"""A/B the round-5 SHARDED table-oscillator VNA (dispatch row 3
sub-path chirp_table) against the per-shard sincos chain
(chirp_lockin), on a 1-device mesh on the real chip at the config-2
shape, with the single-chip chirp_wavetable chain as the anchor.

At T=1 the mesh path's work is identical to the single-chip config-2
chain (the kernel is invoked with the same tile indices), so the A/B
isolates what the resident-period table buys the MESH path over
recomputing the chirp oscillator per sample on the VPU.

Run: nohup python tools/perf_sharded_vna_table.py > logs/sharded_vna_table.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RATE = 100_000_000
L = 4_000_000
K = 32


def hard_sync(x):
    import jax
    import jax.numpy as jnp
    arr = x.re if hasattr(x, "re") else x
    return float(np.asarray(jax.device_get(jnp.ravel(arr)[0])))


def time_exec(step, state, target=16_384_000_000):
    state, ys = step(state)
    hard_sync(ys)
    n_exec = max(1, int(target // (K * L)) // 4)
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n_exec):
            state, ys = step(state)
        hard_sync(ys)
        dt = time.perf_counter() - t0
        best = max(best, n_exec * K * L / dt / 1e6)
    return best, ys


def main():
    import jax
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.engine.fused import FusedLoopback
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.parallel import make_mesh
    import gpu_sdr_tpu.parallel.fused_sharded as fsm
    from gpu_sdr_tpu.parallel.fused_sharded import ShardedFusedVNA
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    out = lambda **kw: print(json.dumps(kw), flush=True)
    kw = dict(rate=RATE, buffer_len=L, samples=64 * L,
              freq=[-40_000_000], chirp_f=[40_000_000], chirp_t=[1.0],
              swipe_s=[5000], delay=1.0)
    tx = AntennaParams(mode=AntMode.TX, ampl=[1.0],
                       wave_type=[WaveType.CHIRP], **kw)
    rx = AntennaParams(mode=AntMode.RX, decim=1,
                       wave_type=[WaveType.CHIRP], **kw)
    mesh = make_mesh((1, 1), ("time", "channels"))

    v_new = ShardedFusedVNA(tx, rx, mesh, blocks_per_exec=K, block_len=L)
    orig = fsm.plan_sharded_chirp_table
    fsm.plan_sharded_chirp_table = lambda *a, **k: False
    try:
        v_old = ShardedFusedVNA(tx, rx, mesh, blocks_per_exec=K,
                                block_len=L)
    finally:
        fsm.plan_sharded_chirp_table = orig
    out(stage="paths", new=v_new.path, old=v_old.path)
    assert v_new.path == "chirp_table" and v_old.path == "chirp_lockin"

    # numeric cross-check (one execution each)
    st, ys_n = v_new.run_exec(v_new.init_state())
    st2, ys_o = v_old.run_exec(v_old.init_state())
    a = cplx.to_np(ys_n).reshape(-1)
    b = cplx.to_np(ys_o).reshape(-1)
    err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)
    out(stage="parity", rel_err=float(err))
    assert err < 1e-4, err

    msps_new, _ = time_exec(v_new.run_exec, v_new.init_state())
    out(stage="rate", path="chirp_table_sharded", msps=round(msps_new))
    msps_old, _ = time_exec(v_old.run_exec, v_old.init_state())
    out(stage="rate", path="chirp_lockin_sharded", msps=round(msps_old))

    # single-chip anchor: the config-2 chirp_wavetable chain, plain jit
    fl = FusedLoopback(tx, rx, blocks_per_exec=K)
    out(stage="single_chip_path", path=fl.path)

    def step1(state):
        g, d = state
        g, d, ys = fl._multi(g, d)
        return (g, d), ys

    msps_1, _ = time_exec(step1, fl._init_states())
    out(stage="rate", path="chirp_wavetable_single", msps=round(msps_1))
    msps_new2, _ = time_exec(v_new.run_exec, v_new.init_state())
    out(stage="rate", path="chirp_table_sharded_again",
        msps=round(msps_new2))
    fused = max(msps_new, msps_new2)
    out(stage="summary", table_sharded=round(fused),
        sincos_sharded=round(msps_old), single_chip=round(msps_1),
        speedup=round(fused / msps_old, 2),
        vs_single=round(fused / msps_1, 3))


if __name__ == "__main__":
    main()
