"""A/B the round-5 SHARDED channelizer-wavetable loopback (dispatch row
3 sub-path channelizer_wavetable) against the presum+dense-DFT pfb_scan
SPMD chain, on a 1-device mesh on the real chip, with the single-chip
channelizer_wavetable chain as the anchor.

At T=1 the mesh path's work is identical to the single-chip headline
chain, so the three-way isolates (a) what the fused kernel buys the
MESH loopback (the pfb_scan chain still runs the round-1 structure:
presum kernel + one dense nfft x nfft XLA matmul + gather select per
block) and (b) what the shard_map dispatch costs vs the plain jit.

Run: nohup python tools/perf_sharded_loopback_at.py > logs/sharded_loopback_at.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RATE = 100_000_000
NFFT = 1000
L = 8_000_000
K = 8


def hard_sync(x):
    import jax
    import jax.numpy as jnp
    arr = x.re if hasattr(x, "re") else x
    return float(np.asarray(jax.device_get(jnp.ravel(arr)[0])))


def time_exec(step, state, target=8_192_000_000):
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
    from gpu_sdr_tpu.parallel.fused_sharded import ShardedFusedLoopback
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    out = lambda **kw: print(json.dumps(kw), flush=True)
    bin_hz = RATE // NFFT
    freqs = [int(k * bin_hz) for k in range(-500, 500)]
    n = len(freqs)
    tx = AntennaParams(mode=AntMode.TX, rate=RATE, buffer_len=L,
                       samples=64 * L, freq=freqs, ampl=[1.0 / n] * n,
                       wave_type=[WaveType.TONES] * n, delay=1.0)
    rx = AntennaParams(mode=AntMode.RX, rate=RATE, buffer_len=L,
                       samples=64 * L, fft_tones=NFFT, pf_average=4,
                       freq=freqs, wave_type=[WaveType.TONES] * n,
                       delay=1.0)
    mesh = make_mesh((1, 1), ("time", "channels"))

    sf_new = ShardedFusedLoopback(tx, rx, mesh, blocks_per_exec=K,
                                  block_len=L)
    import gpu_sdr_tpu.parallel.fused_sharded as fsm
    orig = fsm.plan_sharded_channelizer_loopback
    fsm.plan_sharded_channelizer_loopback = \
        lambda *a, **k: False
    try:
        sf_old = ShardedFusedLoopback(tx, rx, mesh, blocks_per_exec=K,
                                      block_len=L)
    finally:
        fsm.plan_sharded_channelizer_loopback = orig
    out(stage="paths", new=sf_new.path, old=sf_old.path)
    assert sf_new.path == "channelizer_wavetable"
    assert sf_old.path == "pfb_scan"

    # numeric cross-check (one execution each, steady-state block)
    st, ys_n = sf_new.run_exec(sf_new.init_state())
    st, ys_n = sf_new.run_exec(st)
    st2, ys_o = sf_old.run_exec(sf_old.init_state())
    st2, ys_o = sf_old.run_exec(st2)
    a = cplx.to_np(ys_n).reshape(-1, n)
    b = cplx.to_np(ys_o).reshape(-1, n)
    err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)
    out(stage="parity", rel_err=float(err))
    assert err < 1e-3, err

    msps_new, _ = time_exec(sf_new.run_exec, sf_new.init_state())
    out(stage="rate", path="channelizer_wavetable_sharded",
        msps=round(msps_new))
    msps_old, _ = time_exec(sf_old.run_exec, sf_old.init_state())
    out(stage="rate", path="pfb_scan_sharded", msps=round(msps_old))

    # single-chip anchor: the same chain through plain jit (no shard_map).
    # CAUTION (fixed after logs/sharded_loopback_at.log was recorded):
    # FusedLoopback's planner may pick a block SMALLER than buffer_len
    # (6M for this 8M buffer), so the anchor's rate math must use the
    # PLAN's block length — the recorded log's single-chip cell is
    # inflated 4/3 by this (see docs/05 and
    # tools/perf_sharded_smap_probe*.py for the corrected grid:
    # shard_map costs nothing).
    fl = FusedLoopback(tx, rx, blocks_per_exec=K)
    B1 = fl.demod.plan.block_len
    out(stage="single_chip_path", path=fl.path, plan_block_len=B1)

    def step1(state):
        g, d = state
        g, d, ys = fl._multi(g, d)
        return (g, d), ys

    msps_1, _ = time_exec(step1, fl._init_states())
    msps_1 *= B1 / L                 # correct to the true block length
    out(stage="rate", path="channelizer_wavetable_single", msps=round(msps_1))
    msps_new2, _ = time_exec(sf_new.run_exec, sf_new.init_state())
    out(stage="rate", path="channelizer_wavetable_sharded_again",
        msps=round(msps_new2))
    fused = max(msps_new, msps_new2)
    out(stage="summary", fused_sharded=round(fused),
        scan_sharded=round(msps_old), single_chip=round(msps_1),
        speedup=round(fused / msps_old, 2),
        vs_single=round(fused / msps_1, 3))


if __name__ == "__main__":
    main()
