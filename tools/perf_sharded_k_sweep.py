"""Exec-granularity sweep for the sharded channelizer-wavetable
loopback: is the ~16% gap to the plain-jit single-chip chain
(logs/sharded_loopback_at.log: 19.7 vs 23.5 Gsps at K=8) a fixed
per-execution shard_map dispatch cost that a larger K amortizes, or a
per-block cost that K cannot touch?

Back-to-back K in {8, 16, 32} for the sharded form plus the single-chip
anchor at the same K values, one process.

Run: nohup python tools/perf_sharded_k_sweep.py > logs/sharded_k_sweep.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RATE = 100_000_000
NFFT = 1000
L = 8_000_000


def hard_sync(x):
    import jax
    import jax.numpy as jnp
    arr = x.re if hasattr(x, "re") else x
    return float(np.asarray(jax.device_get(jnp.ravel(arr)[0])))


def time_exec(step, state, K, target=8_192_000_000):
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
    return best


def main():
    import jax
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.engine.fused import FusedLoopback
    from gpu_sdr_tpu.parallel import make_mesh
    from gpu_sdr_tpu.parallel.fused_sharded import ShardedFusedLoopback
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    out = lambda **kw: print(json.dumps(kw), flush=True)
    bin_hz = RATE // NFFT
    freqs = [int(k * bin_hz) for k in range(-500, 500)]
    n = len(freqs)

    def params():
        tx = AntennaParams(mode=AntMode.TX, rate=RATE, buffer_len=L,
                           samples=64 * L, freq=freqs,
                           ampl=[1.0 / n] * n,
                           wave_type=[WaveType.TONES] * n, delay=1.0)
        rx = AntennaParams(mode=AntMode.RX, rate=RATE, buffer_len=L,
                           samples=64 * L, fft_tones=NFFT, pf_average=4,
                           freq=freqs, wave_type=[WaveType.TONES] * n,
                           delay=1.0)
        return tx, rx

    mesh = make_mesh((1, 1), ("time", "channels"))
    tx, rx = params()
    for K in (8, 16, 32):
        sf = ShardedFusedLoopback(tx, rx, mesh, blocks_per_exec=K,
                                  block_len=L)
        assert sf.path == "channelizer_wavetable", sf.path
        msps = time_exec(sf.run_exec, sf.init_state(), K)
        out(kind="sharded", K=K, msps=round(msps))
        # single-chip cell corrected to the PLAN's block length (the
        # planner picks 6M for this 8M buffer; the recorded
        # logs/sharded_k_sweep.log cells are inflated 4/3 — the flat
        # ratio conclusion is superseded by perf_sharded_smap_probe*:
        # shard_map costs nothing at matched geometry)
        fl = FusedLoopback(tx, rx, blocks_per_exec=K)
        B1 = fl.demod.plan.block_len

        def step1(state, fl=fl):
            g, d = state
            g, d, ys = fl._multi(g, d)
            return (g, d), ys

        msps1 = time_exec(step1, fl._init_states(), K) * (B1 / L)
        out(kind="single", K=K, msps=round(msps1), plan_block_len=B1,
            ratio=round(msps / msps1, 3))


if __name__ == "__main__":
    main()
