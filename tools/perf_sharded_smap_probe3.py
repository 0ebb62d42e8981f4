"""Definitive one-process A/B for the sharded-loopback attribution:

- cell A: the reconstructed started-flag chain (what ShardedFusedLoopback
  runs) at L=8M, plain jit
- cell B: the production _ChannelizerWavetableChain (spare carried) at
  the SAME L=8M, plain jit
- cell C: B through shard_map

All three share one process and one timing harness, with msps computed
from the TRUE block length.  Context: perf_sharded_loopback_at.py's
"single-chip anchor" built FusedLoopback whose planner chose 6M blocks
while the harness assumed 8M — inflating that anchor by 4/3.

Run: nohup python tools/perf_sharded_smap_probe3.py > logs/sharded_smap_probe3.log 2>&1 &
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


def time_fn(step, state, target=16_384_000_000):
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
    import jax.numpy as jnp
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.engine.fused import _ChannelizerWavetableChain
    from gpu_sdr_tpu.ops import pfb as pfb_ops, tonegen as tone_ops
    from gpu_sdr_tpu.ops.cplx import C, DFT
    from gpu_sdr_tpu.ops.pallas_channelizer import (channelizer_frames_t,
                                                    select_tones_t,
                                                    transpose_block)
    from gpu_sdr_tpu.parallel import make_mesh
    from gpu_sdr_tpu.parallel.fused_sharded import _cpair
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    out = lambda **kw: print(json.dumps(kw), flush=True)
    bin_hz = RATE // NFFT
    freqs = tuple(int(k * bin_hz) for k in range(-500, 500))
    ampls = tuple(1.0 / len(freqs) for _ in freqs)
    bins_t = tuple(int(b) for b in
                   pfb_ops.tone_bins(list(freqs), RATE, NFFT))
    cfg = pfb_ops.PFBConfig(nfft=NFFT, avg=4, rate=RATE, bins=bins_t)
    dft = DFT(NFFT, two_stage=True)
    n1, n2 = dft.split
    lead = cfg.avg - 1
    ftl = L // NFFT
    frame = tone_ops.tone_comb_wavetable_block(freqs, ampls, RATE, NFFT)
    f_t = transpose_block(frame, NFFT, n1, n2)
    lead_f = C(jnp.broadcast_to(f_t.re, (n1, lead, n2)),
               jnp.broadcast_to(f_t.im, (n1, lead, n2)))
    bins = np.asarray(bins_t)
    window = jnp.asarray(cfg.window())

    # A: started-flag chain (the ShardedFusedLoopback body)
    def body_a(st, _):
        g = jnp.where(st == 0, jnp.float32(0.0), jnp.float32(1.0))
        sp = C(lead_f.re * g, lead_f.im * g)
        _, fr = channelizer_frames_t(cfg, window, dft, sp, f_t,
                                     nframes=ftl)
        y = select_tones_t(fr, bins, n1, n2)
        return jnp.int32(1), y

    run_a = jax.jit(lambda st: jax.lax.scan(body_a, st, None, length=K))
    m_a = time_fn(lambda st: run_a(st), jnp.int32(0))
    out(cell="A_started_flag_plain", msps=round(m_a))

    # B: production spare-carried chain at the same L
    ch = _ChannelizerWavetableChain(cfg, dft, freqs, ampls, L, False, 0)
    run_b = jax.jit(lambda sp: ch.multi_step(sp, K))
    m_b = time_fn(lambda st: run_b(st), ch.init_state())
    out(cell="B_prod_chain_plain", msps=round(m_b),
        b_over_a=round(m_b / m_a, 3))

    # C: B through shard_map on a 1-device mesh
    mesh = make_mesh((1, 1), ("time", "channels"))
    run_c = jax.jit(shard_map(
        lambda sp: ch.multi_step(sp, K), mesh=mesh,
        in_specs=(_cpair(None, None, None),),
        out_specs=(_cpair(None, None, None), _cpair(None, None)),
        check_vma=False))
    m_c = time_fn(lambda st: run_c(st), ch.init_state())
    out(cell="C_prod_chain_shard_map", msps=round(m_c),
        c_over_b=round(m_c / m_b, 3))


if __name__ == "__main__":
    main()
