"""Attribute the sharded channelizer loopback's per-block ~18%
shard_map cost (tools/perf_sharded_k_sweep.py: flat across K).

Hypothesis: the scan-stacked per-step output — (ftl, nfft) frames per
block — pays an extra relayout/copy under shard_map that the plain-jit
chain does not.  Isolation: run the IDENTICAL kernel chain but reduce
each block's selected frames to one row (sum over the frame axis)
INSIDE the scan body, shrinking the stacked output 8000x while every
kernel byte and flop stays the same.  Four cells: {sharded, plain-jit}
x {full output, slim output}; if the sharded/plain ratio closes on the
slim variant, the stacked-output path under shard_map is the cost.

Run: nohup python tools/perf_sharded_smap_probe.py > logs/sharded_smap_probe.log 2>&1 &
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


def time_fn(step, state, target=8_192_000_000):
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
    from gpu_sdr_tpu.ops import cplx, pfb as pfb_ops, tonegen as tone_ops
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
    cfg = pfb_ops.PFBConfig(nfft=NFFT, avg=4, rate=RATE)
    dft = DFT(NFFT, two_stage=True)
    n1, n2 = dft.split
    lead = cfg.avg - 1
    ftl = L // NFFT
    frame = tone_ops.tone_comb_wavetable_block(freqs, ampls, RATE, NFFT)
    f_t = transpose_block(frame, NFFT, n1, n2)
    lead_f = C(jnp.broadcast_to(f_t.re, (n1, lead, n2)),
               jnp.broadcast_to(f_t.im, (n1, lead, n2)))
    bins = np.asarray(pfb_ops.tone_bins(list(freqs), RATE, NFFT))
    window = jnp.asarray(cfg.window())
    mesh = make_mesh((1, 1), ("time", "channels"))

    def chain(slim):
        def body(st, _):
            g = jnp.where(st == 0, jnp.float32(0.0), jnp.float32(1.0))
            sp = C(lead_f.re * g, lead_f.im * g)
            _, fr = channelizer_frames_t(cfg, window, dft, sp, f_t,
                                         nframes=ftl)
            y = select_tones_t(fr, bins, n1, n2)
            if slim:
                y = C(jnp.sum(y.re, axis=0, keepdims=True),
                      jnp.sum(y.im, axis=0, keepdims=True))
            return jnp.int32(1), y

        def run(started):
            return jax.lax.scan(body, started, None, length=K)

        return run

    for slim in (False, True):
        run = chain(slim)
        plain = jax.jit(run)
        step_p = lambda st, plain=plain: plain(st)
        m_plain = time_fn(step_p, jnp.int32(0))
        out(kind="plain", slim=slim, msps=round(m_plain))
        smapped = jax.jit(shard_map(
            run, mesh=mesh, in_specs=(P(),),
            out_specs=(P(), _cpair(None, None, None)),
            check_vma=False))
        step_s = lambda st, smapped=smapped: smapped(st)
        m_sh = time_fn(step_s, jnp.int32(0))
        out(kind="shard_map", slim=slim, msps=round(m_sh),
            ratio=round(m_sh / m_plain, 3))


if __name__ == "__main__":
    main()


def main2():
    """Cells 5-6: the production _ChannelizerWavetableChain through
    plain jit and shard_map.  SUPERSEDED by probe3/probe4: this cell's
    3.0 Gsps is multi_step's trailing flat reshape of the scan-stacked
    output (7.5x when not cancelled by FusedLoopback's reshape-back in
    the same jit), NOT the carry structure or shard_map (both measured
    free).  Kept for the record."""
    import jax
    import jax.numpy as jnp
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.engine.fused import _ChannelizerWavetableChain
    from gpu_sdr_tpu.ops import pfb as pfb_ops
    from gpu_sdr_tpu.ops.cplx import DFT
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
    bins = tuple(int(b) for b in
                 pfb_ops.tone_bins(list(freqs), RATE, NFFT))
    cfg = pfb_ops.PFBConfig(nfft=NFFT, avg=4, rate=RATE, bins=bins)
    dft = DFT(NFFT, two_stage=True)
    ch = _ChannelizerWavetableChain(cfg, dft, freqs, ampls, L, False, 0)

    def run(sp):
        return ch.multi_step(sp, K)

    plain = jax.jit(run)
    m_plain = time_fn(lambda st: plain(st), ch.init_state())
    out(kind="plain_prod_chain", msps=round(m_plain))
    mesh = make_mesh((1, 1), ("time", "channels"))
    smapped = jax.jit(shard_map(
        run, mesh=mesh, in_specs=(_cpair(None, None, None),),
        out_specs=(_cpair(None, None, None), _cpair(None, None)),
        check_vma=False))
    m_sh = time_fn(lambda st: smapped(st), ch.init_state())
    out(kind="shard_map_prod_chain", msps=round(m_sh),
        ratio=round(m_sh / m_plain, 3))


if __name__ == "__main__":
    main2()
