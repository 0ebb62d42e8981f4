"""Pin the production chain's 7.6x anomaly (probe3: spare-carried chain
with trailing reshape = 3.0 Gsps vs 23.1 for the flag chain without it,
same L=8M, K=8).  Cells: the SAME started-flag chain with and without a
trailing (K*T, C) reshape of the scan-stacked output, and the
spare-carried body without the reshape — isolating reshape vs carry.

Run: nohup python tools/perf_sharded_smap_probe4.py > logs/sharded_smap_probe4.log 2>&1 &
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
    from gpu_sdr_tpu.ops import pfb as pfb_ops, tonegen as tone_ops
    from gpu_sdr_tpu.ops.cplx import C, DFT
    from gpu_sdr_tpu.ops.pallas_channelizer import (channelizer_frames_t,
                                                    select_tones_t,
                                                    transpose_block)

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
    spare0 = transpose_block(pfb_ops.pfb_spare_init(cfg), NFFT, n1, n2)

    def body_flag(st, _):
        g = jnp.where(st == 0, jnp.float32(0.0), jnp.float32(1.0))
        sp = C(lead_f.re * g, lead_f.im * g)
        _, fr = channelizer_frames_t(cfg, window, dft, sp, f_t,
                                     nframes=ftl)
        y = select_tones_t(fr, bins, n1, n2)
        return jnp.int32(1), y

    def body_carry(sp, _):
        sp, fr = channelizer_frames_t(cfg, window, dft, sp, f_t,
                                      nframes=ftl)
        y = select_tones_t(fr, bins, n1, n2)
        return sp, y

    cells = [
        ("flag_noreshape", body_flag, jnp.int32(0), False),
        ("flag_reshape", body_flag, jnp.int32(0), True),
        ("carry_noreshape", body_carry, spare0, False),
        ("carry_reshape", body_carry, spare0, True),
    ]
    for name, body, st0, reshape in cells:
        def run(st, body=body, reshape=reshape):
            st, ys = jax.lax.scan(body, st, None, length=K)
            if reshape:
                ys = C(ys.re.reshape(K * ftl, len(bins)),
                       ys.im.reshape(K * ftl, len(bins)))
            return st, ys

        f = jax.jit(run)
        m = time_fn(lambda st, f=f: f(st), st0)
        out(cell=name, msps=round(m))


if __name__ == "__main__":
    main()
