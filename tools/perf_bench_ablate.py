"""Measure, don't model, the headline roofline (VERDICT r2 #6).

Ablates the bench.py chain per stage AT THE BENCH GEOMETRY (scan 32 x
8M), back-to-back in one process, fetch-synced, equal-work rounds:

  io     : y = a*x + c elementwise on the spectra-shaped (n1, T, n2)
           pair — the achieved read+write bandwidth for this layout
           (nominal 16 B/sample)
  select : select_tones_t of a resident spectra block, stacked by the
           scan (dense transpose + lane roll).  The carry-dependent
           bias is applied to the REAL half only — deliberately: XLA
           then hoists the loop-invariant imaginary transpose out of
           the scan, so the stage's effective traffic is 12 B/sample
           (re read+write, im stack-write only), which is what the
           docs/05 ladder documents and what this script prints.
  kernel : channelizer_frames_t alone, output sliced to 8 floats —
           the fused synth+PFB+DFT kernel's one HBM spectra write
           (nominal 8 B/sample)
  full   : kernel + select + scan stack — the bench chain
           (nominal 24 B/sample)

Each line prints Gsps and the implied GB/s at the stage's nominal
B/sample; io gives the achieved-elementwise ceiling for the same
shapes.  Run: nohup python tools/perf_bench_ablate.py > log 2>&1 &
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.ops.cplx import C, DFT
    from gpu_sdr_tpu.ops.pallas_channelizer import (
        can_fuse_channelizer, channelizer_frames_t, select_tones_t,
        transpose_block)
    from gpu_sdr_tpu.ops.pfb import PFBConfig, pfb_spare_init, tone_bins
    from gpu_sdr_tpu.ops.tonegen import comb_period, tone_comb_wavetable_block

    rate = 100_000_000
    nfft, avg, n_tones = 1000, 4, 1000
    block_len, K, n_blocks = 8_000_000, 32, 16384
    freqs = tuple(int(k * (rate // nfft))
                  for k in range(-nfft // 2, nfft // 2))
    bins_np = np.asarray(tone_bins(freqs, rate, nfft))
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate,
                    bins=tuple(int(b) for b in bins_np))
    window = cfg.window()
    dft = DFT(nfft, two_stage=True)
    n1, n2 = dft.split
    assert can_fuse_channelizer(cfg, dft, block_len)
    T = block_len // nfft

    period = comb_period(freqs, rate)
    assert nfft % period == 0
    frame = tone_comb_wavetable_block(freqs, (1.0 / n_tones,) * n_tones,
                                      rate, nfft)
    f_t = transpose_block(frame, nfft, n1, n2)
    s0 = transpose_block(pfb_spare_init(cfg), nfft, n1, n2)

    def hard_sync(x):
        return float(np.asarray(jax.device_get(
            jnp.ravel(x if isinstance(x, jax.Array) else x.re)[0])))

    # one resident spectra block for the io / select variants
    @jax.jit
    def one_block(spare_t):
        return channelizer_frames_t(cfg, window, dft, spare_t, f_t,
                                    nframes=T)
    _, fr0 = one_block(s0)
    hard_sync(fr0)

    @jax.jit
    def run_io(c, fr):
        def body(c, _):
            y = C(fr.re * c + c, fr.im * c)
            return c + jnp.float32(1e-30), y
        return jax.lax.scan(body, c, None, length=K)

    @jax.jit
    def run_select(c, fr):
        def body(c, _):
            y = select_tones_t(C(fr.re + c, fr.im), bins_np, n1, n2)
            return c + jnp.float32(1e-30), y
        return jax.lax.scan(body, c, None, length=K)

    @jax.jit
    def run_kernel(spare_t):
        def body(spare_t, _):
            spare_t, fr = channelizer_frames_t(cfg, window, dft, spare_t,
                                               f_t, nframes=T)
            return spare_t, fr.re[0, :8, 0]
        return jax.lax.scan(body, spare_t, None, length=K)

    @jax.jit
    def run_full(spare_t):
        def body(spare_t, _):
            spare_t, fr = channelizer_frames_t(cfg, window, dft, spare_t,
                                               f_t, nframes=T)
            return spare_t, select_tones_t(fr, bins_np, n1, n2)
        return jax.lax.scan(body, spare_t, None, length=K)

    variants = [
        ("io", lambda: run_io(jnp.float32(1), fr0), 16),
        ("select", lambda: run_select(jnp.float32(0), fr0), 12),
        ("kernel", lambda: run_kernel(s0), 8),
        ("full", lambda: run_full(s0), 24),
    ]
    for name, fn, bps in variants:
        try:
            _, ys = fn()
            hard_sync(ys)
        except Exception as e:
            print(json.dumps({"stage": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        n_exec = n_blocks // K
        per_round = n_exec // 4
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(per_round):
                _, ys = fn()
            hard_sync(ys)
            dt = time.perf_counter() - t0
            best = max(best, per_round * K * block_len / dt / 1e9)
        print(json.dumps({"stage": name, "gsps": round(best, 2),
                          "nominal_B_per_sample": bps,
                          "implied_gbps": round(best * bps, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
