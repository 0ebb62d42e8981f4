"""Headline K-as-grid-axis probe (VERDICT r4 #8).

The headline chain scans K=32 blocks of 8M samples, stacking each
block's selected spectra.  With wavetable synthesis the comb is
one-frame-periodic, so the spare-frame carry is closed-form — nothing
forces the scan: ONE channelizer call with nframes = K*T covers the
whole execution on the kernel's grid axis (no scan, no per-block
stacking, one monolithic select).  The round-3 monolithic-grid attempt
still threaded the carry sequentially; this form has no carry at all.
Measure accept/reject against the production scan geometry, equal
samples per execution, back-to-back in one process.

Run: nohup python tools/proto_headline_kgrid.py > logs/headline_kgrid.log 2>&1 &
"""

import json
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")


def hard_sync(arr):
    import jax
    return float(np.asarray(jax.device_get(arr.re.reshape(-1)[0])))


def main():
    import jax
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.ops.cplx import DFT
    from gpu_sdr_tpu.ops.pallas_channelizer import (
        can_fuse_channelizer, channelizer_frames_t, select_tones_t,
        transpose_block)
    from gpu_sdr_tpu.ops.pfb import PFBConfig, pfb_spare_init, tone_bins
    from gpu_sdr_tpu.ops.tonegen import tone_comb_wavetable_block

    rate, nfft, avg, n_tones = 100_000_000, 1000, 4, 1000
    freqs = tuple(int(k * (rate // nfft))
                  for k in range(-nfft // 2, nfft // 2))
    bins_np = np.asarray(tone_bins(freqs, rate, nfft))
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate,
                    bins=tuple(int(b) for b in bins_np))
    window = cfg.window()
    dft = DFT(nfft, two_stage=True)
    n1, n2 = dft.split
    frame = tone_comb_wavetable_block(freqs, (1.0 / n_tones,) * n_tones,
                                      rate, nfft)
    f_t = transpose_block(frame, nfft, n1, n2)
    s0 = transpose_block(pfb_spare_init(cfg), nfft, n1, n2)

    def out(**kw):
        print(json.dumps(kw), flush=True)

    TARGET = 16_384_000_000

    def run(tag, K, block_len):
        if not can_fuse_channelizer(cfg, dft, block_len):
            out(variant=tag, error="untileable block")
            return
        T = block_len // nfft

        def body(spare_t, _):
            spare_t, fr = channelizer_frames_t(cfg, window, dft, spare_t,
                                               f_t, nframes=T)
            return spare_t, select_tones_t(fr, bins_np, n1, n2)

        if K == 1:
            @jax.jit
            def multi(spare_t):
                spare_t, fr = channelizer_frames_t(
                    cfg, window, dft, spare_t, f_t, nframes=T)
                return spare_t, select_tones_t(fr, bins_np, n1, n2)
        else:
            @jax.jit
            def multi(spare_t):
                return jax.lax.scan(body, spare_t, None, length=K)

        s, ys = multi(s0)
        hard_sync(ys)
        samples_per_exec = K * block_len
        n_exec = max(1, TARGET // samples_per_exec // 4)
        best = 0.0
        for _ in range(4):
            s = s0
            t0 = time.perf_counter()
            for _ in range(n_exec):
                s, ys = multi(s)
            hard_sync(ys)
            dt = time.perf_counter() - t0
            best = max(best, n_exec * samples_per_exec / dt / 1e6)
        out(variant=tag, K=K, block_len=block_len, msps=round(best, 1))

    for tag, K, B in (("prod_scan_32x8M", 32, 8_000_000),
                      ("kgrid_1x64M", 1, 64_000_000),
                      ("scan_4x64M", 4, 64_000_000),
                      ("kgrid_1x256M", 1, 256_000_000),
                      ("prod_scan_32x8M_again", 32, 8_000_000)):
        try:
            run(tag, K, B)
        except Exception as e:
            out(variant=tag, error=f"{type(e).__name__}: {e}"[:200])
            traceback.print_exc()


if __name__ == "__main__":
    main()
