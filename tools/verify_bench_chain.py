#!/usr/bin/env python3
"""Numerical fidelity of the bench chain on the real device.

Runs one block of the 1000-tone synth -> PFB -> select chain on the
accelerator and compares against the float64 golden model (tone comb via
exact integer phases -> reference PFB -> bin select).  Guards against the
matmul path silently dropping precision (e.g. bf16 lowering).
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()          # the framework default bench.py runs at
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu import golden
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.pfb import (PFBConfig, pfb_frames, pfb_spare_init,
                                     select_tones, tone_bins)
    from gpu_sdr_tpu.ops.tonegen import ToneCombConfig, tone_comb_block

    rate = 100_000_000
    nfft, avg = 1024, 4
    n_tones = 1000
    L = 262_144                      # small block: golden model is O(C*L)
    freqs = tuple(int(f) for f in
                  np.linspace(-rate / 2 * 0.9, rate / 2 * 0.9, n_tones))
    bins = tuple(int(b) for b in tone_bins(freqs, rate, nfft))
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate, bins=bins)
    window = cfg.window()
    dft = cfg.dft()
    bins_arr = jnp.asarray(np.asarray(bins, np.int32))
    tcfg = ToneCombConfig(rate=rate, freqs=freqs,
                          ampls=(1.0 / n_tones,) * n_tones, block_len=L)
    P, Q = tcfg.factors()
    stepv = tcfg.phase_step()

    @jax.jit
    def step(ph, spare):
        ph, x = tone_comb_block(P, Q, stepv, rate, ph)
        spare, frames = pfb_frames(cfg, window, dft, spare, x)
        return ph, spare, x, select_tones(frames, bins_arr)

    ph = tcfg.phase_init()
    spare = pfb_spare_init(cfg)
    ph, spare, x_dev, y_dev = step(ph, spare)
    x_np = cplx.to_np(jax.block_until_ready(x_dev))
    y_np = cplx.to_np(y_dev)

    # golden: exact tone comb -> reference PFB over zero-primed carry
    x_gold = golden.tone_block(list(freqs), [1.0 / n_tones] * n_tones,
                               rate, 0, L)
    snr_x = golden.snr_db(x_gold, x_np)
    print(f"tone comb SNR vs golden: {snr_x:.1f} dB")

    ze = np.concatenate([np.zeros((avg - 1) * nfft, np.complex128), x_gold])
    frames_gold = golden.pfb_frames(ze, nfft, avg)
    y_gold = golden.tone_select(frames_gold, np.asarray(bins))
    n = min(len(y_gold), len(y_np))
    snr_y = golden.snr_db(y_gold[:n], y_np[:n])
    print(f"chain output SNR vs golden: {snr_y:.1f} dB")
    status = "OK" if (snr_x > 60 and snr_y > 60) else "SUSPICIOUS"
    print(f"fidelity: {status}")


if __name__ == "__main__":
    main()
