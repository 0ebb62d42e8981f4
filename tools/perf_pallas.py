"""TPU experiment: Pallas fused PFB pre-sum in the headline chain.

Measures whether the one-pass Pallas windowed pre-sum (ops/pallas_pfb.py)
beats the XLA shifted-add pre-sum inside the full 1000-tone headline chain
(bench.py configuration: wavetable comb -> PFB -> two-stage DFT -> select,
lax.scan 64 x 4 Msample blocks).

Run on the real chip:  nohup python tools/perf_pallas.py > log 2>&1 &
Stage 1 is a cheap single-block compile that (a) smoke-tests Pallas
lowering through the remote-compile path and (b) checks numerical
equivalence against the XLA pre-sum on-chip before paying for the big
scan compile.
"""

# NOTE: this tool predates the fetch-synced timing rule (CLAUDE.md): numbers it
# printed historically are unreliable (block_until_ready early-ack / short-round
# deflation). Use bench.py / tools/bench_configs.py / tools/perf_honest_sweep.py
# or add hard_sync + steady-state rounds before trusting new runs.

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.pfb import (PFBConfig, pfb_frames, pfb_spare_init,
                                     select_tones, tone_bins)
    from gpu_sdr_tpu.ops.pallas_pfb import pfb_frames_fused
    from gpu_sdr_tpu.ops.tonegen import comb_period, tone_comb_wavetable_block

    print("devices:", jax.devices(), flush=True)

    rate = 100_000_000
    nfft, avg = 1000, 4
    n_tones = 1000
    block_len = 4_000_000
    K = 64
    freqs = tuple(int(k * (rate // nfft)) for k in range(-nfft // 2, nfft // 2))
    bins = tuple(int(b) for b in tone_bins(freqs, rate, nfft))
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate, bins=bins)
    window = cfg.window()
    dft_full = cfg.dft(two_stage=True)
    dft = dft_full.scrambled
    bins_arr = jnp.asarray(dft_full.scramble_index(bins))
    period = comb_period(freqs, rate)
    assert block_len % period == 0
    xconst = tone_comb_wavetable_block(freqs, (1.0 / n_tones,) * n_tones,
                                       rate, block_len)

    # ---- stage 1: single-block smoke + on-chip equivalence ----
    t0 = time.perf_counter()
    spare0 = pfb_spare_init(cfg)

    @jax.jit
    def one_fused(spare):
        spare, frames = pfb_frames_fused(cfg, window, dft, spare, xconst)
        return spare, select_tones(frames, bins_arr)

    @jax.jit
    def one_xla(spare):
        spare, frames = pfb_frames(cfg, window, dft, spare, xconst)
        return spare, select_tones(frames, bins_arr)

    _, yf = one_fused(spare0)
    jax.block_until_ready(yf)
    print(f"stage1 fused compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    _, yx = one_xla(spare0)
    jax.block_until_ready(yx)
    err = max(float(jnp.abs(yf.re - yx.re).max()),
              float(jnp.abs(yf.im - yx.im).max()))
    scale = float(jnp.abs(yx.re).max())
    print(f"stage1 equivalence: max abs err {err:.3e} (scale {scale:.3e})",
          flush=True)
    assert err <= 1e-4 * max(scale, 1.0), "pallas pre-sum mismatch on chip"

    # per-block timing of the single-block programs (device-resident)
    for name, fn in (("fused", one_fused), ("xla", one_xla)):
        t0 = time.perf_counter()
        for _ in range(20):
            _, y = fn(spare0)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / 20
        print(f"stage1 {name} 1x4M: {block_len/dt/1e6:.0f} Msps "
              f"({dt*1e3:.2f} ms/blk)", flush=True)

    # ---- stage 2: full headline scan chain with the pallas pre-sum ----
    def body(spare, _):
        spare, frames = pfb_frames_fused(cfg, window, dft, spare, xconst)
        return spare, select_tones(frames, bins_arr)

    @jax.jit
    def multi(spare):
        return jax.lax.scan(body, spare, None, length=K)

    t0 = time.perf_counter()
    spare, ys = multi(spare0)
    jax.block_until_ready(ys)
    print(f"stage2 scan-{K} compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)

    n_exec = 8
    t0 = time.perf_counter()
    for _ in range(n_exec):
        spare, ys = multi(spare)
    jax.block_until_ready(ys)
    dt = time.perf_counter() - t0
    msps = n_exec * K * block_len / dt / 1e6
    print(json.dumps({"metric": "pallas fused headline chain",
                      "value": round(msps, 1),
                      "unit": "Msamples/s/chip",
                      "vs_baseline": round(msps / 100.0, 3)}), flush=True)


if __name__ == "__main__":
    main()
