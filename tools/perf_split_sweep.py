"""TPU sweep: two-stage DFT split (n1, n2) for nfft=1000 in the headline
chain.  MAC count scales with n1+n2 (balanced best) but MXU padding favors
contraction dims near 128 — measure which wins end-to-end.

Run: nohup python tools/perf_split_sweep.py > log 2>&1 &
"""

# NOTE: this tool predates the fetch-synced timing rule (CLAUDE.md): numbers it
# printed historically are unreliable (block_until_ready early-ack / short-round
# deflation). Use bench.py / tools/bench_configs.py / tools/perf_honest_sweep.py
# or add hard_sync + steady-state rounds before trusting new runs.

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run_variant(n1, n2, K=64, block_len=4_000_000, n_samples=1_536_000_000):
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.cplx import DFT
    from gpu_sdr_tpu.ops.pallas_pfb import pfb_frames_fused
    from gpu_sdr_tpu.ops.pfb import (PFBConfig, pfb_spare_init, select_tones,
                                     tone_bins)
    from gpu_sdr_tpu.ops.tonegen import comb_period, tone_comb_wavetable_block

    rate = 100_000_000
    nfft, avg, n_tones = 1000, 4, 1000
    freqs = tuple(int(k * (rate // nfft)) for k in range(-nfft // 2, nfft // 2))
    bins = tuple(int(b) for b in tone_bins(freqs, rate, nfft))
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate, bins=bins)
    window = cfg.window()

    dft = DFT(nfft, two_stage=True)
    # override the auto split
    assert n1 * n2 == nfft
    sign = -1.0
    from gpu_sdr_tpu.ops.cplx import _dft_factors, const
    dft.split = (n1, n2)
    dft.F1 = const(_dft_factors(n1, sign).astype(np.complex64))
    dft.F2 = const(_dft_factors(n2, sign).astype(np.complex64))
    b = np.arange(n2, dtype=np.float64)
    k1 = np.arange(n1, dtype=np.float64)
    tw = np.exp(sign * 2j * np.pi * np.outer(b, k1) / nfft)
    dft.TW = const(tw.astype(np.complex64))
    bins_arr = jnp.asarray(dft.scramble_index(bins))

    period = comb_period(freqs, rate)
    assert block_len % period == 0
    xconst = tone_comb_wavetable_block(freqs, (1.0 / n_tones,) * n_tones,
                                       rate, block_len)

    def body(spare, _):
        spare, frames = pfb_frames_fused(cfg, window, dft.scrambled,
                                         spare, xconst)
        return spare, select_tones(frames, bins_arr)

    @jax.jit
    def multi(spare):
        return jax.lax.scan(body, spare, None, length=K)

    spare = pfb_spare_init(cfg)
    t0 = time.perf_counter()
    spare, ys = multi(spare)
    jax.block_until_ready(ys)
    c = time.perf_counter() - t0
    n_exec = max(1, n_samples // (K * block_len))
    t0 = time.perf_counter()
    for _ in range(n_exec):
        spare, ys = multi(spare)
    jax.block_until_ready(ys)
    dt = time.perf_counter() - t0
    msps = n_exec * K * block_len / dt / 1e6
    print(f"split ({n1:>3},{n2:>3}): {msps:.0f} Msps ({msps/100:.1f}x) "
          f"[compile {c:.0f}s]", flush=True)


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    for n1, n2 in ((25, 40), (8, 125), (10, 100), (20, 50), (40, 25),
                   (50, 20), (100, 10), (125, 8), (5, 200), (200, 5)):
        run_variant(n1, n2)


if __name__ == "__main__":
    main()
