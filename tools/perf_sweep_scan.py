"""TPU sweep: (blocks_per_exec K, block_len B) for the headline chain with
the Pallas pre-sum, at the tensorfloat32 default.

Run:  nohup python tools/perf_sweep_scan.py > log 2>&1 &
Each variant is one scan program (one remote compile), timed over ~2 GS.
"""

# NOTE: this tool predates the fetch-synced timing rule (CLAUDE.md): numbers it
# printed historically are unreliable (block_until_ready early-ack / short-round
# deflation). Use bench.py / tools/bench_configs.py / tools/perf_honest_sweep.py
# or add hard_sync + steady-state rounds before trusting new runs.

import sys
import time

sys.path.insert(0, ".")


def run_variant(K, block_len, n_samples=2_048_000_000):
    import jax
    import jax.numpy as jnp
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
    dft_full = cfg.dft(two_stage=True)
    dft = dft_full.scrambled
    bins_arr = jnp.asarray(dft_full.scramble_index(bins))
    period = comb_period(freqs, rate)
    assert block_len % period == 0
    xconst = tone_comb_wavetable_block(freqs, (1.0 / n_tones,) * n_tones,
                                       rate, block_len)

    def body(spare, _):
        spare, frames = pfb_frames_fused(cfg, window, dft, spare, xconst)
        return spare, select_tones(frames, bins_arr)

    @jax.jit
    def multi(spare):
        return jax.lax.scan(body, spare, None, length=K)

    spare = pfb_spare_init(cfg)
    t0 = time.perf_counter()
    spare, ys = multi(spare)
    jax.block_until_ready(ys)
    print(f"K={K} B={block_len//1_000_000}M compile+run: "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    n_exec = max(1, n_samples // (K * block_len))
    t0 = time.perf_counter()
    for _ in range(n_exec):
        spare, ys = multi(spare)
    jax.block_until_ready(ys)
    dt = time.perf_counter() - t0
    msps = n_exec * K * block_len / dt / 1e6
    print(f"K={K} B={block_len//1_000_000}M: {msps:.0f} Msps "
          f"({msps/100:.1f}x)", flush=True)
    del multi, xconst, ys, spare


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    for K, B in ((64, 4_000_000), (128, 4_000_000), (64, 8_000_000),
                 (32, 16_000_000), (256, 2_000_000)):
        run_variant(K, B)


if __name__ == "__main__":
    main()
