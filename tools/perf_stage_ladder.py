"""TPU stage ladder at the headline geometry: time scan-64 chains of
progressively more of the chain (presum / +DFT / +select) to attribute
per-block cost.  Run: nohup python tools/perf_stage_ladder.py > log 2>&1 &
"""

# NOTE: this tool predates the fetch-synced timing rule (CLAUDE.md): numbers it
# printed historically are unreliable (block_until_ready early-ack / short-round
# deflation). Use bench.py / tools/bench_configs.py / tools/perf_honest_sweep.py
# or add hard_sync + steady-state rounds before trusting new runs.

import sys
import time

sys.path.insert(0, ".")


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.pallas_pfb import pallas_presum
    from gpu_sdr_tpu.ops.pfb import (PFBConfig, pfb_spare_init, select_tones,
                                     tone_bins)
    from gpu_sdr_tpu.ops.tonegen import tone_comb_wavetable_block

    rate = 100_000_000
    nfft, avg, n_tones = 1000, 4, 1000
    block_len, K = 4_000_000, 64
    nframes = block_len // nfft
    freqs = tuple(int(k * (rate // nfft)) for k in range(-nfft // 2, nfft // 2))
    bins = tuple(int(b) for b in tone_bins(freqs, rate, nfft))
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate, bins=bins)
    W2 = cfg.window().reshape(avg, nfft)
    dftf = cfg.dft(two_stage=True)
    bins_arr = jnp.asarray(dftf.scramble_index(bins))
    xconst = tone_comb_wavetable_block(freqs, (1.0 / n_tones,) * n_tones,
                                       rate, block_len)

    def presum_only(spare, _):
        ze = cplx.concat([spare, xconst])
        X = ze.reshape(nframes + avg - 1, nfft)
        pre = pallas_presum(W2, X, nframes)
        # tiny reduction keeps the output small but forces the work
        return ze[block_len:], cplx.C(pre.re.sum(), pre.im.sum())

    def presum_dft(spare, _):
        ze = cplx.concat([spare, xconst])
        X = ze.reshape(nframes + avg - 1, nfft)
        pre = pallas_presum(W2, X, nframes)
        fr = dftf.scrambled(pre)
        return ze[block_len:], cplx.C(fr.re.sum(), fr.im.sum())

    def full(spare, _):
        ze = cplx.concat([spare, xconst])
        X = ze.reshape(nframes + avg - 1, nfft)
        pre = pallas_presum(W2, X, nframes)
        fr = dftf.scrambled(pre)
        y = select_tones(fr, bins_arr)
        return ze[block_len:], cplx.C(y.re.sum(), y.im.sum())

    def full_out(spare, _):
        ze = cplx.concat([spare, xconst])
        X = ze.reshape(nframes + avg - 1, nfft)
        pre = pallas_presum(W2, X, nframes)
        fr = dftf.scrambled(pre)
        return ze[block_len:], select_tones(fr, bins_arr)

    for name, body in (("presum", presum_only), ("presum+dft", presum_dft),
                       ("presum+dft+select(sum)", full),
                       ("full chain (stacked out)", full_out)):
        @jax.jit
        def multi(spare, body=body):
            return jax.lax.scan(body, spare, None, length=K)

        spare = pfb_spare_init(cfg)
        t0 = time.perf_counter()
        spare, ys = multi(spare)
        jax.block_until_ready(ys)
        c = time.perf_counter() - t0
        n_exec = 4
        t0 = time.perf_counter()
        for _ in range(n_exec):
            spare, ys = multi(spare)
        jax.block_until_ready(ys)
        dt = (time.perf_counter() - t0) / (n_exec * K)
        print(f"{name}: {dt*1e6:.0f} us/blk "
              f"({block_len/dt/1e6:.0f} Msps)  [compile {c:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
