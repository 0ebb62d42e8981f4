"""TPU: stage ladder at the (8,125) split + Pallas pre-sum tile-size sweep.

Run: nohup python tools/perf_bt_sweep.py > log 2>&1 &
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
    X = xconst.reshape(nframes, nfft)

    def run(name, body):
        @jax.jit
        def multi(s):
            return jax.lax.scan(body, s, None, length=K)

        s0 = pfb_spare_init(cfg).reshape(avg - 1, nfft)
        t0 = time.perf_counter()
        s, ys = multi(s0)
        jax.block_until_ready(ys)
        c = time.perf_counter() - t0
        n_exec = 6
        t0 = time.perf_counter()
        for _ in range(n_exec):
            s, ys = multi(s)
        jax.block_until_ready(ys)
        dt = (time.perf_counter() - t0) / (n_exec * K)
        print(f"{name}: {dt*1e6:.0f} us/blk ({block_len/dt/1e6:.0f} Msps) "
              f"[compile {c:.0f}s]", flush=True)

    # tile-size sweep on presum-only (sum output)
    for bt in (40, 80, 160, 200, 400, 1000):
        def body(S, _, bt=bt):
            pre = pallas_presum(W2, S, X, bt=bt)
            return X[-(avg - 1):], cplx.C(pre.re.sum(), pre.im.sum())
        run(f"presum bt={bt}", body)

    # ladder with the aligned split
    def body_dft(S, _):
        pre = pallas_presum(W2, S, X)
        fr = dftf.scrambled(pre)
        return X[-(avg - 1):], cplx.C(fr.re.sum(), fr.im.sum())
    run("presum+dft(8,125)", body_dft)

    def body_full(S, _):
        pre = pallas_presum(W2, S, X)
        fr = dftf.scrambled(pre)
        return X[-(avg - 1):], select_tones(fr, bins_arr)
    run("full (stacked out)", body_full)


if __name__ == "__main__":
    main()
