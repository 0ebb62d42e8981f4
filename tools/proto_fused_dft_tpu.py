"""TPU smoke + timing for the fully fused presum+two-stage-DFT kernel
(tools/proto_fused_dft.py) at the headline geometry.

nfft=1000 -> n1=25, n2=40; block 4.096M samples -> 4096 frames, bt=128
(lane-friendly).  Run: nohup python tools/proto_fused_dft_tpu.py > log &
"""

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
    from gpu_sdr_tpu.ops.pfb import PFBConfig, pfb_spare_init, tone_bins
    from gpu_sdr_tpu.ops.tonegen import comb_period, tone_comb_wavetable_block
    from tools.proto_fused_dft import fused_pfb_dft

    rate = 100_000_000
    nfft, avg, n_tones = 1000, 4, 1000
    n1, n2 = 25, 40
    block_len = 4_096_000
    bt = 128
    nframes = block_len // nfft
    K = 64
    freqs = tuple(int(k * (rate // nfft)) for k in range(-nfft // 2, nfft // 2))
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate)
    W2 = cfg.window().reshape(avg, nfft)
    period = comb_period(freqs, rate)
    assert block_len % period == 0
    xconst = tone_comb_wavetable_block(freqs, (1.0 / n_tones,) * n_tones,
                                       rate, block_len)
    X = xconst.reshape(nframes, nfft)
    S0 = pfb_spare_init(cfg).reshape(avg - 1, nfft)

    # ---- correctness smoke: one block vs XLA two-stage path ----
    @jax.jit
    def one(S):
        return fused_pfb_dft(W2, S, X, n1, n2, bt, interpret=False)

    t0 = time.perf_counter()
    y = one(S0)
    jax.block_until_ready(y)
    print(f"fused kernel compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)

    from gpu_sdr_tpu.ops.pallas_pfb import pfb_frames_fused
    dftf = cfg.dft(two_stage=True)

    @jax.jit
    def ref(spare):
        return pfb_frames_fused(cfg, cfg.window(), dftf.scrambled,
                                spare, xconst)

    _, fr = ref(pfb_spare_init(cfg))
    jax.block_until_ready(fr)
    # fused output: tile-major (nr*nfft, bt), rows (k2, k1); ref scrambled
    # flat pos = k1*n2 + k2 per frame row.  Compare a handful of points.
    yr = np.asarray(y.re)
    fr_r = np.asarray(fr.re)
    nr = nframes // bt
    rng = np.random.default_rng(0)
    worst = 0.0
    for _ in range(200):
        t = int(rng.integers(0, nframes))
        k = int(rng.integers(0, nfft))
        k1, k2 = k % n1, k // n1
        r, tt = t // bt, t % bt
        a = yr[r * nfft + k2 * n1 + k1, tt]
        b = fr_r[t, k1 * n2 + k2]
        worst = max(worst, abs(a - b))
    scale = np.abs(fr_r).max()
    print(f"spot-check max err {worst:.3e} (scale {scale:.3e})", flush=True)
    assert worst < 1e-3 * max(scale, 1e-6)

    # ---- timing: scan-K chains ----
    def run_scan(name, body):
        @jax.jit
        def multi(S):
            return jax.lax.scan(body, S, None, length=K)

        t0 = time.perf_counter()
        S, ys = multi(S0)
        jax.block_until_ready(ys)
        print(f"{name} scan-{K} compile+run: {time.perf_counter()-t0:.1f}s",
              flush=True)
        n_exec = 8
        t0 = time.perf_counter()
        for _ in range(n_exec):
            S, ys = multi(S)
        jax.block_until_ready(ys)
        dt = time.perf_counter() - t0
        msps = n_exec * K * block_len / dt / 1e6
        print(f"{name}: {msps:.0f} Msps ({msps/100:.1f}x)", flush=True)

    def body_sum(S, _):
        y = fused_pfb_dft(W2, S, X, n1, n2, bt, interpret=False)
        return X[-(avg - 1):], cplx.C(y.re.sum(), y.im.sum())

    # tone select in the fused transposed layout: per tile r the selected
    # bin k sits at row r*nfft + (k % n1)*n1?? no: row (k2*n1 + k1) with
    # k1 = k % n1, k2 = k // n1
    bins = tuple(int(b) for b in tone_bins(freqs, rate, nfft))
    barr = np.asarray(bins, np.int64)
    row_in_tile = (barr // n1) * n1 + (barr % n1)
    nr = nframes // bt
    sel_rows = (np.arange(nr)[:, None] * nfft +
                row_in_tile[None, :]).reshape(-1)
    sel_arr = jnp.asarray(sel_rows.astype(np.int32))

    def body_full(S, _):
        y = fused_pfb_dft(W2, S, X, n1, n2, bt, interpret=False)
        sel = cplx.C(jnp.take(y.re, sel_arr, axis=0),
                     jnp.take(y.im, sel_arr, axis=0))  # (nr*ntones, bt)
        return X[-(avg - 1):], sel

    run_scan("fused presum+DFT (sum-out)", body_sum)
    run_scan("fused presum+DFT+select (stacked ch-major out)", body_full)


if __name__ == "__main__":
    main()
