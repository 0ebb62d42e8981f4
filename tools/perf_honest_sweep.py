"""Honest (fetch-synced) re-sweep of the headline chain: geometry
(block_len x blocks_per_exec), DFT split, and chain variant (unfused XLA
chain / Pallas presum chain / transposed fused kernel), all back-to-back
in one process.  The round-1 choices (32x4M, (8,125), Pallas presum) were
made under the block_until_ready inflation (see CLAUDE.md).

Run:  nohup python tools/perf_honest_sweep.py > log 2>&1 &
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
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.cplx import DFT
    from gpu_sdr_tpu.ops.pallas_pfb import pfb_frames_fused
    from gpu_sdr_tpu.ops.pallas_channelizer import (
        can_fuse_channelizer, channelizer_frames_t, select_tones_t,
        transpose_block)
    from gpu_sdr_tpu.ops.pfb import (PFBConfig, pfb_frames, pfb_spare_init,
                                     select_tones, tone_bins)
    from gpu_sdr_tpu.ops.tonegen import tone_comb_wavetable_block

    rate = 100_000_000
    nfft, avg, n_tones = 1000, 4, 1000
    freqs = tuple(int(k * (rate // nfft))
                  for k in range(-nfft // 2, nfft // 2))
    bins_np = np.asarray(tone_bins(freqs, rate, nfft))
    bins = tuple(int(b) for b in bins_np)

    def hard_sync(arr):
        return float(np.asarray(jax.device_get(arr.re.reshape(-1)[0])))

    def timeit(multi, s0, K, L, rounds=4, execs=4):
        s, ys = multi(s0)
        jax.block_until_ready(ys)
        hard_sync(ys)
        best = 0.0
        for _ in range(rounds):
            s = s0
            t0 = time.perf_counter()
            for _ in range(execs):
                s, ys = multi(s)
            jax.block_until_ready(ys)
            hard_sync(ys)
            best = max(best, execs * K * L / (time.perf_counter() - t0) / 1e6)
        return best

    def build_plain(L, K, split, pallas_presum):
        cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate, bins=bins)
        window = cfg.window()
        dft = DFT(nfft, two_stage=True)
        if split is not None:
            dft.split = None
            dft.__init__(nfft, two_stage=True)
            # rebuild with a chosen split
            import gpu_sdr_tpu.ops.cplx as cplx_mod
            dftn = DFT.__new__(DFT)
            dftn.n = nfft
            dftn.inverse = False
            n1, n2 = split
            sign = -1.0
            dftn.split = (n1, n2)
            dftn.F1 = cplx_mod.const(
                cplx_mod._dft_factors(n1, sign).astype(np.complex64))
            dftn.F2 = cplx_mod.const(
                cplx_mod._dft_factors(n2, sign).astype(np.complex64))
            b = np.arange(n2, dtype=np.float64)
            k1 = np.arange(n1, dtype=np.float64)
            tw = np.exp(sign * 2j * np.pi * np.outer(b, k1) / nfft)
            dftn.TW = cplx_mod.const(tw.astype(np.complex64))
            dft = dftn
        bins_arr = jnp.asarray(dft.scramble_index(bins))
        xconst = tone_comb_wavetable_block(
            freqs, (1.0 / n_tones,) * n_tones, rate, L)

        class _S:
            __call__ = staticmethod(dft.scrambled)

        frames_fn = pfb_frames_fused if pallas_presum else pfb_frames

        def body(spare, _):
            spare, fr = frames_fn(cfg, window, _S(), spare, xconst)
            return spare, select_tones(fr, bins_arr)

        @jax.jit
        def multi(spare):
            return jax.lax.scan(body, spare, None, length=K)

        return multi, pfb_spare_init(cfg)

    def build_fused_t(L, K):
        cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate, bins=bins)
        window = cfg.window()
        dft = DFT(nfft, two_stage=True)
        n1, n2 = dft.split
        if not can_fuse_channelizer(cfg, dft, L):
            return None, None
        xt = transpose_block(
            tone_comb_wavetable_block(freqs, (1.0 / n_tones,) * n_tones,
                                      rate, L), nfft, n1, n2)
        s0 = transpose_block(pfb_spare_init(cfg), nfft, n1, n2)

        def body(spare_t, _):
            spare_t, fr_t = channelizer_frames_t(cfg, window, dft,
                                                 spare_t, xt)
            return spare_t, select_tones_t(fr_t, bins_np, n1, n2)

        @jax.jit
        def multi(spare_t):
            return jax.lax.scan(body, spare_t, None, length=K)

        return multi, s0

    geoms = [(4_000_000, 32), (4_000_000, 64), (4_000_000, 16),
             (8_000_000, 16), (2_000_000, 64), (8_000_000, 32)]
    for L, K in geoms:
        multi, s0 = build_plain(L, K, None, True)
        print(json.dumps({"variant": "pallas_presum", "L": L, "K": K,
                          "Msps": round(timeit(multi, s0, K, L), 1)}),
              flush=True)
    for L, K in geoms:
        multi, s0 = build_fused_t(L, K)
        if multi is None:
            continue
        print(json.dumps({"variant": "fused_t", "L": L, "K": K,
                          "Msps": round(timeit(multi, s0, K, L), 1)}),
              flush=True)
    # split sweep at the winning-ish geometry, XLA chain
    for split in ((8, 125), (25, 40), (20, 50), (10, 100)):
        multi, s0 = build_plain(4_000_000, 32, split, True)
        print(json.dumps({"variant": f"split{split}", "L": 4_000_000,
                          "K": 32,
                          "Msps": round(timeit(multi, s0, 32, 4_000_000),
                                        1)}), flush=True)


if __name__ == "__main__":
    main()
