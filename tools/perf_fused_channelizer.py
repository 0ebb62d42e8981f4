"""Compare the round-1 channelizer chain (Pallas pre-sum + XLA two-stage
DFT + select) against the fully fused channelizer kernel
(ops/pallas_channelizer.py) at the headline config, with honest
fetch-synced timing (see tools/rig_probe.py / CLAUDE.md).

Run:  nohup python tools/perf_fused_channelizer.py > log 2>&1 &
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
    from gpu_sdr_tpu.ops.pallas_pfb import pfb_frames_fused
    from gpu_sdr_tpu.ops.pallas_channelizer import channelizer_frames
    from gpu_sdr_tpu.ops.pfb import (PFBConfig, pfb_spare_init,
                                     select_tones, tone_bins)
    from gpu_sdr_tpu.ops.tonegen import comb_period, tone_comb_wavetable_block

    rate = 100_000_000
    nfft, avg, n_tones = 1000, 4, 1000
    block_len, K = 4_000_000, 32
    freqs = tuple(int(k * (rate // nfft))
                  for k in range(-nfft // 2, nfft // 2))
    bins = tuple(int(b) for b in tone_bins(freqs, rate, nfft))
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate, bins=bins)
    window = cfg.window()
    dft = cfg.dft(two_stage=True)
    bins_arr = jnp.asarray(dft.scramble_index(bins))
    period = comb_period(freqs, rate)
    assert block_len % period == 0
    xconst = tone_comb_wavetable_block(freqs, (1.0 / n_tones,) * n_tones,
                                       rate, block_len)

    def hard_sync(arr):
        return float(np.asarray(jax.device_get(arr.re[0, 0, 0])))

    def timeit(multi, spare):
        spare1, ys = multi(spare)
        jax.block_until_ready(ys)
        hard_sync(ys)
        best = 0.0
        for _ in range(4):
            s = spare
            t0 = time.perf_counter()
            for _ in range(4):
                s, ys = multi(s)
            jax.block_until_ready(ys)
            hard_sync(ys)
            dt = time.perf_counter() - t0
            best = max(best, 4 * K * block_len / dt / 1e6)
        return best, ys

    class _Scrambled:
        __call__ = staticmethod(dft.scrambled)

    def body_old(spare, _):
        spare, frames = pfb_frames_fused(cfg, window, _Scrambled(), spare,
                                         xconst)
        return spare, select_tones(frames, bins_arr)

    def body_new(spare, _):
        spare, frames = channelizer_frames(cfg, window, dft, spare, xconst)
        return spare, select_tones(frames, bins_arr)

    results = {}
    outs = {}
    for name, body in (("old", body_old), ("new", body_new)):
        @jax.jit
        def multi(spare, body=body):
            return jax.lax.scan(body, spare, None, length=K)
        msps, ys = timeit(multi, pfb_spare_init(cfg))
        results[name] = round(msps, 1)
        outs[name] = np.asarray(jax.device_get(ys.re[0, :4, :8]))
        print(json.dumps({name: results[name]}), flush=True)

    diff = np.abs(outs["old"] - outs["new"]).max()
    scale = np.abs(outs["old"]).max()
    print(json.dumps({"results_Msps": results,
                      "speedup": round(results["new"] / results["old"], 3),
                      "max_diff": float(diff),
                      "scale": float(scale)}), flush=True)


def main_t():
    """Also compare the transposed-layout kernel (channelizer_frames_t)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.pallas_channelizer import (
        channelizer_frames_t, select_tones_t, transpose_block)
    from gpu_sdr_tpu.ops.pfb import (PFBConfig, pfb_spare_init,
                                     tone_bins)
    from gpu_sdr_tpu.ops.tonegen import tone_comb_wavetable_block

    rate = 100_000_000
    nfft, avg, n_tones = 1000, 4, 1000
    block_len, K = 4_000_000, 32
    freqs = tuple(int(k * (rate // nfft))
                  for k in range(-nfft // 2, nfft // 2))
    bins = np.asarray(tone_bins(freqs, rate, nfft))
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate,
                    bins=tuple(int(b) for b in bins))
    window = cfg.window()
    dft = cfg.dft(two_stage=True)
    n1, n2 = dft.split
    xconst = tone_comb_wavetable_block(freqs, (1.0 / n_tones,) * n_tones,
                                       rate, block_len)
    xt = transpose_block(xconst, nfft, n1, n2)
    spare_t0 = transpose_block(pfb_spare_init(cfg), nfft, n1, n2)

    def body(spare_t, _):
        spare_t, fr_t = channelizer_frames_t(cfg, window, dft, spare_t, xt)
        return spare_t, select_tones_t(fr_t, bins, n1, n2)

    @jax.jit
    def multi(spare_t):
        return jax.lax.scan(body, spare_t, None, length=K)

    def hard_sync(arr):
        return float(np.asarray(jax.device_get(arr.re[0, 0, 0])))

    import time
    s, ys = multi(spare_t0)
    jax.block_until_ready(ys)
    hard_sync(ys)
    best = 0.0
    for _ in range(4):
        s = spare_t0
        t0 = time.perf_counter()
        for _ in range(4):
            s, ys = multi(s)
        jax.block_until_ready(ys)
        hard_sync(ys)
        best = max(best, 4 * K * block_len / (time.perf_counter() - t0) / 1e6)
    print(json.dumps({"new_t": round(best, 1)}), flush=True)


if __name__ == "__main__":
    main()
    main_t()
