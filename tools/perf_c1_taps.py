"""Is the config-1 transposed replay kernel fetch-bound or MXU-bound?

Bytes are identical for pf_average=2 and pf_average=4 (same pre-tiled
recording, same output), but the tap loop halves: 18 vs 36 skinny
(CpP, M) x (M, R+128) split dots per tile.  If the rate ~doubles at
f=2, the kernel is MXU-invocation-bound and stacking the taps into one
(f*CpP, M) LHS per component-pass is the lever; if it barely moves,
the ~205 GB/s fetch is the wall.

Run: nohup python tools/perf_c1_taps.py > logs/c1_taps.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.ops.cplx import C
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_replay import ReplayDDCT
    from gpu_sdr_tpu.ops.tonegen import tone_comb_wavetable_block
    from gpu_sdr_tpu.ops import cplx

    rate, L, K = 100_000_000, 4_000_000, 64
    rec = cplx.to_np(tone_comb_wavetable_block(
        (10_000_000,), (1.0,), rate, L))

    def hard_sync(arr):
        return float(np.asarray(jax.device_get(arr.re.reshape(-1)[0])))

    for pf in (4, 2, 4):          # A/B/A
        cfg = DirectDDCConfig(rate=rate, decim=100, pf_average=pf,
                              freqs=(10_000_000,), phases=(0,))
        rk = ReplayDDCT(cfg, rec, L, blocks_per_exec=K)
        assert rk.ok

        @jax.jit
        def raw(st, Xre, Xim):
            st, y = rk.multi_step(st, X=C(Xre, Xim))
            return st, y

        X = rk._X
        st = rk.init_state()
        st, y = raw(st, X.re, X.im)
        hard_sync(y)
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(16):
                st, y = raw(st, X.re, X.im)
            hard_sync(y)
            dt = time.perf_counter() - t0
            best = max(best, 16 * K * L / dt / 1e6)
        print(json.dumps({"pf_average": pf, "f_taps": cfg.f,
                          "msps": round(best, 1)}), flush=True)


if __name__ == "__main__":
    main()
