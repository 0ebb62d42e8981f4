"""Alignment probe for the transposed replay kernel: does a 128-aligned
column-tile width break the ~12 Gsps wall?  Uses a 2-block recording
(80000 output rows) so 128-multiples divide nbr.

Run:  nohup python tools/perf_replay_t_align.py > log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RATE, L, K = 100_000_000, 4_000_000, 64
TARGET = 8_000_000_000


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    import jax
    from gpu_sdr_tpu import golden
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_replay import ReplayDDCT

    def hard_sync(y):
        return float(np.asarray(jax.device_get(y.re.reshape(-1)[0])))

    freqs = (10_000_000,)
    rec2 = golden.tone_block([10_000_000], [0.5], RATE, 0,
                             2 * L).astype(np.complex64)
    cfg = DirectDDCConfig(rate=RATE, decim=100, pf_average=4,
                          freqs=freqs, phases=(0,))
    # nbr per block = 40000; with a 2-block recording R need only divide
    # nbr (engine contract) -- probe both aligned (via rows=) and not
    for R in (1600, 2000, 640, 3200):
        try:
            if 40_000 % R:
                # 128-aligned widths don't divide nbr=40000: treat the
                # 2-block recording as one 8M block (pure probe)
                rk = ReplayDDCT(cfg, rec2, block_len=2 * L,
                                blocks_per_exec=K // 2, rows=R)
            else:
                rk = ReplayDDCT(cfg, rec2, block_len=L,
                                blocks_per_exec=K, rows=R)
            assert rk.ok, R
            X = cplx.C(jax.device_put(rk._X.re), jax.device_put(rk._X.im))
            multi = jax.jit(lambda st, X: rk.multi_step(st, X=X))
            st = rk.init_state()
            t0 = time.perf_counter()
            st, y = multi(st, X)
            jax.block_until_ready(y)
            hard_sync(y)
            cs = time.perf_counter() - t0
            spe = rk.K * rk.L
            n_exec = max(1, TARGET // spe)
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n_exec):
                    st, y = multi(st, X)
                jax.block_until_ready(y)
                hard_sync(y)
                dt = time.perf_counter() - t0
                best = max(best, n_exec * spe / dt / 1e6)
            print(json.dumps({"R": R, "aligned": R % 128 == 0,
                              "Msps": round(best, 1),
                              "compile_s": round(cs, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"R": R,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
