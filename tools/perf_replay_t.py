"""Transposed few-channel replay kernel (ops/pallas_replay.ReplayDDCT)
vs the row-major ReplayDDC at the config-1 shape (single tone, decim
100, 4M blocks) — honest fetch-synced steady-state timing, back-to-back
in one process.

Run:  nohup python tools/perf_replay_t.py > log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RATE, L, K = 100_000_000, 4_000_000, 64
TARGET = 8_000_000_000


def time_rk(rk):
    import jax
    from gpu_sdr_tpu.ops import cplx

    def hard_sync(y):
        return float(np.asarray(jax.device_get(y.re.reshape(-1)[0])))

    X = cplx.C(jax.device_put(rk._X.re), jax.device_put(rk._X.im))
    multi = jax.jit(lambda st, X: rk.multi_step(st, X=X))
    st = rk.init_state()
    t0 = time.perf_counter()
    st, y = multi(st, X)
    jax.block_until_ready(y)
    hard_sync(y)
    cs = time.perf_counter() - t0
    n_exec = max(1, TARGET // (K * L))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_exec):
            st, y = multi(st, X)
        jax.block_until_ready(y)
        hard_sync(y)
        dt = time.perf_counter() - t0
        best = max(best, n_exec * K * L / dt / 1e6)
    return best, cs


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu import golden
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_replay import ReplayDDC, ReplayDDCT

    for n_tones in (1, 2, 8, 16):
        freqs = tuple(int(f) for f in np.linspace(-45e6, 45e6, n_tones))
        rec = golden.tone_block(list(freqs), [0.5 / n_tones] * n_tones,
                                RATE, 0, L).astype(np.complex64)
        cfg = DirectDDCConfig(rate=RATE, decim=100, pf_average=4,
                              freqs=freqs, phases=(0,) * n_tones)
        for name, cls in (("T", ReplayDDCT), ("rowmajor", ReplayDDC)):
            try:
                rk = cls(cfg, rec, L, blocks_per_exec=K)
                assert rk.ok
                msps, cs = time_rk(rk)
                print(json.dumps({"C": n_tones, "kernel": name,
                                  "R": rk.R, "Msps": round(msps, 1),
                                  "compile_s": round(cs, 1)}), flush=True)
            except Exception as e:
                print(json.dumps({"C": n_tones, "kernel": name,
                                  "error": f"{type(e).__name__}: {e}"[:200]}),
                      flush=True)


if __name__ == "__main__":
    main()
