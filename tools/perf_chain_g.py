"""Honest-timing tile-height sweep for the G-fused TONES->DIRECT chain
(config-3 shape: 100 tones, decim 100, pf_average 4, 4M blocks).

Fetch-synced (hard_sync), steady-state rounds (>= 8 Gsamples per round)
per the CLAUDE.md timing rules.

Run:  nohup python tools/perf_chain_g.py > log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RATE, L, K, CT = 100_000_000, 4_000_000, 64, 100
TARGET = 8_000_000_000  # samples per timing round


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    import jax
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_chain import TonesDirectChain

    def hard_sync(y):
        return float(np.asarray(jax.device_get(y.re.reshape(-1)[0])))

    freqs = tuple(int(f) for f in np.linspace(-45e6, 45e6, CT))
    dcfg = DirectDDCConfig(rate=RATE, decim=100, pf_average=4,
                           freqs=freqs, phases=(0,) * CT)
    for R in (None, 400, 800, 1600, 2500):
        try:
            chain = TonesDirectChain(rate=RATE, tx_freqs=freqs,
                                     tx_ampls=(0.01,) * CT, cfg=dcfg,
                                     block_len=L, rows=R)
            assert chain.ok, R
            multi = jax.jit(lambda st: chain.multi_step(st, K))
            st = chain.init_state()
            t0 = time.perf_counter()
            st, y = multi(st)
            jax.block_until_ready(y)
            hard_sync(y)
            cs = time.perf_counter() - t0
            n_exec = max(1, TARGET // (K * L))
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n_exec):
                    st, y = multi(st)
                jax.block_until_ready(y)
                hard_sync(y)
                dt = time.perf_counter() - t0
                best = max(best, n_exec * K * L / dt / 1e6)
            print(json.dumps({"R": R if R else f"auto({chain.R})",
                              "Msps": round(best, 1),
                              "compile_s": round(cs, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"R": R,
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)


if __name__ == "__main__":
    main()
