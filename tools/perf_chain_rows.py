"""Tile-height sweep for the single-kernel TONES->DIRECT chain.

Run:  nohup python tools/perf_chain_rows.py > log 2>&1 &
"""

# NOTE: this tool predates the fetch-synced timing rule (CLAUDE.md): numbers it
# printed historically are unreliable (block_until_ready early-ack / short-round
# deflation). Use bench.py / tools/bench_configs.py / tools/perf_honest_sweep.py
# or add hard_sync + steady-state rounds before trusting new runs.

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RATE, L, K, CT = 100_000_000, 4_000_000, 16, 100


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    import jax
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_chain import TonesDirectChain

    freqs = tuple(int(f) for f in np.linspace(-45e6, 45e6, CT))
    dcfg = DirectDDCConfig(rate=RATE, decim=100, pf_average=4,
                           freqs=freqs, phases=(0,) * CT)
    for R in (320, 400, 800, 1600, 2000):
        try:
            chain = TonesDirectChain(rate=RATE, tx_freqs=freqs,
                                     tx_ampls=(0.01,) * CT, cfg=dcfg,
                                     block_len=L, rows=R)
            assert chain.ok
            multi = jax.jit(lambda st: chain.multi_step(st, K))
            st = chain.init_state()
            t0 = time.perf_counter()
            st, y = multi(st)
            jax.block_until_ready(y)
            cs = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(10):
                st, y = multi(st)
            jax.block_until_ready(y)
            dt = (time.perf_counter() - t0) / 10
            print(json.dumps({"R": R, "Msps": round(K * L / dt / 1e6, 1),
                              "compile_s": round(cs, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"R": R,
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)


if __name__ == "__main__":
    main()
