"""Back-to-back config-3 chain variants on the real chip.

Variants (same geometry: 100 tones, decim 100, pf_average 4, 4M blocks):
  gfused  — TonesDirectChain (G-fused kernel, f Karatsuba dots + halo)
  foldxla — TonesDirectFoldChain (shift-fold, pure XLA scan)
  foldkrn — TonesDirectFoldKernel (shift-fold in one HBM pass)

Timing follows CLAUDE.md: warm fetch, steady-state rounds, hard device
fetch at every round end.  Run: nohup python tools/perf_fold_kernel.py &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.fold_chain import TonesDirectFoldChain
    from gpu_sdr_tpu.ops.pallas_chain import (TonesDirectChain,
                                              TonesDirectFoldKernel)

    rate, M, f, L, K = 100_000_000, 100, 4, 4_000_000, 64
    freqs = tuple(int(x) for x in np.linspace(-45e6, 45e6, 100))
    ampls = (0.01,) * 100
    dcfg = DirectDDCConfig(rate=rate, decim=M, pf_average=f,
                           freqs=freqs, phases=(0,) * 100)

    def hard_sync(arr):
        return float(np.asarray(jax.device_get(arr.re.reshape(-1)[0])))

    def bench(name, chain):
        if not chain.ok:
            print(json.dumps({"variant": name, "ok": False}), flush=True)
            return
        multi = jax.jit(lambda st: chain.multi_step(st, K))
        st = chain.init_state()
        t0 = time.perf_counter()
        st, y = multi(st)
        jax.block_until_ready(y)
        hard_sync(y)
        compile_s = time.perf_counter() - t0
        target = 16_384_000_000
        n_exec = max(1, target // (K * L))
        per_round = max(1, n_exec // 4)
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(per_round):
                st, y = multi(st)
            jax.block_until_ready(y)
            hard_sync(y)
            dt = time.perf_counter() - t0
            best = max(best, per_round * K * L / dt / 1e6)
        print(json.dumps({"variant": name, "msps": round(best, 1),
                          "vs_baseline": round(best / 100.0, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)

    bench("gfused", TonesDirectChain(rate=rate, tx_freqs=freqs,
                                     tx_ampls=ampls, cfg=dcfg,
                                     block_len=L))
    bench("foldxla", TonesDirectFoldChain(rate=rate, tx_freqs=freqs,
                                          tx_ampls=ampls, cfg=dcfg,
                                          block_len=L))
    for rows in (None, 1600, 2000):
        name = f"foldkrn_r{rows}" if rows else "foldkrn"
        bench(name, TonesDirectFoldKernel(rate=rate, tx_freqs=freqs,
                                          tx_ampls=ampls, cfg=dcfg,
                                          block_len=L, rows=rows))


if __name__ == "__main__":
    main()
