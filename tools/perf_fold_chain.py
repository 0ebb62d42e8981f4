"""Back-to-back config-3 chain comparison on the real chip:

  A. round-2 G-fused Pallas kernel (ops/pallas_chain.TonesDirectChain)
  B. shift-fold XLA chain (ops/fold_chain.TonesDirectFoldChain)

Same process, same geometry (100 non-periodic tones, decim 100, 4M
blocks, K blocks/exec), fetch-synced steady-state rounds (see
docs/05_performance.md on honest timing).

Run:  nohup python tools/perf_fold_chain.py > /tmp/perf_fold.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def time_chain(chain, K, B, target_samples=16_384_000_000, rounds=4):
    import jax

    def hard_sync(arr):
        return float(np.asarray(jax.device_get(arr.re.reshape(-1)[0])))

    multi = jax.jit(lambda st: chain.multi_step(st, K),
                    donate_argnums=(0,))
    st = chain.init_state()
    t0 = time.perf_counter()
    st, y = multi(st)
    jax.block_until_ready(y)
    hard_sync(y)
    compile_s = time.perf_counter() - t0
    n_exec = max(1, target_samples // (K * B))
    per_round = max(1, n_exec // rounds)
    best = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(per_round):
            st, y = multi(st)
        jax.block_until_ready(y)
        hard_sync(y)
        dt = time.perf_counter() - t0
        best = max(best, per_round * K * B / dt / 1e6)
    return best, compile_s


def main():
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.fold_chain import TonesDirectFoldChain
    from gpu_sdr_tpu.ops.pallas_chain import TonesDirectChain

    rate = 100_000_000
    L = 4_000_000
    K = 64
    freqs = tuple(int(f) for f in np.linspace(-45e6, 45e6, 100))
    ampls = (0.01,) * 100
    cfg = DirectDDCConfig(rate=rate, decim=100, pf_average=4,
                          freqs=freqs, phases=(0,) * 100)

    fold = TonesDirectFoldChain(rate=rate, tx_freqs=freqs, tx_ampls=ampls,
                                cfg=cfg, block_len=L)
    assert fold.ok
    msps, comp = time_chain(fold, K, L)
    print(json.dumps({"chain": "fold", "value": round(msps, 1),
                      "vs_baseline": round(msps / 100, 1),
                      "compile_s": round(comp, 1)}), flush=True)

    gf = TonesDirectChain(rate=rate, tx_freqs=freqs, tx_ampls=ampls,
                          cfg=cfg, block_len=L)
    assert gf.ok
    msps, comp = time_chain(gf, K, L)
    print(json.dumps({"chain": "g_fused", "value": round(msps, 1),
                      "vs_baseline": round(msps / 100, 1),
                      "compile_s": round(comp, 1)}), flush=True)

    # fold again (drift check: first/last in one process bracket the rig)
    msps, comp = time_chain(fold, K, L)
    print(json.dumps({"chain": "fold_again", "value": round(msps, 1),
                      "vs_baseline": round(msps / 100, 1),
                      "compile_s": round(comp, 1)}), flush=True)


if __name__ == "__main__":
    main()
