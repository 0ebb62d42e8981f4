"""Isolate the ~20% config-1 time_chain vs direct-loop gap: the only
code difference is time_chain's extra `jax.block_until_ready(ys)` per
timing round.  A/B/A the same fl._multi loop with and without it.

Run: nohup python tools/perf_bur_cost.py > logs/bur_cost.log 2>&1 &
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
    from gpu_sdr_tpu.engine.fused import FusedLoopback
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    rate = 100_000_000
    tx1 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=[10_000_000], ampl=[1.0],
                        wave_type=[WaveType.TONES])
    rx1 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=100, pf_average=4, freq=[10_000_000],
                        wave_type=[WaveType.DIRECT])
    fl = FusedLoopback(tx1, rx1, blocks_per_exec=64)
    K, L = 64, 4_000_000

    def hard_sync(arr):
        return float(np.asarray(jax.device_get(arr.re.reshape(-1)[0])))

    g, d = fl._init_states()
    g, d, ys = fl._multi(g, d)
    jax.block_until_ready(ys)
    hard_sync(ys)

    def run(with_bur):
        nonlocal g, d, ys
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(16):
                g, d, ys = fl._multi(g, d)
            if with_bur:
                jax.block_until_ready(ys)
            hard_sync(ys)
            dt = time.perf_counter() - t0
            best = max(best, 16 * K * L / dt / 1e6)
        return best

    for name, bur in (("no_bur_1", False), ("with_bur", True),
                      ("no_bur_2", False), ("with_bur_2", True)):
        print(json.dumps({"form": name, "msps": round(run(bur), 1)}),
              flush=True)


if __name__ == "__main__":
    main()
