"""Settle the config-1 raw-vs-API discrepancy: the per-config ladder
and the regression gate measured the API chain at 18.8-19.8 Gsps while
the bisect (tools/perf_c1c3_probe.py) measured the identical jit form
at 23.8 — A/B/A the actual time_chain path against the bisect's
donate-form in ONE process.

Run: nohup python tools/perf_c1_settle.py > logs/c1_settle.log 2>&1 &
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
    from tools.bench_configs import time_chain

    out = lambda **kw: print(json.dumps(kw), flush=True)
    rate = 100_000_000
    tx1 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=[10_000_000], ampl=[1.0],
                        wave_type=[WaveType.TONES])
    rx1 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=100, pf_average=4, freq=[10_000_000],
                        wave_type=[WaveType.DIRECT])

    def donate_form():
        fl = FusedLoopback(tx1, rx1, blocks_per_exec=64)
        K, L = 64, 4_000_000

        def hard_sync(arr):
            return float(np.asarray(jax.device_get(
                arr.re.reshape(-1)[0])))

        g, d = fl._init_states()
        g, d, ys = fl._multi(g, d)
        hard_sync(ys)
        per_round = 16
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(per_round):
                g, d, ys = fl._multi(g, d)
            hard_sync(ys)
            dt = time.perf_counter() - t0
            best = max(best, per_round * K * L / dt / 1e6)
        return best

    out(form="time_chain_1", msps=round(time_chain(tx1, rx1, K=64)[0], 1))
    out(form="fl_multi_direct", msps=round(donate_form(), 1))
    out(form="time_chain_2", msps=round(time_chain(tx1, rx1, K=64)[0], 1))


if __name__ == "__main__":
    main()
