"""Config-2 exec-granularity re-sweep: K=32 was chosen when the chain
ran ~15 Gsps; at 52 Gsps each execution is 2.6x shorter, so dispatch
overhead may bind again.  Sweep blocks_per_exec through the API chain
form, BUR-free, one process.

Run: nohup python tools/perf_c2_k_sweep.py > logs/c2_k_sweep.log 2>&1 &
"""
import json, sys, time
import numpy as np
sys.path.insert(0, ".")


def main():
    import jax, bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType
    from tools.bench_configs import time_chain

    rate = 100_000_000
    kw = dict(rate=rate, buffer_len=4_000_000, freq=[-40_000_000],
              chirp_f=[40_000_000], chirp_t=[1.0], swipe_s=[5000])
    tx = AntennaParams(mode=AntMode.TX, ampl=[1.0],
                       wave_type=[WaveType.CHIRP], **kw)
    rx = AntennaParams(mode=AntMode.RX, decim=1,
                       wave_type=[WaveType.CHIRP], **kw)
    for K in (32, 64, 128, 32):        # A/B/C/A
        msps, _, _ = time_chain(tx, rx, K=K)
        print(json.dumps({"K": K, "msps": round(msps, 1)}), flush=True)


if __name__ == "__main__":
    main()
