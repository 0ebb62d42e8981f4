"""Config-3 (100-tone readout) through the public params API, honest
steady-state timing — re-measures the docs/05_performance.md table row
after the G-fused chain kernel (ops/pallas_chain.py).

Run:  nohup python tools/perf_config3_api.py > log 2>&1 &
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main():
    import bench
    import bench_configs as bc
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    rate = 100_000_000
    freqs100 = [int(f) for f in np.linspace(-45e6, 45e6, 100)]
    tx3 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=freqs100, ampl=[0.01] * 100,
                        wave_type=[WaveType.TONES] * 100)
    rx3 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=100, pf_average=4, freq=freqs100,
                        wave_type=[WaveType.DIRECT] * 100)
    msps, B, compile_s = bc.time_chain(tx3, rx3, K=64)
    print(json.dumps({"config": "3_100tone_readout", "value": round(msps, 1),
                      "unit": "Msamples/s/chip",
                      "vs_baseline": round(msps / 100.0, 2),
                      "block_len": B, "compile_s": round(compile_s, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
