"""Config-1 (single-tone DDC + FIR decim-by-100) through the public
params API — re-measures the docs/05_performance.md table row after the
transposed few-channel replay kernel (ops/pallas_replay.ReplayDDCT).

Run:  nohup python tools/perf_config1_api.py > log 2>&1 &
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
    tx1 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=[10_000_000], ampl=[1.0],
                        wave_type=[WaveType.TONES])
    rx1 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=100, pf_average=4, freq=[10_000_000],
                        wave_type=[WaveType.DIRECT])
    msps, B, compile_s = bc.time_chain(tx1, rx1, K=64)
    print(json.dumps({"config": "1_single_tone_ddc_fir",
                      "value": round(msps, 1),
                      "unit": "Msamples/s/chip",
                      "vs_baseline": round(msps / 100.0, 2),
                      "block_len": B, "compile_s": round(compile_s, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
