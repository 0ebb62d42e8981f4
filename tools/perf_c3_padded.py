"""A/B/A the lane-padded config-3 API chain vs unpadded (VERDICT r4 #1).

The c3 ladder (tools/perf_c3_ladder.py) pinned config 3's binding
resource: the C'=100 output tile is a lane-MASKED HBM write (212 GB/s
useful vs 429 dense).  config.pad_lanes pads the tone lists to 128 with
zero-amplitude dummies and slices host-side; this probes the full API
chain (FusedLoopback via time_chain) both ways in one process, plus a
numeric check that the padded chain's first 100 lanes match.

Run: nohup python tools/perf_c3_padded.py > logs/c3_padded.log 2>&1 &
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType
    from tools.bench_configs import time_chain

    rate = 100_000_000
    freqs100 = [int(f) for f in np.linspace(-45e6, 45e6, 100)]
    tx3 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=freqs100, ampl=[0.01] * 100,
                        wave_type=[WaveType.TONES] * 100)
    rx3 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=100, pf_average=4, freq=freqs100,
                        wave_type=[WaveType.DIRECT] * 100)

    # numeric check: one padded vs one unpadded execution, first block
    import jax
    from gpu_sdr_tpu.engine.fused import FusedLoopback
    from gpu_sdr_tpu.ops import cplx
    os.environ["GPU_SDR_TPU_PAD_LANES"] = "0"
    fl0 = FusedLoopback(tx3, rx3, blocks_per_exec=2)
    os.environ["GPU_SDR_TPU_PAD_LANES"] = "1"
    fl1 = FusedLoopback(tx3, rx3, blocks_per_exec=2)
    assert fl1._chain.out_channels == 128, fl1._chain.out_channels
    g0, d0 = fl0._init_states()
    g1, d1 = fl1._init_states()
    _, _, y0 = fl0._multi(g0, d0)
    _, _, y1 = fl1._multi(g1, d1)
    a = np.asarray(jax.device_get(y0.re))[0, :200, :]
    b = np.asarray(jax.device_get(y1.re))[0, :200, :100]
    snr = 10 * np.log10(np.sum(a * a) / max(np.sum((a - b) ** 2), 1e-30))
    print(json.dumps({"padded_vs_unpadded_snr_db": round(float(snr), 1)}),
          flush=True)

    for tag, flag in (("unpadded", "0"), ("padded", "1"),
                      ("unpadded", "0"), ("padded", "1")):
        os.environ["GPU_SDR_TPU_PAD_LANES"] = flag
        msps, B, compile_s = time_chain(tx3, rx3, K=64)
        print(json.dumps({"form": tag, "msps": round(msps, 1),
                          "vs_baseline": round(msps / 100.0, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
