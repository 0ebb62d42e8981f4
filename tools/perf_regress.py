"""Same-run perf regression gate (VERDICT r3 #8).

Runs the headline chain (bench.py's fused channelizer) AND BASELINE
configs 1-4 back-to-back in ONE process and compares each against its
recorded band.  Per-config numbers previously mixed measurement dates,
so a silent single-config regression would pass every test; this gate
is the missing mechanism, and is the perf step of the verify recipe
(.claude/skills/verify/SKILL.md).

Bands: the latest recorded same-run sweep (docs/05_performance.md
per-config table) with the rig's documented drift allowance.  The
rig's LARGE-program throughput drifts up to ~25% across hours
(multi-tenant/thermal; CLAUDE.md), so the pass threshold is
0.65 x recorded — tight enough to catch any real (>=1.5x) regression,
loose enough that drift alone cannot fail the gate.

One JSON line per config: {"config", "msps", "band_min", "recorded",
"pass"}; exits 1 if any config falls below its band.

Run:  nohup python tools/perf_regress.py > logs/perf_regress.log 2>&1 &
"""

import json
import sys

sys.path.insert(0, ".")

# recorded same-run sweep values (Msps) and the drift-allowance floor
DRIFT_FLOOR = 0.65
# 2026-08-21 definitive same-run sweep (logs/perf_regress4.log):
# BUR-free timing + single-fetch lock-in + stacked-taps replay kernel
# + factored fold kernel
BANDS = {
    "headline_1000ch_channelizer": 26_305,
    "1_single_tone_ddc_fir": 26_346,
    "2_vna_chirp_lockin": 52_932,
    "3_100tone_readout": 18_489,
    "4_full_spectrum": 20_513,
}


def main():
    import numpy as np
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType
    from tools.bench_configs import time_chain

    failures = []

    def gate(name, msps):
        rec = BANDS[name]
        band_min = rec * DRIFT_FLOOR
        ok = msps >= band_min
        if not ok:
            failures.append(name)
        print(json.dumps({"config": name, "msps": round(msps, 1),
                          "band_min": round(band_min, 1),
                          "recorded": rec, "pass": ok}), flush=True)

    # headline first.  Round lengths must match the recorded
    # measurements: short rounds understate steady-state rates by up to
    # 2x via the ~50 ms per-round relay drain (docs/05 "4-exec rounds"
    # row) — a 4_096M-sample variant of this gate reproduced exactly
    # that artifact and flagged every config as regressed.
    gate("headline_1000ch_channelizer",
         bench.bench_loopback_1000(n_blocks=16384))

    rate = 100_000_000
    tx1 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=[10_000_000], ampl=[1.0],
                        wave_type=[WaveType.TONES])
    rx1 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=100, pf_average=4, freq=[10_000_000],
                        wave_type=[WaveType.DIRECT])
    gate("1_single_tone_ddc_fir",
         time_chain(tx1, rx1, K=64, target_samples=16_384_000_000)[0])

    tx2 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=[-40_000_000], chirp_f=[40_000_000],
                        chirp_t=[1.0], swipe_s=[5000], ampl=[1.0],
                        wave_type=[WaveType.CHIRP])
    rx2 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=1, freq=[-40_000_000],
                        chirp_f=[40_000_000], chirp_t=[1.0],
                        swipe_s=[5000], wave_type=[WaveType.CHIRP])
    gate("2_vna_chirp_lockin",
         time_chain(tx2, rx2, K=32, target_samples=16_384_000_000)[0])

    freqs100 = [int(f) for f in np.linspace(-45e6, 45e6, 100)]
    tx3 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=freqs100, ampl=[0.01] * 100,
                        wave_type=[WaveType.TONES] * 100)
    rx3 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=100, pf_average=4, freq=freqs100,
                        wave_type=[WaveType.DIRECT] * 100)
    gate("3_100tone_readout",
         time_chain(tx3, rx3, K=64, target_samples=16_384_000_000)[0])

    bins1000 = [int(k * (rate // 1000)) for k in range(-500, 500)]
    tx4 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=6_000_000,
                        freq=bins1000, ampl=[0.001] * 1000,
                        wave_type=[WaveType.TONES] * 1000)
    rx4 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=6_000_000,
                        fft_tones=1000, pf_average=4,
                        wave_type=[WaveType.NOISE])
    gate("4_full_spectrum",
         time_chain(tx4, rx4, K=64, target_samples=16_384_000_000)[0])

    if failures:
        print(json.dumps({"regressions": failures}), flush=True)
        sys.exit(1)
    print(json.dumps({"regressions": []}), flush=True)


if __name__ == "__main__":
    main()
