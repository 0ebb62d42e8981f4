"""Closed-loop science at reference scale ON THE CHIP (VERDICT r4 #2):
a 50-resonator simulated array driven end-to-end — wide VNA sweep (chirp
synthesis + lock-in on the TPU) -> S21 analysis -> extimate_peak_number
-> initialize_peaks -> vna_fit -> get_tones -> 50-tone DIRECT noise
readout at the fitted tones (DDC+FIR on the TPU).

CPU counterpart (asserted statistics): tests/test_resonator_array.py.

Run:  nohup python tools/hw_array_loop.py > logs/array_onchip.log 2>&1 &
Prints one JSON line with peak-count recovery and f0/Qr error stats.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_RESO = 50
RATE = int(4e6)
RF = 10_000_000


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    import jax
    from gpu_sdr_tpu.client import delay as Udelay
    from gpu_sdr_tpu.client import files as Ufiles
    from gpu_sdr_tpu.client import fitting as Ufit
    from gpu_sdr_tpu.client import noise as Unoise
    from gpu_sdr_tpu.client import vna as Uvna
    from gpu_sdr_tpu.engine.channel import make_resonator_channel
    from tests.test_resonator_array import make_array

    workdir = tempfile.mkdtemp(prefix="hw_array_loop_")
    os.chdir(workdir)
    t_start = time.perf_counter()
    resos = make_array()
    chan = make_resonator_channel(RATE, resos, fft_len=1 << 14)
    Udelay.set_line_delay(RATE, 512e-6 * 1e9)
    try:
        fn = Uvna.Single_VNA(start_f=-1_800_000, last_f=1_800_000,
                             measure_t=0.45, n_points=3600, tx_gain=0,
                             Rate=RATE, RF=RF,
                             output_filename="vna_array", channel=chan)
        Uvna.VNA_analysis(fn)
    finally:
        Udelay.LINE_DELAY.clear()

    n_est = Ufit.extimate_peak_number(fn, threshold=0.1, peak_width=30e3,
                                      exclude_center=False)
    ok_init = Ufit.initialize_peaks(fn, N_peaks=N_RESO, peak_width=30e3,
                                    Qr_cutoff=3, Mag_depth_cutoff=0.5,
                                    exclude_center=False)
    n_init = len(Ufiles.get_init_peaks(fn))
    ok_fit = Ufit.vna_fit(fn, fit_range=40e3)
    params = Ufit.get_fit_param(fn)

    got = np.sort([1e6 * p["f0"] for p in params])
    expect = np.sort([RF + r["f0"] for r in resos])[:len(got)]
    f0_err = np.abs(got - expect)
    fit_by_f0 = sorted(params, key=lambda p: p["f0"])
    truth_by_f0 = sorted(resos, key=lambda r: RF + r["f0"])
    qr_rel = []
    for p, r in zip(fit_by_f0, truth_by_f0):
        qr_true_abs = r["Qr"] * (RF + r["f0"]) / r["f0"]
        qr_rel.append(abs(p["Qr"] - qr_true_abs) / qr_true_abs)
    qr_rel = np.asarray(qr_rel)

    rf, rel_tones = Ufit.get_tones(fn)
    nf = Unoise.Get_noise(list(rel_tones), measure_t=0.2, rate=RATE,
                          decimation=500, RF=RF, mode="DIRECT",
                          output_filename="noise_array", channel=chan)
    Unoise.calculate_noise(nf, welch=2)
    ninfo, _freq, real, imag = Ufiles.get_noise(nf)
    data = Ufiles.openH5file(nf)
    steady = np.abs(data[:, 8:]).mean(axis=1)

    print(json.dumps({
        "backend": jax.default_backend(),
        "n_resonators": N_RESO,
        "peak_count_estimated": int(n_est),
        "peaks_initialized": int(n_init),
        "init_ok": bool(ok_init),
        "fit_ok": bool(ok_fit),
        "n_fitted": len(params),
        "f0_err_hz": {"median": round(float(np.median(f0_err)), 1),
                      "p90": round(float(np.percentile(f0_err, 90)), 1),
                      "max": round(float(np.max(f0_err)), 1)},
        "qr_rel_err": {"median": round(float(np.median(qr_rel)), 3),
                       "p90": round(float(np.percentile(qr_rel, 90)), 3)},
        "noise_channels": int(ninfo["n_chan"]),
        "psd_finite": bool(all(np.isfinite(r).all() for r in real) and
                           all(np.isfinite(i).all() for i in imag)),
        "channels_in_dip_fraction": round(float(np.mean(steady < 0.95)), 2),
        "wall_s": round(time.perf_counter() - t_start, 1),
        "workdir": workdir,
    }), flush=True)


if __name__ == "__main__":
    main()
