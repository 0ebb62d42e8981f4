"""Closed-loop science demo on real hardware: VNA over two simulated
resonators -> S21 analysis -> peak init -> nonlinear fit, with every DSP
stage (chirp synthesis, demod, lock-in) running on the TPU chip.

Mirrors tests/test_noise_fitting.py::test_full_fitting_workflow, which
validates the same loop on CPU; this is the hardware evidence.

Run:  nohup python tools/hw_closed_loop.py > log 2>&1 &
Prints one JSON line with the recovered resonator parameters.
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    import jax
    from gpu_sdr_tpu.client import delay as Udelay
    from gpu_sdr_tpu.client import files as Ufiles
    from gpu_sdr_tpu.client import fitting as Ufit
    from gpu_sdr_tpu.client import vna as Uvna
    from gpu_sdr_tpu.engine.channel import make_resonator_channel

    workdir = tempfile.mkdtemp(prefix="hw_closed_loop_")
    os.chdir(workdir)
    rate = int(1e6)
    resos = [dict(f0=-150_000.0, Qr=30.0, Qe_re=60.0),
             dict(f0=200_000.0, Qr=25.0, Qe_re=50.0)]
    chan = make_resonator_channel(rate, resos, fft_len=1 << 12)
    Udelay.set_line_delay(rate, 512e-6 * 1e9)
    try:
        fn = Uvna.Single_VNA(start_f=-400_000, last_f=400_000,
                             measure_t=0.4, n_points=1600, tx_gain=0,
                             Rate=rate, RF=10_000_000,
                             output_filename="vna_hw", channel=chan)
        Uvna.VNA_analysis(fn)
    finally:
        Udelay.LINE_DELAY.clear()
    ok = Ufit.initialize_peaks(fn, N_peaks=2, peak_width=50e3,
                               Qr_cutoff=5, Mag_depth_cutoff=0.5,
                               exclude_center=False)
    assert ok and len(Ufiles.get_init_peaks(fn)) == 2
    assert Ufit.vna_fit(fn, fit_range=60e3)
    params = Ufit.get_fit_param(fn)
    f0s = sorted(1e6 * p["f0"] for p in params)
    expect = sorted(10_000_000 + r["f0"] for r in resos)
    errs = [abs(g - e) for g, e in zip(f0s, expect)]
    print(json.dumps({
        "backend": jax.default_backend(),
        "recovered_f0_hz": [round(f, 1) for f in f0s],
        "expected_f0_hz": expect,
        "f0_err_hz": [round(e, 1) for e in errs],
        "Qr": [round(float(p["Qr"]), 2) for p in params],
        "ok": bool(all(e < 10_000 for e in errs)),
        "workdir": workdir,
    }))


if __name__ == "__main__":
    main()
