"""Plotting for measurements and analysis (mirrors pyUSRP/USRP_plotting.py
plus the plot functions of USRP_VNA/USRP_noise/USRP_fitting/USRP_full_spec).

matplotlib is the only backend (the reference also offered plotly; this
environment has none).  All functions save PNG files and return the output
filename(s).
"""

from __future__ import annotations

import os
import numpy as np

import matplotlib

matplotlib.use("agg")
import matplotlib.pyplot as pl  # noqa: E402

from . import files as Ufiles  # noqa: E402
from .fitting import get_fit_data, get_fit_param, vrms2dbm  # noqa: E402

COLORS = ["black", "red", "green", "blue", "orange", "violet", "brown",
          "purple"]


def get_color(N):
    """Cyclic color picker (reference get_color,
    pyUSRP/USRP_plotting.py:50-61)."""
    return COLORS[N % len(COLORS)]


def style_plotly_figure(fig):
    """Transparent-background plotly styling (reference
    style_plotly_figure, pyUSRP/USRP_plotting.py:63-71)."""
    fig["layout"].update(paper_bgcolor="rgba(0,0,0,0)")
    fig["layout"].update(plot_bgcolor="rgba(0,0,0,0)")


def _out_name(output_filename, default):
    return (output_filename or default) + ".png"


def plot_raw_data(filenames, decimation=None, displayed_samples=None,
                  low_pass=None, backend="matplotlib", output_filename=None,
                  channel_list=None, mode="IQ", start_time=None,
                  end_time=None, auto_open=False, **kwargs) -> str:
    """Plot raw demodulated timestreams in IQ or PM (phase/magnitude) mode
    (reference plot_raw_data, pyUSRP/USRP_plotting.py:73-335)."""
    if isinstance(filenames, str):
        filenames = [filenames]
    fig, axes = pl.subplots(nrows=2, ncols=1, sharex=True, figsize=(10, 7))
    for fn in filenames:
        info = Ufiles.get_rx_info(fn)
        rate = info.rate / max(int(info.decim), 1) if info.decim else info.rate
        data = Ufiles.openH5file(fn)
        chans = channel_list if channel_list is not None \
            else range(data.shape[0])
        s0 = int((start_time or 0) * rate)
        s1 = int(end_time * rate) if end_time else data.shape[1]
        for i, ch in enumerate(chans):
            y = data[ch, s0:s1]
            if decimation and decimation > 1:
                from scipy import signal as sg
                y = sg.decimate(y, int(decimation), ftype="fir")
            if displayed_samples:
                step = max(1, len(y) // displayed_samples)
                y = y[::step]
            t = np.arange(len(y)) / rate
            if mode == "IQ":
                axes[0].plot(t, y.real, color=get_color(i),
                             label=f"{os.path.basename(fn)} ch{ch} I")
                axes[1].plot(t, y.imag, color=get_color(i), ls="--")
                axes[0].set_ylabel("I [ADCu]")
                axes[1].set_ylabel("Q [ADCu]")
            else:
                axes[0].plot(t, np.abs(y), color=get_color(i),
                             label=f"ch{ch} mag")
                axes[1].plot(t, np.unwrap(np.angle(y)), color=get_color(i))
                axes[0].set_ylabel("Magnitude [ADCu]")
                axes[1].set_ylabel("Phase [rad]")
    axes[1].set_xlabel("Time [s]")
    axes[0].legend(fontsize=7)
    axes[0].grid(); axes[1].grid()
    out = _out_name(output_filename, "USRP_raw_data")
    fig.savefig(out, bbox_inches="tight")
    pl.close(fig)
    return out


def plot_VNA(filenames, backend="matplotlib", output_filename=None,
             unwrap_phase=True, auto_open=False, **kwargs) -> str:
    """Magnitude/phase S21 plot of analyzed VNA files
    (reference plot_VNA, pyUSRP/USRP_VNA.py:807-1100)."""
    if isinstance(filenames, str):
        filenames = [filenames]
    fig, (axm, axp) = pl.subplots(nrows=2, ncols=1, sharex=True,
                                  figsize=(10, 7))
    for i, fn in enumerate(filenames):
        freq, s21 = Ufiles.get_VNA_data(fn, calibrated=True)
        phase = np.angle(s21)
        if unwrap_phase:
            phase = np.unwrap(phase)
        axm.plot(freq / 1e6, vrms2dbm(np.abs(s21)), color=get_color(i),
                 label=os.path.basename(fn))
        axp.plot(freq / 1e6, phase, color=get_color(i))
    axm.set_ylabel("S21 Magnitude [dB]")
    axp.set_ylabel("S21 Phase [rad]")
    axp.set_xlabel("Frequency [MHz]")
    axm.legend(fontsize=7)
    axm.grid(); axp.grid()
    out = _out_name(output_filename, "USRP_VNA")
    fig.savefig(out, bbox_inches="tight")
    pl.close(fig)
    return out


def VNA_timestream_plot(filename, output_filename=None, backend="matplotlib",
                        **kwargs) -> str:
    """Waterfall of per-iteration VNA sweeps (reference VNA_timestream_plot,
    pyUSRP/USRP_VNA.py:563-680)."""
    with Ufiles.bound_open(filename) as f:
        grp = f["VNA_dynamic_0"]
        freq = np.asarray(grp["frequency"])
        traces = np.asarray(grp["S21"])
    fig, ax = pl.subplots(figsize=(10, 6))
    im = ax.imshow(vrms2dbm(np.abs(traces)), aspect="auto", origin="lower",
                   extent=[freq[0] / 1e6, freq[-1] / 1e6, 0, len(traces)],
                   cmap="viridis")
    fig.colorbar(im, ax=ax, label="S21 [dB]")
    ax.set_xlabel("Frequency [MHz]")
    ax.set_ylabel("Sweep iteration")
    out = _out_name(output_filename, "USRP_VNA_timestream")
    fig.savefig(out, bbox_inches="tight")
    pl.close(fig)
    return out


def plot_resonators(filenames, reso_freq=None, backend="matplotlib",
                    title_info=None, output_filename=None, auto_open=False,
                    attenuation=None, **kwargs) -> str:
    """IQ circle + magnitude + phase per fitted resonator
    (reference plot_resonators, pyUSRP/USRP_fitting.py:840-1204)."""
    if isinstance(filenames, str):
        filenames = [filenames]
    all_data = []
    for fn in filenames:
        all_data.extend(get_fit_data(fn))
    n = max(1, len(all_data))
    fig, axes = pl.subplots(nrows=n, ncols=3, figsize=(14, 4 * n),
                            squeeze=False)
    for i, d in enumerate(all_data):
        f, orig, fit = d["frequency"], d["original"], d["fitted"]
        axes[i][0].plot(orig.real, orig.imag, ".", color="grey",
                        label="data")
        axes[i][0].plot(fit.real, fit.imag, color="red", label="fit")
        axes[i][0].set_xlabel("I"); axes[i][0].set_ylabel("Q")
        axes[i][0].legend(fontsize=7); axes[i][0].axis("equal")
        axes[i][1].plot(f / 1e6, vrms2dbm(np.abs(orig)), ".", color="grey")
        axes[i][1].plot(f / 1e6, vrms2dbm(np.abs(fit)), color="red")
        axes[i][1].set_xlabel("Frequency [MHz]")
        axes[i][1].set_ylabel("Magnitude [dB]")
        axes[i][2].plot(f / 1e6, np.unwrap(np.angle(orig)), ".",
                        color="grey")
        axes[i][2].plot(f / 1e6, np.unwrap(np.angle(fit)), color="red")
        axes[i][2].set_xlabel("Frequency [MHz]")
        axes[i][2].set_ylabel("Phase [rad]")
        for ax in axes[i]:
            ax.grid()
    out = _out_name(output_filename, "USRP_resonators")
    fig.savefig(out, bbox_inches="tight")
    pl.close(fig)
    return out


def plot_noise_spec(filenames, channel_list=None, max_frequency=None,
                    title_info=None, backend="matplotlib", cryostat_attenuation=0,
                    auto_open=False, output_filename=None, **kwargs) -> str:
    """Per-channel noise PSD plot (reference plot_noise_spec,
    pyUSRP/USRP_noise.py:830-1067)."""
    if isinstance(filenames, str):
        filenames = [filenames]
    fig, ax = pl.subplots(figsize=(10, 6))
    ci = 0
    for fn in filenames:
        info, freq, real, imag = Ufiles.get_noise(fn,
                                                  channel_list=channel_list)
        for i in range(len(real)):
            sel = slice(None)
            if max_frequency is not None:
                sel = freq <= max_frequency
            ax.semilogx(freq[sel], real[i][sel], color=get_color(ci),
                        label=f"{os.path.basename(fn)} ch{i} I")
            ax.semilogx(freq[sel], imag[i][sel], color=get_color(ci),
                        ls="--", label=f"ch{i} Q")
            ci += 1
    ax.set_xlabel("Frequency [Hz]")
    ax.set_ylabel("PSD [dBc/Hz]" if kwargs.get("dbc") else "PSD [dB/Hz]")
    ax.legend(fontsize=7)
    ax.grid(which="both")
    if title_info:
        ax.set_title(title_info)
    out = _out_name(output_filename, "USRP_noise_spec")
    fig.savefig(out, bbox_inches="tight")
    pl.close(fig)
    return out


def plot_pfb(filename, decimation=None, low_pass=None, backend="matplotlib",
             output_filename=None, start_time=None, end_time=None,
             auto_open=False, **kwargs) -> str:
    """Full-PFB waterfall + trace stack (reference plot_pfb,
    pyUSRP/USRP_full_spec.py:402-522): the flattened spectra stream is
    reshaped by fft_tones and rolled by -fft_tones/2 so DC sits centered."""
    info = Ufiles.get_rx_info(filename)
    nfft = int(info.fft_tones)
    z = Ufiles.openH5file(filename)[0]
    n_frames = len(z) // nfft
    z = 20 * np.log10(np.abs(z[:n_frames * nfft]) + 1e-12)
    z_shaped = np.roll(z.reshape(n_frames, nfft), -nfft // 2, axis=1)
    x_label = (info.tone + (np.arange(nfft) - nfft / 2) *
               (info.rate / nfft)) / 1e6
    fig, (ax0, ax1) = pl.subplots(nrows=2, figsize=(10, 10))
    im = ax0.imshow(z_shaped, aspect="auto", interpolation="nearest",
                    extent=[x_label.min(), x_label.max(), 0, n_frames])
    fig.colorbar(im, ax=ax0, label="Power [dB]")
    ax0.set_xlabel("Channel [MHz]")
    ax0.set_ylabel("Frame")
    for zz in z_shaped[::max(1, n_frames // 50)]:
        ax1.plot(x_label, zz, color="k", alpha=0.1)
    ax1.set_xlabel("Channel [MHz]")
    ax1.set_ylabel("Power [dBm]")
    ax1.grid()
    out = _out_name(output_filename, "USRP_PFB_waterfall")
    fig.savefig(out, bbox_inches="tight")
    pl.close(fig)
    return out


def plot_frequency_timestreams(filenames, decimation=None,
                               displayed_samples=None, low_pass=None,
                               backend="matplotlib", output_filename=None,
                               channel_list=None, start_time=None,
                               end_time=None, auto_open=False,
                               **kwargs) -> str:
    """Plot df/f and Qr timestreams from a frequency-converted file
    (reference plot_frequency_timestreams, pyUSRP/USRP_noise.py:1229-1462)."""
    return plot_raw_data(filenames, decimation=decimation,
                         displayed_samples=displayed_samples,
                         backend=backend,
                         output_filename=output_filename or
                         "USRP_frequency_timestreams",
                         channel_list=channel_list, mode="IQ",
                         start_time=start_time, end_time=end_time)


def plot_reso_stat(filenames, reso_freq=None, backend="matplotlib",
                   title_info=None, additional_info=None,
                   output_filename=None, auto_open=False,
                   attr=None, **kwargs) -> str:
    """Resonator fit parameters vs readout power (or a custom raw_data0
    attribute).  The reference declares this function but leaves it empty
    (plot_reso_stat, pyUSRP/USRP_fitting.py:1206-1226); implemented here:
    one panel per parameter (Qr, Qi, f0 shift, a), one line per resonator.
    """
    from .files import get_readout_power

    if isinstance(filenames, str):
        filenames = [filenames]
    points = {}          # reso index -> list of (x, params)
    for fn in filenames:
        params = get_fit_param(fn)
        for i, p in enumerate(params):
            if attr is not None:
                with Ufiles.bound_open(fn) as f:
                    x = f["raw_data0"].attrs.get(attr)
            else:
                try:
                    x = get_readout_power(fn, i)
                except (IndexError, KeyError):
                    x = 0.0
            points.setdefault(i, []).append((float(x), p))
    fig, axes = pl.subplots(nrows=2, ncols=2, figsize=(11, 8))
    panels = [("Qr", lambda p: p["Qr"]),
              ("Qi", lambda p: p["Qi"]),
              ("f0 [MHz]", lambda p: p["f0"]),
              ("a (nonlinearity)", lambda p: p["a"])]
    for ax, (label, getter) in zip(axes.flat, panels):
        for i, series in sorted(points.items()):
            series = sorted(series)
            xs = [s[0] for s in series]
            ys = [getter(s[1]) for s in series]
            ax.plot(xs, ys, "o-", color=get_color(i), label=f"reso {i}")
        ax.set_xlabel(attr if attr else "readout power [dBm]")
        ax.set_ylabel(label)
        ax.grid()
    axes.flat[0].legend(fontsize=7)
    if title_info:
        fig.suptitle(title_info)
    out = _out_name(output_filename, "USRP_reso_stat")
    fig.savefig(out, bbox_inches="tight")
    pl.close(fig)
    return out


def diagnostic_VNA_noise(noise_filename, vna_filename=None, ant=None,
                         backend="matplotlib", output_filename=None,
                         auto_open=False, **kwargs) -> str:
    """Overlay noise acquisition tone points on the VNA trace
    (reference diagnostic_VNA_noise, pyUSRP/USRP_noise.py:1465-1658)."""
    fig, ax = pl.subplots(figsize=(10, 6))
    if vna_filename is not None:
        freq, s21 = Ufiles.get_VNA_data(vna_filename, calibrated=True)
        ax.plot(freq / 1e6, vrms2dbm(np.abs(s21)), color="grey",
                label="VNA")
    info = Ufiles.get_rx_info(noise_filename, ant=ant)
    data = Ufiles.openH5file(noise_filename)
    for i, f in enumerate(info.freq):
        tone = (info.tone + f) / 1e6
        level = vrms2dbm(np.mean(np.abs(data[i])))
        ax.plot(tone, level, "o", color=get_color(i), label=f"tone {i}")
    ax.set_xlabel("Frequency [MHz]")
    ax.set_ylabel("Level [dB]")
    ax.legend(fontsize=7)
    ax.grid()
    out = _out_name(output_filename, "USRP_VNA_noise_diagnostic")
    fig.savefig(out, bbox_inches="tight")
    pl.close(fig)
    return out
