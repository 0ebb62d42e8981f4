"""Smoke tests of the workflow scripts: run each CLI end-to-end on small
parameters in a temp folder (the reference's de-facto integration tests,
SURVEY.md section 4.2)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def run_script(tmp, name, *args, timeout=100):
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", name),
         "--folder", str(tmp), *args],
        capture_output=True, text=True, timeout=timeout, env=ENV, cwd=tmp)
    assert p.returncode == 0, f"{name} failed:\n{p.stdout}\n{p.stderr}"
    return p.stdout


def test_get_line_delay_script(tmp_path):
    out = run_script(tmp_path, "get_line_delay.py", "--rate", "1",
                     "--freq", "10", "--duration", "0.3")
    assert "Line delay" in out


def test_vna_fit_noise_scripts(tmp_path):
    run_script(tmp_path, "get_VNA.py", "--rate", "1", "--freq", "10",
               "--f0", "-0.4", "--f1", "0.4", "--points", "400",
               "--time", "0.2", "--delay_over", "0")
    out = run_script(tmp_path, "analyze_VNA.py")
    assert "analyzed" in out
    out = run_script(tmp_path, "get_noise.py", "--rate", "1", "--freq",
                     "10", "--tones", "0.1", "--time", "0.3",
                     "--decimation", "100")
    assert "noise data written" in out
    out = run_script(tmp_path, "analyze_noise.py")
    assert "analyzed" in out
    out = run_script(tmp_path, "raw_plot.py")
    assert "plot written" in out


def test_full_spec_scripts(tmp_path):
    run_script(tmp_path, "get_noise_full.py", "--rate", "1", "--freq",
               "10", "--channels", "64", "--time", "0.2", "--tones", "0.1")
    out = run_script(tmp_path, "plot_spectrogram.py")
    assert "plot written" in out


def test_raw_capture_script(tmp_path):
    out = run_script(tmp_path, "get_raw_data.py", "--rate", "1", "--freq",
                     "10", "--time", "0.1")
    assert "raw data written" in out


def test_network_test_script(tmp_path):
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "network_test.py"),
         "--channels", "100", "--rate", "1", "--time", "0.5"],
        capture_output=True, text=True, timeout=100, env=ENV, cwd=tmp_path)
    assert p.returncode == 0, p.stderr
    assert "Msps sustained" in p.stdout


def test_read_filter_window_tool(tmp_path):
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "read_filter_window.py"),
         "--nfft", "64", "--average", "4", "-o",
         str(tmp_path / "win.png")],
        capture_output=True, text=True, timeout=60, env=ENV, cwd=tmp_path)
    assert p.returncode == 0, p.stderr
    assert (tmp_path / "win.png").exists()
