"""Smoke tests for the secondary workflow scripts (dual/dynamic/large VNA,
dual noise, beam mapper, raw analysis)."""

import os
import subprocess
import sys

import h5py
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def run_script(tmp, rel, *args, timeout=120):
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", rel),
         "--folder", str(tmp), *args],
        capture_output=True, text=True, timeout=timeout, env=ENV, cwd=tmp)
    assert p.returncode == 0, f"{rel} failed:\n{p.stdout}\n{p.stderr}"
    return p.stdout


def test_dual_vna_script(tmp_path):
    out = run_script(tmp_path, "get_dual_VNA.py", "--rate", "1",
                     "--freq_a", "10", "--freq_b", "20", "--points", "200",
                     "--time", "0.2", "--f0", "-0.4", "--f1", "0.4")
    assert "dual VNA" in out
    # both frontends in one file + the VNA analysis over both
    import glob
    fn = glob.glob(str(tmp_path / "USRP_VNA*.h5"))[0]
    with h5py.File(fn, "r") as f:
        g = f["raw_data0"]
        assert "A_RX2" in g and "B_RX2" in g
        assert len(f["VNA_0"]["frequency"]) == 400  # 200 per frontend


def test_dual_noise_script(tmp_path):
    out = run_script(tmp_path, "get_dual_noise.py", "--rate", "1",
                     "--freq_a", "10", "--freq_b", "20",
                     "--tones_a", "0.1", "--tones_b", "0.15",
                     "--time", "0.2")
    assert "dual noise" in out


def test_large_vna_script(tmp_path):
    out = run_script(tmp_path, "large_VNA.py", "--rate", "1", "--start",
                     "10", "--stop", "12", "--points_per_segment", "200",
                     "--time", "0.2", "--out", "bigvna")
    assert "stitched" in out
    with h5py.File(tmp_path / "bigvna.h5", "r") as f:
        freq = np.asarray(f["VNA_0"]["frequency"])
        assert freq.min() >= 10e6 - 1
        assert freq.max() <= 12e6 + 1
        assert np.all(np.diff(freq) >= 0)


def test_dynamic_vna_script(tmp_path):
    run_script(tmp_path, "get_VNA.py", "--rate", "1", "--freq", "10",
               "--f0", "-0.4", "--f1", "0.4", "--points", "200",
               "--time", "0.1", "--iter", "3", "--delay_over", "0")
    out = run_script(tmp_path, "analyze_dynamic_VNA.py")
    assert "waterfall written" in out


def test_beam_mapper_simulated(tmp_path):
    p = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "beam_mapper", "beam_mapper.py"),
         "--folder", str(tmp_path), "--nx", "2", "--ny", "2",
         "--rate", "1", "--time", "0.1", "--tones", "0.1"],
        capture_output=True, text=True, timeout=120, env=ENV, cwd=tmp_path)
    assert p.returncode == 0, p.stderr
    with h5py.File(tmp_path / "beam_map.h5", "r") as f:
        assert f["beam_map"]["positions"].shape == (4, 2)
        assert f["beam_map"]["responses"].shape == (4, 1)


def test_raw_analysis_script(tmp_path):
    run_script(tmp_path, "get_raw_data.py", "--rate", "1", "--freq", "10",
               "--time", "0.1")
    out = run_script(tmp_path, "raw_data_analisys.py")
    assert "spectrum written" in out
    out = run_script(tmp_path, "last_file_plot.py")
    assert "plot written" in out
