"""Device-resident replay (engine/replay.py) vs the host-fed path."""

import numpy as np
import pytest

from gpu_sdr_tpu.engine import make_demodulator, run_pipeline
from gpu_sdr_tpu.engine.replay import (DEVICE_REPLAY_MAX_BYTES,
                                       DeviceReplay, can_device_replay)
from gpu_sdr_tpu.engine.sinks import MemorySink
from gpu_sdr_tpu.engine.sources import ArraySource, ReplaySource
from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

RNG = np.random.default_rng(3)


def _rx(samples, buffer_len=20_000):
    return AntennaParams(mode=AntMode.RX, rate=1_000_000,
                         buffer_len=buffer_len, samples=samples,
                         decim=10, pf_average=4, freq=[100_000, -250_000],
                         wave_type=[WaveType.DIRECT] * 2)


def _rec(n):
    return (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
            ).astype(np.complex64)


@pytest.mark.parametrize("rec_len,loop", [
    (60_000, False),        # recording shorter than the acquisition
    (55_000, False),        # partial tail block + post-recording zeros
    (50_000, True),         # looped, block-commensurate (plan block 50k)
])
def test_device_replay_matches_host_fed(rec_len, loop):
    rx = _rx(samples=100_000)
    rec = _rec(rec_len)

    demod = make_demodulator(rx)
    sink_h = MemorySink()
    run_pipeline(demod, ArraySource(rec) if not loop else _LoopArray(rec),
                 [sink_h])

    dr = DeviceReplay(rx, rec, loop=loop)
    sink_d = MemorySink()
    dr.run([sink_d])

    a, b = sink_h.data, sink_d.data
    assert a.shape == b.shape
    assert np.array_equal(a, b), "device replay must bit-match host-fed"


class _LoopArray(ArraySource):
    """Host-fed looped recording (commensurate lengths only)."""

    def __init__(self, data):
        super().__init__(data)
        self.loop = True

    def blocks(self, block_len, n_blocks):
        assert len(self.data) % block_len == 0
        nb = len(self.data) // block_len
        for i in range(n_blocks):
            j = i % nb
            yield self.data[j * block_len:(j + 1) * block_len]


def test_run_measurement_dispatches_device_replay(tmp_path, monkeypatch):
    """run_measurement(source=ReplaySource) with a small recording takes
    the device-resident path and matches the host-fed result."""
    from gpu_sdr_tpu import measure as measure_mod
    from gpu_sdr_tpu.engine import replay as replay_mod
    from gpu_sdr_tpu.measure import run_measurement
    from gpu_sdr_tpu.params import UsrpParams

    monkeypatch.chdir(tmp_path)
    rec = _rec(60_000)
    np.save(tmp_path / "rec.npy", rec)
    src = ReplaySource(str(tmp_path / "rec.npy"))
    assert can_device_replay(src)

    cmd = UsrpParams()
    cmd.A_RX2 = _rx(samples=60_000)
    sink_d = MemorySink()
    calls = []
    orig = replay_mod.DeviceReplay.run

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(replay_mod.DeviceReplay, "run", spy)
    run_measurement(cmd, None, source=src, extra_sinks=[sink_d])
    assert calls, "device replay was not dispatched"

    # host-fed reference: force the budget to zero
    monkeypatch.setattr(replay_mod, "DEVICE_REPLAY_MAX_BYTES", 0)
    src2 = ReplaySource(str(tmp_path / "rec.npy"))
    assert not can_device_replay(src2)
    sink_h = MemorySink()
    run_measurement(cmd, None, source=src2, extra_sinks=[sink_h])
    assert np.array_equal(sink_d.data, sink_h.data)


def test_device_replay_kernel_path(monkeypatch):
    """With Pallas forced on, looped commensurate DIRECT replay takes the
    scalar-prefetch kernel and matches the host-fed path at tf32 grade."""
    from gpu_sdr_tpu import golden
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    rx = _rx(samples=200_000, buffer_len=50_000)
    rec = _rec(100_000)                           # 2 blocks, looped
    dr = DeviceReplay(rx, rec, loop=True)
    assert dr._kernel_path is not None
    sink_k = MemorySink()
    dr.run([sink_k])

    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "0")
    dr2 = DeviceReplay(rx, rec, loop=True)
    assert dr2._kernel_path is None
    sink_s = MemorySink()
    dr2.run([sink_s])
    assert sink_k.data.shape == sink_s.data.shape
    assert golden.snr_db(sink_s.data, sink_k.data) > 90.0


def test_budget_gate(monkeypatch):
    from gpu_sdr_tpu.engine import replay as replay_mod
    src = ArraySource(np.zeros(128, np.complex64))
    assert can_device_replay(src)
    # over budget -> host-fed path
    monkeypatch.setattr(replay_mod, "DEVICE_REPLAY_MAX_BYTES", 128 * 8 - 1)
    assert not replay_mod.can_device_replay(src)
    # sources without a recording array -> host-fed path
    from gpu_sdr_tpu.engine.sources import WhiteNoiseSource
    assert not replay_mod.can_device_replay(WhiteNoiseSource())

    class NoData(ArraySource):
        @property
        def data(self):
            raise AttributeError("no data")

        def __init__(self):
            pass
    assert not replay_mod.can_device_replay(NoData())


def test_device_replay_lane_padded_matches_unpadded(monkeypatch):
    """config.pad_lanes on the row-major replay kernel: a 9..127-channel
    recording is demodulated at 128 padded channels (dense writes, +36%
    measured on chip — tools/perf_replay_pad.py) and the host-side slice
    in run_chunked restores the logical channels exactly."""
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    from gpu_sdr_tpu import golden
    from gpu_sdr_tpu.engine.replay import pad_rx_freqs
    rate = 1_000_000
    freqs = [int(f) for f in np.linspace(-400_000, 400_000, 10)]
    rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=20_000,
                       samples=100_000, decim=10, pf_average=4,
                       freq=freqs, wave_type=[WaveType.DIRECT] * 10)
    rec = _rec(50_000)                 # looped: matches the 50k plan block

    monkeypatch.setenv("GPU_SDR_TPU_PAD_LANES", "0")
    assert len(pad_rx_freqs(freqs, rate)) == 10
    dr0 = DeviceReplay(rx, rec, blocks_per_exec=2, loop=True)
    assert dr0.path == "replay_kernel", dr0.path
    s0 = MemorySink()
    dr0.run([s0])

    monkeypatch.setenv("GPU_SDR_TPU_PAD_LANES", "1")
    assert len(pad_rx_freqs(freqs, rate)) == 128
    dr1 = DeviceReplay(rx, rec, blocks_per_exec=2, loop=True)
    assert dr1.path == "replay_kernel", dr1.path
    s1 = MemorySink()
    dr1.run([s1])

    assert s1.data.shape == s0.data.shape
    snr = golden.snr_db(s0.data, s1.data)
    assert snr > 110, f"padded vs unpadded replay: {snr:.1f} dB"


@pytest.mark.parametrize("wave", [WaveType.TONES, WaveType.NOISE])
def test_channelizer_replay_matches_host_fed(monkeypatch, wave):
    """The round-5 fused channelizer replay (channelizer_at: presum +
    two-stage DFT reading the transposed resident recording in place)
    must match the host-fed pipeline for selected-tone AND full-spectrum
    replay, across blocks and the loop seam."""
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    from gpu_sdr_tpu import golden
    rate, nfft = 1_000_000, 1000
    bin_hz = rate // nfft
    rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=128_000,
                       samples=256_000, fft_tones=nfft, pf_average=4,
                       freq=[50 * bin_hz, -200 * bin_hz],
                       wave_type=[wave] * (1 if wave == WaveType.NOISE
                                           else 2))
    rec = _rec(128_000)
    dr = DeviceReplay(rx, rec, blocks_per_exec=2, loop=True)
    assert dr.path == "channelizer_at", dr.path
    s_k = MemorySink()
    dr.run([s_k])

    class _Loop:
        def blocks(self, block_len, n_blocks):
            for i in range(n_blocks):
                s = (i * block_len) % len(rec)
                # wrap-around copy (loop seam semantics)
                idx = (np.arange(block_len) + s) % len(rec)
                yield rec[idx]

    demod = make_demodulator(rx)
    s_h = MemorySink()
    run_pipeline(demod, _Loop(), [s_h])

    n = min(len(s_k.data), len(s_h.data))
    assert n > 0
    snr = golden.snr_db(s_h.data[:n], s_k.data[:n])
    assert snr > 85, f"channelizer_at vs host-fed ({wave}): {snr:.1f} dB"
