"""The dispatch table cannot drift from the code (VERDICT r3 #7):
engine/dispatch.plan_dispatch must predict, for a branch-covering
battery of measurements, exactly the execution path run_measurement
actually takes (measure.LAST_DISPATCH, recorded at each branch).

docs/07_dispatch.md renders the same table for humans.
"""

import numpy as np
import pytest

from gpu_sdr_tpu import measure as measure_mod
from gpu_sdr_tpu.engine.dispatch import plan_dispatch
from gpu_sdr_tpu.engine.sinks import MemorySink
from gpu_sdr_tpu.engine.sources import ArraySource
from gpu_sdr_tpu.measure import run_measurement
from gpu_sdr_tpu.params import AntennaParams, AntMode, UsrpParams, WaveType

RATE = 1_000_000
RNG = np.random.default_rng(11)


def _assert_plan_matches(params, source=None, mesh=None, expect=None):
    plan = plan_dispatch(params, source=source, mesh=mesh)
    run_measurement(params, filename=None, source=source, mesh=mesh,
                    extra_sinks=[MemorySink()])
    actual = list(measure_mod.LAST_DISPATCH)
    assert [d.key() for d in plan] == actual, \
        f"plan {[d.key() for d in plan]} != actual {actual}"
    if expect is not None:
        assert actual == expect
    return plan


def _tones_direct(freqs, samples=200_000, **rx_extra):
    n = len(freqs)
    cmd = UsrpParams()
    cmd.A_TXRX = AntennaParams(
        mode=AntMode.TX, rate=RATE, buffer_len=100_000, samples=samples,
        freq=list(freqs), ampl=[1.0 / n] * n,
        wave_type=[WaveType.TONES] * n, delay=1.0)
    cmd.A_RX2 = AntennaParams(
        mode=AntMode.RX, rate=RATE, buffer_len=100_000, samples=samples,
        freq=list(freqs), decim=rx_extra.pop("decim", 100),
        pf_average=4, wave_type=[WaveType.DIRECT] * n, delay=1.0,
        **rx_extra)
    return cmd


def test_loopback_fold_kernel(monkeypatch):
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    cmd = _tones_direct([12_345, -67_891, 300_001])   # gcd 1: aperiodic
    _assert_plan_matches(
        cmd, expect=[("A_RX2", "fused_loopback", "fold_kernel")])


def test_loopback_fold_chain_when_pallas_off(monkeypatch):
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "0")
    cmd = _tones_direct([12_345, -67_891, 300_001])
    _assert_plan_matches(
        cmd, expect=[("A_RX2", "fused_loopback", "fold_chain")])


def test_loopback_periodic_comb_replay_kernel(monkeypatch):
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    # gcd 100_000 -> comb period 10 divides the block: replay rewrite
    cmd = _tones_direct([-300_000, 100_000, 300_000])
    _assert_plan_matches(
        cmd, expect=[("A_RX2", "fused_loopback", "replay_kernel_t")])


def test_loopback_chirp_wavetable(monkeypatch):
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    kw = dict(rate=RATE, buffer_len=64_000, samples=256_000,
              freq=[-300_000], chirp_f=[300_000], chirp_t=[0.128],
              swipe_s=[64], delay=1.0)
    cmd = UsrpParams()
    cmd.A_TXRX = AntennaParams(mode=AntMode.TX, ampl=[0.7],
                               wave_type=[WaveType.CHIRP], **kw)
    cmd.A_RX2 = AntennaParams(mode=AntMode.RX, decim=1,
                              wave_type=[WaveType.CHIRP], **kw)
    _assert_plan_matches(
        cmd, expect=[("A_RX2", "fused_loopback", "chirp_wavetable")])


def test_loopback_channelizer_wavetable(monkeypatch):
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    nfft, bin_hz = 1000, RATE // 1000
    freqs = [50 * bin_hz, -200 * bin_hz]
    # 128 frames/block: the kernel tile picker needs a multiple-of-8
    # divisor of the frame count (frames_pb=100 is untileable -> generic)
    cmd = UsrpParams()
    cmd.A_TXRX = AntennaParams(mode=AntMode.TX, rate=RATE,
                               buffer_len=128_000, freq=freqs,
                               ampl=[0.5, 0.25],
                               wave_type=[WaveType.TONES] * 2)
    cmd.A_RX2 = AntennaParams(mode=AntMode.RX, rate=RATE, fft_tones=nfft,
                              pf_average=4, buffer_len=128_000,
                              samples=256_000, freq=freqs,
                              wave_type=[WaveType.TONES] * 2)
    _assert_plan_matches(
        cmd, expect=[("A_RX2", "fused_loopback", "channelizer_wavetable")])


def test_loopback_generic_scan_when_pallas_off(monkeypatch):
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "0")
    nfft = 50
    cmd = UsrpParams()
    cmd.A_TXRX = AntennaParams(mode=AntMode.TX, rate=RATE,
                               buffer_len=100_000, freq=[100_000],
                               ampl=[1.0], wave_type=[WaveType.TONES])
    cmd.A_RX2 = AntennaParams(mode=AntMode.RX, rate=RATE, fft_tones=nfft,
                              pf_average=4, buffer_len=100_000,
                              samples=200_000, freq=[100_000],
                              wave_type=[WaveType.TONES])
    _assert_plan_matches(
        cmd, expect=[("A_RX2", "fused_loopback", "generic_scan")])


def _replay_rx(wave, samples=200_000, **extra):
    n_ch = len(extra.get("freq", [0]))
    blen = extra.pop("buffer_len", 100_000)
    return AntennaParams(mode=AntMode.RX, rate=RATE, buffer_len=blen,
                         samples=samples, wave_type=[wave] * n_ch, **extra)


def test_replay_direct_kernel_vs_scan(monkeypatch):
    rec = (RNG.standard_normal(100_000) +
           1j * RNG.standard_normal(100_000)).astype(np.complex64)
    src = ArraySource(rec)
    src.loop = True
    cmd = UsrpParams()
    cmd.A_RX2 = _replay_rx(WaveType.DIRECT, decim=100, pf_average=4,
                           freq=[100_000, -250_000])

    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    _assert_plan_matches(
        cmd, source=src,
        expect=[("A_RX2", "device_replay", "replay_kernel_t")])

    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "0")
    _assert_plan_matches(
        cmd, source=src, expect=[("A_RX2", "device_replay", "scan")])


def test_replay_chirp_table(monkeypatch):
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    rec = (RNG.standard_normal(400_000) +
           1j * RNG.standard_normal(400_000)).astype(np.complex64)
    src = ArraySource(rec)
    src.loop = True
    cmd = UsrpParams()
    cmd.A_RX2 = _replay_rx(WaveType.CHIRP, samples=400_000, decim=1,
                           freq=[-300_000], chirp_f=[300_000],
                           chirp_t=[0.1], swipe_s=[1000])
    _assert_plan_matches(
        cmd, source=src,
        expect=[("A_RX2", "device_replay", "chirp_table")])


def test_replay_channelizer_at(monkeypatch):
    """A fusable TONES replay geometry rides the round-5 fused
    channelizer kernel over the resident recording (no presum round
    trip)."""
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    nfft, bin_hz = 1000, RATE // 1000
    rec = (RNG.standard_normal(256_000) +
           1j * RNG.standard_normal(256_000)).astype(np.complex64)
    src = ArraySource(rec)
    src.loop = True
    cmd = UsrpParams()
    cmd.A_RX2 = _replay_rx(WaveType.TONES, fft_tones=nfft, pf_average=4,
                           samples=256_000, buffer_len=128_000,
                           freq=[50 * bin_hz, -200 * bin_hz])
    _assert_plan_matches(
        cmd, source=src,
        expect=[("A_RX2", "device_replay", "channelizer_at")])


def test_sharded_replay_channelizer_at(monkeypatch):
    """Under a time-only mesh the same fusable TONES replay geometry
    rides the SHARDED fused channelizer (per-shard kernel, staged
    cross-shard halos) — plan and actual must agree on the sub-path."""
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    from gpu_sdr_tpu.parallel import make_mesh
    nfft, bin_hz = 1000, RATE // 1000
    rec = (RNG.standard_normal(256_000) +
           1j * RNG.standard_normal(256_000)).astype(np.complex64)
    src = ArraySource(rec)
    src.loop = True
    cmd = UsrpParams()
    cmd.A_RX2 = _replay_rx(WaveType.TONES, fft_tones=nfft, pf_average=4,
                           samples=256_000, buffer_len=128_000,
                           freq=[50 * bin_hz, -200 * bin_hz])
    _assert_plan_matches(
        cmd, source=src, mesh=make_mesh((8, 1), ("time", "channels")),
        expect=[("A_RX2", "sharded_replay", "channelizer_at")])


def test_replay_pfb_at(monkeypatch):
    """A geometry whose channelizer tiling fails (nfft=500 at this
    block) falls back to the in-place presum + XLA DFT path."""
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    nfft, bin_hz = 500, RATE // 500
    rec = (RNG.standard_normal(200_000) +
           1j * RNG.standard_normal(200_000)).astype(np.complex64)
    src = ArraySource(rec)
    src.loop = True
    cmd = UsrpParams()
    cmd.A_RX2 = _replay_rx(WaveType.TONES, fft_tones=nfft, pf_average=4,
                           samples=200_000, buffer_len=100_000,
                           freq=[50 * bin_hz, -200 * bin_hz])
    _assert_plan_matches(
        cmd, source=src, expect=[("A_RX2", "device_replay", "pfb_at")])


def test_segmented_replay_plan(monkeypatch):
    from gpu_sdr_tpu.engine import replay as replay_mod
    rec = (RNG.standard_normal(200_000) +
           1j * RNG.standard_normal(200_000)).astype(np.complex64)
    src = ArraySource(rec)
    monkeypatch.setattr(replay_mod, "DEVICE_REPLAY_MAX_BYTES",
                        100_000 * 8)
    cmd = UsrpParams()
    cmd.A_RX2 = _replay_rx(WaveType.DIRECT, decim=100, pf_average=4,
                           freq=[100_000, -250_000])
    _assert_plan_matches(
        cmd, source=src, expect=[("A_RX2", "segmented_replay", None)])


def test_host_pipeline_white_noise():
    cmd = UsrpParams()
    cmd.A_RX2 = _replay_rx(WaveType.DIRECT, samples=100_000, decim=100,
                           pf_average=4, freq=[100_000])
    _assert_plan_matches(
        cmd, expect=[("A_RX2", "host_pipeline", None)])


def test_host_pipeline_mixed():
    cmd = UsrpParams()
    cmd.A_TXRX = AntennaParams(
        mode=AntMode.TX, rate=RATE, buffer_len=100_000, samples=100_000,
        freq=[100_000, -200_000], ampl=[0.5, 0.5],
        wave_type=[WaveType.TONES] * 2, delay=1.0)
    cmd.A_RX2 = AntennaParams(
        mode=AntMode.RX, rate=RATE, buffer_len=100_000, samples=100_000,
        decim=100, pf_average=4, freq=[100_000, -200_000],
        wave_type=[WaveType.DIRECT, WaveType.CHIRP],
        chirp_f=[0, 200_000], chirp_t=[0.0, 0.1], swipe_s=[0, 1000],
        delay=1.0)
    plan = plan_dispatch(cmd)
    assert plan[0].key() == ("A_RX2", "host_pipeline_mixed", None)


def test_dual_fused(monkeypatch):
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "0")
    freqs = [12_345, -67_891]
    cmd = UsrpParams()
    for tx_name, rx_name in (("A_TXRX", "A_RX2"), ("B_TXRX", "B_RX2")):
        setattr(cmd, tx_name, AntennaParams(
            mode=AntMode.TX, rate=RATE, buffer_len=100_000,
            samples=200_000, freq=freqs, ampl=[0.5, 0.5],
            wave_type=[WaveType.TONES] * 2, delay=1.0))
        setattr(cmd, rx_name, AntennaParams(
            mode=AntMode.RX, rate=RATE, buffer_len=100_000,
            samples=200_000, freq=freqs, decim=100, pf_average=4,
            wave_type=[WaveType.DIRECT] * 2, delay=1.0))
    _assert_plan_matches(
        cmd, expect=[("A_RX2", "dual_fused", "fold_chain"),
                     ("B_RX2", "dual_fused", "fold_chain")])


def test_sharded_paths():
    from gpu_sdr_tpu.parallel import make_mesh
    mesh = make_mesh((2, 4), ("time", "channels"))

    nfft, bin_hz = 1000, RATE // 1000
    freqs = [50 * bin_hz, -200 * bin_hz]
    cmd = UsrpParams()
    cmd.A_TXRX = AntennaParams(mode=AntMode.TX, rate=RATE,
                               buffer_len=100_000, samples=400_000,
                               freq=freqs, ampl=[0.5, 0.25],
                               wave_type=[WaveType.TONES] * 2, delay=1.0)
    cmd.A_RX2 = AntennaParams(mode=AntMode.RX, rate=RATE, fft_tones=nfft,
                              pf_average=4, buffer_len=100_000,
                              samples=400_000, freq=freqs,
                              wave_type=[WaveType.TONES] * 2, delay=1.0)
    _assert_plan_matches(cmd, mesh=mesh,
                         expect=[("A_RX2", "sharded_fused", "pfb_scan")])


def test_sharded_fused_channelizer_wavetable(monkeypatch):
    """A bin-quantized comb on a TIME-ONLY mesh rides the per-shard
    fused channelizer kernel (round 5) — plan and actual must agree."""
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    from gpu_sdr_tpu.parallel import make_mesh
    mesh = make_mesh((8, 1), ("time", "channels"))
    nfft, bin_hz = 1000, RATE // 1000
    freqs = [50 * bin_hz, -200 * bin_hz]
    cmd = UsrpParams()
    cmd.A_TXRX = AntennaParams(mode=AntMode.TX, rate=RATE,
                               buffer_len=128_000, samples=256_000,
                               freq=freqs, ampl=[0.5, 0.25],
                               wave_type=[WaveType.TONES] * 2, delay=1.0)
    cmd.A_RX2 = AntennaParams(mode=AntMode.RX, rate=RATE, fft_tones=nfft,
                              pf_average=4, buffer_len=128_000,
                              samples=256_000, freq=freqs,
                              wave_type=[WaveType.TONES] * 2, delay=1.0)
    _assert_plan_matches(
        cmd, mesh=mesh,
        expect=[("A_RX2", "sharded_fused", "channelizer_wavetable")])

    rec = (RNG.standard_normal(400_000) +
           1j * RNG.standard_normal(400_000)).astype(np.complex64)
    src = ArraySource(rec)
    cmd2 = UsrpParams()
    cmd2.A_RX2 = AntennaParams(mode=AntMode.RX, rate=RATE, decim=100,
                               pf_average=4, buffer_len=100_000,
                               samples=400_000,
                               freq=[100_000, -250_000],
                               wave_type=[WaveType.DIRECT] * 2)
    _assert_plan_matches(cmd2, source=src, mesh=mesh,
                         expect=[("A_RX2", "sharded_replay", "scan")])


def test_replay_chirp_at_when_period_incommensurate(monkeypatch):
    """A looped CHIRP recording whose chirp period does NOT divide the
    block takes the in-place lock-in (chirp_at), not the table form."""
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    rec = (RNG.standard_normal(400_000) +
           1j * RNG.standard_normal(400_000)).astype(np.complex64)
    src = ArraySource(rec)
    src.loop = True
    cmd = UsrpParams()
    # steps=300, t=0.03 -> period 30_000 samples; block 100_000
    cmd.A_RX2 = _replay_rx(WaveType.CHIRP, samples=400_000, decim=1,
                           freq=[-300_000], chirp_f=[300_000],
                           chirp_t=[0.03], swipe_s=[300])
    _assert_plan_matches(
        cmd, source=src, expect=[("A_RX2", "device_replay", "chirp_at")])


def test_sharded_fused_chirp_table(monkeypatch):
    """A resident-period chirp loopback under a mesh rides the round-5
    sharded table-oscillator lock-in — plan and actual must agree."""
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    from gpu_sdr_tpu.parallel import make_mesh
    mesh = make_mesh((4, 2), ("time", "channels"))
    rate = 1_000_000
    kw = dict(rate=rate, buffer_len=64_000, samples=256_000,
              freq=[-300_000], chirp_f=[300_000], chirp_t=[0.128],
              swipe_s=[128], delay=1.0)
    cmd = UsrpParams()
    cmd.A_TXRX = AntennaParams(mode=AntMode.TX, ampl=[0.7],
                               wave_type=[WaveType.CHIRP], **kw)
    cmd.A_RX2 = AntennaParams(mode=AntMode.RX, decim=1,
                              wave_type=[WaveType.CHIRP], **kw)
    _assert_plan_matches(
        cmd, mesh=mesh,
        expect=[("A_RX2", "sharded_fused", "chirp_table")])


def test_sharded_replay_kernel_dispatch(monkeypatch):
    """A looped DIRECT recording on a time-only mesh rides the round-5
    sharded replay kernel — plan and actual must agree."""
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    from gpu_sdr_tpu.parallel import make_mesh
    mesh = make_mesh((8, 1), ("time", "channels"))
    rec = (RNG.standard_normal(256_000) +
           1j * RNG.standard_normal(256_000)).astype(np.complex64)
    src = ArraySource(rec)
    src.loop = True
    cmd = UsrpParams()
    cmd.A_RX2 = _replay_rx(WaveType.DIRECT, decim=100, pf_average=4,
                           samples=512_000, buffer_len=128_000,
                           freq=[100_000, -250_000])
    _assert_plan_matches(
        cmd, source=src, mesh=mesh,
        expect=[("A_RX2", "sharded_replay", "replay_kernel")])
