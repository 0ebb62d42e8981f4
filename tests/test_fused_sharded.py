"""Sharded fused TONES->PFB->select loopback chain vs the golden stream.

The scan-inside-shard_map chain (parallel/fused_sharded.py) must reproduce
the unsharded golden PFB of the golden tone stream on a (time, channels)
mesh, through multiple executions (halo + phase carries crossing both the
scan and the execution boundary)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from gpu_sdr_tpu import golden
from gpu_sdr_tpu.ops import cplx
from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType
from gpu_sdr_tpu.parallel.fused_sharded import ShardedFusedLoopback


def _mesh(t, c):
    devs = np.array(jax.devices()[:t * c]).reshape(t, c)
    return Mesh(devs, ("time", "channels"))


def _params(rate, freqs, ampls, nfft, avg):
    tx = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=rate,
                       freq=list(freqs), ampl=list(ampls),
                       wave_type=[WaveType.TONES] * len(freqs))
    rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=rate,
                       freq=list(freqs), ampl=list(ampls),
                       wave_type=[WaveType.TONES] * len(freqs),
                       fft_tones=nfft, pf_average=avg)
    return tx, rx


def _golden_selected(freqs, ampls, rate, nfft, avg, bins, n_samples):
    x = golden.tone_block(list(freqs), list(ampls), rate, 0, n_samples)
    frames = golden.pfb_frames(x, nfft, avg)
    return frames[:, bins]


@pytest.mark.parametrize("freqs,label", [
    ((3000, -7000, 15000), "const"),     # bin-aligned -> wavetable TX
    ((3001, -7013), "matmul"),           # off-grid -> matmul TX + phase
])
def test_sharded_fused_matches_golden(freqs, label):
    rate, nfft, avg = 64_000, 64, 4
    ampls = tuple(0.5 for _ in freqs)
    T, Kc = 4, 2
    L = T * nfft * 8                     # 8 frames per time shard
    K, n_exec = 3, 2
    tx, rx = _params(rate, freqs, ampls, nfft, avg)
    mesh = _mesh(T, Kc)
    sf = ShardedFusedLoopback(tx, rx, mesh, blocks_per_exec=K, block_len=L)
    assert sf._const_tx == (label == "const")

    state = sf.init_state()
    outs = []
    for _ in range(n_exec):
        state, ys = sf.run_exec(state)
        y = cplx.to_np(ys)               # (K, L//nfft, n_tones)
        outs.append(y.reshape(-1, y.shape[-1]))
    out = np.concatenate(outs, axis=0)

    bins = golden.tone_bins(list(freqs), rate, nfft)
    ref = _golden_selected(freqs, ampls, rate, nfft, avg, bins,
                           n_exec * K * L)
    # zero-primed halo: our frame t corresponds to golden frame t-(avg-1)
    skip = avg - 1
    n = min(len(ref), len(out) - skip)
    snr = golden.snr_db(ref[:n], out[skip:skip + n])
    assert snr > 90.0, f"{label}: SNR {snr:.1f} dB"


def test_run_measurement_dispatches_sharded_fused(monkeypatch, tmp_path):
    """run_measurement(mesh=...) with a fusable TONES->TONES loopback must
    take the sharded fused fast path and produce the golden tone stream."""
    from gpu_sdr_tpu.engine.sinks import MemorySink
    from gpu_sdr_tpu.measure import run_measurement
    from gpu_sdr_tpu.params import UsrpParams
    from gpu_sdr_tpu.parallel import fused_sharded as fs

    calls = []
    orig = fs.ShardedFusedLoopback.run

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(fs.ShardedFusedLoopback, "run", spy)
    monkeypatch.chdir(tmp_path)

    rate, nfft, avg = 1_024_000, 64, 4
    bin_hz = rate // nfft
    freqs = [5 * bin_hz, -10 * bin_hz]
    cmd = UsrpParams()
    cmd.A_TXRX = AntennaParams(
        mode=AntMode.TX, rate=rate, buffer_len=64_000, samples=256_000,
        freq=freqs, ampl=[0.4, 0.3], wave_type=[WaveType.TONES] * 2,
        delay=1.0)
    cmd.A_RX2 = AntennaParams(
        mode=AntMode.RX, rate=rate, buffer_len=64_000, samples=256_000,
        freq=freqs, fft_tones=nfft, pf_average=avg,
        wave_type=[WaveType.TONES] * 2, delay=1.0)
    mesh = _mesh(4, 2)
    sink = MemorySink()
    run_measurement(cmd, None, extra_sinks=[sink], mesh=mesh)
    assert calls, "sharded fused path was not dispatched"
    out = sink.data
    bins = golden.tone_bins(freqs, rate, nfft)
    ref = _golden_selected(freqs, [0.4, 0.3], rate, nfft, avg, bins,
                           out.shape[0] * nfft + (avg - 1) * nfft)
    skip = avg - 1
    n = min(len(ref), len(out) - skip)
    assert golden.snr_db(ref[:n], out[skip:skip + n]) > 90


def test_sharded_fused_vna_matches_unsharded():
    """CHIRP->CHIRP sharded fused chain == the single-device FusedLoopback
    (same chirp, same lock-in segmentation, block boundaries crossing the
    chirp period)."""
    from gpu_sdr_tpu.engine.fused import FusedLoopback
    from gpu_sdr_tpu.engine.sinks import MemorySink
    from gpu_sdr_tpu.parallel.fused_sharded import ShardedFusedVNA

    rate = 1_000_000
    p = dict(rate=rate, buffer_len=100_000, samples=400_000,
             freq=[-300_000], chirp_f=[300_000], chirp_t=[0.1],
             swipe_s=[1000], delay=1.0)
    tx = AntennaParams(mode=AntMode.TX, ampl=[0.8],
                       wave_type=[WaveType.CHIRP], **p)
    rx = AntennaParams(mode=AntMode.RX, decim=1,
                       wave_type=[WaveType.CHIRP], **p)

    ref_sink = MemorySink()
    FusedLoopback(tx, rx, blocks_per_exec=2).run([ref_sink])
    ref = ref_sink.data

    T = 4
    devs = np.array(jax.devices()[:T])
    mesh = Mesh(devs, ("time",))
    ppt = 100  # chirp length/steps * decim = (0.1*1e6/1000)*1 = 100
    L = T * ppt * 250
    sf = ShardedFusedVNA(tx, rx, mesh, blocks_per_exec=2, block_len=L)
    assert sf.ppt == ppt
    state = sf.init_state()
    outs = []
    for _ in range(2):
        state, ys = sf.run_exec(state)
        y = cplx.to_np(ys)
        outs.append(y.reshape(-1, 1))
    out = np.concatenate(outs, axis=0)
    n = min(len(ref), len(out))
    assert n > 0
    assert golden.snr_db(ref[:n], out[:n]) > 100


def test_run_measurement_dispatches_sharded_vna(monkeypatch, tmp_path):
    from gpu_sdr_tpu.engine.sinks import MemorySink
    from gpu_sdr_tpu.measure import run_measurement
    from gpu_sdr_tpu.params import UsrpParams
    from gpu_sdr_tpu.parallel import fused_sharded as fs

    calls = []
    orig = fs.ShardedFusedVNA.run_exec

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(fs.ShardedFusedVNA, "run_exec", spy)
    monkeypatch.chdir(tmp_path)

    rate = 1_000_000
    p = dict(rate=rate, buffer_len=100_000, samples=300_000,
             freq=[-200_000], chirp_f=[200_000], chirp_t=[0.05],
             swipe_s=[500], delay=1.0)
    cmd = UsrpParams()
    cmd.A_TXRX = AntennaParams(mode=AntMode.TX, ampl=[1.0],
                               wave_type=[WaveType.CHIRP], **p)
    cmd.A_RX2 = AntennaParams(mode=AntMode.RX, decim=1,
                              wave_type=[WaveType.CHIRP], **p)
    mesh = Mesh(np.array(jax.devices()[:4]), ("time",))
    sink = MemorySink()
    run_measurement(cmd, None, extra_sinks=[sink], mesh=mesh)
    assert calls, "sharded fused VNA path was not dispatched"
    out = sink.data
    # loopback VNA: z = |chirp|^2 = 1 at every lock-in point
    assert out.shape[1] == 1 and out.shape[0] > 0
    assert np.allclose(out, 1.0, atol=1e-4)


def test_sharded_fused_time_only_mesh():
    """A 1-D time mesh (no channel axis) must also work: selection is a
    plain local gather of the full spectrum."""
    rate, nfft, avg = 32_000, 32, 4
    freqs, ampls = (2000, -5000), (0.7, 0.3)
    T = 4
    devs = np.array(jax.devices()[:T])
    mesh = Mesh(devs, ("time",))
    L = T * nfft * 4
    tx, rx = _params(rate, freqs, ampls, nfft, avg)
    sf = ShardedFusedLoopback(tx, rx, mesh, blocks_per_exec=2, block_len=L)
    state = sf.init_state()
    state, ys = sf.run_exec(state)
    state, ys2 = sf.run_exec(state)
    out = np.concatenate([cplx.to_np(y).reshape(-1, len(freqs))
                          for y in (ys, ys2)], axis=0)
    bins = golden.tone_bins(list(freqs), rate, nfft)
    ref = _golden_selected(freqs, ampls, rate, nfft, avg, bins, 4 * L)
    skip = avg - 1
    n = min(len(ref), len(out) - skip)
    snr = golden.snr_db(ref[:n], out[skip:skip + n])
    assert snr > 90.0, f"SNR {snr:.1f} dB"


def test_sharded_fused_pallas_presum_matches_golden(monkeypatch):
    """With the Pallas gate forced on, the sharded chain uses the one-pass
    pre-sum kernel (interpret mode off-TPU) and must still match golden."""
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    freqs, ampls = (3000, -7000, 15000), (0.5, 0.5, 0.5)
    rate, nfft, avg = 64_000, 64, 4
    T, Kc = 4, 2
    L = T * nfft * 8
    K, n_exec = 2, 2
    tx, rx = _params(rate, freqs, ampls, nfft, avg)
    sf = ShardedFusedLoopback(tx, rx, _mesh(T, Kc), blocks_per_exec=K,
                              block_len=L)
    state = sf.init_state()
    outs = []
    for _ in range(n_exec):
        state, ys = sf.run_exec(state)
        y = cplx.to_np(ys)
        outs.append(y.reshape(-1, y.shape[-1]))
    out = np.concatenate(outs, axis=0)
    bins = golden.tone_bins(list(freqs), rate, nfft)
    ref = _golden_selected(freqs, ampls, rate, nfft, avg, bins,
                           n_exec * K * L)
    skip = avg - 1
    n = min(len(ref), len(out) - skip)
    snr = golden.snr_db(ref[:n], out[skip:skip + n])
    assert snr > 90.0, f"pallas sharded SNR {snr:.1f} dB"


def _direct_params(rate, freqs, ampls, decim, pfa, L):
    tx = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=L,
                       freq=list(freqs), ampl=list(ampls),
                       wave_type=[WaveType.TONES] * len(freqs))
    rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=L,
                       freq=list(freqs), decim=decim, pf_average=pfa,
                       wave_type=[WaveType.DIRECT] * len(freqs))
    return tx, rx


def test_sharded_fused_direct_matches_golden():
    """The zero-collective sharded TONES->DIRECT chain (time x channels)
    must match the float64 oracle across executions."""
    from gpu_sdr_tpu.parallel.fused_sharded import ShardedFusedDirect
    rate, decim, pfa = 1_000_000, 10, 4
    freqs = (12_345, -67_891, 300_001, -111_111)     # off-grid comb
    ampls = (0.4, 0.3, 0.2, 0.1)
    T, Kc = 2, 4
    L = 80_000
    tx, rx = _direct_params(rate, freqs, ampls, decim, pfa, L)
    sf = ShardedFusedDirect(tx, rx, _mesh(T, Kc), blocks_per_exec=2,
                            block_len=L)
    assert sf.ok
    state = sf.init_state()
    outs = []
    for _ in range(2):
        state, ys = sf.run_exec(state)
        y = cplx.to_np(ys)
        outs.append(y.reshape(-1, y.shape[-1]))
    out = np.concatenate(outs, axis=0)               # (rows, C)
    x = golden.tone_block(list(freqs), list(ampls), rate, 0, 4 * L)
    gold = golden.GoldenDirectDemodulator(list(freqs), rate, decim, pfa)
    ref = np.concatenate([gold(x[i * L:(i + 1) * L]) for i in range(4)],
                         axis=1).T
    assert out.shape == ref.shape
    snr = golden.snr_db(ref, out)
    assert snr > 95.0, f"SNR {snr:.1f} dB"


@pytest.mark.parametrize("use_fold", [True, False])
def test_sharded_fused_direct_matches_single_device_chain(use_fold):
    """Sharded chain == its unsharded kernel to f32 tolerance — both the
    shift-fold path (default) and the G-fused fallback."""
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_chain import (TonesDirectChain,
                                              TonesDirectFoldKernel)
    from gpu_sdr_tpu.parallel.fused_sharded import ShardedFusedDirect
    rate, decim, pfa = 1_000_000, 10, 4
    freqs = (12_345, -67_891)
    ampls = (0.5, 0.25)
    L = 40_000
    tx, rx = _direct_params(rate, freqs, ampls, decim, pfa, L)
    sf = ShardedFusedDirect(tx, rx, _mesh(2, 2), blocks_per_exec=3,
                            block_len=L, use_fold=use_fold)
    assert sf.ok
    assert (sf.fold is not None) == use_fold
    st, ys = sf.run_exec(sf.init_state())
    out = cplx.to_np(ys).reshape(-1, len(freqs))

    dcfg = DirectDDCConfig(rate=rate, decim=decim, pf_average=pfa,
                           freqs=freqs, phases=(0, 0))
    cls = TonesDirectFoldKernel if use_fold else TonesDirectChain
    chain = cls(rate=rate, tx_freqs=freqs, tx_ampls=ampls,
                cfg=dcfg, block_len=L, interpret=True)
    st2, ym = chain.multi_step(chain.init_state(), 3)
    ref = cplx.to_np(ym)
    assert golden.snr_db(ref, out) > 100.0
    assert np.array_equal(np.asarray(st[0]), np.asarray(st2[0]))


def test_run_measurement_dispatches_sharded_direct(monkeypatch, tmp_path):
    """run_measurement(mesh=...) with TONES->DIRECT must take the sharded
    fused chain and produce a valid acquisition."""
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    from gpu_sdr_tpu.measure import run_measurement
    from gpu_sdr_tpu.engine.sinks import MemorySink
    from gpu_sdr_tpu.params import UsrpParams
    monkeypatch.chdir(tmp_path)
    rate = 1_000_000
    freqs = [12_345, -67_891]
    cmd = UsrpParams()
    cmd.A_TXRX = AntennaParams(
        mode=AntMode.TX, rate=rate, buffer_len=40_000, samples=160_000,
        freq=freqs, ampl=[0.5, 0.5], wave_type=[WaveType.TONES] * 2,
        delay=1.0)
    cmd.A_RX2 = AntennaParams(
        mode=AntMode.RX, rate=rate, buffer_len=40_000, samples=160_000,
        freq=freqs, decim=10, pf_average=4,
        wave_type=[WaveType.DIRECT] * 2, delay=1.0)
    sink = MemorySink()
    run_measurement(cmd, None, extra_sinks=[sink], mesh=_mesh(2, 2))
    assert sink.data is not None and sink.data.shape[1] == 2
    assert sink.data.shape[0] >= 16_000


def test_sharded_fused_direct_lane_padded(monkeypatch):
    """config.pad_lanes on a channel-sharded mesh pads the fold chain's
    channel axis to 128 lanes PER SHARD (multiple 128*Kc) so every
    shard's output tile writes dense; the dead channels are sliced off
    host-side, and the result matches the unpadded chain and the
    float64 oracle (round 5: the sharded form of the single-chip
    lane-padding that doubled config 3)."""
    from gpu_sdr_tpu.parallel.fused_sharded import ShardedFusedDirect
    rate, decim, pfa = 1_000_000, 10, 4
    freqs = (12_345, -67_891, 300_001, -111_111)
    ampls = (0.4, 0.3, 0.2, 0.1)
    T, Kc = 2, 2
    L = 40_000
    tx, rx = _direct_params(rate, freqs, ampls, decim, pfa, L)
    mesh = _mesh(T, Kc)

    monkeypatch.setenv("GPU_SDR_TPU_PAD_LANES", "0")
    sf0 = ShardedFusedDirect(tx, rx, mesh, blocks_per_exec=2,
                             block_len=L)
    assert sf0.ok and sf0.fold is not None and sf0.n_pad == 0

    monkeypatch.setenv("GPU_SDR_TPU_PAD_LANES", "1")
    sf1 = ShardedFusedDirect(tx, rx, mesh, blocks_per_exec=2,
                             block_len=L)
    assert sf1.ok and sf1.fold is not None
    assert sf1.n_pad == 252 and sf1.out_channels == 256  # 128 * Kc
    assert sf1.n_tones == len(freqs)
    # per-shard output tile is now a dense 128-lane write
    assert sf1.out_channels % (128 * Kc) == 0

    from gpu_sdr_tpu.engine.sinks import MemorySink
    s0, s1 = MemorySink(), MemorySink()
    sf0.run([s0], n_blocks=4)
    sf1.run([s1], n_blocks=4)
    assert s1.data.shape == s0.data.shape      # dead lanes sliced off
    assert golden.snr_db(s0.data, s1.data) > 120

    x = golden.tone_block(list(freqs), list(ampls), rate, 0, 4 * L)
    gold = golden.GoldenDirectDemodulator(list(freqs), rate, decim, pfa)
    ref = np.concatenate([gold(x[i * L:(i + 1) * L]) for i in range(4)],
                         axis=1).T
    n = min(len(ref), len(s1.data))
    assert golden.snr_db(ref[:n], s1.data[:n]) > 95


def test_sharded_channelizer_wavetable_matches_golden(monkeypatch):
    """A bin-quantized comb on a TIME-ONLY mesh rides the per-shard
    fused channelizer kernel (round 5: the single-chip headline chain
    sharded with zero collectives — a one-frame-periodic comb's halo
    frames ARE the constant frame); output must match the float64
    oracle with the same zero-primed startup as the pfb_scan path."""
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    freqs, ampls = (3000, -7000, 15000), (0.5, 0.5, 0.5)
    rate, nfft, avg = 64_000, 64, 4
    T, Kc = 8, 1
    L = T * nfft * 8
    K, n_exec = 2, 2
    tx, rx = _params(rate, freqs, ampls, nfft, avg)
    sf = ShardedFusedLoopback(tx, rx, _mesh(T, Kc), blocks_per_exec=K,
                              block_len=L)
    assert sf.path == "channelizer_wavetable", sf.path
    state = sf.init_state()
    outs = []
    for _ in range(n_exec):
        state, ys = sf.run_exec(state)
        y = cplx.to_np(ys)
        outs.append(y.reshape(-1, y.shape[-1]))
    out = np.concatenate(outs, axis=0)
    bins = golden.tone_bins(list(freqs), rate, nfft)
    ref = _golden_selected(freqs, ampls, rate, nfft, avg, bins,
                           n_exec * K * L)
    skip = avg - 1
    n = min(len(ref), len(out) - skip)
    snr = golden.snr_db(ref[:n], out[skip:skip + n])
    assert snr > 90.0, f"sharded channelizer wavetable: {snr:.1f} dB"

    # and it must equal the pfb_scan SPMD chain exactly (same stream
    # semantics, startup included)
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "0")
    sf2 = ShardedFusedLoopback(tx, rx, _mesh(T, Kc), blocks_per_exec=K,
                               block_len=L)
    assert sf2.path == "pfb_scan", sf2.path
    state2 = sf2.init_state()
    outs2 = []
    for _ in range(n_exec):
        state2, ys2 = sf2.run_exec(state2)
        y2 = cplx.to_np(ys2)
        outs2.append(y2.reshape(-1, y2.shape[-1]))
    out2 = np.concatenate(outs2, axis=0)
    snr2 = golden.snr_db(out2, out)
    assert snr2 > 100.0, f"kernel vs pfb_scan path: {snr2:.1f} dB"


def test_sharded_vna_table_matches_sincos_and_golden(monkeypatch):
    """The round-5 sharded table-oscillator VNA (one resident chirp
    period, per-shard single-fetch lock-in kernel at tile i*T + t,
    zero collectives) must match the per-shard sincos chain and the
    float64 oracle."""
    from gpu_sdr_tpu.parallel.fused_sharded import ShardedFusedVNA
    rate = 1_000_000
    kw = dict(rate=rate, freq=[-300_000], chirp_f=[300_000],
              chirp_t=[0.128], swipe_s=[128])
    L = 64_000
    tx = AntennaParams(mode=AntMode.TX, buffer_len=L, samples=4 * L,
                       ampl=[0.7], wave_type=[WaveType.CHIRP], **kw)
    rx = AntennaParams(mode=AntMode.RX, buffer_len=L, samples=4 * L,
                       decim=1, wave_type=[WaveType.CHIRP], **kw)
    mesh = _mesh(4, 2)

    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "0")
    v0 = ShardedFusedVNA(tx, rx, mesh, blocks_per_exec=2, block_len=L)
    assert v0.path == "chirp_lockin", v0.path
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    v1 = ShardedFusedVNA(tx, rx, mesh, blocks_per_exec=2, block_len=L)
    assert v1.path == "chirp_table", v1.path

    outs = []
    for v in (v0, v1):
        st = v.init_state()
        o = []
        for _ in range(2):
            st, ys = v.run_exec(st)
            o.append(cplx.to_np(ys).reshape(-1, 1))
        outs.append(np.concatenate(o))
    o0, o1 = outs
    assert o0.shape == o1.shape
    assert golden.snr_db(o0, o1) > 110

    # and the single-device production chain (the config-2
    # chirp_wavetable path, itself golden-proven) must agree
    from gpu_sdr_tpu.engine.fused import FusedLoopback
    from gpu_sdr_tpu.engine.sinks import MemorySink
    ref_sink = MemorySink()
    fl = FusedLoopback(tx, rx, blocks_per_exec=2)
    assert fl.path == "chirp_wavetable", fl.path
    fl.run([ref_sink])
    ref = ref_sink.data
    n = min(len(ref), len(o1))
    assert n > 0
    snr = golden.snr_db(ref[:n], o1[:n])
    assert snr > 100, f"sharded chirp table vs single-chip: {snr:.1f} dB"
