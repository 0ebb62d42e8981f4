"""On-chip kernel parity: re-assert, ON THE REAL CHIP, the claims that
the CPU suite can only check in Pallas interpret mode — each Mosaic
kernel against the float64 golden oracle and against its XLA
formulation (VERDICT r1 #9: make the on-chip parity re-checkable).

Run alone (one process per chip):  python -m pytest tests_tpu/ -q
"""

import numpy as np
import pytest

from gpu_sdr_tpu import golden
from gpu_sdr_tpu.config import configure_precision

configure_precision()

RNG = np.random.default_rng(11)


def _noise(n):
    return (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
            ).astype(np.complex64)


def test_fused_ddc_kernel_matches_golden_and_xla():
    """ops/pallas_ddc (fused DDC+FIR, bf16 hi/lo split dots) vs the XLA
    accumulated-matmul path and the float64 oracle."""
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import (DirectDDCConfig, ddc_carrier_init,
                                     ddc_carrier_step, direct_ddc_fir)
    from gpu_sdr_tpu.ops.pallas_ddc import ddc_fused

    rate, decim, pfa = 1_000_000, 10, 4
    freqs = (12_345, -67_891, 300_001, -111_111)
    cfg = DirectDDCConfig(rate=rate, decim=decim, pf_average=pfa,
                          freqs=freqs, phases=(0,) * 4)
    L = 80_000
    hmod = cfg.modulated_taps()
    ramp = cfg.carrier_ramp(L // cfg.M)
    stepv = ddc_carrier_step(cfg, L)
    x = _noise(2 * L)

    outs = {}
    for name, fn in (("xla", direct_ddc_fir),
                     ("pallas", lambda *a: ddc_fused(*a,
                                                     precision="tf32"))):
        phase = ddc_carrier_init(cfg, L)
        hist = cplx.zeros((cfg.f - 1) * cfg.M)
        ys = []
        for i in range(2):
            blk = cplx.from_np(x[i * L:(i + 1) * L])
            phase, hist, y = jax.jit(fn, static_argnums=(3, 4, 5))(
                hmod, ramp, stepv, cfg.rate, cfg.M, cfg.f, phase, hist,
                blk)
            ys.append(cplx.to_np(y))
        outs[name] = np.concatenate(ys)

    gold = golden.GoldenDirectDemodulator(list(freqs), rate, decim, pfa)
    ref = gold(x).T
    n = min(len(ref), len(outs["pallas"]))
    snr_gold = golden.snr_db(ref[:n], outs["pallas"][:n])
    snr_xla = golden.snr_db(outs["xla"][:n], outs["pallas"][:n])
    assert snr_gold > 85, f"kernel vs float64 oracle: {snr_gold:.1f} dB"
    assert snr_xla > 85, f"kernel vs XLA tf32: {snr_xla:.1f} dB"


def test_fused_channelizer_kernel_matches_golden_and_xla():
    """ops/pallas_channelizer (transposed fused PFB+DFT) vs pfb_frames +
    scrambled DFT (XLA) and the float64 oracle — the headline chain's
    kernel."""
    import jax.numpy as jnp
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.pallas_channelizer import (
        can_fuse_channelizer, channelizer_frames_t, select_tones_t,
        transpose_block)
    from gpu_sdr_tpu.ops.pfb import (PFBConfig, pfb_frames,
                                     pfb_spare_init, select_tones)

    rate, nfft, avg = 1_000_000, 1000, 4
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate)
    window = cfg.window()
    dft = cfg.dft(two_stage=True)
    n1, n2 = dft.split
    L = 80 * nfft
    assert can_fuse_channelizer(cfg, dft, L)
    x = _noise(2 * L)
    bins = np.arange(0, nfft, 7)[:128]

    # XLA reference
    spare = pfb_spare_init(cfg)
    xs = []
    for i in range(2):
        spare, fr = pfb_frames(cfg, window, dft, spare,
                               cplx.from_np(x[i * L:(i + 1) * L]))
        xs.append(cplx.to_np(select_tones(
            fr, jnp.asarray(bins.astype(np.int32)))))
    ref_xla = np.concatenate(xs)

    # kernel
    sp_t = transpose_block(pfb_spare_init(cfg), nfft, n1, n2)
    ks = []
    for i in range(2):
        x_t = transpose_block(cplx.from_np(x[i * L:(i + 1) * L]),
                              nfft, n1, n2)
        sp_t, fr_t = channelizer_frames_t(cfg, window, dft, sp_t, x_t)
        ks.append(cplx.to_np(select_tones_t(fr_t, bins, n1, n2)))
    got = np.concatenate(ks)

    ref_gold = golden.tone_select(
        golden.pfb_frames(x, nfft, avg), list(bins))
    skip = avg - 1
    n = min(len(ref_gold), len(got) - skip)
    snr_gold = golden.snr_db(ref_gold[:n], got[skip:skip + n])
    snr_xla = golden.snr_db(ref_xla, got)
    assert snr_gold > 85, f"kernel vs float64 oracle: {snr_gold:.1f} dB"
    assert snr_xla > 85, f"kernel vs XLA tf32: {snr_xla:.1f} dB"


def test_chirp_lockin_kernel_matches_golden():
    """ops/pallas_lockin (in-place chirp lock-in over a recording) vs the
    chirp_demod + flat-window lock-in oracle."""
    import jax.numpy as jnp
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops import lockin as lockin_ops
    from gpu_sdr_tpu.ops.chirp import ChirpConfig
    from gpu_sdr_tpu.ops.pallas_lockin import pallas_chirp_lockin_at

    rate = 1_000_000
    cp = golden.ChirpParameter(-300_000, 300_000, rate, 1000, 0.1)
    cfg = ChirpConfig.from_params(-300_000, 300_000, rate, 1000, 0.1)
    ppt = cp.length
    L = 80_000
    nseg_pb = L // ppt
    x = _noise(2 * L)
    xc = cplx.from_np(x)
    Xf = cplx.C(xc.re.reshape(-1, ppt), xc.im.reshape(-1, ppt))
    profile = jnp.asarray(lockin_ops.lockin_profile(ppt))

    last = jnp.uint32(0)
    outs = []
    for i in range(2):
        last, y = pallas_chirp_lockin_at(cfg, profile, last, Xf,
                                         jnp.int32(i), nseg_pb)
        outs.append(np.asarray(y.re) + 1j * np.asarray(y.im))
    got = np.concatenate(outs)

    z = golden.chirp_demod(cp, 0, x)
    gd = golden.GoldenVNADecimator(ppt)
    ref = gd(z)
    snr = golden.snr_db(ref, got)
    assert snr > 85, f"lock-in kernel vs oracle: {snr:.1f} dB"


def test_tones_direct_chain_matches_golden():
    """ops/pallas_chain (single-kernel G-fused TONES->DIRECT loopback,
    in-kernel comb synthesis) vs the float64 comb+demod oracle — the
    config-3 chain, compiled by Mosaic (the CPU suite runs it only in
    interpret mode)."""
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_chain import TonesDirectChain

    rate, M, f, L = 1_000_000, 10, 4, 80_000
    tx_freqs = tuple(int(x) for x in np.linspace(-300_000, 300_000, 20))
    ampls = tuple(0.05 + 0.01 * (i % 5) for i in range(20))
    dcfg = DirectDDCConfig(rate=rate, decim=M, pf_average=f,
                           freqs=tx_freqs, phases=(0,) * 20)
    chain = TonesDirectChain(rate=rate, tx_freqs=tx_freqs, tx_ampls=ampls,
                             cfg=dcfg, block_len=L, interpret=False)
    assert chain.ok
    n_blocks = 3
    state = chain.init_state()
    step = jax.jit(chain.step)
    outs = []
    for _ in range(n_blocks):
        state, y = step(state)
        outs.append(cplx.to_np(y).T)
    got = np.concatenate(outs, axis=1)

    x = golden.tone_block(tx_freqs, ampls, rate, 0, n_blocks * L)
    gold = golden.GoldenDirectDemodulator(list(tx_freqs), rate, M, f)
    ref = np.concatenate(
        [gold(x[i * L:(i + 1) * L]) for i in range(n_blocks)], axis=1)
    snr = golden.snr_db(ref, got)
    assert snr > 85, f"chain kernel vs float64 oracle: {snr:.1f} dB"


def test_presum_kernel_matches_golden():
    """ops/pallas_pfb (one-pass windowed pre-sum) vs the oracle."""
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.pallas_pfb import pallas_presum
    from gpu_sdr_tpu.ops.windows import pfb_window
    import jax.numpy as jnp

    nfft, avg = 1000, 4
    T = 160
    x = _noise(T * nfft)
    xc = cplx.from_np(x)
    W2 = jnp.asarray(pfb_window(nfft, avg).astype(np.float32)
                     ).reshape(avg, nfft)
    spare = cplx.zeros((avg - 1, nfft))
    pre = pallas_presum(W2, spare, xc.reshape(T, nfft), bt=80,
                        interpret=False)
    got = cplx.to_np(pre)

    w = pfb_window(nfft, avg)
    ext = np.concatenate([np.zeros((avg - 1) * nfft, np.complex64), x])
    ref = np.stack([
        sum(ext[(t + i) * nfft:(t + i + 1) * nfft] *
            w[i * nfft:(i + 1) * nfft] for i in range(avg))
        for t in range(T)])
    snr = golden.snr_db(ref, got)
    assert snr > 100, f"pre-sum kernel vs oracle: {snr:.1f} dB"


def test_transposed_replay_kernel_matches_rowmajor_onchip():
    """ops/pallas_replay.ReplayDDCT (few-channel transposed kernel,
    pre-tiled column-major recording + contiguous 3D output writes) vs
    the row-major ReplayDDC ON CHIP — Mosaic-lowered, across executions
    and the loop seam."""
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_replay import ReplayDDC, ReplayDDCT

    rate, M, f = 1_000_000, 10, 4
    freqs = (100_000, -250_000)
    L, K = 50_000, 3
    rec = _noise(3 * L)
    cfg = DirectDDCConfig(rate=rate, decim=M, pf_average=f,
                          freqs=freqs, phases=(0, 0))
    a = ReplayDDC(cfg, rec, block_len=L, blocks_per_exec=K,
                  interpret=False)
    b = ReplayDDCT(cfg, rec, block_len=L, blocks_per_exec=K,
                   interpret=False)
    assert a.ok and b.ok
    sa, sb = a.init_state(), b.init_state()
    for _ in range(3):                            # 9 blocks: wraps twice
        sa, ya = a.multi_step(sa)
        sb, yb = b.multi_step(sb)
        snr = golden.snr_db(cplx.to_np(ya), cplx.to_np(yb))
        assert snr > 110, f"transposed vs row-major on chip: {snr:.1f} dB"


def test_fold_kernel_matches_golden_onchip():
    """ops/pallas_chain.TonesDirectFoldKernel (shift-fold chain in one
    HBM pass, incl. the self-ramp fast path) vs the float64 comb+demod
    oracle — the round-3 config-3 production chain, compiled by Mosaic
    (the CPU suite runs it only in interpret mode)."""
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_chain import TonesDirectFoldKernel

    rate, M, f, L = 1_000_000, 10, 4, 80_000
    tx_freqs = tuple(int(x) for x in np.linspace(-300_000, 300_000, 20))
    ampls = tuple(0.05 + 0.01 * (i % 5) for i in range(20))
    for rx_freqs, label in ((tx_freqs, "self_ramp"),
                            (tx_freqs[:10], "ramp_streamed")):
        dcfg = DirectDDCConfig(rate=rate, decim=M, pf_average=f,
                               freqs=rx_freqs,
                               phases=(0,) * len(rx_freqs))
        chain = TonesDirectFoldKernel(rate=rate, tx_freqs=tx_freqs,
                                      tx_ampls=ampls, cfg=dcfg,
                                      block_len=L, interpret=False)
        assert chain.ok
        assert chain.self_ramp == (label == "self_ramp")
        n_blocks = 3
        state = chain.init_state()
        state, y = jax.jit(
            lambda st: chain.multi_step(st, n_blocks))(state)
        got = cplx.to_np(y).T

        x = golden.tone_block(tx_freqs, ampls, rate, 0, n_blocks * L)
        gold = golden.GoldenDirectDemodulator(list(rx_freqs), rate, M, f)
        ref = np.concatenate(
            [gold(x[i * L:(i + 1) * L]) for i in range(n_blocks)], axis=1)
        snr = golden.snr_db(ref, got)
        assert snr > 85, f"{label} fold kernel vs oracle: {snr:.1f} dB"


def test_table_oscillator_lockin_matches_golden_onchip():
    """ops/pallas_lockin.pallas_chirp_lockin_table (the config-2
    production lock-in: demod oscillator READ from the resident period)
    vs the golden chirp demod + lock-in, compiled by Mosaic."""
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu.ops import chirp as chirp_ops
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.chirp import ChirpConfig
    from gpu_sdr_tpu.ops.lockin import lockin_profile
    from gpu_sdr_tpu.ops.pallas_lockin import pallas_chirp_lockin_table

    rate = 1_000_000
    steps, chirp_t = 128, 0.0256
    cfg = ChirpConfig.from_params(-300_000, 300_000, rate, steps, chirp_t)
    ppt = cfg.length
    period = cfg.period
    nseg_pb = 32
    L = nseg_pb * ppt
    nblk = period // L

    def body(last, _):
        last, c = chirp_ops.chirp_block(cfg, last, L)
        return last, c
    _, cs = jax.lax.scan(body, jnp.uint32(0), None, length=nblk)
    total_nseg = period // ppt
    Cf = cplx.C(cs.re.reshape(total_nseg, ppt),
                cs.im.reshape(total_nseg, ppt))

    x = _noise(period)
    Xf = cplx.from_np(x.reshape(total_nseg, ppt))
    prof = jnp.asarray(lockin_profile(ppt))

    cp = golden.ChirpParameter(-300_000, 300_000, rate, steps, chirp_t)
    ref = golden.GoldenVNADecimator(ppt)(golden.chirp_demod(cp, 0, x))

    outs = []
    for i in range(nblk):
        y = pallas_chirp_lockin_table(prof, Cf, Xf, jnp.int32(i),
                                      nseg_pb, interpret=False)
        outs.append(cplx.to_np(y))
    out = np.concatenate(outs)
    snr = golden.snr_db(ref, out)
    assert snr > 85, f"table-oscillator lock-in vs oracle: {snr:.1f} dB"

    # replay form: the signal index diverges from the oscillator index
    # (engine/replay._chirp_table_replay wraps them mod different
    # cycles).  Reading block i out of the second copy of a doubled
    # recording through sig_idx must reproduce the lock-step result.
    X2 = cplx.C(jnp.concatenate([Xf.re, Xf.re]),
                jnp.concatenate([Xf.im, Xf.im]))
    y2 = pallas_chirp_lockin_table(prof, Cf, X2, jnp.int32(nblk - 1),
                                   nseg_pb, interpret=False,
                                   sig_idx=jnp.int32(2 * nblk - 1))
    np.testing.assert_array_equal(cplx.to_np(y2),
                                  out[(nblk - 1) * nseg_pb:])


def test_single_fetch_lockin_matches_aliased_onchip():
    """ops/pallas_lockin.pallas_chirp_lockin_table_self (the config-2
    loopback's single-fetch form: one stream serves as oscillator AND
    signal — the aliased 4-spec call streams every byte twice,
    tools/perf_lockin_self.py: 19.6 -> 26.4 Gsps) must match the
    aliased call bit-for-bit on the real half, with an exactly-zero
    imaginary half, compiled by Mosaic."""
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu.ops import chirp as chirp_ops
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.chirp import ChirpConfig
    from gpu_sdr_tpu.ops.lockin import lockin_profile
    from gpu_sdr_tpu.ops.pallas_lockin import (
        pallas_chirp_lockin_table, pallas_chirp_lockin_table_self)

    rate = 1_000_000
    steps, chirp_t = 128, 0.0256
    cfg = ChirpConfig.from_params(-300_000, 300_000, rate, steps, chirp_t)
    ppt = cfg.length
    nseg_pb = 32
    L = nseg_pb * ppt
    nblk = cfg.period // L

    def body(last, _):
        last, c = chirp_ops.chirp_block(cfg, last, L, scale=0.7)
        return last, c
    _, cs = jax.lax.scan(body, jnp.uint32(0), None, length=nblk)
    total_nseg = cfg.period // ppt
    Cf = cplx.C(cs.re.reshape(total_nseg, ppt),
                cs.im.reshape(total_nseg, ppt))
    prof = jnp.asarray(lockin_profile(ppt) / 0.7)

    for i in range(nblk):
        ya = pallas_chirp_lockin_table(prof, Cf, Cf, jnp.int32(i),
                                       nseg_pb, interpret=False)
        yb = pallas_chirp_lockin_table_self(prof, Cf, jnp.int32(i),
                                            nseg_pb, interpret=False)
        np.testing.assert_array_equal(np.asarray(ya.re),
                                      np.asarray(yb.re))
        assert np.abs(np.asarray(yb.im)).max() == 0.0
        assert np.abs(np.asarray(ya.im)).max() < 1e-6


def test_fold_t_kernel_matches_golden_onchip():
    """ops/pallas_chain.TonesDirectFoldT (channel-major factored fold:
    dense time-row lanes — the round-5 config-3 probe form) vs the
    float64 comb+demod oracle, compiled by Mosaic."""
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_chain import TonesDirectFoldT

    rate, M, f = 1_000_000, 10, 4
    L = 25_600                        # nb = 2560 = 20 x 128
    tx_freqs = tuple(int(x) for x in np.linspace(-300_000, 300_000, 20))
    ampls = tuple(0.05 + 0.01 * (i % 5) for i in range(20))
    for rx_freqs, label in ((tx_freqs, "self_ramp"),
                            (tx_freqs[:10], "ramp_streamed")):
        dcfg = DirectDDCConfig(rate=rate, decim=M, pf_average=f,
                               freqs=rx_freqs,
                               phases=(0,) * len(rx_freqs))
        chain = TonesDirectFoldT(rate=rate, tx_freqs=tx_freqs,
                                 tx_ampls=ampls, cfg=dcfg,
                                 block_len=L, interpret=False)
        assert chain.ok
        assert chain.R % 128 == 0
        n_blocks = 3
        state = chain.init_state()
        state, y = jax.jit(
            lambda st: chain.multi_step(st, n_blocks))(state)
        got = cplx.to_np(y)           # channel-major (Cp, rows)

        x = golden.tone_block(tx_freqs, ampls, rate, 0, n_blocks * L)
        gold = golden.GoldenDirectDemodulator(list(rx_freqs), rate, M, f)
        ref = np.concatenate(
            [gold(x[i * L:(i + 1) * L]) for i in range(n_blocks)], axis=1)
        snr = golden.snr_db(ref, got)
        assert snr > 85, f"{label} fold-T kernel vs oracle: {snr:.1f} dB"


def test_channelizer_at_replay_matches_golden_onchip():
    """ops/pallas_channelizer.channelizer_frames_at (round-5 fused
    channelizer replay: presum + two-stage DFT reading the transposed
    resident recording in place) vs the float64 PFB oracle, compiled by
    Mosaic through the DeviceReplay dispatch."""
    from gpu_sdr_tpu.engine.replay import DeviceReplay
    from gpu_sdr_tpu.engine.sinks import MemorySink
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    rng = np.random.default_rng(9)
    rate, nfft, avg = 1_024_000, 64, 4
    L = 64_000
    rec = (rng.standard_normal(2 * L) + 1j * rng.standard_normal(2 * L)
           ).astype(np.complex64)
    rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=L,
                       samples=2 * L, fft_tones=nfft, pf_average=avg,
                       wave_type=[WaveType.NOISE])
    dr = DeviceReplay(rx, rec, blocks_per_exec=2, loop=True)
    assert dr.path == "channelizer_at", dr.path
    sink = MemorySink()
    dr.run([sink])
    out = sink.data
    ref = golden.pfb_frames(rec.astype(np.complex128), nfft, avg)
    skip = avg - 1
    n = min(len(ref), len(out) - skip)
    snr = golden.snr_db(ref[:n], out[skip:skip + n])
    assert snr > 85, f"channelizer_at vs oracle on chip: {snr:.1f} dB"


def test_sharded_channelizer_at_replay_matches_golden_onchip():
    """ops/pallas_channelizer.channelizer_frames_at_halo (round-5
    SHARDED fused channelizer replay: per-shard kernel reading the
    shard-local transposed recording with STAGED cross-shard halos) vs
    the float64 PFB oracle, compiled by Mosaic through the
    ShardedDeviceReplay dispatch on a 1-device mesh — the kernel's
    staged-halo select (program_id==0) and dual halo block specs are
    distinct from channelizer_frames_at and need their own on-chip
    lowering proof."""
    from gpu_sdr_tpu.engine.sinks import MemorySink
    from gpu_sdr_tpu.parallel import make_mesh
    from gpu_sdr_tpu.parallel.sharded_replay import ShardedDeviceReplay
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    rng = np.random.default_rng(13)
    rate, nfft, avg = 1_024_000, 64, 4
    L = 64_000
    rec = (rng.standard_normal(2 * L) + 1j * rng.standard_normal(2 * L)
           ).astype(np.complex64)
    rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=L,
                       samples=2 * L, fft_tones=nfft, pf_average=avg,
                       wave_type=[WaveType.NOISE])
    mesh = make_mesh((1, 1), ("time", "channels"))
    sr = ShardedDeviceReplay(rx, rec, mesh, blocks_per_exec=2, loop=True)
    assert sr.path == "channelizer_at", sr.path
    sink = MemorySink()
    sr.run([sink])
    out = sink.data
    ref = golden.pfb_frames(rec.astype(np.complex128), nfft, avg)
    skip = avg - 1
    n = min(len(ref), len(out) - skip)
    snr = golden.snr_db(ref[:n], out[skip:skip + n])
    assert snr > 85, \
        f"sharded channelizer_at vs oracle on chip: {snr:.1f} dB"


def test_sharded_replay_kernel_matches_golden_onchip():
    """ops/pallas_replay.ShardedReplayDDC (round-5 sharded row-major
    replay: per-shard in-place DDC+FIR with staged cross-shard FIR
    history) vs the float64 oracle, compiled by Mosaic through the
    ShardedDeviceReplay dispatch on a 1-device mesh — the kernel's
    staged-halo select (_kernel_h) is distinct from _kernel and needs
    its own on-chip lowering proof."""
    from gpu_sdr_tpu.engine.sinks import MemorySink
    from gpu_sdr_tpu.parallel import make_mesh
    from gpu_sdr_tpu.parallel.sharded_replay import ShardedDeviceReplay
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    rng = np.random.default_rng(17)
    rate, decim, pfa = 1_024_000, 16, 4
    L = 128_000 * 4
    freqs = [100_000, -250_000]
    rec = (rng.standard_normal(2 * L) + 1j * rng.standard_normal(2 * L)
           ).astype(np.complex64)
    rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=L,
                       samples=4 * L, decim=decim, pf_average=pfa,
                       freq=freqs, wave_type=[WaveType.DIRECT] * 2)
    mesh = make_mesh((1, 1), ("time", "channels"))
    sr = ShardedDeviceReplay(rx, rec, mesh, blocks_per_exec=2, loop=True)
    assert sr.path == "replay_kernel", sr.path
    sink = MemorySink()
    sr.run([sink])
    gold = golden.GoldenDirectDemodulator(freqs, rate, decim, pfa)
    full = np.concatenate([rec, rec])
    ref = np.concatenate([gold(full[i * L:(i + 1) * L])
                          for i in range(4)], axis=1).T
    n = min(len(ref), len(sink.data))
    snr = golden.snr_db(ref[:n], sink.data[:n])
    assert snr > 85, f"sharded replay kernel vs oracle on chip: {snr:.1f} dB"
