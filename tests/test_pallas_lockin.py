"""Pallas fused chirp+lock-in kernel vs the golden model (interpret mode on
CPU; the compiled path runs on real TPU via tools/perf experiments)."""

import jax.numpy as jnp
import numpy as np

from gpu_sdr_tpu import golden
from gpu_sdr_tpu.ops import cplx
from gpu_sdr_tpu.ops.chirp import ChirpConfig
from gpu_sdr_tpu.ops.lockin import lockin_profile
from gpu_sdr_tpu.ops.pallas_lockin import fused_chirp_lockin

RNG = np.random.default_rng(17)


def test_pallas_fused_matches_golden():
    rate = 1_000_000
    steps, chirp_t = 100, 0.02
    cfg = ChirpConfig.from_params(-300_000, 300_000, rate, steps, chirp_t)
    ppt = cfg.length          # decim=1 lock-in
    nseg = 64
    L = nseg * ppt
    x = (RNG.standard_normal(L) + 1j * RNG.standard_normal(L)
         ).astype(np.complex64)
    prof = jnp.asarray(lockin_profile(ppt))

    cp = golden.ChirpParameter(-300_000, 300_000, rate, steps, chirp_t)
    zg = golden.chirp_demod(cp, 0, x)
    dec = golden.GoldenVNADecimator(ppt)
    ref = dec(zg)

    last, y = fused_chirp_lockin(cfg, prof, jnp.uint32(0), cplx.from_np(x),
                                 use_pallas=True, interpret=True)
    out = cplx.to_np(y)
    assert out.shape == (nseg,)
    snr = golden.snr_db(ref, out)
    assert snr > 90.0, f"SNR {snr:.1f} dB"

    # the XLA path agrees too
    last2, y2 = fused_chirp_lockin(cfg, prof, jnp.uint32(0),
                                   cplx.from_np(x), use_pallas=False)
    assert golden.snr_db(cplx.to_np(y2), out) > 100.0
    assert int(last) == int(last2)


def test_pallas_fused_block_continuity():
    rate = 1_000_000
    cfg = ChirpConfig.from_params(0, 200_000, rate, 50, 0.01)
    ppt = cfg.length
    nseg = 32
    L = nseg * ppt
    x = (RNG.standard_normal(2 * L) + 1j * RNG.standard_normal(2 * L)
         ).astype(np.complex64)
    prof = jnp.asarray(lockin_profile(ppt))
    last = jnp.uint32(0)
    outs = []
    for b in (x[:L], x[L:]):
        last, y = fused_chirp_lockin(cfg, prof, last, cplx.from_np(b),
                                     use_pallas=True, interpret=True)
        outs.append(cplx.to_np(y))
    out = np.concatenate(outs)
    cp = golden.ChirpParameter(0, 200_000, rate, 50, 0.01)
    ref = golden.GoldenVNADecimator(ppt)(golden.chirp_demod(cp, 0, x))
    assert golden.snr_db(ref, out) > 90.0


def test_table_oscillator_lockin_matches_golden():
    """pallas_chirp_lockin_table: the demod oscillator READ from a
    resident one-period wavetable (TONES wavetable trick applied to the
    chirp demodulator) must match the golden chirp demod + lock-in on a
    random signal, across period-block indices."""
    import jax
    from gpu_sdr_tpu.ops import chirp as chirp_ops
    from gpu_sdr_tpu.ops.pallas_lockin import pallas_chirp_lockin_table

    rate = 1_000_000
    steps, chirp_t = 128, 0.0256
    cfg = ChirpConfig.from_params(-300_000, 300_000, rate, steps, chirp_t)
    ppt = cfg.length
    period = cfg.period
    nseg_pb = 32
    L = nseg_pb * ppt
    nblk = period // L
    assert period % L == 0

    # one oscillator period from the production generator
    def body(last, _):
        last, c = chirp_ops.chirp_block(cfg, last, L)
        return last, c
    _, cs = jax.lax.scan(body, jnp.uint32(0), None, length=nblk)
    total_nseg = period // ppt
    Cf = cplx.C(cs.re.reshape(total_nseg, ppt),
                cs.im.reshape(total_nseg, ppt))

    x = (RNG.standard_normal(period) + 1j * RNG.standard_normal(period)
         ).astype(np.complex64)
    Xf = cplx.from_np(x.reshape(total_nseg, ppt))
    prof = jnp.asarray(lockin_profile(ppt))

    cp = golden.ChirpParameter(-300_000, 300_000, rate, steps, chirp_t)
    ref = golden.GoldenVNADecimator(ppt)(golden.chirp_demod(cp, 0, x))

    outs = []
    for i in range(nblk):
        y = pallas_chirp_lockin_table(prof, Cf, Xf, jnp.int32(i),
                                      nseg_pb, interpret=True)
        outs.append(cplx.to_np(y))
    out = np.concatenate(outs)
    snr = golden.snr_db(ref, out)
    assert snr > 90.0, f"table-oscillator lock-in SNR {snr:.1f} dB"


def test_hostfed_chirp_table_step_matches_xla(monkeypatch):
    """The host-fed CHIRP demodulator uses the table-oscillator lock-in
    when the block is period-commensurate (demodulator._try_chirp_table_step);
    it must match the XLA chirp_demod_block + lockin_decimate path on a
    streamed random signal across the period wrap."""
    from gpu_sdr_tpu.engine.demodulator import make_demodulator
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    rate = 1_000_000
    rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=64_000,
                       samples=640_000, freq=[-300_000],
                       chirp_f=[300_000], chirp_t=[0.128], swipe_s=[128],
                       decim=1, wave_type=[WaveType.CHIRP])

    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "1")
    d_tab = make_demodulator(rx)
    assert isinstance(d_tab.init_state(), tuple)   # table path engaged
    monkeypatch.setenv("GPU_SDR_TPU_PALLAS", "0")
    d_xla = make_demodulator(rx)

    L = d_tab.plan.block_len
    assert L == d_xla.plan.block_len == 64_000
    st_t, st_x = d_tab.init_state(), d_xla.init_state()
    outs_t, outs_x = [], []
    for k in range(5):                      # 320k samples: wraps 128k x2
        x = (RNG.standard_normal(L) + 1j * RNG.standard_normal(L)
             ).astype(np.complex64)
        xc = cplx.from_np(x)
        st_t, yt = d_tab.step(st_t, xc)
        st_x, yx = d_xla.step(st_x, xc)
        outs_t.append(cplx.to_np(yt))
        outs_x.append(cplx.to_np(yx))
    a = np.concatenate(outs_t)
    b = np.concatenate(outs_x)
    assert a.shape == b.shape
    assert golden.snr_db(b, a) > 90.0


def test_table_self_matches_aliased_bit_identical():
    """pallas_chirp_lockin_table_self (single-fetch loopback form) is
    bit-identical to the 4-spec aliased call with X == C — Mosaic does
    not coalesce aliased block specs, so the loopback chain fetches its
    wavetable twice; the self form halves the traffic with the same
    product set (tools/perf_pallas_bw2.py, 2026-08-21)."""
    import jax
    from gpu_sdr_tpu.ops import chirp as chirp_ops
    from gpu_sdr_tpu.ops.pallas_lockin import (
        pallas_chirp_lockin_table, pallas_chirp_lockin_table_self)

    rate = 1_000_000
    steps, chirp_t = 128, 0.0256
    cfg = ChirpConfig.from_params(-300_000, 300_000, rate, steps, chirp_t)
    ppt = cfg.length
    period = cfg.period
    nseg_pb = 32
    L = nseg_pb * ppt
    nblk = period // L

    def body(last, _):
        last, c = chirp_ops.chirp_block(cfg, last, L, scale=0.7)
        return last, c
    _, cs = jax.lax.scan(body, jnp.uint32(0), None, length=nblk)
    total_nseg = period // ppt
    Cf = cplx.C(cs.re.reshape(total_nseg, ppt),
                cs.im.reshape(total_nseg, ppt))
    prof = jnp.asarray(lockin_profile(ppt) / 0.7)

    for i in range(nblk):
        ya = pallas_chirp_lockin_table(prof, Cf, Cf, jnp.int32(i),
                                       nseg_pb, interpret=True)
        yb = pallas_chirp_lockin_table_self(prof, Cf, jnp.int32(i),
                                            nseg_pb, interpret=True)
        # real half: identical products, bit-identical
        assert np.array_equal(np.asarray(ya.re), np.asarray(yb.re))
        # imag half: the true loopback answer is exactly 0; the self
        # form delivers it exactly, while the aliased form leaves ~1e-9
        # FMA-contraction residue (cr*ci - ci*cr fused one side only)
        assert np.array_equal(np.asarray(yb.im),
                              np.zeros_like(np.asarray(yb.im)))
        assert np.abs(np.asarray(ya.im)).max() < 1e-6
