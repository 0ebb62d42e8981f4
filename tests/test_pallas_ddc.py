"""Pallas fused DDC+FIR (interpret mode) vs the XLA path and golden."""

import jax
import numpy as np
import pytest

from gpu_sdr_tpu import golden
from gpu_sdr_tpu.ops import cplx
from gpu_sdr_tpu.ops.ddc import (DirectDDCConfig, ddc_carrier_init,
                                 ddc_carrier_step, direct_ddc_fir)
from gpu_sdr_tpu.ops.pallas_ddc import _pick_rows, ddc_fused

RNG = np.random.default_rng(11)


def crandn(n):
    return (RNG.standard_normal(n) +
            1j * RNG.standard_normal(n)).astype(np.complex64)


def _setup(rate, M, f, freqs, L):
    cfg = DirectDDCConfig(rate=rate, decim=M, pf_average=f,
                          freqs=freqs, phases=(0,) * len(freqs))
    hmod = cfg.modulated_taps()
    ramp = cfg.carrier_ramp(L // cfg.M)
    stepv = ddc_carrier_step(cfg, L)
    return cfg, hmod, ramp, stepv


@pytest.mark.parametrize("n_tones,M,f,L", [
    (7, 10, 4, 480),      # config-3-like shape, small
    (1, 10, 4, 480),      # single channel (config 1)
    (5, 16, 2, 512),      # short FIR
    (3, 8, 8, 1024),      # long overlap (f-1 = 7 halo rows)
])
def test_pallas_ddc_matches_xla_stream(n_tones, M, f, L):
    rate = 10_000
    freqs = tuple(int(x) for x in np.linspace(-rate // 3, rate // 3,
                                              n_tones))
    cfg, hmod, ramp, stepv = _setup(rate, M, f, freqs, L)
    pa = pb = ddc_carrier_init(cfg, L)
    ha = hb = cplx.zeros((cfg.f - 1) * cfg.M)
    fn_a = jax.jit(lambda p, h, x: direct_ddc_fir(
        hmod, ramp, stepv, cfg.rate, cfg.M, cfg.f, p, h, x))
    fn_b = jax.jit(lambda p, h, x: ddc_fused(
        hmod, ramp, stepv, cfg.rate, cfg.M, cfg.f, p, h, x,
        interpret=True))
    for _ in range(3):
        xb = cplx.from_np(crandn(L))
        pa, ha, ya = fn_a(pa, ha, xb)
        pb, hb, yb = fn_b(pb, hb, xb)
        assert np.array_equal(np.asarray(pa), np.asarray(pb))
        assert np.allclose(cplx.to_np(ha), cplx.to_np(hb))
        assert np.allclose(cplx.to_np(ya), cplx.to_np(yb), atol=2e-4)


def test_pallas_ddc_matches_golden_stream():
    """Multi-block continuity against the numpy DDC+FIR oracle."""
    rate, M, f, L = 10_000, 10, 4, 800
    freqs = (1000, -2500, 333)
    cfg, hmod, ramp, stepv = _setup(rate, M, f, freqs, L)
    blocks = [crandn(L) for _ in range(3)]
    gold = golden.GoldenDirectDemodulator(freqs, rate, M, f)
    ref = np.concatenate([gold(b) for b in blocks], axis=1)
    phase = ddc_carrier_init(cfg, L)
    hist = cplx.zeros((cfg.f - 1) * cfg.M)
    outs = []
    for b in blocks:
        phase, hist, y = ddc_fused(hmod, ramp, stepv, cfg.rate, cfg.M,
                                   cfg.f, phase, hist, cplx.from_np(b),
                                   interpret=True)
        outs.append(cplx.to_np(y).T)         # -> (C, nb)
    out = np.concatenate(outs, axis=1)
    assert out.shape == ref.shape
    assert golden.snr_db(ref, out) > 90.0


def test_pallas_ddc_tf32_split_precision():
    """The manual bf16 hi/lo split variant must sit at the framework's
    tensorfloat32 grade (~90 dB), far above a single bf16 pass (~49 dB)."""
    rate, M, f, L = 10_000, 10, 4, 960
    freqs = tuple(int(x) for x in np.linspace(-3000, 3000, 5))
    cfg, hmod, ramp, stepv = _setup(rate, M, f, freqs, L)
    phase = ddc_carrier_init(cfg, L)
    hist = cplx.zeros((cfg.f - 1) * cfg.M)
    xb = cplx.from_np(crandn(L))
    _, _, ya = direct_ddc_fir(hmod, ramp, stepv, cfg.rate, cfg.M, cfg.f,
                              phase, hist, xb)
    _, _, yb = ddc_fused(hmod, ramp, stepv, cfg.rate, cfg.M, cfg.f,
                         phase, hist, xb, interpret=True,
                         precision="tf32")
    a, b = cplx.to_np(ya), cplx.to_np(yb)
    assert golden.snr_db(a, b) > 85.0
    assert not np.allclose(a, b, atol=1e-6)   # really took the split path


def test_pallas_ddc_fallback_untileable():
    """Geometry that doesn't tile must fall back to the XLA path and
    still be exact."""
    rate, M, f, L = 10_000, 7, 4, 7 * 13   # nb = 13: no 8-aligned divisor
    freqs = (1000, -2500)
    cfg, hmod, ramp, stepv = _setup(rate, M, f, freqs, L)
    phase = ddc_carrier_init(cfg, L)
    hist = cplx.zeros((cfg.f - 1) * cfg.M)
    xb = cplx.from_np(crandn(L))
    pa, ha, ya = direct_ddc_fir(hmod, ramp, stepv, cfg.rate, cfg.M, cfg.f,
                                phase, hist, xb)
    pb, hb, yb = ddc_fused(hmod, ramp, stepv, cfg.rate, cfg.M, cfg.f,
                           phase, hist, xb)
    assert np.array_equal(np.asarray(pa), np.asarray(pb))
    assert np.allclose(cplx.to_np(ya), cplx.to_np(yb))


def test_pick_rows():
    assert _pick_rows(40_000, 100, 100) % 8 == 0
    assert 40_000 % _pick_rows(40_000, 100, 100) == 0
    assert _pick_rows(13, 7, 2) == 0
