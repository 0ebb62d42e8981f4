"""Pallas fused PFB pre-sum (interpret mode) vs the XLA path and golden."""

import jax
import numpy as np
import pytest

from gpu_sdr_tpu import golden
from gpu_sdr_tpu.ops import cplx
from gpu_sdr_tpu.ops.pallas_pfb import _pick_bt, pfb_frames_fused
from gpu_sdr_tpu.ops.pfb import PFBConfig, pfb_frames, pfb_spare_init

RNG = np.random.default_rng(7)


def crandn(*shape):
    return (RNG.standard_normal(shape) +
            1j * RNG.standard_normal(shape)).astype(np.complex64)


@pytest.mark.parametrize("nfft,avg,blocks", [(64, 4, 3), (100, 2, 2),
                                             (128, 8, 2)])
def test_pallas_presum_matches_xla(nfft, avg, blocks):
    rate = nfft * 1000
    L = nfft * 24
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate)
    window = cfg.window()
    dft = cfg.dft()
    spare_a = pfb_spare_init(cfg)
    spare_b = pfb_spare_init(cfg)
    fn_a = jax.jit(lambda s, x: pfb_frames(cfg, window, dft, s, x))
    fn_b = jax.jit(lambda s, x: pfb_frames_fused(cfg, window, dft, s, x,
                                                 interpret=True))
    for _ in range(blocks):
        xb = cplx.from_np(crandn(L))
        spare_a, fa = fn_a(spare_a, xb)
        spare_b, fb = fn_b(spare_b, xb)
        assert np.allclose(cplx.to_np(fa), cplx.to_np(fb), atol=1e-4)
        assert np.allclose(np.asarray(spare_a.re), np.asarray(spare_b.re))


def test_pallas_presum_matches_golden_stream():
    nfft, avg, rate = 64, 4, 64_000
    L = nfft * 32
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate)
    window = cfg.window()
    dft = cfg.dft()
    blocks = [crandn(L) for _ in range(3)]
    ref = golden.pfb_frames(np.concatenate(blocks), nfft, avg)
    spare = pfb_spare_init(cfg)
    outs = []
    for b in blocks:
        spare, fr = pfb_frames_fused(cfg, window, dft, spare,
                                     cplx.from_np(b), interpret=True)
        outs.append(cplx.to_np(fr))
    out = np.concatenate(outs, axis=0)
    skip = avg - 1
    n = min(len(ref), len(out) - skip)
    assert golden.snr_db(ref[:n], out[skip:skip + n]) > 90.0


def test_pick_bt():
    # divisor of nframes, %8==0, 32-aligned preferred, VMEM-capped
    assert _pick_bt(4000, 1000) == 160
    assert _pick_bt(24, 64) == 24
    bt = _pick_bt(4096, 1024)
    assert 4096 % bt == 0 and bt % 32 == 0
    assert _pick_bt(25, 64) == 0        # no multiple-of-8 divisor
