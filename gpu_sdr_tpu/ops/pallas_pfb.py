"""Pallas TPU kernel: single-pass PFB windowed pre-sum.

The XLA pre-sum in ops/pfb.pfb_frames —

    pre = sum_i X[i:i+ft, :] * W[i]       (avg shifted, scaled adds)

— is the most expensive stage of the whole TONES chain on TPU: measured at
the headline config it costs MORE than the two-stage DFT matmul that
follows (XLA executes the shifted-slice add chain as multiple HBM passes,
~9x off bandwidth speed-of-light).  This kernel computes the same pre-sum
in ONE pass: each grid step holds a (bt, nfft) tile of X in VMEM plus the
avg-1 following rows (the inter-tile halo, staged as a tiny side input so
no BlockSpec overlaps), multiplies by the window rows and accumulates —
one HBM read of the block, one write of the pre-sum.

The DFT stays in XLA: at nfft ~ 1000 the two-stage Cooley-Tukey matmul
(~n1+n2 MACs/sample) beats any in-kernel dense DFT (nfft MACs/sample) on
FLOPs alone, so fusing it here would lose.  (Replaces the reference's
polyphase_filter CUDA kernel, cpp/kernels.cu:474-516, which has the same
one-pass structure per output point.)

`pfb_frames_fused` is a drop-in for ops/pfb.pfb_frames; it falls back to
the XLA path when the geometry doesn't tile (or off-TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .cplx import C
from .pfb import PFBConfig, pfb_frames


_HALO_PAD = 8   # Mosaic block sublane granularity: halo rows padded to 8


def _kernel(avg: int, bt: int, ar_ref, ai_ref, hr_ref, hi_ref, w_ref,
            or_ref, oi_ref):
    """One (bt, nfft) output tile.  a: rows [r*bt, (r+1)*bt) of X;
    h: the avg-1 rows following the tile (padded to _HALO_PAD);
    w: (avg, nfft) window rows."""
    ar = ar_ref[:]
    ai = ai_ref[:]
    w = w_ref[:]
    out_r = ar * w[0][None, :]
    out_i = ai * w[0][None, :]
    for i in range(1, avg):
        # rows i..i+bt of the extended tile = concat(a[i:], h[:i])
        rr = jnp.concatenate([ar[i:], hr_ref[:i]], axis=0)
        ri = jnp.concatenate([ai[i:], hi_ref[:i]], axis=0)
        out_r = out_r + rr * w[i][None, :]
        out_i = out_i + ri * w[i][None, :]
    or_ref[:] = out_r
    oi_ref[:] = out_i


def _pick_bt(nframes: int, target: int = 256) -> int:
    """Largest divisor of nframes <= target that is a multiple of 8 (the
    Mosaic sublane granularity).  target=256 keeps the double-buffered
    in+out tiles (4 x bt x nfft x 4B) near 4 MB at nfft ~ 1000 —
    comfortable in 16 MB VMEM.  Returns 0 when no such tiling exists
    (callers fall back to the XLA path)."""
    bt = 0
    for d in range(1, int(np.sqrt(nframes)) + 1):
        if nframes % d == 0:
            for c in (d, nframes // d):
                if c <= target and c % 8 == 0 and c > bt:
                    bt = c
    return bt


def pallas_presum(window2d: jax.Array, X: C, nframes: int,
                  bt: int | None = None,
                  interpret: bool | None = None) -> C:
    """pre[t, b] = sum_i X[t+i, b] * window2d[i, b] for t < nframes.

    X: (nframes + avg - 1, nfft) pair; window2d: (avg, nfft).
    interpret=None auto-selects interpret mode off-TPU (CPU Pallas only
    runs interpreted), so gated callers work on any backend."""
    import jax.experimental.pallas as pl

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    avg, nfft = window2d.shape
    ftot = X.shape[0]
    assert ftot == nframes + avg - 1
    if bt is None:
        bt = _pick_bt(nframes)
    assert bt and nframes % bt == 0 and bt % 8 == 0
    nr = nframes // bt
    assert avg - 1 <= _HALO_PAD, "halo rows must fit in the padded tile"

    # inter-tile halo rows, padded to _HALO_PAD per tile:
    # h[r, j] = X[(r+1)*bt + j] for j < avg-1 (pad rows clamped, unused)
    idx = ((np.arange(nr)[:, None] + 1) * bt +
           np.arange(_HALO_PAD)[None, :]).reshape(-1)
    idx = np.minimum(idx, ftot - 1)
    idx_arr = jnp.asarray(idx.astype(np.int32))
    hr = jnp.take(X.re, idx_arr, axis=0)
    hi = jnp.take(X.im, idx_arr, axis=0)

    kernel = functools.partial(_kernel, avg, bt)
    out_shape = (jax.ShapeDtypeStruct((nframes, nfft), X.re.dtype),
                 jax.ShapeDtypeStruct((nframes, nfft), X.re.dtype))
    o_re, o_im = pl.pallas_call(
        kernel,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec((bt, nfft), lambda r: (r, 0)),        # a re
            pl.BlockSpec((bt, nfft), lambda r: (r, 0)),        # a im
            pl.BlockSpec((_HALO_PAD, nfft), lambda r: (r, 0)),  # halo re
            pl.BlockSpec((_HALO_PAD, nfft), lambda r: (r, 0)),  # halo im
            pl.BlockSpec((avg, nfft), lambda r: (0, 0)),       # window
        ],
        out_specs=(
            pl.BlockSpec((bt, nfft), lambda r: (r, 0)),
            pl.BlockSpec((bt, nfft), lambda r: (r, 0)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(X.re, X.im, hr, hi, window2d)
    return C(o_re, o_im)


def pfb_frames_fused(cfg: PFBConfig, window: jax.Array, dft, spare: C,
                     x: C, bt: int | None = None,
                     interpret: bool | None = None):
    """Drop-in for ops/pfb.pfb_frames with the Pallas pre-sum.

    Same signature/semantics: (new_spare, frames)."""
    from . import cplx
    nfft, avg = cfg.nfft, cfg.avg
    L = x.shape[0]
    nframes = L // nfft
    bt_eff = bt if bt is not None else _pick_bt(nframes)
    if (not spare.shape[0] or not bt_eff or avg - 1 > _HALO_PAD or
            avg - 1 > bt_eff):
        # no carry (avg==1) / untileable geometry: XLA path
        return pfb_frames(cfg, window, dft, spare, x)
    bt = bt_eff
    ze = cplx.concat([spare, x])
    X = ze.reshape(nframes + avg - 1, nfft)
    W = window.reshape(avg, nfft)
    pre = pallas_presum(W, X, nframes, bt=bt, interpret=interpret)
    frames = dft(pre)
    new_spare = ze[L:]
    return new_spare, frames
