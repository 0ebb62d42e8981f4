"""Pallas TPU kernel: single-pass PFB windowed pre-sum.

The XLA pre-sum in ops/pfb.pfb_frames —

    pre = sum_i X[i:i+ft, :] * W[i]       (avg shifted, scaled adds)

— is the most expensive stage of the whole TONES chain on TPU: measured at
the headline config it costs MORE than the two-stage DFT matmul that
follows (XLA executes the shifted-slice add chain as multiple HBM passes,
~9x off bandwidth speed-of-light).  This kernel computes the same pre-sum
in ONE pass: each grid step holds a (bt, nfft) tile of the raw block in
VMEM plus the avg-1 rows PRECEDING the tile (the inter-tile halo, staged
as a tiny side input so no BlockSpec overlaps; tile 0's halo is the
carried spare), multiplies by the window rows and accumulates — one HBM
read of the block, one write of the pre-sum.  Feeding the raw block
directly (rather than concat([spare, x]), which costs a full extra HBM
round trip) measured +9% end-to-end at the headline config.

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


def _kernel(avg: int, bt: int, ar_ref, ai_ref, lr_ref, li_ref, w_ref,
            or_ref, oi_ref):
    """One (bt, nfft) output tile.  a: raw rows [r*bt, (r+1)*bt);
    l: the avg-1 rows preceding the tile (padded to _HALO_PAD; the last
    avg-1 of the padded rows are the real ones); w: (avg, nfft) windows.

    Frame t of the tile spans ext[t : t+avg) where
    ext = concat(l[-(avg-1):], a); term i of the window sum is
    ext[i : i+bt] = concat(l[pad+i-(avg-1):], a[: bt-(avg-1-i)])."""
    a_r = ar_ref[:]
    a_i = ai_ref[:]
    w = w_ref[:]
    out_r = a_r * w[avg - 1][None, :]
    out_i = a_i * w[avg - 1][None, :]
    lead = avg - 1
    for i in range(lead):
        k = lead - i                       # rows taken from the lead halo
        rr = jnp.concatenate(
            [lr_ref[_HALO_PAD - k:], a_r[:bt - k]], axis=0)
        ri = jnp.concatenate(
            [li_ref[_HALO_PAD - k:], a_i[:bt - k]], axis=0)
        out_r = out_r + rr * w[i][None, :]
        out_i = out_i + ri * w[i][None, :]
    or_ref[:] = out_r
    oi_ref[:] = out_i


def _pick_bt(nframes: int, nfft: int = 1000) -> int:
    """Tile height: a divisor of nframes, multiple of 8 (Mosaic sublane
    granularity), small enough that the double-buffered in+out tiles
    (2 x 4 x bt x nfft x 4B) stay within ~12 MB of the 16 MB VMEM scoped
    limit.  Measured on chip (tools/perf_bt_sweep.py, nfft=1000):
    32-aligned tiles stream best (bt=160: 126 us/blk vs bt=200: 143),
    so prefer the largest 32-aligned candidate, then 16-, then 8-aligned.
    Returns 0 when no tiling exists (callers fall back to XLA)."""
    from .pallas_ddc import pick_tile
    return pick_tile(nframes, (12 * 2 ** 20) // (32 * max(nfft, 1)))


def pallas_presum(window2d: jax.Array, spare: C, X: C,
                  bt: int | None = None,
                  interpret: bool | None = None) -> C:
    """pre[t, b] = sum_i ext[t+i, b] * window2d[i, b] for t < nframes,
    with ext = concat(spare, X) — computed WITHOUT materializing ext.

    X: (nframes, nfft) raw rows; spare: (avg-1, nfft) carried rows;
    window2d: (avg, nfft).
    interpret=None auto-selects interpret mode off-TPU (CPU Pallas only
    runs interpreted), so gated callers work on any backend."""
    import jax.experimental.pallas as pl

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    avg, nfft = window2d.shape
    nframes = X.shape[0]
    lead = avg - 1
    assert spare.shape == (lead, nfft)
    if bt is None:
        bt = _pick_bt(nframes, nfft)
    assert bt and nframes % bt == 0 and bt % 8 == 0
    nr = nframes // bt
    assert lead <= _HALO_PAD, "halo rows must fit in the padded tile"
    assert lead <= bt

    # leading halo rows, padded to _HALO_PAD per tile, real rows LAST:
    # l[r, _HALO_PAD-k+j] = ext[r*bt - k + j] — tile 0 takes the spare,
    # tile r>0 takes the last `lead` rows of the previous tile of X.
    idx = ((np.arange(1, nr)[:, None]) * bt - lead +
           np.arange(_HALO_PAD)[None, :] - (_HALO_PAD - lead))
    idx = np.maximum(idx.reshape(-1), 0)
    idx_arr = jnp.asarray(idx.astype(np.int32))
    pad = jnp.zeros((_HALO_PAD - lead, nfft), X.re.dtype)
    l0_r = jnp.concatenate([pad, spare.re], axis=0)
    l0_i = jnp.concatenate([pad, spare.im], axis=0)
    lr = jnp.concatenate([l0_r, jnp.take(X.re, idx_arr, axis=0)], axis=0)
    li = jnp.concatenate([l0_i, jnp.take(X.im, idx_arr, axis=0)], axis=0)

    kernel = functools.partial(_kernel, avg, bt)
    out_shape = (jax.ShapeDtypeStruct((nframes, nfft), X.re.dtype),
                 jax.ShapeDtypeStruct((nframes, nfft), X.re.dtype))
    o_re, o_im = pl.pallas_call(
        kernel,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec((bt, nfft), lambda r: (r, 0)),        # a re
            pl.BlockSpec((bt, nfft), lambda r: (r, 0)),        # a im
            pl.BlockSpec((_HALO_PAD, nfft), lambda r: (r, 0)),  # lead re
            pl.BlockSpec((_HALO_PAD, nfft), lambda r: (r, 0)),  # lead im
            pl.BlockSpec((avg, nfft), lambda r: (0, 0)),       # window
        ],
        out_specs=(
            pl.BlockSpec((bt, nfft), lambda r: (r, 0)),
            pl.BlockSpec((bt, nfft), lambda r: (r, 0)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(X.re, X.im, lr, li, window2d)
    return C(o_re, o_im)


def pfb_frames_fused(cfg: PFBConfig, window: jax.Array, dft, spare: C,
                     x: C, bt: int | None = None,
                     interpret: bool | None = None):
    """Drop-in for ops/pfb.pfb_frames with the Pallas pre-sum.

    Same signature/semantics: (new_spare, frames)."""
    nfft, avg = cfg.nfft, cfg.avg
    L = x.shape[0]
    nframes = L // nfft
    bt_eff = bt if bt is not None else _pick_bt(nframes, nfft)
    H = (avg - 1) * nfft
    if (not spare.shape[0] or not bt_eff or avg - 1 > _HALO_PAD or
            avg - 1 > bt_eff or H > L):
        # no carry (avg==1) / untileable geometry: XLA path
        return pfb_frames(cfg, window, dft, spare, x)
    bt = bt_eff
    X = x.reshape(nframes, nfft)
    S = spare.reshape(avg - 1, nfft)
    W = window.reshape(avg, nfft)
    pre = pallas_presum(W, S, X, bt=bt, interpret=interpret)
    frames = dft(pre)
    new_spare = x[L - H:]
    return new_spare, frames


def _kernel_at(avg: int, bt: int, idx_ref, val_ref, ar_ref, ai_ref,
               lr_ref, li_ref, w_ref, or_ref, oi_ref):
    """Replay variant of _kernel: the tile's leading halo is the 8-row
    unit of the RECORDING preceding it (the previous stream block's tail
    lives in the recording; wraps at the loop seam), zeroed on the
    stream's very first tile via val."""
    import jax.experimental.pallas as pl
    pid = pl.program_id(0)
    v = jnp.where(pid == 0, val_ref[0].astype(jnp.float32),
                  jnp.float32(1.0))
    a_r = ar_ref[:]
    a_i = ai_ref[:]
    w = w_ref[:]
    out_r = a_r * w[avg - 1][None, :]
    out_i = a_i * w[avg - 1][None, :]
    lead = avg - 1
    for i in range(lead):
        k = lead - i
        rr = jnp.concatenate(
            [lr_ref[_HALO_PAD - k:] * v, a_r[:bt - k]], axis=0)
        ri = jnp.concatenate(
            [li_ref[_HALO_PAD - k:] * v, a_i[:bt - k]], axis=0)
        out_r = out_r + rr * w[i][None, :]
        out_i = out_i + ri * w[i][None, :]
    or_ref[:] = out_r
    oi_ref[:] = out_i


def pallas_presum_at(window2d: jax.Array, X_full: C, blk_idx: jax.Array,
                     valid: jax.Array, frames_pb: int,
                     bt: int | None = None,
                     interpret: bool | None = None) -> C:
    """Pre-sum of ONE stream block read in place from a recording.

    X_full: (total_frames, nfft) recording view (total_frames a multiple
    of frames_pb); blk_idx: int32 scalar block index (scalar-prefetched
    into the BlockSpec index maps — no dynamic_slice copy); valid: int32
    scalar, 0 zeroes the leading halo (stream start).  The halo rows are
    the recording rows preceding the block, wrapping at the loop seam.
    Returns pre (frames_pb, nfft)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    avg, nfft = window2d.shape
    lead = avg - 1
    total_frames = X_full.shape[0]
    if bt is None:
        bt = _pick_bt(frames_pb, nfft)
    assert bt and frames_pb % bt == 0 and bt % _HALO_PAD == 0
    assert 0 < lead <= _HALO_PAD
    nr = frames_pb // bt
    nunits = total_frames // _HALO_PAD
    runit = bt // _HALO_PAD

    a_map = lambda r, i, v: (i[0] * nr + r, 0)
    halo_map = lambda r, i, v: (((i[0] * nr + r) * runit - 1) % nunits, 0)
    const2 = lambda r, i, v: (0, 0)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec((bt, nfft), a_map),
            pl.BlockSpec((bt, nfft), a_map),
            pl.BlockSpec((_HALO_PAD, nfft), halo_map),
            pl.BlockSpec((_HALO_PAD, nfft), halo_map),
            pl.BlockSpec((avg, nfft), const2),
        ],
        out_specs=(pl.BlockSpec((bt, nfft), lambda r, i, v: (r, 0)),
                   pl.BlockSpec((bt, nfft), lambda r, i, v: (r, 0))),
    )
    kernel = functools.partial(_kernel_at, avg, bt)
    o_re, o_im = pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=(jax.ShapeDtypeStruct((frames_pb, nfft), X_full.dtype),
                   jax.ShapeDtypeStruct((frames_pb, nfft), X_full.dtype)),
        interpret=interpret,
    )(jnp.asarray(blk_idx, jnp.int32).reshape(1),
      jnp.asarray(valid, jnp.int32).reshape(1),
      X_full.re, X_full.im, X_full.re, X_full.im, window2d)
    return C(o_re, o_im)
