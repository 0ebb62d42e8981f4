"""Pallas TPU kernel: the ENTIRE PFB channelizer stage in one HBM pass.

The round-1 chain ran four HBM round trips per block —

    presum kernel   (read x,   write pre)
    DFT stage 1     (read pre, write z)     n1-point matmul + twiddle
    DFT stage 2     (read z,   write Y)     n2-point matmul
    tone select     (read Y,   write y)

— ~64 B/sample of traffic, HBM-bound well below the chip's ceilings
(tools/rig_probe.py).  This kernel fuses the first three.  Everything is
laid out (frames, n1, n2) — for the (8, 125) split of nfft=1000 each
frame's n1=8 rows are exactly one Mosaic sublane tile, so every access
below is a leading-axis slice, a static middle-axis index, or a 2D
matmul; no lane-granular shuffles:

    presum   : pre[u] = sum_i W[i] * ext[u+i]        (leading-axis
               shifted multiply-adds on the VPU; ext = halo ++ tile)
    stage 1  : z_k1[u, b] = sum_a F1[a, k1] * pre[u, a, b]
               (n1 unrolled complex scalar * (bt, n2) adds, VPU)
    twiddle  : folded into the stage-2 constants: G_k1[b, k2] =
               W_N^{b*k1} * F2[b, k2] — zero runtime cost
    stage 2  : Y_k1 = z_k1 @ G_k1  (MXU; complex Karatsuba = 3 real
               matmuls, each a manual bf16 hi/lo split dot — the
               tensorfloat32 product set; Mosaic lowers DEFAULT only,
               see ops/pallas_ddc.split_dot)
    out      : out[u, k1, :] = Y_k1 — flattened, bin k = k1*n2 + k2:
               exactly ops/cplx.DFT.scrambled's layout, so tone
               selection keeps using DFT.scramble_index.

One read of the block + one write of the spectra: with the select that
is ~32 B/sample, half the round-1 traffic.  Replaces the reference
polyphase_filter + cufftExecC2C pair (cpp/kernels.cu:474-516,
cpp/USRP_demodulator.cpp:501).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cplx import C
from .pallas_ddc import hilo_split
from .pfb import PFBConfig, pfb_frames


def _np_hilo(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side bf16 hi/lo split of an f32 array."""
    import ml_dtypes
    hi = a.astype(ml_dtypes.bfloat16)
    lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def stage2_consts(n: int, n1: int, n2: int):
    """The per-k1 stage-2 matrices with the twiddle folded in:
    G_k1[b, k2] = exp(-2pi i b k1 / n) * exp(-2pi i b k2 / n2),
    returned as six (n1, n2, n2) bf16 arrays (re, im, re+im) x (hi, lo) —
    pre-split on the host so the kernel never re-splits resident
    constants."""
    b = np.arange(n2, dtype=np.float64)
    k2 = np.arange(n2, dtype=np.float64)
    k1 = np.arange(n1, dtype=np.float64)
    f2 = np.exp(-2j * np.pi * np.outer(b, k2) / n2)          # (b, k2)
    tw = np.exp(-2j * np.pi * np.outer(k1, b) / n)           # (k1, b)
    g = tw[:, :, None] * f2[None, :, :]                      # (k1, b, k2)
    gr = np.ascontiguousarray(g.real.astype(np.float32))
    gi = np.ascontiguousarray(g.imag.astype(np.float32))
    gs = gr + gi
    out = []
    for m in (gr, gi, gs):
        hi, lo = _np_hilo(m)
        out.append(jnp.asarray(hi))
        out.append(jnp.asarray(lo))
    return tuple(out)


def stage1_scalars(n1: int) -> np.ndarray:
    """F1[a, k1] = exp(-2pi i a k1 / n1), baked into the kernel as
    unrolled scalar literals."""
    a = np.arange(n1, dtype=np.float64)
    return np.exp(-2j * np.pi * np.outer(a, a) / n1)


def _cmul_acc(acc, xr, xi, cr, ci):
    """acc += (cr + i ci) * (xr + i xi) with exact-zero/one coefficient
    terms elided (the k1=0 row of F1 is all ones, half the a*k1 products
    hit +-1/+-i)."""
    ar, ai = acc

    def times(c, v):
        if c == 1.0:
            return v
        if c == -1.0:
            return -v
        return c * v

    tr = ti = None
    if cr != 0.0:
        tr = times(cr, xr)
        ti = times(cr, xi)
    if ci != 0.0:
        tr = -times(ci, xi) if tr is None else tr - times(ci, xi)
        ti = times(ci, xr) if ti is None else ti + times(ci, xr)
    if tr is None:
        return acc
    return (tr if ar is None else ar + tr,
            ti if ai is None else ai + ti)


def _kernel(avg: int, bt: int, n1: int, n2: int, F1: np.ndarray,
            ar_ref, ai_ref, lr_ref, li_ref, wr_ref,
            grh_ref, grl_ref, gih_ref, gil_ref, gsh_ref, gsl_ref,
            or_ref, oi_ref):
    """One (bt, n1, n2) tile of frame spectra in scrambled order.

    a: raw frames [r*bt, (r+1)*bt) as (bt, n1, n2); l: the avg-1 frames
    preceding the tile; w: (avg, n1, n2) window; g*: stage-2 constants.
    """
    lead = avg - 1
    ext_r = jnp.concatenate([lr_ref[:], ar_ref[:]], axis=0)
    ext_i = jnp.concatenate([li_ref[:], ai_ref[:]], axis=0)
    w = wr_ref[:]
    pre_r = ext_r[lead:] * w[lead][None]
    pre_i = ext_i[lead:] * w[lead][None]
    for i in range(lead):
        pre_r = pre_r + ext_r[i:i + bt] * w[i][None]
        pre_i = pre_i + ext_i[i:i + bt] * w[i][None]

    d = functools.partial(jnp.dot, precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)
    for k1 in range(n1):
        # stage 1: z_k1 = sum_a F1[a, k1] * pre[:, a, :]
        acc = (None, None)
        for a in range(n1):
            acc = _cmul_acc(acc, pre_r[:, a, :], pre_i[:, a, :],
                            float(F1[a, k1].real), float(F1[a, k1].imag))
        z_r, z_i = acc
        # stage 2 on the MXU: Y_k1 = z_k1 @ G_k1 (Karatsuba, split dots)
        zr_hi, zr_lo = hilo_split(z_r)
        zi_hi, zi_lo = hilo_split(z_i)
        zs_hi, zs_lo = hilo_split(z_r + z_i)
        rr = (d(zr_hi, grh_ref[k1]) + d(zr_hi, grl_ref[k1]) +
              d(zr_lo, grh_ref[k1]))
        ii = (d(zi_hi, gih_ref[k1]) + d(zi_hi, gil_ref[k1]) +
              d(zi_lo, gih_ref[k1]))
        ss = (d(zs_hi, gsh_ref[k1]) + d(zs_hi, gsl_ref[k1]) +
              d(zs_lo, gsh_ref[k1]))
        or_ref[:, k1, :] = rr - ii
        oi_ref[:, k1, :] = ss - rr - ii


def _pick_bt(nframes: int, nfft: int) -> int:
    """Tile height in FRAMES: a divisor of nframes sized so the working
    set (raw + ext + pre-sum + output tiles + per-k1 temporaries, double
    buffered) stays inside the 16 MB scoped-VMEM limit — measured ~0.13
    MB/frame at nfft=1000, so cap ~80 frames.  The frame axis is untiled
    (each frame is a whole sublane group), so any divisor works."""
    cap = max(1, (2500 * 1024) // (32 * max(nfft, 1)))
    best = 0
    for d in range(1, nframes + 1):
        if nframes % d == 0 and d <= cap:
            best = d
    return best


def _pick_bt_t(nframes: int, nfft: int, n2: int | None = None) -> int:
    """Tile height for the transposed kernel: bt rides the sublane axis,
    so it must be a multiple of 8 — or equal to the whole frame count
    (a block that spans the full array dimension is always legal).

    With `n2` (the DFT split's lane factor), the VMEM budget counts the
    PADDED lane width — an (n1, bt, n2) tile with n2 < 128 physically
    occupies n1*bt*128 lanes, up to 16x the logical bytes (a small-nfft
    on-chip replay OOM'd scoped VMEM before this, round 5)."""
    phys = max(nfft, 1)
    if n2 is not None and n2 > 0:
        # budget constant chosen so the production nfft=1000 (n2=125 ->
        # phys 1024) geometry keeps its measured bt=80
        phys = (max(nfft, 1) // n2) * (-(-n2 // 128) * 128)
        cap = max(1, (2560 * 1024) // (32 * phys))
    else:
        cap = max(1, (2500 * 1024) // (32 * phys))
    best = 0
    for d in range(1, nframes + 1):
        if nframes % d == 0 and d <= cap and d % 8 == 0:
            best = d
    if best == 0 and nframes <= cap:
        best = nframes
    return best


def can_fuse_channelizer(cfg: PFBConfig, dft, block_len: int) -> bool:
    """Needs a two-stage split with a small first factor (the stage-1
    unroll is n1^2 scalar terms) and a tileable geometry."""
    if getattr(dft, "split", None) is None:
        return False
    n1, _ = dft.split
    if not (2 <= n1 <= 16):
        return False
    if block_len % cfg.nfft != 0:
        return False
    nframes = block_len // cfg.nfft
    n2 = dft.split[1]
    return (_pick_bt(nframes, cfg.nfft) > 0 and
            _pick_bt_t(nframes, cfg.nfft, n2) > 0 and cfg.avg >= 2)


def channelizer_frames(cfg: PFBConfig, window: jax.Array, dft, spare: C,
                       x: C, bt: int | None = None,
                       interpret: bool | None = None):
    """Fused drop-in for pfb_frames + dft.scrambled:

        new_spare, frames = channelizer_frames(cfg, window, dft, spare, x)

    frames[t, k1*n2 + k2] is the frame-t spectrum in the scrambled
    Cooley-Tukey order (bin k lives at dft.scramble_index(k)).  Falls
    back to the XLA path (re-ordered to match) when the geometry doesn't
    tile or off-TPU without interpret."""
    import jax.experimental.pallas as pl

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    nfft, avg = cfg.nfft, cfg.avg
    L = x.shape[0]
    if not can_fuse_channelizer(cfg, dft, L) or spare.shape[0] == 0:
        spare, frames = pfb_frames(cfg, window, dft, spare, x)
        if getattr(dft, "split", None) is not None:
            idx = jnp.asarray(dft.scramble_index(np.arange(nfft)))
            inv = jnp.zeros(nfft, jnp.int32).at[idx].set(
                jnp.arange(nfft, dtype=jnp.int32))
            frames = C(jnp.take(frames.re, inv, axis=-1),
                       jnp.take(frames.im, inv, axis=-1))
        return spare, frames

    n1, n2 = dft.split
    nframes = L // nfft
    if bt is None:
        bt = _pick_bt(nframes, nfft)
    lead = avg - 1
    nr = nframes // bt

    X3 = x.reshape(nframes, n1, n2)
    S3 = spare.reshape(lead, n1, n2)
    W3 = window.reshape(avg, n1, n2)

    # leading halo frames per tile (tile 0: the carried spare; tile r>0:
    # the last `lead` frames of tile r-1), staged as a side input
    idx = (np.arange(1, nr)[:, None] * bt - lead +
           np.arange(lead)[None, :]).reshape(-1)
    idx_arr = jnp.asarray(idx.astype(np.int32))
    lr = jnp.concatenate([S3.re, jnp.take(X3.re, idx_arr, axis=0)], axis=0)
    li = jnp.concatenate([S3.im, jnp.take(X3.im, idx_arr, axis=0)], axis=0)

    g6 = stage2_consts(nfft, n1, n2)
    F1 = stage1_scalars(n1)
    kernel = functools.partial(_kernel, avg, bt, n1, n2, F1)
    const3 = lambda r: (0, 0, 0)
    o_re, o_im = pl.pallas_call(
        kernel,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec((bt, n1, n2), lambda r: (r, 0, 0)),    # a re
            pl.BlockSpec((bt, n1, n2), lambda r: (r, 0, 0)),    # a im
            pl.BlockSpec((lead, n1, n2), lambda r: (r, 0, 0)),  # halo re
            pl.BlockSpec((lead, n1, n2), lambda r: (r, 0, 0)),  # halo im
            pl.BlockSpec((avg, n1, n2), const3),                # window
        ] + [pl.BlockSpec((n1, n2, n2), const3)] * 6,           # stage-2 G
        out_specs=(
            pl.BlockSpec((bt, n1, n2), lambda r: (r, 0, 0)),
            pl.BlockSpec((bt, n1, n2), lambda r: (r, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nframes, n1, n2), x.re.dtype),
            jax.ShapeDtypeStruct((nframes, n1, n2), x.re.dtype),
        ),
        interpret=interpret,
    )(X3.re, X3.im, lr, li, W3, *g6)
    new_spare = x[L - lead * nfft:]
    return new_spare, C(o_re.reshape(nframes, nfft),
                        o_im.reshape(nframes, nfft))


# ----------------------------------------------------------------------
# Transposed-layout variant: x arrives as (n1, T, n2)
# ----------------------------------------------------------------------
#
# In the (T, n1, n2) layout above, stage 1 needs 64 sublane selects
# (pre[:, a, :]) per tile — measured ~0.5 ms/block, the kernel's
# dominant cost.  Transposing to (n1, T, n2) makes the stage-1 chunk
# pre[a] a FREE leading-axis view; the presum's window shifts move to
# the (sublane) middle axis, where avg-1 = 3 shifted slices per tile are
# cheap.  The output lands as (n1_k1, T, n2_k2): bin k of frame t lives
# at [k % n1, t, k // n1] (select_tones_t), and the producer supplies x
# transposed (free for the synthesis bench; one XLA pass for replay).


_HALO_T = 8   # Mosaic sublane granularity: halo frames padded to 8


def _kernel_t(avg: int, bt: int, n1: int, n2: int, F1: np.ndarray,
              const_x: bool,
              ar_ref, ai_ref, lr_ref, li_ref, wr_ref,
              grh_ref, grl_ref, gih_ref, gil_ref, gsh_ref, gsl_ref,
              or_ref, oi_ref):
    """One (n1, bt, n2) tile of frame spectra, transposed-scrambled.
    The halo tile carries _HALO_T frames with the real avg-1 LAST.
    const_x: the raw tile is ONE frame (n1, 1, n2) broadcast across bt —
    a bin-quantized comb is nfft-periodic, so the block never needs to
    exist in HBM (the reference's TONES wavetable trick)."""
    lead = avg - 1
    if const_x:
        a_r = jnp.broadcast_to(ar_ref[:], (n1, bt, n2))
        a_i = jnp.broadcast_to(ai_ref[:], (n1, bt, n2))
    else:
        a_r = ar_ref[:]
        a_i = ai_ref[:]
    ext_r = jnp.concatenate([lr_ref[:, _HALO_T - lead:, :], a_r], axis=1)
    ext_i = jnp.concatenate([li_ref[:, _HALO_T - lead:, :], a_i], axis=1)
    w = wr_ref[:]                                  # (n1, avg, n2)
    pre_r = ext_r[:, lead:, :] * w[:, lead:lead + 1, :]
    pre_i = ext_i[:, lead:, :] * w[:, lead:lead + 1, :]
    for i in range(lead):
        pre_r = pre_r + ext_r[:, i:i + bt, :] * w[:, i:i + 1, :]
        pre_i = pre_i + ext_i[:, i:i + bt, :] * w[:, i:i + 1, :]

    d = functools.partial(jnp.dot, precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)
    for k1 in range(n1):
        acc = (None, None)
        for a in range(n1):
            acc = _cmul_acc(acc, pre_r[a], pre_i[a],
                            float(F1[a, k1].real), float(F1[a, k1].imag))
        z_r, z_i = acc
        zr_hi, zr_lo = hilo_split(z_r)
        zi_hi, zi_lo = hilo_split(z_i)
        zs_hi, zs_lo = hilo_split(z_r + z_i)
        rr = (d(zr_hi, grh_ref[k1]) + d(zr_hi, grl_ref[k1]) +
              d(zr_lo, grh_ref[k1]))
        ii = (d(zi_hi, gih_ref[k1]) + d(zi_hi, gil_ref[k1]) +
              d(zi_lo, gih_ref[k1]))
        ss = (d(zs_hi, gsh_ref[k1]) + d(zs_hi, gsl_ref[k1]) +
              d(zs_lo, gsh_ref[k1]))
        or_ref[k1] = rr - ii
        oi_ref[k1] = ss - rr - ii


def transpose_block(x: C, nfft: int, n1: int, n2: int) -> C:
    """(L,) stream -> (n1, T, n2) kernel layout (one XLA pass)."""
    T = x.shape[0] // nfft
    return C(x.re.reshape(T, n1, n2).transpose(1, 0, 2),
             x.im.reshape(T, n1, n2).transpose(1, 0, 2))


def natural_frames_t(frames_t: C) -> C:
    """Un-scramble transposed frames to natural bin order: (n1, T, n2)
    -> (T, nfft).  A pure transpose — bin k = k2*n1 + k1 sits at
    [k1, t, k2], so natural order is transpose(1, 2, 0) flattened."""
    T = frames_t.shape[1]
    return C(frames_t.re.transpose(1, 2, 0).reshape(T, -1),
             frames_t.im.transpose(1, 2, 0).reshape(T, -1))


def select_tones_t(frames_t: C, bins, n1: int, n2: int) -> C:
    """Select bins from transposed-scrambled frames: (n1, T, n2) ->
    (T, n_tones); bin k sits at [k % n1, :, k // n1].

    When the bins are ALL nfft bins in consecutive (mod nfft) order —
    the full-band comb / full-spectrum case — selection is a dense
    transpose + lane roll instead of a 1000-point gather."""
    nfft = n1 * n2
    b = np.asarray(bins, dtype=np.int64)
    if len(b) == nfft and np.array_equal((b - b[0]) % nfft,
                                         np.arange(nfft)):
        nat = natural_frames_t(frames_t)
        s = int(b[0]) % nfft
        if s == 0:
            return nat
        return C(jnp.roll(nat.re, -s, axis=1),
                 jnp.roll(nat.im, -s, axis=1))
    k1 = jnp.asarray((b % n1).astype(np.int32))
    k2 = jnp.asarray((b // n1).astype(np.int32))
    return C(frames_t.re[k1, :, k2].T, frames_t.im[k1, :, k2].T)


def channelizer_frames_t(cfg: PFBConfig, window: jax.Array, dft,
                         spare_t: C, x_t: C, bt: int | None = None,
                         interpret: bool | None = None,
                         nframes: int | None = None):
    """Fused channelizer on transposed blocks.

        new_spare_t, frames_t = channelizer_frames_t(cfg, window, dft,
                                                     spare_t, x_t)

    x_t: (n1, T, n2) block (transpose_block); spare_t: (n1, avg-1, n2)
    carried frames; frames_t: (n1, T, n2) transposed-scrambled spectra
    (select with select_tones_t).  Requires can_fuse_channelizer.

    When x_t is a SINGLE frame (n1, 1, n2) and `nframes` is given, the
    frame is broadcast across the block inside the kernel — an
    nfft-periodic (bin-quantized) comb never needs its block in HBM
    (the reference's TONES wavetable trick)."""
    import jax.experimental.pallas as pl

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    nfft, avg = cfg.nfft, cfg.avg
    n1, n2 = dft.split
    const_x = x_t.shape[1] == 1 and nframes is not None and nframes > 1
    nframes = x_t.shape[1] if not const_x else int(nframes)
    lead = avg - 1
    assert spare_t.shape == (n1, lead, n2)
    if bt is None:
        bt = _pick_bt_t(nframes, nfft, n2)
    assert bt and (bt % 8 == 0 or bt == nframes) and \
        nframes % bt == 0, (bt, nframes)
    nr = nframes // bt

    # leading halo frames per tile along the middle axis, padded to
    # _HALO_T frames per tile (Mosaic sublane granularity), real frames
    # LAST.  Built from `lead` strided slices (x_t[:, bt-lead+j::bt])
    # interleaved — a 3D-axis-1 jnp.take here trips an mlir
    # lowering-cache KeyError in this jax version, and strided slices
    # are cheaper anyway.
    assert lead <= _HALO_T <= bt
    dt = x_t.re.dtype

    def halos(xcomp, spcomp):
        pad0 = jnp.zeros((n1, _HALO_T - lead, n2), dt)
        pieces = [jnp.concatenate([pad0, spcomp], axis=1)]
        if nr > 1:
            cols = [xcomp[:, bt - lead + j:(nr - 1) * bt:bt, :]
                    for j in range(lead)]
            inter = jnp.stack(cols, axis=2)       # (n1, nr-1, lead, n2)
            zer = jnp.zeros((n1, nr - 1, _HALO_T - lead, n2), dt)
            inter = jnp.concatenate([zer, inter], axis=2)
            pieces.append(inter.reshape(n1, (nr - 1) * _HALO_T, n2))
        return jnp.concatenate(pieces, axis=1)

    if const_x:
        fr_r = jnp.broadcast_to(x_t.re, (n1, lead, n2))
        fr_i = jnp.broadcast_to(x_t.im, (n1, lead, n2))

        def halos_const(frame_b, spcomp):
            pad0 = jnp.zeros((n1, _HALO_T - lead, n2), dt)
            pieces = [jnp.concatenate([pad0, spcomp], axis=1)]
            if nr > 1:
                blockpad = jnp.concatenate([pad0, frame_b], axis=1)
                pieces.append(jnp.broadcast_to(
                    blockpad[:, None], (n1, nr - 1, _HALO_T, n2)
                ).reshape(n1, (nr - 1) * _HALO_T, n2))
            return jnp.concatenate(pieces, axis=1)

        lr = halos_const(fr_r, spare_t.re)
        li = halos_const(fr_i, spare_t.im)
    else:
        lr = halos(x_t.re, spare_t.re)
        li = halos(x_t.im, spare_t.im)

    # window in kernel layout: (n1, avg, n2); W[i] row for chunk a
    W_t = jnp.asarray(window).reshape(avg, n1, n2).transpose(1, 0, 2)

    g6 = stage2_consts(nfft, n1, n2)
    F1 = stage1_scalars(n1)
    kernel = functools.partial(_kernel_t, avg, bt, n1, n2, F1, const_x)
    const3 = lambda r: (0, 0, 0)
    a_spec = (pl.BlockSpec((n1, 1, n2), const3) if const_x
              else pl.BlockSpec((n1, bt, n2), lambda r: (0, r, 0)))
    o_re, o_im = pl.pallas_call(
        kernel,
        grid=(nr,),
        in_specs=[
            a_spec,                                             # a re
            a_spec,                                             # a im
            pl.BlockSpec((n1, _HALO_T, n2), lambda r: (0, r, 0)),  # halo
            pl.BlockSpec((n1, _HALO_T, n2), lambda r: (0, r, 0)),
            pl.BlockSpec((n1, avg, n2), const3),                # window
        ] + [pl.BlockSpec((n1, n2, n2), const3)] * 6,           # stage-2 G
        out_specs=(
            pl.BlockSpec((n1, bt, n2), lambda r: (0, r, 0)),
            pl.BlockSpec((n1, bt, n2), lambda r: (0, r, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n1, nframes, n2), x_t.re.dtype),
            jax.ShapeDtypeStruct((n1, nframes, n2), x_t.re.dtype),
        ),
        interpret=interpret,
    )(x_t.re, x_t.im, lr, li, W_t, *g6)
    if const_x:
        new_spare = C(jnp.broadcast_to(x_t.re, (n1, lead, n2)),
                      jnp.broadcast_to(x_t.im, (n1, lead, n2)))
    else:
        new_spare = C(x_t.re[:, nframes - lead:, :],
                      x_t.im[:, nframes - lead:, :])
    return new_spare, C(o_re, o_im)


def _kernel_t_at(avg: int, bt: int, n1: int, n2: int, F1: np.ndarray,
                 idx_ref, val_ref, ar_ref, ai_ref, lr_ref, li_ref,
                 wr_ref, grh_ref, grl_ref, gih_ref, gil_ref,
                 gsh_ref, gsl_ref, or_ref, oi_ref):
    """Replay variant of _kernel_t: the raw tile and its leading halo
    frames are read IN PLACE from the transposed resident recording via
    scalar-prefetched block indices (no dynamic_slice copy, no presum
    round trip).  The halo unit is the _HALO_T-frame unit preceding the
    tile in the recording (real frames LAST — the same layout the
    stacked-halo staging produces), wrapping at the loop seam; the
    stream's very first tile zeroes it via val (zero history)."""
    import jax.experimental.pallas as pl
    pid = pl.program_id(0)
    v = jnp.where(pid == 0, val_ref[0].astype(jnp.float32),
                  jnp.float32(1.0))
    lead = avg - 1
    a_r = ar_ref[:]
    a_i = ai_ref[:]
    ext_r = jnp.concatenate([lr_ref[:, _HALO_T - lead:, :] * v, a_r],
                            axis=1)
    ext_i = jnp.concatenate([li_ref[:, _HALO_T - lead:, :] * v, a_i],
                            axis=1)
    w = wr_ref[:]
    pre_r = ext_r[:, lead:, :] * w[:, lead:lead + 1, :]
    pre_i = ext_i[:, lead:, :] * w[:, lead:lead + 1, :]
    for i in range(lead):
        pre_r = pre_r + ext_r[:, i:i + bt, :] * w[:, i:i + 1, :]
        pre_i = pre_i + ext_i[:, i:i + bt, :] * w[:, i:i + 1, :]

    d = functools.partial(jnp.dot, precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)
    for k1 in range(n1):
        acc = (None, None)
        for a in range(n1):
            acc = _cmul_acc(acc, pre_r[a], pre_i[a],
                            float(F1[a, k1].real), float(F1[a, k1].imag))
        z_r, z_i = acc
        zr_hi, zr_lo = hilo_split(z_r)
        zi_hi, zi_lo = hilo_split(z_i)
        zs_hi, zs_lo = hilo_split(z_r + z_i)
        rr = (d(zr_hi, grh_ref[k1]) + d(zr_hi, grl_ref[k1]) +
              d(zr_lo, grh_ref[k1]))
        ii = (d(zi_hi, gih_ref[k1]) + d(zi_hi, gil_ref[k1]) +
              d(zi_lo, gih_ref[k1]))
        ss = (d(zs_hi, gsh_ref[k1]) + d(zs_hi, gsl_ref[k1]) +
              d(zs_lo, gsh_ref[k1]))
        or_ref[k1] = rr - ii
        oi_ref[k1] = ss - rr - ii


def _kernel_t_at_h(avg: int, bt: int, n1: int, n2: int, F1: np.ndarray,
                   idx_ref, val_ref, ar_ref, ai_ref, lr_ref, li_ref,
                   hsr_ref, hsi_ref, wr_ref,
                   grh_ref, grl_ref, gih_ref, gil_ref,
                   gsh_ref, gsl_ref, or_ref, oi_ref):
    """_kernel_t_at with a SECOND, staged halo source for the block's
    first tile: under a time-sharded mesh a shard's stream-preceding
    frames live on the neighbouring shard (or, for shard 0, in the
    previous block), so they cannot be read from the shard-local
    recording layout.  Tiles r > 0 keep the in-recording halo unit
    (stream-contiguous within the shard); tile r == 0 reads the
    per-block staged halo (precomputed host-side at upload, wrap
    included), zeroed by `val` at the stream start (zero history)."""
    import jax.experimental.pallas as pl
    pid = pl.program_id(0)
    first = pid == 0
    v = jnp.where(first, val_ref[0].astype(jnp.float32), jnp.float32(1.0))
    lead = avg - 1
    a_r = ar_ref[:]
    a_i = ai_ref[:]
    h_r = jnp.where(first, hsr_ref[:, _HALO_T - lead:, :],
                    lr_ref[:, _HALO_T - lead:, :]) * v
    h_i = jnp.where(first, hsi_ref[:, _HALO_T - lead:, :],
                    li_ref[:, _HALO_T - lead:, :]) * v
    ext_r = jnp.concatenate([h_r, a_r], axis=1)
    ext_i = jnp.concatenate([h_i, a_i], axis=1)
    w = wr_ref[:]
    pre_r = ext_r[:, lead:, :] * w[:, lead:lead + 1, :]
    pre_i = ext_i[:, lead:, :] * w[:, lead:lead + 1, :]
    for i in range(lead):
        pre_r = pre_r + ext_r[:, i:i + bt, :] * w[:, i:i + 1, :]
        pre_i = pre_i + ext_i[:, i:i + bt, :] * w[:, i:i + 1, :]

    d = functools.partial(jnp.dot, precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)
    for k1 in range(n1):
        acc = (None, None)
        for a in range(n1):
            acc = _cmul_acc(acc, pre_r[a], pre_i[a],
                            float(F1[a, k1].real), float(F1[a, k1].imag))
        z_r, z_i = acc
        zr_hi, zr_lo = hilo_split(z_r)
        zi_hi, zi_lo = hilo_split(z_i)
        zs_hi, zs_lo = hilo_split(z_r + z_i)
        rr = (d(zr_hi, grh_ref[k1]) + d(zr_hi, grl_ref[k1]) +
              d(zr_lo, grh_ref[k1]))
        ii = (d(zi_hi, gih_ref[k1]) + d(zi_hi, gil_ref[k1]) +
              d(zi_lo, gih_ref[k1]))
        ss = (d(zs_hi, gsh_ref[k1]) + d(zs_hi, gsl_ref[k1]) +
              d(zs_lo, gsh_ref[k1]))
        or_ref[k1] = rr - ii
        oi_ref[k1] = ss - rr - ii


def can_channelizer_at_halo(cfg: PFBConfig, dft, nframes: int,
                            total_frames: int) -> bool:
    """Shape gate for channelizer_frames_at_halo: the fused-kernel
    gates evaluated on the PER-SHARD geometry (nframes frames per block
    per shard, total_frames resident frames per shard)."""
    if getattr(dft, "split", None) is None:
        return False
    n1, n2 = dft.split
    if not (2 <= n1 <= 16):
        return False
    bt = _pick_bt_t(nframes, cfg.nfft, n2)
    return bool(bt and bt % _HALO_T == 0 and nframes % bt == 0 and
                total_frames % _HALO_T == 0 and
                0 < cfg.avg - 1 <= _HALO_T)


def channelizer_frames_at_halo(cfg: PFBConfig, window: jax.Array, dft,
                               Xt_loc: C, Hs_loc: C, blk_idx: jax.Array,
                               valid: jax.Array, nframes: int,
                               bt: int | None = None,
                               interpret: bool | None = None) -> C:
    """channelizer_frames_at over a SHARD-LOCAL transposed recording
    whose stream-preceding frames (for the block's first tile) are
    supplied as a staged per-block halo array.

    Xt_loc: (n1, nblk*nframes, n2) shard-local resident recording
    (block b's shard span at frames [b*nframes, (b+1)*nframes));
    Hs_loc: (n1, nblk*_HALO_T, n2) staged halo units, one per block,
    each holding the _HALO_T stream frames preceding the shard's span
    (real frames LAST, loop wrap precomputed); blk_idx / valid: int32
    scalars (valid 0 zeroes the stream-start halo — pass 0 only on the
    shard owning the stream's first frame).  Returns frames_t
    (n1, nframes, n2), transposed-scrambled (select with
    select_tones_t)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    nfft, avg = cfg.nfft, cfg.avg
    n1, n2 = dft.split
    total_T = Xt_loc.shape[1]
    if bt is None:
        bt = _pick_bt_t(nframes, nfft, n2)
    assert bt and bt % _HALO_T == 0 and nframes % bt == 0
    assert total_T % _HALO_T == 0 and 0 < avg - 1 <= _HALO_T
    nr = nframes // bt
    nunits = total_T // _HALO_T
    runit = bt // _HALO_T

    W_t = jnp.asarray(window).reshape(avg, n1, n2).transpose(1, 0, 2)
    g6 = stage2_consts(nfft, n1, n2)
    F1 = stage1_scalars(n1)
    kernel = functools.partial(_kernel_t_at_h, avg, bt, n1, n2, F1)
    a_map = lambda r, i, v: (0, i[0] * nr + r, 0)
    halo_map = lambda r, i, v: \
        (0, ((i[0] * nr + r) * runit - 1) % nunits, 0)
    staged_map = lambda r, i, v: (0, i[0], 0)
    const3 = lambda r, i, v: (0, 0, 0)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec((n1, bt, n2), a_map),
            pl.BlockSpec((n1, bt, n2), a_map),
            pl.BlockSpec((n1, _HALO_T, n2), halo_map),
            pl.BlockSpec((n1, _HALO_T, n2), halo_map),
            pl.BlockSpec((n1, _HALO_T, n2), staged_map),
            pl.BlockSpec((n1, _HALO_T, n2), staged_map),
            pl.BlockSpec((n1, avg, n2), const3),
        ] + [pl.BlockSpec((n1, n2, n2), const3)] * 6,
        out_specs=(pl.BlockSpec((n1, bt, n2), lambda r, i, v: (0, r, 0)),
                   pl.BlockSpec((n1, bt, n2), lambda r, i, v: (0, r, 0))),
    )
    o_re, o_im = pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=(
            jax.ShapeDtypeStruct((n1, nframes, n2), Xt_loc.re.dtype),
            jax.ShapeDtypeStruct((n1, nframes, n2), Xt_loc.re.dtype),
        ),
        interpret=interpret,
    )(jnp.asarray(blk_idx, jnp.int32).reshape(1),
      jnp.asarray(valid, jnp.int32).reshape(1),
      Xt_loc.re, Xt_loc.im, Xt_loc.re, Xt_loc.im,
      Hs_loc.re, Hs_loc.im, W_t, *g6)
    return C(o_re, o_im)


def can_channelizer_at(cfg: PFBConfig, dft, block_len: int,
                       n: int) -> bool:
    """Shape gate for channelizer_frames_at: the fused-kernel gates plus
    recording commensurability (total frames a multiple of the halo
    unit, blocks a multiple of the frame tile)."""
    if not can_fuse_channelizer(cfg, dft, block_len):
        return False
    nfft = cfg.nfft
    if n % nfft != 0 or n % block_len != 0:
        return False
    T = block_len // nfft
    bt = _pick_bt_t(T, nfft, dft.split[1])
    total_T = n // nfft
    return bool(bt and bt % _HALO_T == 0 and T % bt == 0 and
                total_T % _HALO_T == 0 and
                0 < cfg.avg - 1 <= _HALO_T)


def channelizer_frames_at(cfg: PFBConfig, window: jax.Array, dft,
                          Xt_full: C, blk_idx: jax.Array,
                          valid: jax.Array, nframes: int,
                          bt: int | None = None,
                          interpret: bool | None = None) -> C:
    """Fused presum + two-stage DFT of ONE stream block read IN PLACE
    from a transposed resident recording (round 5: collapses the
    full-spectrum replay's presum round trip — pfb_at paid recording
    read + presum write + presum read + spectra write where this pays
    recording read + spectra write).

    Xt_full: (n1, total_T, n2) recording (transpose_block applied to the
    whole recording once at upload); blk_idx: int32 scalar block index;
    valid: int32 scalar, 0 zeroes the stream-start halo.  Returns
    frames_t (n1, nframes, n2), transposed-scrambled like
    channelizer_frames_t (select with select_tones_t)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    nfft, avg = cfg.nfft, cfg.avg
    n1, n2 = dft.split
    total_T = Xt_full.shape[1]
    if bt is None:
        bt = _pick_bt_t(nframes, nfft, n2)
    assert bt and bt % _HALO_T == 0 and nframes % bt == 0
    assert total_T % _HALO_T == 0 and 0 < avg - 1 <= _HALO_T
    nr = nframes // bt
    nunits = total_T // _HALO_T
    runit = bt // _HALO_T

    W_t = jnp.asarray(window).reshape(avg, n1, n2).transpose(1, 0, 2)
    g6 = stage2_consts(nfft, n1, n2)
    F1 = stage1_scalars(n1)
    kernel = functools.partial(_kernel_t_at, avg, bt, n1, n2, F1)
    a_map = lambda r, i, v: (0, i[0] * nr + r, 0)
    halo_map = lambda r, i, v: \
        (0, ((i[0] * nr + r) * runit - 1) % nunits, 0)
    const3 = lambda r, i, v: (0, 0, 0)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec((n1, bt, n2), a_map),
            pl.BlockSpec((n1, bt, n2), a_map),
            pl.BlockSpec((n1, _HALO_T, n2), halo_map),
            pl.BlockSpec((n1, _HALO_T, n2), halo_map),
            pl.BlockSpec((n1, avg, n2), const3),
        ] + [pl.BlockSpec((n1, n2, n2), const3)] * 6,
        out_specs=(pl.BlockSpec((n1, bt, n2), lambda r, i, v: (0, r, 0)),
                   pl.BlockSpec((n1, bt, n2), lambda r, i, v: (0, r, 0))),
    )
    o_re, o_im = pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=(
            jax.ShapeDtypeStruct((n1, nframes, n2), Xt_full.re.dtype),
            jax.ShapeDtypeStruct((n1, nframes, n2), Xt_full.re.dtype),
        ),
        interpret=interpret,
    )(jnp.asarray(blk_idx, jnp.int32).reshape(1),
      jnp.asarray(valid, jnp.int32).reshape(1),
      Xt_full.re, Xt_full.im, Xt_full.re, Xt_full.im, W_t, *g6)
    return C(o_re, o_im)
