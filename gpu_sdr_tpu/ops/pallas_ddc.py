"""Pallas TPU kernel: fused multi-tone DDC + decimating FIR, one HBM pass.

The XLA path (ops/ddc.direct_ddc_fir) is memory-bound, not MXU-bound: its
f accumulated matmuls re-read the raw block f times and round-trip the
accumulator through HBM, and the bf16-vs-tf32 ladder moves the chain by
<6% (tools/perf_ddc_variants.py) — the MXU is idle while HBM streams.
This kernel computes the identical quantity in ONE pass over the input:

    y[n, c] = rot_c * ramp[n, c] * sum_j X[n+j, :] @ hmod[j*M:(j+1)*M, c]

Each grid step holds a (R, M) tile of the decim-major input view in VMEM
plus the f-1 rows preceding it (inter-tile halo staged as a tiny side
input, exactly like ops/pallas_pfb.py; tile 0's halo is the carried FIR
history), runs the f complex tap matmuls on the MXU (Karatsuba 3-dot form,
float32 HIGHEST — Mosaic lowers DEFAULT/HIGHEST only, and full f32
accuracy here is *better* than the XLA path's tensorfloat32 default),
applies the carrier ramp and the per-block phase rotation in VMEM, and
writes only the (R, C) output tile: one read of the block, one write of
the decimated result.

Replaces the reference's direct_demodulator_integer + per-channel FIR
(cpp/kernels.cu:45-86, cpp/fir.cu:83-88) hot pair the same way
pallas_pfb replaces polyphase_filter.

`ddc_fused` is a drop-in for ops/ddc.direct_ddc_fir; it falls back to the
XLA path when the geometry doesn't tile (or off-TPU runs interpreted).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import cplx
from .cplx import C
from .ddc import direct_ddc_fir

_HALO_PAD = 8   # Mosaic block sublane granularity: halo rows padded to 8


def hilo_split(a):
    """bf16 hi/lo decomposition of an f32 array (hi = bf16(a),
    lo = bf16(a - hi))."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def split_dot(a_hi, a_lo, b):
    """In-kernel dot at the tensorfloat32/HIGH grade via the manual bf16
    split: hi@hi + hi@lo + lo@hi — the same product set XLA's HIGH
    computes, which Mosaic cannot express natively (it lowers only
    DEFAULT/HIGHEST dot precision)."""
    b_hi, b_lo = hilo_split(b)
    # explicit DEFAULT: bf16 inputs are one MXU pass; the global
    # tensorfloat32 default lowers to HIGH, which Mosaic rejects
    d = functools.partial(jnp.dot, precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def split_dot_presplit(a_hi, a_lo, b_hi, b_lo):
    """`split_dot` with the b operand's bf16 hi/lo split precomputed on the
    host (for constant operands: saves the per-grid-step VPU split)."""
    d = functools.partial(jnp.dot, precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def pick_tile(n: int, cap: int, prefer_align: bool = True) -> int:
    """Shared tile-size search: the largest divisor of `n` that is a
    multiple of 8 (Mosaic sublane granularity) and <= `cap` (the
    caller's VMEM budget), or 0 when none exists — callers' ok-gates
    then fall back instead of letting Mosaic crash on an over-budget
    tile.  With prefer_align, 32- then 16-aligned candidates win (the
    measured sweet spot for streamed row-major tiles,
    tools/perf_bt_sweep.py); column-major tiles (ReplayDDCT) measured
    best with the plain maximum."""
    if cap < 8:
        return 0
    cands = []
    for d in range(1, int(np.sqrt(n)) + 1):
        if n % d == 0:
            for c in (d, n // d):
                if c <= cap and c % 8 == 0:
                    cands.append(c)
    if not cands:
        return 0
    if prefer_align:
        return max(cands, key=lambda c: ((c % 32 == 0), (c % 16 == 0), c))
    return max(cands)


def np_hilo(a):
    """Host-side bf16 hi/lo decomposition matching `hilo_split`
    (hi = bf16(a), lo = bf16(a - hi)) for shipping pre-split constants."""
    import ml_dtypes
    hi = np.asarray(a, np.float32).astype(ml_dtypes.bfloat16)
    lo = (np.asarray(a, np.float32) - hi.astype(np.float32)
          ).astype(ml_dtypes.bfloat16)
    return hi, lo


def _kernel(f: int, M: int, R: int, split: bool, xr_ref, xi_ref, lr_ref,
            li_ref, hr_ref, hi_ref, hs_ref, rr_ref, ri_ref, qr_ref,
            qi_ref, yr_ref, yi_ref):
    """One (R, C) output tile.

    x: raw rows [r*R, (r+1)*R) of the (nb, M) input view; l: the f-1 rows
    preceding the tile (padded to _HALO_PAD, real rows LAST); h*: the
    (f*M, C) modulated taps (re, im, re+im); rr/ri: the (R, C) carrier
    ramp tile; qr/qi: the (1, C) per-block phase rotation.

    Window j of output row n is ext[n+j-(f-1)] on the extended tile
    ext = concat(l[-(f-1):], x) of R+f-1 rows, built once; the f tap
    matmuls read static row slices of it.

    split=False: f32 dots at HIGHEST (6 bf16 passes, exact f32 grade).
    split=True: manual bf16 hi/lo decomposition — hi@hi + hi@lo + lo@hi,
    the same product set as XLA's tensorfloat32/HIGH (3 passes, ~92 dB),
    which Mosaic cannot express natively (it lowers DEFAULT/HIGHEST only).
    The split is computed ONCE per extended tile, not per tap window.
    """
    lead = f - 1
    if lead:
        ext_r = jnp.concatenate([lr_ref[_HALO_PAD - lead:], xr_ref[:]],
                                axis=0)
        ext_i = jnp.concatenate([li_ref[_HALO_PAD - lead:], xi_ref[:]],
                                axis=0)
    else:
        ext_r, ext_i = xr_ref[:], xi_ref[:]
    ext_s = ext_r + ext_i

    if split:
        parts = [hilo_split(a) for a in (ext_r, ext_i, ext_s)]

        def rdot(p, href, j):
            a_hi, a_lo = p
            return split_dot(a_hi[j:j + R], a_lo[j:j + R],
                             href[j * M:(j + 1) * M, :])
    else:
        parts = [(a,) for a in (ext_r, ext_i, ext_s)]

        def rdot(p, href, j):
            return jnp.dot(p[0][j:j + R], href[j * M:(j + 1) * M, :],
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)

    acc_r = acc_i = None
    for j in range(f):
        rr = rdot(parts[0], hr_ref, j)
        ii = rdot(parts[1], hi_ref, j)
        ri = rdot(parts[2], hs_ref, j)
        tr, ti = rr - ii, ri - rr - ii
        acc_r = tr if acc_r is None else acc_r + tr
        acc_i = ti if acc_i is None else acc_i + ti
    # y = acc * ramp * rot  (complex elementwise, rot broadcast over rows)
    ramp_r = rr_ref[:]
    ramp_i = ri_ref[:]
    t_r = acc_r * ramp_r - acc_i * ramp_i
    t_i = acc_r * ramp_i + acc_i * ramp_r
    rot_r = qr_ref[:]
    rot_i = qi_ref[:]
    yr_ref[:] = t_r * rot_r - t_i * rot_i
    yi_ref[:] = t_r * rot_i + t_i * rot_r


def _pick_rows(nb: int, M: int, Cn: int) -> int:
    """Tile height: a divisor of nb, multiple of 8, small enough that the
    double-buffered in/out/ramp tiles plus the kernel's split temporaries
    stay within ~9 MB of the 16 MB scoped VMEM.  Lane dims are padded to
    128 on chip (a (R, 1) block still occupies 128 lanes), so the budget
    counts PADDED widths.  Prefers 32-aligned candidates (the measured
    sweet spot for streamed tiles, tools/perf_bt_sweep.py).  Returns 0
    when no tiling exists."""
    Mp = -(-M // 128) * 128
    Cp = -(-Cn // 128) * 128
    # x (f32, re+im, double-buffered) + ext/split temporaries (f32 + bf16)
    # + y and ramp tiles (f32, re+im, double-buffered)
    bytes_per_row = 16 * Mp + 24 * Mp + 32 * Cp
    return pick_tile(nb, (9 * 2 ** 20) // max(bytes_per_row, 1))


def _pallas_ddc(hmod: C, hsum: jax.Array, ramp: C, rot: C, hist: C, x: C,
                M: int, f: int, R: int, interpret: bool,
                split: bool) -> C:
    """Run the kernel over one block.  x: (L,) flat; hist: ((f-1)*M,)."""
    import jax.experimental.pallas as pl

    L = x.shape[0]
    nb = L // M
    Cn = hmod.shape[1]
    nr = nb // R
    lead = f - 1
    X = x.reshape(nb, M)
    H = hist.reshape(lead, M)

    # leading halo rows, padded to _HALO_PAD per tile, real rows LAST:
    # tile 0 takes the carried history, tile r>0 the last `lead` rows of
    # the previous tile of X (cf. ops/pallas_pfb.pallas_presum).
    idx = ((np.arange(1, nr)[:, None]) * R - lead +
           np.arange(_HALO_PAD)[None, :] - (_HALO_PAD - lead))
    idx = np.maximum(idx.reshape(-1), 0)
    idx_arr = jnp.asarray(idx.astype(np.int32))
    pad = jnp.zeros((_HALO_PAD - lead, M), X.re.dtype)
    l_r = jnp.concatenate([pad, H.re, jnp.take(X.re, idx_arr, axis=0)],
                          axis=0)
    l_i = jnp.concatenate([pad, H.im, jnp.take(X.im, idx_arr, axis=0)],
                          axis=0)

    kernel = functools.partial(_kernel, f, M, R, split)
    out_shape = (jax.ShapeDtypeStruct((nb, Cn), X.re.dtype),
                 jax.ShapeDtypeStruct((nb, Cn), X.re.dtype))
    y_re, y_im = pl.pallas_call(
        kernel,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec((R, M), lambda r: (r, 0)),            # x re
            pl.BlockSpec((R, M), lambda r: (r, 0)),            # x im
            pl.BlockSpec((_HALO_PAD, M), lambda r: (r, 0)),    # lead re
            pl.BlockSpec((_HALO_PAD, M), lambda r: (r, 0)),    # lead im
            pl.BlockSpec((f * M, Cn), lambda r: (0, 0)),       # taps re
            pl.BlockSpec((f * M, Cn), lambda r: (0, 0)),       # taps im
            pl.BlockSpec((f * M, Cn), lambda r: (0, 0)),       # taps re+im
            pl.BlockSpec((R, Cn), lambda r: (r, 0)),           # ramp re
            pl.BlockSpec((R, Cn), lambda r: (r, 0)),           # ramp im
            pl.BlockSpec((1, Cn), lambda r: (0, 0)),           # rot re
            pl.BlockSpec((1, Cn), lambda r: (0, 0)),           # rot im
        ],
        out_specs=(
            pl.BlockSpec((R, Cn), lambda r: (r, 0)),
            pl.BlockSpec((R, Cn), lambda r: (r, 0)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(X.re, X.im, l_r, l_i, hmod.re, hmod.im, hsum,
      ramp.re, ramp.im, rot.re.reshape(1, Cn), rot.im.reshape(1, Cn))
    return C(y_re, y_im)


def ddc_fused(
    hmod: C,                  # (f*M, C) modulated taps
    ramp: C,                  # (nb, C) carrier ramp
    step: jax.Array,          # (C,) int32 per-block phase increment
    W: int,                   # rate (modulus)
    M: int,                   # decimation
    f: int,                   # taps per arm
    phase: jax.Array,         # (C,) int32 carried phase accumulator
    hist: C,                  # ((f-1)*M,) carried raw input samples
    x: C,                     # (L,) input block
    rows: int | None = None,
    interpret: bool | None = None,
    precision: str = "tf32",
):
    """Drop-in for ops/ddc.direct_ddc_fir with the fused Pallas kernel.

    Same signature/semantics: (phase', hist', y), y of shape (L//M, C).
    Falls back to the XLA path when the geometry doesn't tile.

    precision: "tf32" (default; manual hi/lo bf16 split, 3 MXU passes —
    the framework's default matmul grade, measured -104 dB vs the XLA
    tf32 path on chip and 1.8x faster than "highest") or "highest"
    (exact f32-grade dots, 6 bf16 passes)."""
    L = x.shape[0]
    nb = L // M
    R = rows if rows is not None else _pick_rows(nb, M, hmod.shape[1])
    if (f < 2 or not R or nb % R != 0 or f - 1 > _HALO_PAD or
            f - 1 > R or hist.shape[0] != (f - 1) * M or L % M != 0):
        return direct_ddc_fir(hmod, ramp, step, W, M, f, phase, hist, x)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    theta = phase.astype(jnp.float32) * jnp.float32(2.0 * np.pi / W)
    rot = cplx.expi_neg(theta)
    hsum = hmod.re + hmod.im
    y = _pallas_ddc(hmod, hsum, ramp, rot, hist, x, M, f, R, interpret,
                    split=(precision == "tf32"))
    new_phase = phase + step
    new_phase = jnp.where(new_phase >= W, new_phase - W, new_phase)
    new_hist = x[L - (f - 1) * M:]
    return new_phase, new_hist, y
