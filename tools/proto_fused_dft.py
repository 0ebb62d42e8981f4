"""Prototype: fully fused PFB tile kernel — presum + two-stage DFT in one
Pallas kernel (per-tile, VMEM-resident), output in scrambled+transposed
layout (nfft, bt) so the tone select is a row gather.

Correctness in interpret mode on CPU; TPU lowering smoke separate.
"""

import functools
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
if __name__ == "__main__":          # CPU for the interpret-mode self-test
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from gpu_sdr_tpu.ops import cplx  # noqa: E402
from gpu_sdr_tpu.ops.cplx import C, DFT  # noqa: E402
from gpu_sdr_tpu.ops.pfb import PFBConfig, pfb_spare_init, pfb_frames  # noqa: E402

_HALO_PAD = 8


def _kernel(avg, bt, n1, n2, ar, ai, lr, li, w_ref,
            f1r, f1i, f2r, f2i, twr, twi, or_, oi_):
    """presum (leading halo) -> transpose -> stage1 -> twiddle -> stage2.
    Output tile: (nfft, bt) scrambled rows: row (k2*n1 + k1) = bin
    k1 + n1*k2 ... layout [k2][k1] major."""
    nfft = n1 * n2
    a_r, a_i, w = ar[:], ai[:], w_ref[:]
    out_r = a_r * w[avg - 1][None, :]
    out_i = a_i * w[avg - 1][None, :]
    lead = avg - 1
    for i in range(lead):
        k = lead - i
        rr = jnp.concatenate([lr[_HALO_PAD - k:], a_r[:bt - k]], axis=0)
        ri = jnp.concatenate([li[_HALO_PAD - k:], a_i[:bt - k]], axis=0)
        out_r = out_r + rr * w[i][None, :]
        out_i = out_i + ri * w[i][None, :]
    # transpose (bt, nfft) -> (nfft, bt); rows n = n2*a + b
    pr = out_r.T
    pi = out_i.T
    # reshape rows to (n1, n2*bt): row a, col (b, t)
    pr = pr.reshape(n1, n2 * bt)
    pi = pi.reshape(n1, n2 * bt)
    # stage 1: z[k1, (b,t)] = sum_a F1[a, k1] * p[a, (b,t)]  (F1 symmetric:
    # F1[a,k1] = W_n1^{a k1}) -> F1^T @ p = F1 @ p.  Mosaic only lowers
    # DEFAULT/HIGHEST dot precision; the DFT FLOPs are small, take HIGHEST.
    P = jax.lax.Precision.HIGHEST
    dot = functools.partial(jnp.dot, precision=P)
    zr = dot(f1r[:], pr) - dot(f1i[:], pi)
    zi = dot(f1r[:], pi) + dot(f1i[:], pr)
    # twiddle: TW[k1, b] broadcast over t
    z3r = zr.reshape(n1, n2, bt)
    z3i = zi.reshape(n1, n2, bt)
    tr = twr[:].reshape(n1, n2)[:, :, None]
    ti = twi[:].reshape(n1, n2)[:, :, None]
    ur = z3r * tr - z3i * ti
    ui = z3r * ti + z3i * tr
    # stage 2: contract b: y[k2, k1, t] = sum_b F2[b, k2] u[k1, b, t]
    # -> transpose u to (n2, n1, bt) then (n2, n1*bt); F2 symmetric.
    ur = jnp.swapaxes(ur, 0, 1).reshape(n2, n1 * bt)
    ui = jnp.swapaxes(ui, 0, 1).reshape(n2, n1 * bt)
    yr = dot(f2r[:], ur) - dot(f2i[:], ui)
    yi = dot(f2r[:], ui) + dot(f2i[:], ur)
    # y rows k2, cols (k1, t) -> output (nfft, bt) rows (k2, k1)
    or_[:] = yr.reshape(nfft, bt)
    oi_[:] = yi.reshape(nfft, bt)


def fused_pfb_dft(window2d, spare, X, n1, n2, bt, interpret=True):
    import jax.experimental.pallas as pl
    avg, nfft = window2d.shape
    nframes = X.shape[0]
    lead = avg - 1
    nr = nframes // bt
    sign = -1.0
    k1 = np.arange(n1)
    F1 = np.exp(sign * 2j * np.pi * np.outer(k1, k1) / n1).astype(np.complex64)
    k2 = np.arange(n2)
    F2 = np.exp(sign * 2j * np.pi * np.outer(k2, k2) / n2).astype(np.complex64)
    b = np.arange(n2)
    # twiddle W_N^{b*k1} laid out (k1, b)
    TW = np.exp(sign * 2j * np.pi * np.outer(k1, b) / (n1 * n2)).astype(
        np.complex64)

    idx = ((np.arange(1, nr)[:, None]) * bt + np.arange(_HALO_PAD)[None, :]
           - _HALO_PAD)
    idx = np.maximum(idx.reshape(-1), 0)
    idx_arr = jnp.asarray(idx.astype(np.int32))
    pad = jnp.zeros((_HALO_PAD - lead, nfft), X.re.dtype)
    l0_r = jnp.concatenate([pad, spare.re], axis=0)
    l0_i = jnp.concatenate([pad, spare.im], axis=0)
    lr = jnp.concatenate([l0_r, jnp.take(X.re, idx_arr, axis=0)], axis=0)
    li = jnp.concatenate([l0_i, jnp.take(X.im, idx_arr, axis=0)], axis=0)

    kernel = functools.partial(_kernel, avg, bt, n1, n2)
    out_shape = (jax.ShapeDtypeStruct((nr * nfft, bt), X.re.dtype),
                 jax.ShapeDtypeStruct((nr * nfft, bt), X.re.dtype))
    o_re, o_im = pl.pallas_call(
        kernel,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec((bt, nfft), lambda r: (r, 0)),
            pl.BlockSpec((bt, nfft), lambda r: (r, 0)),
            pl.BlockSpec((_HALO_PAD, nfft), lambda r: (r, 0)),
            pl.BlockSpec((_HALO_PAD, nfft), lambda r: (r, 0)),
            pl.BlockSpec((avg, nfft), lambda r: (0, 0)),
            pl.BlockSpec((n1, n1), lambda r: (0, 0)),
            pl.BlockSpec((n1, n1), lambda r: (0, 0)),
            pl.BlockSpec((n2, n2), lambda r: (0, 0)),
            pl.BlockSpec((n2, n2), lambda r: (0, 0)),
            pl.BlockSpec((n1, n2), lambda r: (0, 0)),
            pl.BlockSpec((n1, n2), lambda r: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((nfft, bt), lambda r: (r, 0)),
            pl.BlockSpec((nfft, bt), lambda r: (r, 0)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(X.re, X.im, lr, li, window2d,
      jnp.asarray(F1.real), jnp.asarray(F1.imag),
      jnp.asarray(F2.real), jnp.asarray(F2.imag),
      jnp.asarray(TW.real), jnp.asarray(TW.imag))
    return C(o_re, o_im)       # (nr*nfft, bt): tile-major rows


def main():
    rate = 64_000
    nfft, avg = 64, 4
    n1, n2 = 8, 8
    bt = 16
    nframes = 64
    L = nframes * nfft
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate)
    window = cfg.window()
    W2 = window.reshape(avg, nfft)
    rng = np.random.default_rng(3)
    xb = (rng.standard_normal(L) + 1j * rng.standard_normal(L)).astype(
        np.complex64)
    x = cplx.from_np(xb)
    spare0 = pfb_spare_init(cfg)

    dft = cfg.dft(two_stage=False)
    _, ref = pfb_frames(cfg, window, dft, spare0, x)     # (nframes, nfft)
    ref = cplx.to_np(ref)

    X = x.reshape(nframes, nfft)
    S = spare0.reshape(avg - 1, nfft)
    y = fused_pfb_dft(W2, S, X, n1, n2, bt)
    yr = np.asarray(y.re)
    yi = np.asarray(y.im)
    # undo layout: tile r rows [r*nfft, (r+1)*nfft) = (k2, k1) major, cols t
    got = np.zeros((nframes, nfft), np.complex64)
    nr = nframes // bt
    for r in range(nr):
        blk = (yr[r * nfft:(r + 1) * nfft] +
               1j * yi[r * nfft:(r + 1) * nfft])     # (nfft, bt)
        blk = blk.reshape(n2, n1, bt)
        for kk2 in range(n2):
            for kk1 in range(n1):
                got[r * bt:(r + 1) * bt, kk1 + n1 * kk2] = blk[kk2, kk1]
    err = np.abs(got - ref).max()
    print("max err vs XLA dense-DFT path:", err, "scale", np.abs(ref).max())
    assert err < 2e-3 * np.abs(ref).max()
    print("OK")


if __name__ == "__main__":
    main()
