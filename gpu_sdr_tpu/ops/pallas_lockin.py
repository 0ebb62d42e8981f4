"""Pallas TPU kernel: fused chirp demodulation + lock-in decimation.

The XLA path (ops/chirp.py + ops/lockin.py) materializes the full
demodulated stream z = conj(chirp) * x (two HBM round trips of the block)
before the segment reduction.  This kernel fuses the three stages — integer
phase accumulator -> oscillator -> conjugate mix -> profile-weighted segment
sum — into one pass: each grid step loads a (SEG_TILE, ppt) tile of the
input, computes the chirp phases for exactly those samples from the uint32
accumulator (bit-identical math to ops/chirp.py), and reduces to SEG_TILE
lock-in points without writing z anywhere.

Used opportunistically: `fused_chirp_lockin` falls back to the XLA ops
when Pallas is unavailable; both paths match the golden model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import golden
from .chirp import ChirpConfig
from .cplx import C

_INV_2_31_5 = np.float32(1.0 / golden.TWO_31_5)


def _phase_wave(cfg: ChirpConfig, n: jax.Array, last_index: jax.Array):
    """sin/cos of the chirp at uint32 sample offsets n (any shape).
    Same arithmetic as ops/chirp._phase_index (wrapping uint32)."""
    period = jnp.uint32(cfg.period)
    length = jnp.uint32(cfg.length)
    chirpness = jnp.uint32(cfg.chirpness & 0xFFFFFFFF)
    f0 = jnp.uint32(cfg.f0 & 0xFFFFFFFF)
    one, two = jnp.uint32(1), jnp.uint32(2)
    eff = (last_index % period) + (n % period)
    eff = jnp.where(eff >= period, eff - period, eff)
    fi = eff // length
    q_phase = (fi // two) * (fi + one) + (fi % two) * ((fi + one) // two)
    pc = chirpness * (length * q_phase)
    idx = (eff * (f0 + fi * chirpness) - pc).astype(jnp.int32)
    th = jnp.float32(np.pi) * (idx.astype(jnp.float32) * _INV_2_31_5)
    return jnp.sin(th), -jnp.cos(th)       # (chirp_re, chirp_im)


def _kernel(cfg: ChirpConfig, seg_tile: int, ppt: int,
            last_ref, xr_ref, xi_ref, w_ref, or_ref, oi_ref):
    t = jax.lax.broadcasted_iota(jnp.uint32, (seg_tile, ppt), 0)
    k = jax.lax.broadcasted_iota(jnp.uint32, (seg_tile, ppt), 1)
    import jax.experimental.pallas as pl
    seg0 = jnp.uint32(pl.program_id(0) * seg_tile)
    n = (seg0 + t) * jnp.uint32(ppt) + k
    cr, ci = _phase_wave(cfg, n, last_ref[0])
    xr = xr_ref[:]
    xi = xi_ref[:]
    # z = conj(c) * x
    zr = cr * xr + ci * xi
    zi = cr * xi - ci * xr
    w = w_ref[:]
    or_ref[:] = jnp.sum(zr * w[None, :], axis=1, keepdims=True)
    oi_ref[:] = jnp.sum(zi * w[None, :], axis=1, keepdims=True)


def pallas_chirp_lockin(cfg: ChirpConfig, profile: jax.Array,
                        last_index: jax.Array, x: C,
                        seg_tile: int = 8, interpret: bool = False):
    """Fused kernel: x (nseg*ppt,) -> lock-in points (nseg,).
    Returns (new_last_index, y: C(nseg,))."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ppt = profile.shape[0]
    L = x.shape[0]
    nseg = L // ppt
    assert nseg % seg_tile == 0, "nseg must be a multiple of seg_tile"
    xr = x.re.reshape(nseg, ppt)
    xi = x.im.reshape(nseg, ppt)
    last_arr = jnp.asarray(last_index, dtype=jnp.uint32).reshape(1)

    grid = (nseg // seg_tile,)
    kernel = functools.partial(_kernel, cfg, seg_tile, ppt)
    out_shape = (jax.ShapeDtypeStruct((nseg, 1), jnp.float32),
                 jax.ShapeDtypeStruct((nseg, 1), jnp.float32))
    o_re, o_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((seg_tile, ppt), lambda s: (s, 0)),
            pl.BlockSpec((seg_tile, ppt), lambda s: (s, 0)),
            pl.BlockSpec((ppt,), lambda s: (0,)),
        ],
        out_specs=(
            pl.BlockSpec((seg_tile, 1), lambda s: (s, 0)),
            pl.BlockSpec((seg_tile, 1), lambda s: (s, 0)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(last_arr, xr, xi, profile)
    new_last = (last_index + jnp.uint32(L % cfg.period)) % \
        jnp.uint32(cfg.period)
    return new_last, C(o_re[:, 0], o_im[:, 0])


def fused_chirp_lockin(cfg: ChirpConfig, profile: jax.Array,
                       last_index: jax.Array, x: C,
                       use_pallas: bool = False, interpret: bool = False):
    """Chirp demod + lock-in, Pallas-fused when requested, XLA otherwise."""
    if use_pallas:
        return pallas_chirp_lockin(cfg, profile, last_index, x,
                                   interpret=interpret)
    from .chirp import chirp_demod_block
    from .lockin import lockin_decimate
    last, z = chirp_demod_block(cfg, last_index, x)
    return last, lockin_decimate(profile, z)


def pallas_chirp_lockin_table(profile: jax.Array, C_full: C, X_full: C,
                              blk_idx: jax.Array, nseg_pb: int,
                              seg_tile: int = 8,
                              interpret: bool | None = None,
                              sig_idx: jax.Array | None = None) -> C:
    """Table-oscillator lock-in: the demod chirp is READ from a resident
    one-period wavetable instead of recomputed per sample.

    The integer-accumulator chirp repeats exactly every period
    (cpp/kernels.cu:335-372 quantization), so one period of the
    oscillator in HBM serves the whole stream — the reference's TONES
    wavetable trick (tone_gen pointer rotation,
    cpp/USRP_buffer_generator.cpp:226-229) applied to the CHIRP
    demodulator.  Per tile the kernel streams oscillator rows c and
    signal rows x and reduces z = conj(c)*x against the lock-in profile:
    pure MXU/elementwise work, no per-sample sincos on the VPU (the
    measured cost of the in-kernel oscillator — see ROADMAP).

    C_full/X_full: (total_nseg, ppt) period/recording views,
    segment-aligned (each a multiple of nseg_pb rows); blk_idx: int32
    OSCILLATOR period-block index (the stream's phase position mod
    period).  sig_idx (optional, int32): separate SIGNAL block index
    into X_full — used by the replay path, where the recording index
    wraps mod the recording length while the oscillator index wraps mod
    the chirp period (they coincide only when the recording is
    period-commensurate).  Default: lock-step with blk_idx (the
    loopback case, where the signal IS the wavetable).
    Returns y: C(nseg_pb,).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    ppt = profile.shape[0]
    assert C_full.shape[1] == ppt and X_full.shape[1] == ppt
    assert nseg_pb % seg_tile == 0
    nr = nseg_pb // seg_tile
    if sig_idx is None:
        sig_idx = blk_idx
    idx_arr = jnp.stack([jnp.asarray(blk_idx, dtype=jnp.int32),
                         jnp.asarray(sig_idx, dtype=jnp.int32)])

    row_map = lambda s, i: (i[0] * nr + s, 0)
    sig_map = lambda s, i: (i[1] * nr + s, 0)

    def kernel(idx_ref, cr_ref, ci_ref, xr_ref, xi_ref, w_ref,
               or_ref, oi_ref):
        cr, ci = cr_ref[:], ci_ref[:]
        xr, xi = xr_ref[:], xi_ref[:]
        zr = cr * xr + ci * xi            # conj(c) * x
        zi = cr * xi - ci * xr
        w = w_ref[:]
        or_ref[:] = jnp.sum(zr * w[None, :], axis=1, keepdims=True)
        oi_ref[:] = jnp.sum(zi * w[None, :], axis=1, keepdims=True)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec((seg_tile, ppt), row_map),      # oscillator re
            pl.BlockSpec((seg_tile, ppt), row_map),      # oscillator im
            pl.BlockSpec((seg_tile, ppt), sig_map),      # signal re
            pl.BlockSpec((seg_tile, ppt), sig_map),      # signal im
            pl.BlockSpec((ppt,), lambda s, i: (0,)),     # profile
        ],
        out_specs=(
            pl.BlockSpec((seg_tile, 1), lambda s, i: (s, 0)),
            pl.BlockSpec((seg_tile, 1), lambda s, i: (s, 0)),
        ),
    )
    out_shape = (jax.ShapeDtypeStruct((nseg_pb, 1), jnp.float32),
                 jax.ShapeDtypeStruct((nseg_pb, 1), jnp.float32))
    o_re, o_im = pl.pallas_call(
        kernel, grid_spec=gs, out_shape=out_shape, interpret=interpret,
    )(idx_arr, C_full.re, C_full.im, X_full.re, X_full.im, profile)
    return C(o_re[:, 0], o_im[:, 0])


def pallas_chirp_lockin_table_self(profile: jax.Array, C_full: C,
                                   blk_idx: jax.Array, nseg_pb: int,
                                   seg_tile: int = 8,
                                   interpret: bool | None = None) -> C:
    """Single-fetch loopback form of :func:`pallas_chirp_lockin_table`.

    In the loopback the signal IS the wavetable, and Mosaic does NOT
    coalesce two block specs over the same buffer: the 4-spec aliased
    form streams every byte TWICE (measured: 189 GB/s effective vs
    392 GB/s for 4 distinct streams, tools/perf_pallas_bw2.py
    lockin2_aliased_th8, 2026-08-21).  Here each row is fetched once
    and the tile serves as both oscillator and signal — the same
    product set (zr = cr*cr + ci*ci, zi = cr*ci - ci*cr), half the HBM
    traffic.  The real half is bit-identical to the aliased call; the
    imaginary half is EXACTLY zero (the loopback's true answer), where
    the aliased form leaves ~1e-9 FMA-contraction residue
    (tests/test_pallas_lockin.py).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    ppt = profile.shape[0]
    assert C_full.shape[1] == ppt
    assert nseg_pb % seg_tile == 0
    nr = nseg_pb // seg_tile
    idx_arr = jnp.asarray(blk_idx, dtype=jnp.int32).reshape(1)

    row_map = lambda s, i: (i[0] * nr + s, 0)

    def kernel(idx_ref, cr_ref, ci_ref, w_ref, or_ref, oi_ref):
        cr, ci = cr_ref[:], ci_ref[:]
        zr = cr * cr + ci * ci            # conj(c) * c
        zi = cr * ci - ci * cr            # exactly zero, same products
        w = w_ref[:]
        or_ref[:] = jnp.sum(zr * w[None, :], axis=1, keepdims=True)
        oi_ref[:] = jnp.sum(zi * w[None, :], axis=1, keepdims=True)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec((seg_tile, ppt), row_map),      # wavetable re
            pl.BlockSpec((seg_tile, ppt), row_map),      # wavetable im
            pl.BlockSpec((ppt,), lambda s, i: (0,)),     # profile
        ],
        out_specs=(
            pl.BlockSpec((seg_tile, 1), lambda s, i: (s, 0)),
            pl.BlockSpec((seg_tile, 1), lambda s, i: (s, 0)),
        ),
    )
    out_shape = (jax.ShapeDtypeStruct((nseg_pb, 1), jnp.float32),
                 jax.ShapeDtypeStruct((nseg_pb, 1), jnp.float32))
    o_re, o_im = pl.pallas_call(
        kernel, grid_spec=gs, out_shape=out_shape, interpret=interpret,
    )(idx_arr, C_full.re, C_full.im, profile)
    return C(o_re[:, 0], o_im[:, 0])


def pallas_chirp_lockin_at(cfg: ChirpConfig, profile: jax.Array,
                           last_index: jax.Array, X_full: C,
                           blk_idx: jax.Array, nseg_pb: int,
                           seg_tile: int = 8,
                           interpret: bool | None = None):
    """Replay form of :func:`pallas_chirp_lockin`: the block's segments
    are read in place from an HBM-resident recording via a
    scalar-prefetched block index (no dynamic_slice copy, no
    materialized demodulated stream).

    X_full: (total_nseg, ppt) recording view (total_nseg a multiple of
    nseg_pb); blk_idx: int32 recording-block index; last_index: uint32
    chirp phase position of the STREAM (carried by the caller — the
    stream position and the recording index diverge when looping).
    Returns (new_last_index, y: C(nseg_pb,))."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    ppt = profile.shape[0]
    assert X_full.shape[1] == ppt
    assert nseg_pb % seg_tile == 0
    nr = nseg_pb // seg_tile
    last_arr = jnp.asarray(last_index, dtype=jnp.uint32).reshape(1)
    idx_arr = jnp.asarray(blk_idx, dtype=jnp.int32).reshape(1)

    x_map = lambda s, i: (i[0] * nr + s, 0)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # last_index
            pl.BlockSpec((seg_tile, ppt), x_map),        # x re
            pl.BlockSpec((seg_tile, ppt), x_map),        # x im
            pl.BlockSpec((ppt,), lambda s, i: (0,)),     # profile
        ],
        out_specs=(
            pl.BlockSpec((seg_tile, 1), lambda s, i: (s, 0)),
            pl.BlockSpec((seg_tile, 1), lambda s, i: (s, 0)),
        ),
    )
    def kernel(idx_ref, last_ref, xr_ref, xi_ref, w_ref, or_ref, oi_ref):
        # idx_ref is consumed by the BlockSpec index maps only
        _kernel(cfg, seg_tile, ppt, last_ref, xr_ref, xi_ref, w_ref,
                or_ref, oi_ref)

    out_shape = (jax.ShapeDtypeStruct((nseg_pb, 1), jnp.float32),
                 jax.ShapeDtypeStruct((nseg_pb, 1), jnp.float32))
    o_re, o_im = pl.pallas_call(
        kernel, grid_spec=gs, out_shape=out_shape, interpret=interpret,
    )(idx_arr, last_arr, X_full.re, X_full.im, profile)
    L = nseg_pb * ppt
    new_last = (last_index + jnp.uint32(L % cfg.period)) % \
        jnp.uint32(cfg.period)
    return new_last, C(o_re[:, 0], o_im[:, 0])
