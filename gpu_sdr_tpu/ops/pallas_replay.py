"""Pallas TPU kernel: fused DDC+FIR straight from an HBM-resident
recording — scalar-prefetched block indices, K blocks per grid.

The scan-form device replay (engine/replay.py) pays two costs the
loopback chains don't: `lax.dynamic_slice` materializes a copy of every
block it pulls out of the recording (an extra 2x block read/write per
block), and stacking the Pallas demodulator's per-block outputs through
the scan costs a relayout copy (see ops/pallas_chain.py).  Here the
whole execution is ONE kernel: the per-block recording indices are a
scalar-prefetch input consumed by the x BlockSpec's index_map, so tiles
stream directly out of the recording; the FIR history halo is simply the
8-row unit of the recording preceding each tile (wrapping mod the
recording length at the loop seam — the history IS in the recording);
the per-block output rotations are closed-form in the carried phase; and
each tile writes straight into the (K*nb, C) output.

DIRECT-mode replay equivalent of the reference's process_direct fed from
a recorded stream (cpp/USRP_demodulator.cpp:400-464).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import cplx
from .cplx import C
from .ddc import DirectDDCConfig
from .pallas_ddc import _pick_rows, hilo_split, split_dot

_HUNIT = 8      # halo block: one 8-row (sublane) unit preceding the tile


def _kernel(f: int, M: int, R: int, lead: int, nr: int,
            idx_ref, val_ref,
            xr_ref, xi_ref, lr_ref, li_ref, hr_ref, hi_ref, hs_ref,
            rr_ref, ri_ref, qdr_ref, qdi_ref, yr_ref, yi_ref):
    """One (R, C) output tile; grid = (K * nr,).

    x: R recording rows addressed via the prefetched block index; l: the
    8-row recording unit preceding the tile (its last f-1 rows are the
    FIR history; zeroed via val for the stream's very first tile); h*:
    modulated taps; rr/ri: carrier ramp tile (per-block-local rows);
    qdr/qdi: this block's output rotation row ((8, C), row 0 real).
    """
    pid = pl_program_id_0()
    r0 = pid % nr
    k = pid // nr
    # history validity: inside a block the halo rows always exist; the
    # block's first tile reads the previous block's tail, which is only
    # invalid at the very start of the stream (val[k] == 0)
    v = jnp.where(r0 == 0, val_ref[k].astype(jnp.float32),
                  jnp.float32(1.0))
    ext_r = jnp.concatenate([lr_ref[_HUNIT - lead:] * v, xr_ref[:]],
                            axis=0)
    ext_i = jnp.concatenate([li_ref[_HUNIT - lead:] * v, xi_ref[:]],
                            axis=0)
    ext_s = ext_r + ext_i

    xr_hi, xr_lo = hilo_split(ext_r)
    xi_hi, xi_lo = hilo_split(ext_i)
    xs_hi, xs_lo = hilo_split(ext_s)
    acc_r = acc_i = None
    for j in range(f):
        rr = split_dot(xr_hi[j:j + R], xr_lo[j:j + R],
                       hr_ref[j * M:(j + 1) * M, :])
        ii = split_dot(xi_hi[j:j + R], xi_lo[j:j + R],
                       hi_ref[j * M:(j + 1) * M, :])
        ri = split_dot(xs_hi[j:j + R], xs_lo[j:j + R],
                       hs_ref[j * M:(j + 1) * M, :])
        t_r, t_i = rr - ii, ri - rr - ii
        acc_r = t_r if acc_r is None else acc_r + t_r
        acc_i = t_i if acc_i is None else acc_i + t_i

    ramp_r, ramp_i = rr_ref[:], ri_ref[:]
    t_r = acc_r * ramp_r - acc_i * ramp_i
    t_i = acc_r * ramp_i + acc_i * ramp_r
    rot_r, rot_i = qdr_ref[0:1], qdi_ref[0:1]
    yr_ref[:] = t_r * rot_r - t_i * rot_i
    yi_ref[:] = t_r * rot_i + t_i * rot_r


def pl_program_id_0():
    import jax.experimental.pallas as pl
    return pl.program_id(0)


class ReplayDDC:
    """Compiled K-blocks-per-execution DDC over an HBM recording.

    Requirements (else callers fall back to the scan path): looped
    replay with a block-commensurate recording, decimating DIRECT mode
    with 2 <= pf_average (f-1 <= 8), tileable rows."""

    def __init__(self, cfg: DirectDDCConfig, data: np.ndarray,
                 block_len: int, blocks_per_exec: int = 8,
                 interpret: bool | None = None):
        self.cfg = cfg
        self.L = int(block_len)
        self.K = int(blocks_per_exec)
        M, f = cfg.M, cfg.f
        n = len(data)
        self.ok = (f >= 2 and f - 1 <= _HUNIT and self.L % M == 0 and
                   n % self.L == 0 and n > 0)
        if not self.ok:
            return
        self.nbr = self.L // M                  # output rows per block
        self.nblk = n // self.L                 # recording blocks
        self.R = _pick_rows(self.nbr, M, cfg.n_channels)
        self.ok = bool(self.R) and self.nbr % self.R == 0 and \
            self.R % _HUNIT == 0 and f - 1 <= self.R
        if not self.ok:
            return
        buf = np.asarray(data, dtype=np.complex64)
        xc = cplx.from_np(buf)
        self._X = C(xc.re.reshape(self.nblk * self.nbr, M),
                    xc.im.reshape(self.nblk * self.nbr, M))
        self._hmod = cfg.modulated_taps()
        self._hsum = self._hmod.re + self._hmod.im
        self._ramp = cfg.carrier_ramp(self.nbr)
        from .ddc import ddc_carrier_step
        self._dstep = ddc_carrier_step(cfg, self.L)
        self.interpret = interpret

    def init_state(self):
        from .ddc import ddc_carrier_init
        return (jnp.int32(0),                       # recording block index
                ddc_carrier_init(self.cfg, self.L),  # carried phase
                jnp.int32(0))                        # stream-started flag

    def _offsets(self, K, Cn):
        W = self.cfg.rate
        k = np.arange(K, dtype=np.int64)[:, None]
        s = np.asarray(self._dstep, dtype=np.int64)[None, :]
        return jnp.asarray(((k * s) % W).astype(np.int32))

    def multi_step(self, state, X: C | None = None):
        """One execution: K blocks -> (state', y (K*nbr, C)).

        Pass the recording `X` explicitly when calling under an outer
        jit: a closure-captured device array becomes an inlined constant
        in the compile request, which this rig's remote-compile relay
        rejects/crashes on for large recordings."""
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        idx0, dph, started = state
        cfg, K, R, nbr = self.cfg, self.K, self.R, self.nbr
        M, f, W, Cp = cfg.M, cfg.f, cfg.rate, cfg.n_channels
        nr = nbr // R
        interpret = self.interpret
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")

        ks = jnp.arange(K, dtype=jnp.int32)
        idxs = (idx0 + ks) % jnp.int32(self.nblk)
        # history valid except the stream's very first block
        val = jnp.where((ks == 0) & (started == 0), jnp.int32(0),
                        jnp.int32(1))
        doffs = self._offsets(K, Cp)
        dphs = dph[None, :] + doffs
        dphs = jnp.where(dphs >= W, dphs - W, dphs)
        drots = cplx.expi_neg(dphs.astype(jnp.float32) *
                              jnp.float32(2.0 * np.pi / W))
        rep8 = lambda a: jnp.repeat(a, 8, axis=0)    # Mosaic 8-sublane
        drots = C(rep8(drots.re), rep8(drots.im))

        nunit_tot = (self.nblk * nbr) // _HUNIT
        runit = R // _HUNIT

        def x_map(r, idx_ref, val_ref):
            return (idx_ref[r // nr] * nr + r % nr, 0)

        def halo_map(r, idx_ref, val_ref):
            g8 = (idx_ref[r // nr] * nr + r % nr) * runit
            return ((g8 - 1) % nunit_tot, 0)

        per_blk = lambda r, idx_ref, val_ref: (r // nr, 0)
        in_blk = lambda r, idx_ref, val_ref: (r % nr, 0)
        const2 = lambda r, idx_ref, val_ref: (0, 0)

        kernel = functools.partial(_kernel, f, M, R, f - 1, nr)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(K * nr,),
            in_specs=[
                pl.BlockSpec((R, M), x_map),               # x re
                pl.BlockSpec((R, M), x_map),               # x im
                pl.BlockSpec((_HUNIT, M), halo_map),       # halo re
                pl.BlockSpec((_HUNIT, M), halo_map),       # halo im
                pl.BlockSpec((f * M, Cp), const2),         # taps re
                pl.BlockSpec((f * M, Cp), const2),         # taps im
                pl.BlockSpec((f * M, Cp), const2),         # taps sum
                pl.BlockSpec((R, Cp), in_blk),             # ramp re
                pl.BlockSpec((R, Cp), in_blk),             # ramp im
                pl.BlockSpec((8, Cp), per_blk),            # drot re
                pl.BlockSpec((8, Cp), per_blk),            # drot im
            ],
            out_specs=(pl.BlockSpec((R, Cp), lambda r, i, v: (r, 0)),
                       pl.BlockSpec((R, Cp), lambda r, i, v: (r, 0))),
        )
        y_call = pl.pallas_call(
            kernel, grid_spec=gs,
            out_shape=(jax.ShapeDtypeStruct((K * nbr, Cp), jnp.float32),
                       jax.ShapeDtypeStruct((K * nbr, Cp), jnp.float32)),
            interpret=interpret,
        )
        Xr = self._X if X is None else X
        y_re, y_im = y_call(
            idxs, val, Xr.re, Xr.im, Xr.re, Xr.im,
            self._hmod.re, self._hmod.im, self._hsum,
            self._ramp.re, self._ramp.im, drots.re, drots.im)

        dK = self._offsets(K + 1, Cp)[K]
        new_dph = dph + dK
        new_dph = jnp.where(new_dph >= W, new_dph - W, new_dph)
        new_idx = (idx0 + K) % jnp.int32(self.nblk)
        return (new_idx, new_dph, jnp.int32(1)), C(y_re, y_im)
