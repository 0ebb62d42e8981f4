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
from .pallas_ddc import (_pick_rows, hilo_split, np_hilo, split_dot,
                         split_dot_presplit)

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


def _kernel_h(f: int, M: int, R: int, lead: int, nr: int,
              idx_ref, val_ref,
              xr_ref, xi_ref, lr_ref, li_ref, slr_ref, sli_ref,
              hr_ref, hi_ref, hs_ref,
              rr_ref, ri_ref, qdr_ref, qdi_ref, yr_ref, yi_ref):
    """_kernel with a SECOND, staged halo source for each block's first
    tile: under a time-sharded mesh a shard's stream-preceding recording
    rows live on the neighbouring shard (or, for shard 0, in the
    previous block), so they cannot be read from the shard-local
    recording layout.  Tiles r > 0 keep the in-recording halo unit
    (stream-contiguous within the shard); tile r == 0 reads the
    per-block staged halo (precomputed host-side at upload, loop wrap
    included), zeroed by val only on the shard owning the stream's
    first row."""
    pid = pl_program_id_0()
    r0 = pid % nr
    k = pid // nr
    first = r0 == 0
    v = jnp.where(first, val_ref[k].astype(jnp.float32), jnp.float32(1.0))
    hl_r = jnp.where(first, slr_ref[_HUNIT - lead:],
                     lr_ref[_HUNIT - lead:]) * v
    hl_i = jnp.where(first, sli_ref[_HUNIT - lead:],
                     li_ref[_HUNIT - lead:]) * v
    ext_r = jnp.concatenate([hl_r, xr_ref[:]], axis=0)
    ext_i = jnp.concatenate([hl_i, xi_ref[:]], axis=0)
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


class ShardedReplayDDC:
    """The row-major replay kernel's time-sharded form (round 5): the
    recording is laid out shard-major (shard t's span of every block
    contiguous), each block's first-tile FIR history comes from a
    staged per-(shard, block) halo array (the recording is static, so
    the cross-shard rows are precomputed at upload — zero collectives),
    and every other tile reads its history from the shard-local
    recording exactly as the single-chip kernel does.  Host-side
    staging lives here; parallel/sharded_replay.py wraps invoke_local
    in a shard_map.  Reference analog: process_direct fed from a
    recorded stream, cpp/USRP_demodulator.cpp:400-464 (single-GPU)."""

    @classmethod
    def plan_tiles(cls, cfg: DirectDDCConfig, n: int, L: int, T: int):
        """(nbr, nbr_t, nblk, R) when the PER-SHARD geometry tiles."""
        M, f = cfg.M, cfg.f
        if not (f >= 2 and f - 1 <= _HUNIT and L % M == 0 and
                n % L == 0 and n > 0):
            return None
        nbr, nblk = L // M, n // L
        if nbr % T != 0:
            return None
        nbr_t = nbr // T
        R = _pick_rows(nbr_t, M, cfg.n_channels)
        if not (R and nbr_t % R == 0 and R % _HUNIT == 0 and f - 1 <= R):
            return None
        return nbr, nbr_t, nblk, R

    def __init__(self, cfg: DirectDDCConfig, data: np.ndarray,
                 block_len: int, T: int, blocks_per_exec: int = 8,
                 interpret: bool | None = None):
        self.cfg = cfg
        self.L = int(block_len)
        self.T = int(T)
        self.K = int(blocks_per_exec)
        n = len(data)
        plan = self.plan_tiles(cfg, n, self.L, self.T)
        self.ok = plan is not None
        if not self.ok:
            return
        self.nbr, self.nbr_t, self.nblk, self.R = plan
        M = cfg.M
        rows = np.asarray(data, dtype=np.complex64).reshape(
            self.nblk * self.nbr, M)
        # shard-major recording: shard t's blocks contiguous at
        # [t*nblk*nbr_t, (t+1)*nblk*nbr_t), block b at [b*nbr_t, ...)
        g = rows.reshape(self.nblk, T, self.nbr_t, M)
        self.X_np = np.ascontiguousarray(
            g.transpose(1, 0, 2, 3).reshape(T * self.nblk * self.nbr_t,
                                            M))
        # staged per-(shard, block) halo units: the _HUNIT recording
        # rows preceding the shard's span in stream order, wrap mod the
        # recording (real history rows LAST, like the in-recording unit)
        tot = self.nblk * self.nbr
        h = np.empty((T, self.nblk, _HUNIT, M), np.complex64)
        for t in range(T):
            for b in range(self.nblk):
                p = b * self.nbr + t * self.nbr_t
                h[t, b] = rows[np.arange(p - _HUNIT, p) % tot]
        self.H_np = np.ascontiguousarray(
            h.reshape(T * self.nblk * _HUNIT, M))
        self._hmod = cfg.modulated_taps()
        self._hsum = self._hmod.re + self._hmod.im
        self._ramp = cfg.carrier_ramp(self.nbr)   # (nbr, Cp): time-shards
        from .ddc import ddc_carrier_step
        self._dstep = ddc_carrier_step(cfg, self.L)
        self.interpret = interpret

    # replicated stream state + per-execution rotations: identical to
    # the single-chip kernel (phase advance is per GLOBAL block);
    # delegated at call time because ReplayDDC is defined below
    def init_state(self):
        return ReplayDDC.init_state(self)

    def _offsets(self, K, Cn):
        return ReplayDDC._offsets(self, K, Cn)

    def _block_rots_and_advance(self, state, K):
        return ReplayDDC._block_rots_and_advance(self, state, K)

    def invoke_local(self, idxs, val, drots8, Xl: C, Hl: C,
                     rampl: C) -> C:
        """One execution's kernel on ONE shard's local arrays: Xl
        (nblk*nbr_t, M) recording span, Hl (nblk*_HUNIT, M) staged
        halos, rampl (nbr_t, Cp) ramp rows; idxs (K,) block indices,
        val (K,) per-shard history-valid flags, drots8 (8K, Cp)
        rotation rows.  Returns y (K*nbr_t, Cp)."""
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        cfg, K, R = self.cfg, self.K, self.R
        M, f, Cp = cfg.M, cfg.f, cfg.n_channels
        nr = self.nbr_t // R
        interpret = self.interpret
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        nunit_loc = (self.nblk * self.nbr_t) // _HUNIT
        runit = R // _HUNIT

        x_map = lambda r, i, v: (i[r // nr] * nr + r % nr, 0)
        halo_map = lambda r, i, v: \
            (((i[r // nr] * nr + r % nr) * runit - 1) % nunit_loc, 0)
        staged_map = lambda r, i, v: (i[r // nr], 0)
        per_blk = lambda r, i, v: (r // nr, 0)
        in_blk = lambda r, i, v: (r % nr, 0)
        const2 = lambda r, i, v: (0, 0)

        kernel = functools.partial(_kernel_h, f, M, R, f - 1, nr)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(K * nr,),
            in_specs=[
                pl.BlockSpec((R, M), x_map),             # x re
                pl.BlockSpec((R, M), x_map),             # x im
                pl.BlockSpec((_HUNIT, M), halo_map),     # in-rec halo re
                pl.BlockSpec((_HUNIT, M), halo_map),     # in-rec halo im
                pl.BlockSpec((_HUNIT, M), staged_map),   # staged halo re
                pl.BlockSpec((_HUNIT, M), staged_map),   # staged halo im
                pl.BlockSpec((f * M, Cp), const2),       # taps re
                pl.BlockSpec((f * M, Cp), const2),       # taps im
                pl.BlockSpec((f * M, Cp), const2),       # taps sum
                pl.BlockSpec((R, Cp), in_blk),           # ramp re
                pl.BlockSpec((R, Cp), in_blk),           # ramp im
                pl.BlockSpec((8, Cp), per_blk),          # drot re
                pl.BlockSpec((8, Cp), per_blk),          # drot im
            ],
            out_specs=(pl.BlockSpec((R, Cp), lambda r, i, v: (r, 0)),
                       pl.BlockSpec((R, Cp), lambda r, i, v: (r, 0))),
        )
        y_re, y_im = pl.pallas_call(
            kernel, grid_spec=gs,
            out_shape=(
                jax.ShapeDtypeStruct((K * self.nbr_t, Cp), jnp.float32),
                jax.ShapeDtypeStruct((K * self.nbr_t, Cp), jnp.float32),
            ),
            interpret=interpret,
        )(idxs, val, Xl.re, Xl.im, Xl.re, Xl.im, Hl.re, Hl.im,
          self._hmod.re, self._hmod.im, self._hsum,
          rampl.re, rampl.im, drots8.re, drots8.im)
        return C(y_re, y_im)


class ReplayDDC:
    """Compiled K-blocks-per-execution DDC over an HBM recording.

    Requirements (else callers fall back to the scan path): looped
    replay with a block-commensurate recording, decimating DIRECT mode
    with 2 <= pf_average (f-1 <= 8), tileable rows."""

    @classmethod
    def plan_tiles(cls, cfg: DirectDDCConfig, n: int, L: int):
        """The ok flag's pure shape math: (nbr, nblk, R) when the
        recording/geometry is tileable, else None.  Shared by __init__
        and engine/dispatch.plan_dispatch so the dispatch table cannot
        drift from the builder."""
        M, f = cfg.M, cfg.f
        if not (f >= 2 and f - 1 <= _HUNIT and L % M == 0 and
                n % L == 0 and n > 0):
            return None
        nbr, nblk = L // M, n // L
        R = _pick_rows(nbr, M, cfg.n_channels)
        if not (R and nbr % R == 0 and R % _HUNIT == 0 and f - 1 <= R):
            return None
        return nbr, nblk, R

    def __init__(self, cfg: DirectDDCConfig, data: np.ndarray,
                 block_len: int, blocks_per_exec: int = 8,
                 interpret: bool | None = None):
        self.cfg = cfg
        self.L = int(block_len)
        self.K = int(blocks_per_exec)
        n = len(data)
        plan = self.plan_tiles(cfg, n, self.L)
        self.ok = plan is not None
        if not self.ok:
            return
        self.nbr, self.nblk, self.R = plan
        M = cfg.M
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

    def _block_rots_and_advance(self, state, K):
        """Per-block output rotations for K blocks (exact int32 phase) and
        the advanced state: (idxs, val, drots (K, C), state')."""
        idx0, dph, started = state
        W, Cp = self.cfg.rate, self.cfg.n_channels
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
        dK = self._offsets(K + 1, Cp)[K]
        new_dph = dph + dK
        new_dph = jnp.where(new_dph >= W, new_dph - W, new_dph)
        new_idx = (idx0 + K) % jnp.int32(self.nblk)
        return idxs, val, drots, (new_idx, new_dph, jnp.int32(1))

    def multi_step(self, state, X: C | None = None):
        """One execution: K blocks -> (state', y (K*nbr, C)).

        Pass the recording `X` explicitly when calling under an outer
        jit: a closure-captured device array becomes an inlined constant
        in the compile request, which this rig's remote-compile relay
        rejects/crashes on for large recordings."""
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        cfg, K, R, nbr = self.cfg, self.K, self.R, self.nbr
        M, f, W, Cp = cfg.M, cfg.f, cfg.rate, cfg.n_channels
        nr = nbr // R
        interpret = self.interpret
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")

        idxs, val, drots, new_state = self._block_rots_and_advance(state, K)
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

        return new_state, C(y_re, y_im)


_TLEAD = 128    # baked halo columns preceding each pre-tiled column tile


def _kernel_t(f: int, R: int, lead: int, nr: int, CpP: int,
              idx_ref, val_ref,
              xr_ref, xi_ref,
              hrh_ref, hrl_ref, hih_ref, hil_ref, hsh_ref, hsl_ref,
              yr_ref, yi_ref):
    """Transposed (few-channel) variant: one (R, CpP) output tile.

    With few channels the row-major kernel pads the output lanes
    C -> 128 and every tap matmul burns 128/C of the MXU.  Here the tap
    matrices ride the SUBLANE side instead: each tap contributes a
    (CpP, M) x (M, R+128) dot — MXU cost scales with ceil(C/8)/8 instead
    of 1, a 16x pass reduction at C=1.  The input arrives PRE-TILED
    column-major with the FIR history baked in as _TLEAD halo columns
    per tile (built once at init; ~8% extra HBM), so the kernel never
    transposes or concatenates — in-VMEM relayouts are what ate the
    MXU savings in the first (in-kernel transpose) version of this
    kernel.  The taps arrive pre-split (bf16 hi/lo x re/im/sum,
    np_hilo); the carrier ramp and the per-block output rotation move
    to a cheap XLA post-multiply on the (K*nb, C) output (decimated:
    ~C/(4*M) of the input bytes), so the kernel carries no per-row
    constants at all.
    """
    pid = pl_program_id_0()
    r0 = pid % nr
    v = jnp.where(r0 == 0, val_ref[pid // nr].astype(jnp.float32),
                  jnp.float32(1.0))
    # stream start: zero the baked-in (wrapped) history columns
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, R + _TLEAD), 1)
    m = jnp.where(lane < _TLEAD, v, jnp.float32(1.0))
    ext_r = xr_ref[0] * m                            # (M, R+_TLEAD)
    ext_i = xi_ref[0] * m
    ext_s = ext_r + ext_i

    er_hi, er_lo = hilo_split(ext_r)
    ei_hi, ei_lo = hilo_split(ext_i)
    es_hi, es_lo = hilo_split(ext_s)
    # ALL taps in one (f*CpP, M) LHS per component-pass: 9 MXU dots per
    # tile instead of 36.  With CpP=8 output rows the MXU runs at 8/128
    # row occupancy and its cost is invocation-shaped, not MAC-shaped —
    # measured f=4 vs f=2 (tools/perf_c1_taps.py: 24.1 vs 27.4 Gsps,
    # same bytes) puts the tap dots at ~24% of tile time.  Slicing the
    # stacked result is bit-identical to dotting per-tap slices (output
    # rows are independent).
    RR = split_dot_presplit(hrh_ref[:], hrl_ref[:], er_hi, er_lo)
    II = split_dot_presplit(hih_ref[:], hil_ref[:], ei_hi, ei_lo)
    RI = split_dot_presplit(hsh_ref[:], hsl_ref[:], es_hi, es_lo)
    TR, TI = RR - II, RI - RR - II                   # (f*CpP, R+_TLEAD)
    acc_r = acc_i = None
    for j in range(f):
        s = slice(j * CpP, (j + 1) * CpP)
        j0 = _TLEAD - lead + j
        t_r = TR[s, j0:j0 + R]
        t_i = TI[s, j0:j0 + R]
        acc_r = t_r if acc_r is None else acc_r + t_r
        acc_i = t_i if acc_i is None else acc_i + t_i
    # write channel-major: a (K*nb, CpP) output would be 4*CpP-byte
    # strided row writes (the wall this kernel first hit at ~100 GB/s);
    # the (1, CpP, R) block is one contiguous burst, un-packed by XLA
    yr_ref[0] = acc_r
    yi_ref[0] = acc_i


def _pick_rows_t(nb: int, M: int, CpP: int) -> int:
    """Column-tile width for the transposed kernel: divisor of nb,
    multiple of 8, VMEM-capped.  Per column (sublanes = M padded to 8):
    x f32 re+im double-buffered + ext f32 x3 + bf16 splits x6."""
    Ms = -(-M // 8) * 8
    bytes_per_col = 16 * Ms + 12 * Ms + 12 * Ms + 16 * CpP + 32
    cap = (9 * 2 ** 20) // max(bytes_per_col, 1) - _TLEAD
    # largest divisor wins outright: with columns on lanes the 32-align
    # sweet spot of the row-major streamed tiles does not apply
    # (measured R=2000 ~9% over R=1600 at the config-1 shape); cap < 8
    # -> 0 and make_replay_ddc falls back to row-major
    from .pallas_ddc import pick_tile
    return pick_tile(nb, cap, prefer_align=False)


class ReplayDDCT(ReplayDDC):
    """Few-channel (C <= 8) transposed ReplayDDC — same state and call
    convention; the recording is pre-tiled column-major with baked FIR
    halos (see _kernel_t) and ramp/rotation apply in XLA on the
    decimated output."""

    @classmethod
    def plan_tiles(cls, cfg: DirectDDCConfig, n: int, L: int,
                   rows: int | None = None):
        """Shape math of the transposed kernel's ok flag (see
        ReplayDDC.plan_tiles)."""
        M, f = cfg.M, cfg.f
        Cp = cfg.n_channels
        CpP = 8 * max(1, -(-Cp // 8))
        if not (f >= 2 and f - 1 <= _TLEAD and L % M == 0 and
                n % L == 0 and n > 0 and Cp <= 32):
            return None
        nbr, nblk = L // M, n // L
        R = int(rows) if rows else _pick_rows_t(nbr, M, CpP)
        if not (R and nbr % R == 0 and R % _HUNIT == 0 and f - 1 <= R):
            return None
        return nbr, nblk, R

    def __init__(self, cfg: DirectDDCConfig, data: np.ndarray,
                 block_len: int, blocks_per_exec: int = 8,
                 interpret: bool | None = None, rows: int | None = None):
        self.cfg = cfg
        self.L = int(block_len)
        self.K = int(blocks_per_exec)
        M, f = cfg.M, cfg.f
        Cp = cfg.n_channels
        n = len(data)
        self.CpP = 8 * max(1, -(-Cp // 8))
        plan = self.plan_tiles(cfg, n, self.L, rows=rows)
        self.ok = plan is not None
        if not self.ok:
            return
        self.nbr, self.nblk, self.R = plan
        # pre-tiled transposed recording: tile t = columns
        # [t*R - _TLEAD, t*R + R) of X^T (M, ntot), wrapping mod ntot
        # (the wrap IS the looped-replay FIR history; the stream's first
        # tile masks it in-kernel)
        buf = np.asarray(data, dtype=np.complex64)
        ntot = self.nblk * self.nbr
        xt = buf.reshape(ntot, M).T                 # (M, ntot)
        n_tiles = ntot // self.R
        cols = (np.arange(n_tiles)[:, None] * self.R +
                np.arange(-_TLEAD, self.R)[None, :]) % ntot
        xtt = np.ascontiguousarray(
            xt[:, cols].transpose(1, 0, 2))         # (n_tiles, M, R+128)
        self._X = C(jnp.asarray(xtt.real), jnp.asarray(xtt.imag))
        # taps transposed per-tap to (f*CpP, M), pre-split bf16 hi/lo
        hm = cfg.modulated_taps()
        hr = np.asarray(hm.re).reshape(f, M, Cp)
        hi = np.asarray(hm.im).reshape(f, M, Cp)

        def pack(a):       # (f, M, Cp) -> (f*CpP, M)
            t = np.zeros((f, self.CpP, M), np.float32)
            t[:, :Cp, :] = a.transpose(0, 2, 1)
            return t.reshape(f * self.CpP, M)

        self._HT = tuple(jnp.asarray(a) for pair in
                         (np_hilo(pack(hr)), np_hilo(pack(hi)),
                          np_hilo(pack(hr + hi))) for a in pair)
        self._ramp = cfg.carrier_ramp(self.nbr)
        from .ddc import ddc_carrier_step
        self._dstep = ddc_carrier_step(cfg, self.L)
        self.interpret = interpret

    def multi_step(self, state, X: C | None = None):
        """One execution: K blocks -> (state', y (K*nbr, C))."""
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        cfg, K, R, nbr = self.cfg, self.K, self.R, self.nbr
        M, f, Cp = cfg.M, cfg.f, cfg.n_channels
        CpP = self.CpP
        nr = nbr // R
        interpret = self.interpret
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")

        idxs, val, drots, new_state = self._block_rots_and_advance(state, K)

        def x_map(r, idx_ref, val_ref):
            return (idx_ref[r // nr] * nr + r % nr, 0, 0)

        const2 = lambda r, idx_ref, val_ref: (0, 0)

        kernel = functools.partial(_kernel_t, f, R, f - 1, nr, CpP)
        ht_spec = pl.BlockSpec((f * CpP, M), const2)
        x_spec = pl.BlockSpec((1, M, R + _TLEAD), x_map)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(K * nr,),
            in_specs=[
                x_spec, x_spec,                            # pre-tiled x^T
                ht_spec, ht_spec,                          # tapsT re hi/lo
                ht_spec, ht_spec,                          # tapsT im hi/lo
                ht_spec, ht_spec,                          # tapsT sum hi/lo
            ],
            out_specs=(pl.BlockSpec((1, CpP, R), lambda r, i, v: (r, 0, 0)),
                       pl.BlockSpec((1, CpP, R), lambda r, i, v: (r, 0, 0))),
        )
        y_call = pl.pallas_call(
            kernel, grid_spec=gs,
            out_shape=(jax.ShapeDtypeStruct((K * nr, CpP, R), jnp.float32),
                       jax.ShapeDtypeStruct((K * nr, CpP, R), jnp.float32)),
            interpret=interpret,
        )
        Xr = self._X if X is None else X
        y_re, y_im = y_call(idxs, val, Xr.re, Xr.im, *self._HT)
        unpack = lambda a: a.transpose(0, 2, 1).reshape(K * nbr, CpP)[:, :Cp]
        y = C(unpack(y_re), unpack(y_im))

        # ramp x per-block rotation on the decimated output (XLA);
        # drots (K, Cp) from the shared exact-int32 phase bookkeeping
        ramp = self._ramp                                     # (nbr, Cp)
        rot_r = (drots.re[:, None, :] * ramp.re[None] -
                 drots.im[:, None, :] * ramp.im[None]).reshape(K * nbr, Cp)
        rot_i = (drots.re[:, None, :] * ramp.im[None] +
                 drots.im[:, None, :] * ramp.re[None]).reshape(K * nbr, Cp)
        y = cplx.mul(y, C(rot_r, rot_i))
        return new_state, y


def make_replay_ddc(cfg: DirectDDCConfig, data: np.ndarray,
                    block_len: int, blocks_per_exec: int = 8,
                    interpret: bool | None = None) -> ReplayDDC:
    """ReplayDDC factory: the transposed kernel for few channels
    (C <= 8, where the row-major form wastes 128/C of every MXU pass),
    the row-major kernel otherwise.  Callers check `.ok`."""
    if cfg.n_channels <= 8:
        rk = ReplayDDCT(cfg, data, block_len, blocks_per_exec, interpret)
        if rk.ok:
            return rk
    return ReplayDDC(cfg, data, block_len, blocks_per_exec, interpret)


def replay_ddc_kind(cfg: DirectDDCConfig, n: int, L: int):
    """Which kernel make_replay_ddc would return (and whether it is ok)
    without building it: 'replay_kernel_t' / 'replay_kernel' / None.
    Mirrors make_replay_ddc exactly via the shared plan_tiles math."""
    if cfg.n_channels <= 8 and ReplayDDCT.plan_tiles(cfg, n, L):
        return "replay_kernel_t"
    if ReplayDDC.plan_tiles(cfg, n, L):
        return "replay_kernel"
    return None
