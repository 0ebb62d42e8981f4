"""Pallas TPU kernel: single-kernel fused TONES -> DIRECT loopback chain.

The config-3 production shape (multi-tone comb TX looped into the fused
DDC+FIR RX — the reference's --sw_loop path with TONES TX and DIRECT RX)
never needs the raw block x at all.  Round-2's first version synthesized
x in-VMEM (x_tile = P_tile @ Q) and then ran the f DDC tap dots on the
synthesized rows; but the synthesis matmul and the tap matmuls CONTRACT
THROUGH x, so x can be eliminated algebraically:

    y[r, c] = sum_j sum_m x[(r+j)*M + m] * hmod[j*M + m, c]
    x[n*M + m] = sum_t srot_t * P[n, t] * Q[t, m]
  =>
    y[r, c] = sum_j sum_t (srot_t * P[r+j, t]) * G[j, t, c]
    G[j, t, c] = sum_m Q[t, m] * hmod[j*M + m, c]   -- constant (f, C_t, C')

G is computed host-side in float64 (comb factor x modulated taps) and
shipped pre-split into bf16 hi/lo pairs, so per tile the kernel does only:
rotate the P rows, split them, and run f Karatsuba dots of
(R, C_t) x (C_t, C') — the decimation axis M never enters the kernel, the
synthesized rows are never materialized, and no constant is re-split per
grid step.  For the 100-tone/decim-100 config this removes ~20% of the
MXU passes and all of the per-tile VPU split work of the first version
(measured 7.9 -> see docs/05_performance.md).

Per block the only HBM traffic is the P tile read, the carrier ramp, and
the (nb, C') output.  There is no carried FIR history: a block's leading
halo rows are re-synthesized from P's last rows with the PREVIOUS block's
rotation, so the whole streaming state is three int32 phase vectors.

All dots use the manual bf16 hi/lo split (the tensorfloat32/HIGH product
set — Mosaic lowers DEFAULT/HIGHEST only; see ops/pallas_ddc.py).

Replaces the reference's tone_gen wavetable + direct_demodulator_integer
+ per-channel FIR chain (cpp/kernels.cu:589-684, :45-86, cpp/fir.cu).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import cplx
from .cplx import C
from .ddc import DirectDDCConfig
from .pallas_ddc import _HALO_PAD, hilo_split as _hilo, \
    np_hilo as _np_hilo, split_dot_presplit as _psdot


def _kernel(f: int, R: int, lead: int, nr: int,
            pr_ref, pi_ref, lr_ref, li_ref,
            grh_ref, grl_ref, gih_ref, gil_ref, gsh_ref, gsl_ref,
            rr_ref, ri_ref,
            sr_ref, si_ref, vr_ref, vi_ref, qdr_ref, qdi_ref,
            yr_ref, yi_ref):
    """One (R, C') output tile; grid = (K * nr,) — K streamed blocks of nr
    tiles each, all in ONE kernel invocation (the per-block phase
    rotations are closed-form, so there is no sequential carry inside an
    execution and lax.scan — with its per-block output-stacking copies —
    is unnecessary; the kernel writes straight into the (K*nb, C')
    output).

    p: P rows [(r%nr)*R ...); l: the lead rows preceding the tile in P
    (wrapped mod nb, padded to _HALO_PAD, real rows LAST); g*: the fused
    synthesis x taps constant G (f, C_t, C') as bf16 hi/lo pairs for
    re / im / re+im; rr/ri: carrier ramp tile; sr/si: this block's
    synthesis rotation row (1, C_t); vr/vi: the halo rotation row for the
    block's FIRST tile (the previous block's rotation, pre-zeroed ahead
    of block 0); qdr/qdi: the block's DDC output rotation (1, C').
    """
    r0 = pl_program_id_0() % nr
    # per-block rotation rows arrive as (8, C) tiles (each row replicated
    # x8 to satisfy Mosaic's 8-sublane block granularity); row 0 is real
    sr_row, si_row = sr_ref[0:1], si_ref[0:1]
    dr_row, di_row = qdr_ref[0:1], qdi_ref[0:1]
    # rotation for the halo rows: previous block's for the block's first
    # tile (its halo rows wrap to the previous block's tail), else current
    hro_r = jnp.where(r0 == 0, vr_ref[0:1], sr_row)
    hro_i = jnp.where(r0 == 0, vi_ref[0:1], si_row)
    lr = lr_ref[_HALO_PAD - lead:]
    li = li_ref[_HALO_PAD - lead:]
    halo_r = lr * hro_r - li * hro_i
    halo_i = lr * hro_i + li * hro_r
    tr = pr_ref[:] * sr_row - pi_ref[:] * si_row
    ti = pr_ref[:] * si_row + pi_ref[:] * sr_row
    pe_r = jnp.concatenate([halo_r, tr], axis=0)      # (R+lead, C_t)
    pe_i = jnp.concatenate([halo_i, ti], axis=0)

    # fused synthesis+DDC+FIR: f Karatsuba dots against the G constant
    pr_hi, pr_lo = _hilo(pe_r)
    pi_hi, pi_lo = _hilo(pe_i)
    ps_hi, ps_lo = _hilo(pe_r + pe_i)
    acc_r = acc_i = None
    for j in range(f):
        rr = _psdot(pr_hi[j:j + R], pr_lo[j:j + R],
                    grh_ref[j], grl_ref[j])
        ii = _psdot(pi_hi[j:j + R], pi_lo[j:j + R],
                    gih_ref[j], gil_ref[j])
        ri = _psdot(ps_hi[j:j + R], ps_lo[j:j + R],
                    gsh_ref[j], gsl_ref[j])
        t_r, t_i = rr - ii, ri - rr - ii
        acc_r = t_r if acc_r is None else acc_r + t_r
        acc_i = t_i if acc_i is None else acc_i + t_i

    ramp_r = rr_ref[:]
    ramp_i = ri_ref[:]
    t_r = acc_r * ramp_r - acc_i * ramp_i
    t_i = acc_r * ramp_i + acc_i * ramp_r
    rot_r = dr_row
    rot_i = di_row
    yr_ref[:] = t_r * rot_r - t_i * rot_i
    yi_ref[:] = t_r * rot_i + t_i * rot_r


def pl_program_id_0():
    import jax.experimental.pallas as pl
    return pl.program_id(0)


def _pick_rows(nb: int, Ct: int, Cp: int, f: int) -> int:
    """Tile height: divisor of nb, multiple of 8, VMEM-capped (P tile +
    splits + output/ramp rows, double-buffered, after the resident G
    constant)."""
    from .pallas_ddc import pick_tile
    Ctp = -(-Ct // 128) * 128
    Cpp = -(-Cp // 128) * 128
    g_bytes = 6 * f * Ctp * Cpp * 2
    bytes_per_row = 28 * Ctp + 32 * Cpp
    # cap < 8 (resident G + minimal tile overflow VMEM) -> 0: callers'
    # ok-gate falls back to the scan path
    return pick_tile(nb, (10 * 2 ** 20 - g_bytes) // max(bytes_per_row, 1))


@dataclasses.dataclass
class TonesDirectChain:
    """Compiled single-kernel TONES->DIRECT loopback for one geometry.

    Build once per measurement; `step(state)` emits one (nb, C') block of
    demodulated samples with NO input — the comb is synthesized in-kernel.
    State: (synth_phase (C_t,), ddc_phase (C',), prev_valid ()) int32/f32.
    """

    rate: int
    tx_freqs: Tuple[int, ...]
    tx_ampls: Tuple[float, ...]
    cfg: DirectDDCConfig
    block_len: int
    scale: float = 1.0
    interpret: bool | None = None
    time_shards: int = 1     # tile rows must divide the per-shard rows
    rows: int | None = None  # tile height override (perf tuning)

    def __post_init__(self):
        W, L, M, f = self.rate, self.block_len, self.cfg.M, self.cfg.f
        assert L % M == 0
        nb = L // M
        Ct = len(self.tx_freqs)
        Cp = self.cfg.n_channels
        self.nb, self.Ct, self.Cp = nb, Ct, Cp
        nbt = nb // self.time_shards if nb % self.time_shards == 0 else 0
        self.R = (self.rows if self.rows is not None
                  else _pick_rows(nbt, Ct, Cp, f)) if nbt else 0
        self.lead = f - 1
        self.ok = bool(self.R) and f >= 2 and self.lead <= _HALO_PAD \
            and self.lead <= self.R and nbt and nbt % self.R == 0
        if not self.ok:
            return
        # P (nb, Ct) from exact integer phases; halo rows of P (wrapped
        # mod nb) staged per tile, real rows LAST in the pad
        fr = np.asarray(self.tx_freqs, dtype=np.int64) % W
        n = np.arange(nb, dtype=np.int64)
        m = np.arange(M, dtype=np.int64)
        ph_p = (fr[None, :] * ((n[:, None] * M) % W)) % W
        ph_q = (fr[:, None] * (m[None, :] % W)) % W
        P = np.exp(2j * np.pi * (ph_p / float(W)))
        Q = (np.asarray(self.tx_ampls, dtype=np.float64)[:, None] *
             np.exp(2j * np.pi * (ph_q / float(W)))) * self.scale
        nr = nb // self.R
        idx = ((np.arange(nr)[:, None]) * self.R - self.lead +
               np.arange(_HALO_PAD)[None, :] - (_HALO_PAD - self.lead))
        lP = P[idx.reshape(-1) % nb]           # tile 0 wraps to P's tail
        self._P = cplx.const(P.astype(np.complex64))
        self._lP = cplx.const(lP.astype(np.complex64))
        # G[j, t, c] = sum_m Q[t, m] * hmod[j*M+m, c] in float64: the
        # synthesis matmul contracted into the modulated taps host-side
        hmod = self.cfg.modulated_taps_np()
        G = np.einsum("tm,jmc->jtc", Q,
                      hmod.reshape(f, M, Cp)).astype(np.complex64)
        g_re = G.real.astype(np.float32)
        g_im = G.imag.astype(np.float32)
        self._G = tuple(jnp.asarray(a) for pair in
                        (_np_hilo(g_re), _np_hilo(g_im),
                         _np_hilo(g_re + g_im)) for a in pair)
        self._ramp = self.cfg.carrier_ramp(nb)
        self._sstep = jnp.asarray(((fr * L) % W).astype(np.int32))
        from .ddc import ddc_carrier_step
        self._dstep = ddc_carrier_step(self.cfg, L)

    def init_state(self):
        from .ddc import ddc_carrier_init
        return (jnp.zeros(self.Ct, dtype=jnp.int32),
                ddc_carrier_init(self.cfg, self.block_len),
                jnp.float32(0.0))

    def _phase_offsets(self, step_np, K: int, Cn: int) -> jax.Array:
        """(K, Cn) int32 per-block phase offsets k*step mod W (host int64
        so k*step never overflows)."""
        W = self.rate
        k = np.arange(K, dtype=np.int64)[:, None]
        s = np.asarray(step_np, dtype=np.int64)[None, :]
        return jnp.asarray(((k * s) % W).astype(np.int32))

    def block_rotations(self, state, K: int):
        """(state', srots, hrots, drots): per-block rotation rows for K
        consecutive blocks, each x8-row-replicated (Mosaic 8-sublane
        block granularity; the kernel reads row 0)."""
        sph, dph, pv = state
        W, Ct, Cp = self.rate, self.Ct, self.Cp
        two_pi_w = jnp.float32(2.0 * np.pi / W)
        soffs = self._phase_offsets(np.asarray(self._sstep), K, Ct)
        sphs = sph[None, :] + soffs                  # < 2W, fits int32
        sphs = jnp.where(sphs >= W, sphs - W, sphs)  # (K, Ct)
        srots = cplx.expi(sphs.astype(jnp.float32) * two_pi_w)
        sp_prev = sph - self._sstep
        sp_prev = jnp.where(sp_prev < 0, sp_prev + W, sp_prev)
        prot0 = cplx.expi(sp_prev.astype(jnp.float32) * two_pi_w)
        # halo rotation for block k's first tile = block k-1's rotation;
        # ahead of the stream's very first block it is zeroed (pv=0)
        hrots = C(jnp.concatenate([prot0.re[None, :] * pv,
                                   srots.re[:-1]], axis=0),
                  jnp.concatenate([prot0.im[None, :] * pv,
                                   srots.im[:-1]], axis=0))
        doffs = self._phase_offsets(np.asarray(self._dstep), K, Cp)
        dphs = dph[None, :] + doffs
        dphs = jnp.where(dphs >= W, dphs - W, dphs)
        drots = cplx.expi_neg(dphs.astype(jnp.float32) * two_pi_w)

        rep8 = lambda a: C(jnp.repeat(a.re, 8, axis=0),
                           jnp.repeat(a.im, 8, axis=0))
        sK = self._phase_offsets(np.asarray(self._sstep), K + 1, Ct)[K]
        dK = self._phase_offsets(np.asarray(self._dstep), K + 1, Cp)[K]
        new_sph = sph + sK
        new_sph = jnp.where(new_sph >= W, new_sph - W, new_sph)
        new_dph = dph + dK
        new_dph = jnp.where(new_dph >= W, new_dph - W, new_dph)
        state = (new_sph, new_dph, jnp.float32(1.0))
        return state, rep8(srots), rep8(hrots), rep8(drots)

    def invoke(self, P, lP, G, ramp, srots, hrots,
               drots, K: int, interpret: bool | None = None):
        """Run the kernel over K blocks of (possibly shard-local)
        operands; returns y (K * P.shape[0], Cp).  G is the 6-tuple of
        (f, C_t, C'_local) bf16 arrays (re/im/sum, hi/lo each)."""
        import jax.experimental.pallas as pl
        f, R = self.cfg.f, self.R
        nb_loc = P.shape[0]
        Ct, Cp = P.shape[1], G[0].shape[2]
        nr = nb_loc // R
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")

        kernel = functools.partial(_kernel, f, R, self.lead, nr)
        out_shape = (jax.ShapeDtypeStruct((K * nb_loc, Cp), jnp.float32),
                     jax.ShapeDtypeStruct((K * nb_loc, Cp), jnp.float32))
        per_blk = lambda r: (r // nr, 0)             # (K*8, C) rotation rows
        in_blk = lambda r: (r % nr, 0)               # per-block-local tiles
        g_blk = lambda r: (0, 0, 0)                  # resident G constant
        g_spec = pl.BlockSpec((f, Ct, Cp), g_blk)
        y_re, y_im = pl.pallas_call(
            kernel,
            grid=(K * nr,),
            in_specs=[
                pl.BlockSpec((R, Ct), in_blk),               # P re
                pl.BlockSpec((R, Ct), in_blk),               # P im
                pl.BlockSpec((_HALO_PAD, Ct), in_blk),       # lP re
                pl.BlockSpec((_HALO_PAD, Ct), in_blk),       # lP im
                g_spec, g_spec,                              # G re hi/lo
                g_spec, g_spec,                              # G im hi/lo
                g_spec, g_spec,                              # G sum hi/lo
                pl.BlockSpec((R, Cp), in_blk),               # ramp re
                pl.BlockSpec((R, Cp), in_blk),               # ramp im
                pl.BlockSpec((8, Ct), per_blk),              # srot re
                pl.BlockSpec((8, Ct), per_blk),              # srot im
                pl.BlockSpec((8, Ct), per_blk),              # halo rot re
                pl.BlockSpec((8, Ct), per_blk),              # halo rot im
                pl.BlockSpec((8, Cp), per_blk),              # drot re
                pl.BlockSpec((8, Cp), per_blk),              # drot im
            ],
            out_specs=(
                pl.BlockSpec((R, Cp), lambda r: (r, 0)),
                pl.BlockSpec((R, Cp), lambda r: (r, 0)),
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(P.re, P.im, lP.re, lP.im, *G,
          ramp.re, ramp.im,
          srots.re, srots.im, hrots.re, hrots.im, drots.re, drots.im)
        return C(y_re, y_im)

    def multi_step(self, state, K: int):
        """Demodulate K consecutive blocks in ONE kernel invocation.

        Returns (state', y) with y of shape (K*nb, Cp).  The per-block
        rotations are closed-form from the carried phases, so the K-block
        loop is a grid axis, not a scan — the kernel writes each tile
        straight into the stacked output (no per-block copy)."""
        state, srots, hrots, drots = self.block_rotations(state, K)
        y = self.invoke(self._P, self._lP, self._G, self._ramp,
                        srots, hrots, drots, K, self.interpret)
        return state, y

    def step(self, state):
        """One block: (state', y (nb, Cp))."""
        state, y = self.multi_step(state, 1)
        return state, y


# ----------------------------------------------------------------------
# Shift-fold kernel: the whole f-tap loop folded into ONE dot
# ----------------------------------------------------------------------

def _fold_kernel(R: int, self_ramp: bool, *refs):
    """One (R, C') output tile of the SHIFT-FOLD chain (the algebra of
    ops/fold_chain.py in the single-HBM-pass form of TonesDirectChain):
    P[r+j, t] = P[r, t] * e^{2j pi f_t j M / W} folds the f tap dots into
    ONE Karatsuba dot against G2[t, c] = sum_j shift[t, j] G[j, t, c], so
    there is no halo machinery at all — per tile: rotate the P rows,
    split, 3 MXU passes of (R, C_t) x (C_t, C'), ramp + DDC rotation,
    write.  Grid = (K * nr,) exactly like TonesDirectChain.

    With self_ramp (rx tone list == tx tone list), the carrier ramp is
    EXACTLY conj(P) (carrier_ramp vs the P phase table: identical integer
    phases, opposite sign), so the ramp is never streamed — a third of
    the chain's HBM traffic removed."""
    if self_ramp:
        (pr_ref, pi_ref,
         grh_ref, grl_ref, gih_ref, gil_ref, gsh_ref, gsl_ref,
         sr_ref, si_ref, qdr_ref, qdi_ref,
         yr_ref, yi_ref) = refs
    else:
        (pr_ref, pi_ref,
         grh_ref, grl_ref, gih_ref, gil_ref, gsh_ref, gsl_ref,
         rr_ref, ri_ref,
         sr_ref, si_ref, qdr_ref, qdi_ref,
         yr_ref, yi_ref) = refs
    sr_row, si_row = sr_ref[0:1], si_ref[0:1]
    dr_row, di_row = qdr_ref[0:1], qdi_ref[0:1]
    pr, pi = pr_ref[:], pi_ref[:]
    tr = pr * sr_row - pi * si_row
    ti = pr * si_row + pi * sr_row
    pr_hi, pr_lo = _hilo(tr)
    pi_hi, pi_lo = _hilo(ti)
    ps_hi, ps_lo = _hilo(tr + ti)
    rr = _psdot(pr_hi, pr_lo, grh_ref[:], grl_ref[:])
    ii = _psdot(pi_hi, pi_lo, gih_ref[:], gil_ref[:])
    ri = _psdot(ps_hi, ps_lo, gsh_ref[:], gsl_ref[:])
    acc_r, acc_i = rr - ii, ri - rr - ii
    if self_ramp:
        ramp_r, ramp_i = pr, -pi
    else:
        ramp_r, ramp_i = rr_ref[:], ri_ref[:]
    t_r = acc_r * ramp_r - acc_i * ramp_i
    t_i = acc_r * ramp_i + acc_i * ramp_r
    yr_ref[:] = t_r * dr_row - t_i * di_row
    yi_ref[:] = t_r * di_row + t_i * dr_row


def _fold_rotg_kernel(R: int, self_ramp: bool, *refs):
    """Fold-kernel variant that rotates the (C_t, C') G2 CONSTANT instead
    of the (R, C_t) P tile (round 5, VERDICT r4 #1).

    y[r,c] = sum_t P1[r,t] * crot[t] * G2[t,c] — the per-tile synthesis
    rotation is a diagonal in t, so it commutes onto G2:
    y = P1 @ (diag(crot) @ G2).  P1 is constant, so its Karatsuba bf16
    hi/lo splits are precomputed HOST-side; per tile the VPU does only
    (a) a diag extraction of the rotation row to a column via one masked
    lane-reduce against an identity constant (Mosaic has no cheap
    row->column transpose), (b) the complex scaling + hi/lo splits of the
    tiny (C_t, C') G2, and (c) the output ramp/rotation — where the
    streamed-rotation form pays the rotate + three hi/lo splits on every
    (R, C_t) tile.  Same MXU pass count, same product set (drop-lo*lo
    order), ~half the per-tile VPU work at config-3 shapes.
    """
    if self_ramp:
        (p1rh_ref, p1rl_ref, p1ih_ref, p1il_ref, p1sh_ref, p1sl_ref,
         g2r_ref, g2i_ref, eye_ref, p1r_ref, p1i_ref,
         cr_ref, ci_ref, qdr_ref, qdi_ref,
         yr_ref, yi_ref) = refs
    else:
        (p1rh_ref, p1rl_ref, p1ih_ref, p1il_ref, p1sh_ref, p1sl_ref,
         g2r_ref, g2i_ref, eye_ref, rr_ref, ri_ref,
         cr_ref, ci_ref, qdr_ref, qdi_ref,
         yr_ref, yi_ref) = refs
    cr_row, ci_row = cr_ref[0:1], ci_ref[0:1]         # (1, C_t)
    dr_row, di_row = qdr_ref[0:1], qdi_ref[0:1]
    eye = eye_ref[:]                                  # (C_t, C_t) identity
    col_r = jnp.sum(cr_row * eye, axis=1, keepdims=True)   # (C_t, 1)
    col_i = jnp.sum(ci_row * eye, axis=1, keepdims=True)
    g2r, g2i = g2r_ref[:], g2i_ref[:]                 # (C_t, C') f32
    gr = col_r * g2r - col_i * g2i
    gi = col_r * g2i + col_i * g2r
    grh, grl = _hilo(gr)
    gih, gil = _hilo(gi)
    gsh, gsl = _hilo(gr + gi)
    rr = _psdot(p1rh_ref[:], p1rl_ref[:], grh, grl)
    ii = _psdot(p1ih_ref[:], p1il_ref[:], gih, gil)
    ri = _psdot(p1sh_ref[:], p1sl_ref[:], gsh, gsl)
    acc_r, acc_i = rr - ii, ri - rr - ii
    if self_ramp:
        ramp_r, ramp_i = p1r_ref[:], -p1i_ref[:]
    else:
        ramp_r, ramp_i = rr_ref[:], ri_ref[:]
    t_r = acc_r * ramp_r - acc_i * ramp_i
    t_i = acc_r * ramp_i + acc_i * ramp_r
    yr_ref[:] = t_r * dr_row - t_i * di_row
    yi_ref[:] = t_r * di_row + t_i * dr_row


@dataclasses.dataclass
class TonesDirectFoldKernel:
    """Single-kernel shift-fold TONES->DIRECT loopback.

    The exact algebra of ops/fold_chain.TonesDirectFoldChain executed in
    ONE HBM pass per block: where the XLA fold chain pays ~6 elementwise
    round trips of the (nb, C_t)/(nb, C') working set (rotate, matmul at
    HIGH = 3 reads, ramp, rotate, scan-stack), this kernel reads the P
    tile and the ramp tile once and writes the output tile once — with
    only 3 MXU passes per tile vs the G-fused kernel's 3f
    (ops/pallas_chain.TonesDirectChain).  The stream's first-block
    startup transient (zero FIR history) is restored OUTSIDE the kernel:
    a (f-1)-row correction against the partial folds G2p, gated by the
    prev_valid flag — touching f-1 rows of one block per acquisition.

    Replaces the same reference chain: tone_gen (cpp/kernels.cu:589-684)
    + direct_demodulator_integer (:45-86) + per-channel FIR
    (cpp/fir.cu:83-88) for the --sw_loop TONES->DIRECT path.
    """

    path_name = "fold_kernel"

    rate: int
    tx_freqs: Tuple[int, ...]
    tx_ampls: Tuple[float, ...]
    cfg: DirectDDCConfig
    block_len: int
    scale: float = 1.0
    interpret: bool | None = None
    time_shards: int = 1     # tile rows must divide the per-shard rows
    rows: int | None = None  # tile height override (perf tuning)
    rotg: bool = False       # rotate G2 in-kernel instead of the P tile

    def __post_init__(self):
        W, L, M, f = self.rate, self.block_len, self.cfg.M, self.cfg.f
        self.ok = (self.cfg.decim > 0 and L % M == 0
                   and len(self.tx_freqs) > 0 and f >= 1)
        if not self.ok:
            return
        nb = L // M
        Ct, Cp = len(self.tx_freqs), self.cfg.n_channels
        self.nb, self.Ct, self.Cp = nb, Ct, Cp
        nbt = nb // self.time_shards if nb % self.time_shards == 0 else 0
        self.R = ((self.rows if self.rows is not None
                   else _pick_rows(nbt, Ct, Cp, 1)) if nbt else 0)
        self.ok = bool(self.R) and bool(nbt) and nbt % self.R == 0
        if not self.ok:
            return
        # rx tone list == tx tone list (mod W) -> the carrier ramp is
        # exactly conj(P): never streamed (1/3 of the HBM traffic)
        self.self_ramp = (
            tuple(int(f) % W for f in self.cfg.freqs) ==
            tuple(int(f) % W for f in self.tx_freqs))
        fr = np.asarray(self.tx_freqs, dtype=np.int64) % W
        n = np.arange(nb, dtype=np.int64)
        m = np.arange(M, dtype=np.int64)
        j = np.arange(f, dtype=np.int64)
        # P, Q, G, G2 from exact integer phases (float64) — identical
        # math to ops/fold_chain.py
        P = np.exp(2j * np.pi *
                   (((fr[None, :] * ((n[:, None] * M) % W)) % W)
                    / float(W)))
        Q = (np.asarray(self.tx_ampls, dtype=np.float64)[:, None] *
             np.exp(2j * np.pi * (((fr[:, None] * m[None, :]) % W)
                                  / float(W)))) * self.scale
        hmod = self.cfg.modulated_taps_np()          # (f*M, Cp) float64
        G = np.einsum("tm,jmc->jtc", Q, hmod.reshape(f, M, Cp))
        shift = np.exp(2j * np.pi *
                       (((fr[:, None] * ((j[None, :] * M) % W)) % W)
                        / float(W)))
        G2 = np.einsum("tj,jtc->tc", shift, G)
        # startup partial folds: output row r of the stream's first block
        # misses taps j < f-1-r (zero history, GoldenFIR semantics)
        G2p = np.stack([
            np.einsum("tj,jtc->tc", shift[:, :f - 1 - r], G[:f - 1 - r])
            for r in range(f - 1)]) if f > 1 else np.zeros((0, Ct, Cp))
        self._P = cplx.const(P.astype(np.complex64))
        g_re = G2.real.astype(np.float32)
        g_im = G2.imag.astype(np.float32)
        self._G2 = tuple(jnp.asarray(a) for pair in
                         (_np_hilo(g_re), _np_hilo(g_im),
                          _np_hilo(g_re + g_im)) for a in pair)
        self._G2f = (jnp.asarray(g_re), jnp.asarray(g_im))
        self._G2p = cplx.const(G2p.astype(np.complex64))
        self._ramp = self.cfg.carrier_ramp(nb)
        # Row-direction Vandermonde factoring (round 4): P[r + b*R, t] =
        # P1[r, t] * PB[b, t] with both factors from exact integer
        # phases, so the kernel need not STREAM P at all — P1 rides a
        # constant-index block (Mosaic fetches it once) and PB folds
        # into the per-tile rotation rows (block_rotations_factored).
        # Removing the P stream halves the self-ramp chain's HBM
        # traffic (P read + y write -> y write only).
        R = self.R
        b = np.arange(nb // R, dtype=np.int64)       # GLOBAL tile index
        pbph = (fr[None, :] * ((b[:, None] * R * M) % W)) % W
        PB = np.exp(2j * np.pi * (pbph / float(W)))
        self._P1 = cplx.const(P[:R].astype(np.complex64))
        # rotg variant constants: P1's Karatsuba splits precomputed (the
        # per-tile rotation moves onto G2 in-kernel), plus the identity
        # used for the rotation row->column diag extraction
        p1_re = P[:R].real.astype(np.float32)
        p1_im = P[:R].imag.astype(np.float32)
        self._P1s = tuple(jnp.asarray(a) for pair in
                          (_np_hilo(p1_re), _np_hilo(p1_im),
                           _np_hilo(p1_re + p1_im)) for a in pair)
        self._eye = jnp.eye(Ct, dtype=jnp.float32)
        self._PB = cplx.const(PB.astype(np.complex64))
        frx = np.asarray(self.cfg.freqs, dtype=np.int64) % W
        rbph = (frx[None, :] * ((b[:, None] * R * M) % W)) % W
        RB = np.exp(-2j * np.pi * (rbph / float(W)))
        self._RB = cplx.const(RB.astype(np.complex64))
        self._ramp1 = C(self._ramp.re[:R], self._ramp.im[:R])
        self._sstep = jnp.asarray(((fr * L) % W).astype(np.int32))
        from .ddc import ddc_carrier_step
        self._dstep = ddc_carrier_step(self.cfg, L)
        abs0 = -((f - 1) * M)
        self._sph0 = jnp.asarray(((fr * abs0) % W).astype(np.int32))

    def init_state(self):
        from .ddc import ddc_carrier_init
        # copy: the master _sph0 must survive a donating caller
        return (jnp.copy(self._sph0),
                ddc_carrier_init(self.cfg, self.block_len),
                jnp.float32(0.0))

    # per-block rotation staging shared with the G-fused chain
    _phase_offsets = TonesDirectChain._phase_offsets

    def _rots(self, state, K: int):
        """(state', srots (K, Ct), drots (K, Cp)) — un-replicated."""
        sph, dph, pv = state
        W, Ct, Cp = self.rate, self.Ct, self.Cp
        two_pi_w = jnp.float32(2.0 * np.pi / W)
        soffs = self._phase_offsets(np.asarray(self._sstep), K, Ct)
        sphs = sph[None, :] + soffs
        sphs = jnp.where(sphs >= W, sphs - W, sphs)
        srots = cplx.expi(sphs.astype(jnp.float32) * two_pi_w)
        doffs = self._phase_offsets(np.asarray(self._dstep), K, Cp)
        dphs = dph[None, :] + doffs
        dphs = jnp.where(dphs >= W, dphs - W, dphs)
        drots = cplx.expi_neg(dphs.astype(jnp.float32) * two_pi_w)
        sK = self._phase_offsets(np.asarray(self._sstep), K + 1, Ct)[K]
        dK = self._phase_offsets(np.asarray(self._dstep), K + 1, Cp)[K]
        new_sph = sph + sK
        new_sph = jnp.where(new_sph >= W, new_sph - W, new_sph)
        new_dph = dph + dK
        new_dph = jnp.where(new_dph >= W, new_dph - W, new_dph)
        return (new_sph, new_dph, jnp.float32(1.0)), srots, drots

    def block_rotations(self, state, K: int):
        """(state', srots (K*8, Ct), drots (K*8, Cp)) — no halo rotations:
        the fold has no halo rows."""
        state2, srots, drots = self._rots(state, K)
        rep8 = lambda a: C(jnp.repeat(a.re, 8, axis=0),
                           jnp.repeat(a.im, 8, axis=0))
        return state2, rep8(srots), rep8(drots)

    def block_rotations_factored(self, state, K: int, flat: bool = True):
        """Per-TILE rotation rows with the P/ramp Vandermonde factors
        pre-multiplied in: crot[k, b] = srot[k] * PB[b] (synthesis) and
        qrot[k, b] = drot[k] * conj(PB[b]) (self-ramp: the ramp is
        conj(P1 * PB[b]) and the kernel applies conj(P1)) or
        drot[k] * RB[b] (streamed-ramp factor).  Shapes (K*nr*8, C)
        when `flat`, else (K, nr*8, C) — the sharded caller shards the
        GLOBAL tile axis over 'time' (parallel/fused_sharded.py)."""
        state2, srots, drots = self._rots(state, K)
        PB = self._PB
        cr = (srots.re[:, None, :] * PB.re[None] -
              srots.im[:, None, :] * PB.im[None])
        ci = (srots.re[:, None, :] * PB.im[None] +
              srots.im[:, None, :] * PB.re[None])
        QB = C(PB.re, -PB.im) if self.self_ramp else self._RB
        qr = (drots.re[:, None, :] * QB.re[None] -
              drots.im[:, None, :] * QB.im[None])
        qi = (drots.re[:, None, :] * QB.im[None] +
              drots.im[:, None, :] * QB.re[None])
        nr = PB.re.shape[0]

        def rep8(a):                                  # (K, nr, C)
            a = jnp.repeat(a, 8, axis=1)              # (K, nr*8, C)
            return a.reshape(K * nr * 8, a.shape[-1]) if flat else a
        return (state2, C(rep8(cr), rep8(ci)), C(rep8(qr), rep8(qi)))

    def invoke(self, P, G2, ramp, srots, drots, K: int,
               interpret: bool | None = None):
        """Run the fold kernel over K blocks; returns y (K*nb, Cp)."""
        import jax.experimental.pallas as pl
        R = self.R
        nb_loc = P.shape[0]
        Ct, Cp = P.shape[1], G2[0].shape[1]
        nr = nb_loc // R
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        self_ramp = self.self_ramp
        kernel = functools.partial(_fold_kernel, R, self_ramp)
        out_shape = (jax.ShapeDtypeStruct((K * nb_loc, Cp), jnp.float32),
                     jax.ShapeDtypeStruct((K * nb_loc, Cp), jnp.float32))
        per_blk = lambda r: (r // nr, 0)
        in_blk = lambda r: (r % nr, 0)
        g_spec = pl.BlockSpec((Ct, Cp), lambda r: (0, 0))
        ramp_specs = [] if self_ramp else [
            pl.BlockSpec((R, Cp), in_blk),                   # ramp re
            pl.BlockSpec((R, Cp), in_blk),                   # ramp im
        ]
        ramp_args = () if self_ramp else (ramp.re, ramp.im)
        y_re, y_im = pl.pallas_call(
            kernel,
            grid=(K * nr,),
            in_specs=[
                pl.BlockSpec((R, Ct), in_blk),               # P re
                pl.BlockSpec((R, Ct), in_blk),               # P im
                g_spec, g_spec,                              # G2 re hi/lo
                g_spec, g_spec,                              # G2 im hi/lo
                g_spec, g_spec,                              # G2 sum hi/lo
                *ramp_specs,
                pl.BlockSpec((8, Ct), per_blk),              # srot re
                pl.BlockSpec((8, Ct), per_blk),              # srot im
                pl.BlockSpec((8, Cp), per_blk),              # drot re
                pl.BlockSpec((8, Cp), per_blk),              # drot im
            ],
            out_specs=(
                pl.BlockSpec((R, Cp), lambda r: (r, 0)),
                pl.BlockSpec((R, Cp), lambda r: (r, 0)),
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(P.re, P.im, *G2, *ramp_args,
          srots.re, srots.im, drots.re, drots.im)
        return C(y_re, y_im)

    def invoke_factored(self, crots, qrots, K: int,
                        interpret: bool | None = None,
                        P1: C | None = None, G2=None, ramp1: C | None = None):
        """Run the fold kernel with NO streamed P/ramp: the P1 (and
        ramp1) factor blocks have constant index maps — Mosaic fetches
        a block only when its indices change, so they are DMA'd once —
        and the Vandermonde tile factors arrive pre-multiplied into the
        per-TILE rotation rows.  Same kernel body, same algebra; the
        chain's HBM traffic drops to the output write alone.

        The sharded fold path (parallel/fused_sharded._build_fold)
        passes its shard-local P1/G2/ramp1 and time-sharded crot/qrot
        rows explicitly; the number of tiles comes from the rotation
        rows, so the same call serves any local row count."""
        import jax.experimental.pallas as pl
        R = self.R
        if P1 is None:
            P1 = self._P1
        if G2 is None:
            G2 = self._G2
        if ramp1 is None and not self.self_ramp:
            ramp1 = self._ramp1
        Ct, Cp = P1.re.shape[1], G2[0].shape[1]
        n_tiles = crots.re.shape[0] // 8             # K * local tiles
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        kernel = functools.partial(_fold_kernel, R, self.self_ramp)
        out_shape = (jax.ShapeDtypeStruct((n_tiles * R, Cp), jnp.float32),
                     jax.ShapeDtypeStruct((n_tiles * R, Cp), jnp.float32))
        const = lambda r: (0, 0)
        per_tile = lambda r: (r, 0)
        g_spec = pl.BlockSpec((Ct, Cp), const)
        ramp_specs = [] if self.self_ramp else [
            pl.BlockSpec((R, Cp), const),
            pl.BlockSpec((R, Cp), const),
        ]
        ramp_args = () if self.self_ramp else (ramp1.re, ramp1.im)
        y_re, y_im = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((R, Ct), const),                # P1 re
                pl.BlockSpec((R, Ct), const),                # P1 im
                g_spec, g_spec,
                g_spec, g_spec,
                g_spec, g_spec,
                *ramp_specs,
                pl.BlockSpec((8, Ct), per_tile),             # crot re
                pl.BlockSpec((8, Ct), per_tile),             # crot im
                pl.BlockSpec((8, Cp), per_tile),             # qrot re
                pl.BlockSpec((8, Cp), per_tile),             # qrot im
            ],
            out_specs=(
                pl.BlockSpec((R, Cp), lambda r: (r, 0)),
                pl.BlockSpec((R, Cp), lambda r: (r, 0)),
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(P1.re, P1.im, *G2, *ramp_args,
          crots.re, crots.im, qrots.re, qrots.im)
        return C(y_re, y_im)

    def invoke_factored_rotg(self, crots, qrots, K: int,
                             interpret: bool | None = None):
        """`invoke_factored` with the per-tile rotation applied to the
        (C_t, C') G2 constant in-kernel (see _fold_rotg_kernel): P1 rides
        as HOST-presplit bf16 constants, so the per-tile VPU never touches
        an (R, C_t)-sized rotate or split."""
        import jax.experimental.pallas as pl
        R = self.R
        Ct, Cp = self.Ct, self.Cp
        n_tiles = crots.re.shape[0] // 8
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        kernel = functools.partial(_fold_rotg_kernel, R, self.self_ramp)
        out_shape = (jax.ShapeDtypeStruct((n_tiles * R, Cp), jnp.float32),
                     jax.ShapeDtypeStruct((n_tiles * R, Cp), jnp.float32))
        const = lambda r: (0, 0)
        per_tile = lambda r: (r, 0)
        p1_spec = pl.BlockSpec((R, Ct), const)
        mid_specs = ([p1_spec, p1_spec] if self.self_ramp else
                     [pl.BlockSpec((R, Cp), const)] * 2)
        mid_args = ((self._P1.re, self._P1.im) if self.self_ramp else
                    (self._ramp1.re, self._ramp1.im))
        y_re, y_im = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                p1_spec, p1_spec,                            # P1 re hi/lo
                p1_spec, p1_spec,                            # P1 im hi/lo
                p1_spec, p1_spec,                            # P1 sum hi/lo
                pl.BlockSpec((Ct, Cp), const),               # G2 re
                pl.BlockSpec((Ct, Cp), const),               # G2 im
                pl.BlockSpec((Ct, Ct), const),               # eye
                *mid_specs,                                  # P1 f32 | ramp1
                pl.BlockSpec((8, Ct), per_tile),             # crot re
                pl.BlockSpec((8, Ct), per_tile),             # crot im
                pl.BlockSpec((8, Cp), per_tile),             # qrot re
                pl.BlockSpec((8, Cp), per_tile),             # qrot im
            ],
            out_specs=(
                pl.BlockSpec((R, Cp), lambda r: (r, 0)),
                pl.BlockSpec((R, Cp), lambda r: (r, 0)),
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(*self._P1s, *self._G2f, self._eye, *mid_args,
          crots.re, crots.im, qrots.re, qrots.im)
        return C(y_re, y_im)

    def startup_correction(self, state, y, transposed: bool = False):
        """Restore the zero-history startup transient on the stream's
        first block (prev_valid = 0): remove the missing taps'
        contribution from the first f-1 output rows.  `y` is (rows, Cp),
        or (Cp, rows) when `transposed` (the channel-major kernel)."""
        f, W = self.cfg.f, self.rate
        sph0, dph0, pv = state
        if f <= 1:
            return y
        two_pi_w = jnp.float32(2.0 * np.pi / W)
        srot0 = cplx.expi(sph0.astype(jnp.float32) * two_pi_w)
        drot0 = cplx.expi_neg(dph0.astype(jnp.float32) * two_pi_w)
        h = cplx.mul(self._P[:f - 1],
                     C(srot0.re[None, :], srot0.im[None, :]))
        G2p = self._G2p
        cr = (jnp.einsum("rt,rtc->rc", h.re, G2p.re) -
              jnp.einsum("rt,rtc->rc", h.im, G2p.im))
        ci = (jnp.einsum("rt,rtc->rc", h.re, G2p.im) +
              jnp.einsum("rt,rtc->rc", h.im, G2p.re))
        corr = cplx.mul(cplx.mul(C(cr, ci), self._ramp[:f - 1]),
                        C(drot0.re[None, :], drot0.im[None, :]))
        g = jnp.float32(1.0) - pv
        if transposed:
            return C(y.re.at[:, :f - 1].add(-g * corr.re.T),
                     y.im.at[:, :f - 1].add(-g * corr.im.T))
        return C(y.re.at[:f - 1].add(-g * corr.re),
                 y.im.at[:f - 1].add(-g * corr.im))

    def multi_step(self, state, K: int):
        """Demodulate K consecutive blocks in ONE kernel invocation."""
        state0 = state
        if self.time_shards == 1:
            state, crots, qrots = self.block_rotations_factored(state, K)
            if self.rotg:
                y = self.invoke_factored_rotg(crots, qrots, K,
                                              self.interpret)
            else:
                y = self.invoke_factored(crots, qrots, K, self.interpret)
        else:
            state, srots, drots = self.block_rotations(state, K)
            y = self.invoke(self._P, self._G2, self._ramp, srots, drots,
                            K, self.interpret)
        # y rows already carry ramp + DDC rotation, so the startup
        # correction does too
        y = self.startup_correction(state0, y)
        return state, y

    def step(self, state):
        state, y = self.multi_step(state, 1)
        return state, y


# ----------------------------------------------------------------------
# Transposed (channel-major) factored fold kernel
# ----------------------------------------------------------------------

def _fold_t_kernel(R: int, *refs):
    """One (C', R) CHANNEL-MAJOR output tile of the factored fold chain.

    y^T = (diag(crot) G2)^T @ P1^T: the dense lane axis is the TIME rows
    (R a multiple of 128), so the output write streams at the dense-lane
    wall (429 GB/s measured) instead of the sub-128 masked-write cap the
    row-major kernel pays at C' < 128 — and with no padding, the write
    is 8 B/sample instead of the padded 10.24 (tools/perf_c3_ladder.py).
    The rotation lands on the (C', C_t) G2^T constant as a LANE-broadcast
    row (no transpose needed); P1^T rides as host-presplit bf16
    constants; the output-side rotation column comes from one masked
    lane-reduce against the identity (the _fold_rotg_kernel trick).
    """
    (g2tr_ref, g2ti_ref, eye_ref,
     p1trh_ref, p1trl_ref, p1tih_ref, p1til_ref,
     p1tsh_ref, p1tsl_ref, rtr_ref, rti_ref,
     cr_ref, ci_ref, qdr_ref, qdi_ref,
     yr_ref, yi_ref) = refs
    cr_row, ci_row = cr_ref[0:1], ci_ref[0:1]          # (1, C_t)
    g2r, g2i = g2tr_ref[:], g2ti_ref[:]                # (C', C_t)
    gr = g2r * cr_row - g2i * ci_row
    gi = g2r * ci_row + g2i * cr_row
    grh, grl = _hilo(gr)
    gih, gil = _hilo(gi)
    gsh, gsl = _hilo(gr + gi)
    rr = _psdot(grh, grl, p1trh_ref[:], p1trl_ref[:])  # (C', R)
    ii = _psdot(gih, gil, p1tih_ref[:], p1til_ref[:])
    ri = _psdot(gsh, gsl, p1tsh_ref[:], p1tsl_ref[:])
    acc_r, acc_i = rr - ii, ri - rr - ii
    ramp_r, ramp_i = rtr_ref[:], rti_ref[:]            # (C', R)
    t_r = acc_r * ramp_r - acc_i * ramp_i
    t_i = acc_r * ramp_i + acc_i * ramp_r
    qr_row, qi_row = qdr_ref[0:1], qdi_ref[0:1]        # (1, C')
    eye = eye_ref[:]                                   # (C', C')
    qc_r = jnp.sum(qr_row * eye, axis=1, keepdims=True)  # (C', 1)
    qc_i = jnp.sum(qi_row * eye, axis=1, keepdims=True)
    yr_ref[:] = t_r * qc_r - t_i * qc_i
    yi_ref[:] = t_r * qc_i + t_i * qc_r


def _pick_rows_t(nb: int, Ct: int, Cp: int) -> int:
    """Largest divisor of nb that is a multiple of 128 (the output LANE
    tile) within the VMEM budget (P1^T splits + ramp + double-buffered
    output per R column-block)."""
    Ctp = -(-Ct // 128) * 128
    Cpp = -(-Cp // 128) * 128
    bytes_per_col = 6 * Ctp * 2 + 2 * Cpp * 4 + 4 * Cpp * 4
    cap = (10 * 2 ** 20) // max(bytes_per_col, 1)
    best = 0
    for d in range(128, min(nb, cap) + 1, 128):
        if nb % d == 0:
            best = d
    return best


@dataclasses.dataclass
class TonesDirectFoldT:
    """Channel-major factored fold chain: emits y as (C', K*nb).

    Composes a row-major TonesDirectFoldKernel for all host-side math
    (P/G2/rotations/startup) and runs the transposed kernel, whose output
    lane axis is the dense time-row axis — the probe for (and, if wired,
    the production form of) the dense-write ceiling at C' < 128.
    Requires nb % 128 == 0 (e.g. block_len = 4_096_000 at M = 100), i.e.
    the block planner must pick lane-commensurate blocks.
    """

    path_name = "fold_kernel_t"

    rate: int
    tx_freqs: Tuple[int, ...]
    tx_ampls: Tuple[float, ...]
    cfg: DirectDDCConfig
    block_len: int
    scale: float = 1.0
    interpret: bool | None = None
    rows: int | None = None

    def __post_init__(self):
        L, M = self.block_len, self.cfg.M
        self.ok = self.cfg.decim > 0 and L % M == 0
        if not self.ok:
            return
        nb = L // M
        Ct, Cp = len(self.tx_freqs), self.cfg.n_channels
        R = self.rows if self.rows is not None else \
            _pick_rows_t(nb, Ct, Cp)
        self.ok = bool(R) and R % 128 == 0 and nb % R == 0
        if not self.ok:
            return
        base = TonesDirectFoldKernel(
            rate=self.rate, tx_freqs=self.tx_freqs,
            tx_ampls=self.tx_ampls, cfg=self.cfg,
            block_len=L, scale=self.scale, rows=R)
        self.ok = base.ok
        if not self.ok:
            return
        self.base = base
        self.nb, self.Ct, self.Cp, self.R = nb, Ct, Cp, R
        self.self_ramp = base.self_ramp
        p1t_re = np.asarray(base._P1.re).T.copy()      # (Ct, R)
        p1t_im = np.asarray(base._P1.im).T.copy()
        self._P1Ts = tuple(jnp.asarray(a) for pair in
                           (_np_hilo(p1t_re), _np_hilo(p1t_im),
                            _np_hilo(p1t_re + p1t_im)) for a in pair)
        self._G2T = (jnp.asarray(np.asarray(base._G2f[0]).T.copy()),
                     jnp.asarray(np.asarray(base._G2f[1]).T.copy()))
        self._eye = jnp.eye(Cp, dtype=jnp.float32)
        if self.self_ramp:
            # ramp = conj(P1)^T; Cp == Ct here
            self._rampT = (jnp.asarray(p1t_re), jnp.asarray(-p1t_im))
        else:
            self._rampT = (
                jnp.asarray(np.asarray(base._ramp1.re).T.copy()),
                jnp.asarray(np.asarray(base._ramp1.im).T.copy()))

    def init_state(self):
        return self.base.init_state()

    def invoke_t(self, crots, qrots, interpret: bool | None = None):
        import jax.experimental.pallas as pl
        R, Ct, Cp = self.R, self.Ct, self.Cp
        n_tiles = crots.re.shape[0] // 8
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        kernel = functools.partial(_fold_t_kernel, R)
        out_shape = (jax.ShapeDtypeStruct((Cp, n_tiles * R), jnp.float32),
                     jax.ShapeDtypeStruct((Cp, n_tiles * R), jnp.float32))
        const = lambda r: (0, 0)
        per_tile = lambda r: (r, 0)
        p1t_spec = pl.BlockSpec((Ct, R), const)
        y_re, y_im = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((Cp, Ct), const),           # G2T re
                pl.BlockSpec((Cp, Ct), const),           # G2T im
                pl.BlockSpec((Cp, Cp), const),           # eye
                p1t_spec, p1t_spec,                      # P1T re hi/lo
                p1t_spec, p1t_spec,                      # P1T im hi/lo
                p1t_spec, p1t_spec,                      # P1T sum hi/lo
                pl.BlockSpec((Cp, R), const),            # rampT re
                pl.BlockSpec((Cp, R), const),            # rampT im
                pl.BlockSpec((8, Ct), per_tile),         # crot re
                pl.BlockSpec((8, Ct), per_tile),         # crot im
                pl.BlockSpec((8, Cp), per_tile),         # qrot re
                pl.BlockSpec((8, Cp), per_tile),         # qrot im
            ],
            out_specs=(
                pl.BlockSpec((Cp, R), lambda r: (0, r)),
                pl.BlockSpec((Cp, R), lambda r: (0, r)),
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(*self._G2T, self._eye, *self._P1Ts, *self._rampT,
          crots.re, crots.im, qrots.re, qrots.im)
        return C(y_re, y_im)

    def multi_step(self, state, K: int):
        """K blocks in one kernel; returns (state', y (Cp, K*nb))."""
        state0 = state
        state, crots, qrots = self.base.block_rotations_factored(state, K)
        y = self.invoke_t(crots, qrots, self.interpret)
        y = self.base.startup_correction(state0, y, transposed=True)
        return state, y

    def step(self, state):
        return self.multi_step(state, 1)
