"""Pallas TPU kernel: single-kernel fused TONES -> DIRECT loopback chain.

The config-3 production shape (multi-tone comb TX looped into the fused
DDC+FIR RX — the reference's --sw_loop path with TONES TX and DIRECT RX)
spends its HBM traffic on the raw block x: the synthesis matmul writes it
(32 MB/block) and the DDC kernel reads it back.  But x is never needed in
HBM at all: factorize the comb over the DDC's own (nb, M) tile split

    x[n*M + m] = sum_c srot_c * P[n, c] * Q[c, m]
    P[n, c] = exp(2j*pi*(f_c*n*M mod W)/W)       (nb, C_t) constant
    Q[c, m] = A_c * exp(2j*pi*(f_c*m mod W)/W)   (C_t, M)  constant
    srot_c  = exp(2j*pi*phase_c/W)               per-block int32 phase

and each DDC input tile becomes one in-VMEM matmul of the P tile (plus
its f-1-row halo) against Q.  The kernel then runs the same fused DDC+FIR
as ops/pallas_ddc.py on the synthesized rows.  Per block the only HBM
traffic is the P tile read (same bytes as the x read it replaces), the
carrier ramp, and the (nb, C') output — the synthesis write/read round
trip is gone, and so is the carried FIR history: the previous block's
tail rows are re-synthesized from P's last rows with the PREVIOUS block's
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
    split_dot as _sdot


def _kernel(f: int, M: int, R: int, lead: int, nr: int,
            pr_ref, pi_ref, lr_ref, li_ref, qr_ref, qi_ref, qs_ref,
            hr_ref, hi_ref, hs_ref, rr_ref, ri_ref,
            sr_ref, si_ref, vr_ref, vi_ref, qdr_ref, qdi_ref,
            yr_ref, yi_ref):
    """One (R, C') output tile; grid = (K * nr,) — K streamed blocks of nr
    tiles each, all in ONE kernel invocation (the per-block phase
    rotations are closed-form, so there is no sequential carry inside an
    execution and lax.scan — with its per-block output-stacking copies —
    is unnecessary; the kernel writes straight into the (K*nb, C')
    output).

    p: P rows [(r%nr)*R ...); l: the lead rows preceding the tile in P
    (wrapped mod nb, padded to _HALO_PAD, real rows LAST); q*: Q and
    Q.re+Q.im; h*: modulated taps; rr/ri: carrier ramp tile; sr/si: this
    block's synthesis rotation row (1, C_t); vr/vi: the halo rotation row
    for the block's FIRST tile (the previous block's rotation, pre-zeroed
    ahead of block 0); qdr/qdi: the block's DDC output rotation (1, C').
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

    # synthesize the extended input rows: x_ext = P_ext @ Q (Karatsuba)
    pr_hi, pr_lo = _hilo(pe_r)
    pi_hi, pi_lo = _hilo(pe_i)
    ps_hi, ps_lo = _hilo(pe_r + pe_i)
    srr = _sdot(pr_hi, pr_lo, qr_ref[:])
    sii = _sdot(pi_hi, pi_lo, qi_ref[:])
    sri = _sdot(ps_hi, ps_lo, qs_ref[:])
    ext_r = srr - sii                                  # (R+lead, M)
    ext_i = sri - srr - sii
    ext_s = ext_r + ext_i

    # fused DDC+FIR on the synthesized rows (cf. ops/pallas_ddc._kernel)
    xr_hi, xr_lo = _hilo(ext_r)
    xi_hi, xi_lo = _hilo(ext_i)
    xs_hi, xs_lo = _hilo(ext_s)
    acc_r = acc_i = None
    for j in range(f):
        rr = _sdot(xr_hi[j:j + R], xr_lo[j:j + R],
                   hr_ref[j * M:(j + 1) * M, :])
        ii = _sdot(xi_hi[j:j + R], xi_lo[j:j + R],
                   hi_ref[j * M:(j + 1) * M, :])
        ri = _sdot(xs_hi[j:j + R], xs_lo[j:j + R],
                   hs_ref[j * M:(j + 1) * M, :])
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


def _pick_rows(nb: int, M: int, Ct: int, Cp: int) -> int:
    """Tile height: divisor of nb, multiple of 8, VMEM-capped (P tile +
    splits + synthesized rows + output/ramp, double-buffered)."""
    Ctp = -(-Ct // 128) * 128
    Mp = -(-M // 128) * 128
    Cpp = -(-Cp // 128) * 128
    bytes_per_row = 28 * Ctp + 44 * Mp + 32 * Cpp
    cap = max(8, (8 * 2 ** 20) // max(bytes_per_row, 1))
    cands = []
    for d in range(1, int(np.sqrt(nb)) + 1):
        if nb % d == 0:
            for c in (d, nb // d):
                if c <= cap and c % 8 == 0:
                    cands.append(c)
    if not cands:
        return 0
    return max(cands, key=lambda c: ((c % 32 == 0), (c % 16 == 0), c))


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
                  else _pick_rows(nbt, M, Ct, Cp)) if nbt else 0
        self.lead = f - 1
        self.ok = bool(self.R) and f >= 2 and self.lead <= _HALO_PAD \
            and self.lead <= self.R and nbt and nbt % self.R == 0
        if not self.ok:
            return
        # P (nb, Ct), Q (Ct, M) from exact integer phases; halo rows of P
        # (wrapped mod nb) staged per tile, real rows LAST in the pad
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
        self._Q = cplx.const(Q.astype(np.complex64))
        self._Qs = self._Q.re + self._Q.im
        self._hmod = self.cfg.modulated_taps()
        self._hsum = self._hmod.re + self._hmod.im
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

    def invoke(self, P, lP, Q, Qs, hmod, hsum, ramp, srots, hrots,
               drots, K: int, interpret: bool | None = None):
        """Run the kernel over K blocks of (possibly shard-local)
        operands; returns y (K * P.shape[0], hmod.shape[1])."""
        import jax.experimental.pallas as pl
        M, f, R = self.cfg.M, self.cfg.f, self.R
        nb_loc = P.shape[0]
        Ct, Cp = P.shape[1], hmod.shape[1]
        nr = nb_loc // R
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")

        kernel = functools.partial(_kernel, f, M, R, self.lead, nr)
        out_shape = (jax.ShapeDtypeStruct((K * nb_loc, Cp), jnp.float32),
                     jax.ShapeDtypeStruct((K * nb_loc, Cp), jnp.float32))
        per_blk = lambda r: (r // nr, 0)             # (K*8, C) rotation rows
        in_blk = lambda r: (r % nr, 0)               # per-block-local tiles
        y_re, y_im = pl.pallas_call(
            kernel,
            grid=(K * nr,),
            in_specs=[
                pl.BlockSpec((R, Ct), in_blk),               # P re
                pl.BlockSpec((R, Ct), in_blk),               # P im
                pl.BlockSpec((_HALO_PAD, Ct), in_blk),       # lP re
                pl.BlockSpec((_HALO_PAD, Ct), in_blk),       # lP im
                pl.BlockSpec((Ct, M), lambda r: (0, 0)),     # Q re
                pl.BlockSpec((Ct, M), lambda r: (0, 0)),     # Q im
                pl.BlockSpec((Ct, M), lambda r: (0, 0)),     # Q sum
                pl.BlockSpec((f * M, Cp), lambda r: (0, 0)),  # h re
                pl.BlockSpec((f * M, Cp), lambda r: (0, 0)),  # h im
                pl.BlockSpec((f * M, Cp), lambda r: (0, 0)),  # h sum
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
        )(P.re, P.im, lP.re, lP.im, Q.re, Q.im, Qs,
          hmod.re, hmod.im, hsum, ramp.re, ramp.im,
          srots.re, srots.im, hrots.re, hrots.im, drots.re, drots.im)
        return C(y_re, y_im)

    def multi_step(self, state, K: int):
        """Demodulate K consecutive blocks in ONE kernel invocation.

        Returns (state', y) with y of shape (K*nb, Cp).  The per-block
        rotations are closed-form from the carried phases, so the K-block
        loop is a grid axis, not a scan — the kernel writes each tile
        straight into the stacked output (no per-block copy)."""
        state, srots, hrots, drots = self.block_rotations(state, K)
        y = self.invoke(self._P, self._lP, self._Q, self._Qs,
                        self._hmod, self._hsum, self._ramp,
                        srots, hrots, drots, K, self.interpret)
        return state, y

    def step(self, state):
        """One block: (state', y (nb, Cp))."""
        state, y = self.multi_step(state, 1)
        return state, y
