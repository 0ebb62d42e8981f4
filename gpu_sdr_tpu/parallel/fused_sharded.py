"""Fused TX->PFB->select loopback chain over a (time, channels) mesh.

The multi-chip form of engine/fused.py's TONES->TONES path: the whole
K-blocks-per-execution loop — tone synthesis, PFB channelization, tone
selection — runs as ONE SPMD program.  The `lax.scan` lives *inside* the
`shard_map`, so each device executes the full K-block loop locally and the
only inter-device traffic per block is

  * a ppermute of the (avg-1)*nfft-sample overlap-save halo around the
    time ring (ICI neighbor exchange; the reference's buffer_helper spare
    samples, cpp/USRP_server_memory_management.cpp:104-156), and
  * one psum over the channel axis to combine owner-local tone selections
    (each channel shard owns nfft/Kc contiguous bins and contributes only
    the tones whose bin it owns — no sharded gather, no all-to-all).

TX synthesis shards over 'time' exactly: per-shard integer phase offsets
f*(t*Lt) mod W are folded into the per-shard int32 phase carry (the general
matmul comb), or — for bin-quantized combs with period | block — the local
block slice is a constant (the wavetable fast path, see ops/tonegen.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import cplx
from ..ops import tonegen as tone_ops
from ..ops.cplx import C
from ..ops.pfb import PFBConfig, tone_bins
from ..params import AntennaParams, WaveType

try:  # jax >= 0.6 moved shard_map to the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _cpair(*spec):
    return C(P(*spec), P(*spec))


def _to_np_global(ys: C) -> np.ndarray:
    """Global numpy view of a sharded result; on a multi-process (multi-
    host) mesh the shards are gathered with process_allgather so every
    host's sinks see the full stream (the per-host ingest/egress design
    of SURVEY.md section 7)."""
    re, im = ys.re, ys.im
    if hasattr(re, "is_fully_addressable") and not re.is_fully_addressable:
        from jax.experimental import multihost_utils
        re = multihost_utils.process_allgather(re, tiled=True)
        im = multihost_utils.process_allgather(im, tiled=True)
        return np.asarray(re).astype(np.float32) + \
            1j * np.asarray(im).astype(np.float32)
    return cplx.to_np(ys)


def plan_sharded_channelizer_loopback(tx, rx, mesh, block_len: int) -> bool:
    """Pure shape-math gate of
    ShardedFusedLoopback._build_channelizer (round 5): a bin-quantized
    (one-frame-periodic) comb under a TIME-ONLY mesh runs the fused
    channelizer kernel per shard — the single-chip headline chain
    spread over the time axis with ZERO collectives (a periodic comb's
    halo frames are the constant frame itself, so nothing is
    ppermuted).  Shared with engine/dispatch so the plan cannot drift
    from the builder."""
    from ..config import kernel_dot_precision, use_pallas_pfb
    from ..ops.cplx import DFT
    from ..ops.pallas_channelizer import can_fuse_channelizer
    if not (use_pallas_pfb() and kernel_dot_precision() == "tf32"):
        return False
    if mesh.shape.get("channels", 1) != 1:
        return False                   # DFT columns stay device-local
    T = mesh.shape.get("time", 1)
    nfft, avg = int(rx.fft_tones), int(rx.pf_average)
    if nfft <= 0 or int(rx.decim) > 1 or tx.burst_on > 0:
        return False
    if block_len % (T * nfft) != 0:
        return False
    freqs = tuple(int(f) for f in tx.freq)
    if not freqs or not rx.freq:
        return False
    period = tone_ops.comb_period(freqs, int(tx.rate))
    if period <= 0 or nfft % period != 0:
        return False                   # comb not one-frame-periodic
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=int(rx.rate))
    dft = DFT(nfft, two_stage=True)
    ftl = block_len // (T * nfft)      # frames per shard per block
    return can_fuse_channelizer(cfg, dft, ftl * nfft)


@dataclasses.dataclass
class ShardedFusedLoopback:
    """Compiled sharded K-block TONES->TONES (PFB) loopback chain.

    Usage:
        sf = ShardedFusedLoopback(tx, rx, mesh, blocks_per_exec=K,
                                  block_len=L)
        state = sf.init_state()
        state, ys = sf.run_exec(state)    # ys (K, L//nfft, n_tones) global
    """

    tx: AntennaParams
    rx: AntennaParams
    mesh: Mesh
    blocks_per_exec: int = 8
    block_len: int = 1_000_000

    def __post_init__(self):
        tx, rx, mesh, L = self.tx, self.rx, self.mesh, self.block_len
        assert tx.wave_type and tx.wave_type[0] == WaveType.TONES
        assert rx.wave_type and rx.wave_type[0] == WaveType.TONES
        rate = int(rx.rate)
        nfft = int(rx.fft_tones)
        avg = int(rx.pf_average)
        self.cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate)
        self.T = mesh.shape.get("time", 1)
        self.Kc = mesh.shape.get("channels", 1)
        assert L % (self.T * nfft) == 0, \
            "block_len must split over time shards in whole frames"
        assert nfft % self.Kc == 0, "nfft must split over channel shards"
        self.Lt = L // self.T
        self.ft = self.Lt // nfft            # frames per time shard
        self.H = (avg - 1) * nfft
        assert self.H <= self.Lt, "halo must fit in one time shard"

        # tone selection: owner shard + local column per tone
        bins = tone_bins(rx.freq, rate, nfft)          # global bins
        nloc = nfft // self.Kc
        self.n_tones = len(bins)
        self._bins_np = np.asarray(bins)
        self._owners = jnp.asarray((bins // nloc).astype(np.int32))
        self._local_idx = jnp.asarray((bins % nloc).astype(np.int32))

        from ..ops.cplx import dft_matrix
        self.F = dft_matrix(nfft)                      # (nfft, nfft)
        self.window = self.cfg.window()

        # TX path selection (mirrors engine/generator.py make_generator)
        freqs = tuple(int(f) for f in tx.freq)
        ampls = tuple(float(a) for a in (tx.ampl or [1.0] * len(freqs)))
        period = tone_ops.comb_period(freqs, rate)
        self._const_tx = (L % period == 0 and period <= (1 << 22))
        if self._const_tx:
            self._xconst = tone_ops.tone_comb_wavetable_block(
                freqs, ampls, rate, L)                 # (L,) global const
        else:
            cfgt = tone_ops.ToneCombConfig(
                rate=rate, freqs=freqs, ampls=ampls, block_len=self.Lt)
            self._P, self._Q = cfgt.factors()          # local (U,C),(C,S)
            fr = np.asarray(freqs, dtype=np.int64)
            W = rate
            # per-block phase advance is the GLOBAL block stride f*L mod W
            self._stepv = jnp.asarray(((fr * L) % W).astype(np.int32))
            # per-shard init: shard t starts at absolute sample t*Lt
            t = np.arange(self.T, dtype=np.int64)
            ph0 = (fr[None, :] * ((t[:, None] * self.Lt) % W)) % W
            self._phase0 = jnp.asarray(
                ph0.reshape(-1).astype(np.int32))      # (T*Ctx,)
            self._n_tx = len(freqs)
        # the fused channelizer kernel per shard (the single-chip
        # headline chain, engine/fused._ChannelizerWavetableChain,
        # sharded) when the geometry allows — else the presum+XLA-DFT
        # SPMD chain
        if plan_sharded_channelizer_loopback(tx, rx, mesh, L):
            self.path = "channelizer_wavetable"
            self._build_channelizer(freqs, ampls)
        else:
            self.path = "pfb_scan"
            self._build()

    # ------------------------------------------------------------------
    def _build(self):
        mesh = self.mesh
        nfft, avg = self.cfg.nfft, self.cfg.avg
        rate = self.cfg.rate
        T, H, ft, K = self.T, self.H, self.ft, self.blocks_per_exec
        Kc = self.Kc
        has_time = "time" in mesh.axis_names and T > 1
        time_ax = "time" if "time" in mesh.axis_names else None
        ch_ax = "channels" if "channels" in mesh.axis_names else None
        const_tx = self._const_tx

        # Pallas one-pass pre-sum on the local (ft, nfft) tile when the
        # per-shard geometry tiles (same gate as the single-chip engine)
        from ..config import use_pallas_pfb
        from ..ops.pallas_pfb import _HALO_PAD, _pick_bt, pallas_presum
        bt = _pick_bt(ft, nfft)
        fused_presum = (use_pallas_pfb() and bt > 0 and H > 0 and
                        avg - 1 <= min(_HALO_PAD, bt))

        def pfb_select(halo, x, window, F, owners, local_idx):
            """One block of PFB + owner-local select (local shapes:
            halo (H,), x (Lt,), F (nfft, nfft/Kc))."""
            if H > 0 and has_time:
                tail = x[-H:]
                perm = [(i, (i + 1) % T) for i in range(T)]
                recv = C(jax.lax.ppermute(tail.re, "time", perm),
                         jax.lax.ppermute(tail.im, "time", perm))
                tidx = jax.lax.axis_index("time")
                use = C(jnp.where(tidx == 0, halo.re, recv.re),
                        jnp.where(tidx == 0, halo.im, recv.im))
                new_halo = recv
            elif H > 0:
                use, new_halo = halo, x[-H:]
            else:
                use, new_halo = halo, halo
            W2 = window.reshape(avg, nfft)
            if fused_presum:
                # leading-halo form: no concat([halo, x]) HBM round trip
                pre = pallas_presum(W2, use.reshape(avg - 1, nfft),
                                    x.reshape(ft, nfft), bt=bt)
            else:
                ze = cplx.concat([use, x]) if H else x
                X = ze.reshape(ft + avg - 1, nfft)
                pre = cplx.zeros((ft, nfft), dtype=x.re.dtype)
                for i in range(avg):
                    pre = pre + cplx.scale(X[i:i + ft, :], W2[i][None, :])
            frames = cplx.matmul(pre, F)               # (ft, nfft/Kc)
            sel = cplx.take(frames, local_idx, axis=-1)  # (ft, n_tones)
            if ch_ax is not None and Kc > 1:
                cidx = jax.lax.axis_index("channels")
                mask = (owners == cidx).astype(sel.re.dtype)[None, :]
                sel = C(jax.lax.psum(sel.re * mask, "channels"),
                        jax.lax.psum(sel.im * mask, "channels"))
            return new_halo, sel

        if const_tx:
            def spmd_chain(halo, xloc, window, F, owners, local_idx):
                def body(carry, _):
                    halo2, sel = pfb_select(carry, xloc, window, F,
                                            owners, local_idx)
                    return halo2, sel
                halo, ys = jax.lax.scan(body, halo, None, length=K)
                return halo, ys

            self._exec = jax.jit(shard_map(
                spmd_chain, mesh=mesh,
                in_specs=(_cpair(time_ax),     # halo carry
                          _cpair(time_ax),     # const TX block
                          P(None),             # window
                          _cpair(None, ch_ax),  # DFT columns
                          P(None), P(None)),   # owners, local_idx
                out_specs=(_cpair(time_ax),
                           _cpair(None, time_ax, None)),
                check_vma=False))
        else:
            Ptx, Qtx, stepv = self._P, self._Q, self._stepv

            def spmd_chain(phase, halo, window, F, owners, local_idx):
                def body(carry, _):
                    ph, hl = carry
                    ph, x = tone_ops.tone_comb_block(Ptx, Qtx, stepv,
                                                     rate, ph)
                    hl, sel = pfb_select(hl, x, window, F,
                                         owners, local_idx)
                    return (ph, hl), sel
                (phase2, halo2), ys = jax.lax.scan(
                    body, (phase, halo), None, length=K)
                return phase2, halo2, ys

            self._exec = jax.jit(shard_map(
                spmd_chain, mesh=mesh,
                in_specs=(P(time_ax),          # per-shard tx phase
                          _cpair(time_ax),     # halo carry
                          P(None),
                          _cpair(None, ch_ax),
                          P(None), P(None)),
                out_specs=(P(time_ax), _cpair(time_ax),
                           _cpair(None, time_ax, None)),
                check_vma=False))

    # ------------------------------------------------------------------
    def _build_channelizer(self, freqs, ampls):
        """Per-shard fused channelizer kernel for a bin-quantized comb
        (round 5): each time shard runs the single-chip headline kernel
        (ops/pallas_channelizer.channelizer_frames_t, const-frame
        broadcast) over its ftl frames — ZERO collectives.  A
        one-frame-periodic comb makes every halo frame the constant
        frame itself: shard t>0's stream-preceding frames (which the
        pfb_scan path ppermutes from shard t-1) ARE the frame, and
        shard 0's carry equals it from the second block on.  Only the
        stream's very first tile (shard 0, block 0) differs — zero
        history, selected by the started flag, exactly matching the
        pfb_scan path's zero-primed halo carry."""
        import jax.numpy as jnp
        from ..ops.cplx import DFT
        from ..ops.pallas_channelizer import (channelizer_frames_t,
                                              select_tones_t,
                                              transpose_block)
        mesh = self.mesh
        time_ax = "time" if "time" in mesh.axis_names else None
        has_time = time_ax is not None and self.T > 1
        cfg = self.cfg
        nfft, avg = cfg.nfft, cfg.avg
        lead = avg - 1
        dft = DFT(nfft, two_stage=True)
        n1, n2 = dft.split
        frame = tone_ops.tone_comb_wavetable_block(
            freqs, ampls, cfg.rate, nfft)              # (nfft,) const
        f_t = transpose_block(frame, nfft, n1, n2)     # (n1, 1, n2)
        lead_f = C(jnp.broadcast_to(f_t.re, (n1, lead, n2)),
                   jnp.broadcast_to(f_t.im, (n1, lead, n2)))
        bins = self._bins_np
        window = jnp.asarray(self.window)
        ftl, K = self.ft, self.blocks_per_exec

        def spmd(started):
            tidx = (jax.lax.axis_index("time") if has_time
                    else jnp.int32(0))

            def body(st, _):
                g = jnp.where(jnp.logical_and(tidx == 0, st == 0),
                              jnp.float32(0.0), jnp.float32(1.0))
                sp = C(lead_f.re * g, lead_f.im * g)
                _, fr = channelizer_frames_t(cfg, window, dft, sp, f_t,
                                             nframes=ftl)
                y = select_tones_t(fr, bins, n1, n2)
                return jnp.int32(1), y

            st2, ys = jax.lax.scan(body, started, None, length=K)
            return st2, ys

        self._exec = jax.jit(shard_map(
            spmd, mesh=mesh,
            in_specs=(P(),),
            out_specs=(P(), _cpair(None, time_ax, None)),
            check_vma=False))

    # ------------------------------------------------------------------
    def init_state(self):
        if self.path == "channelizer_wavetable":
            return (jnp.int32(0),)                 # started flag
        halo = cplx.zeros(self.T * self.H)
        if self._const_tx:
            return (halo,)
        return (self._phase0, halo)

    def run_exec(self, state):
        """One compiled execution: K blocks.  Returns (state', ys) with
        ys of global shape (K, L//nfft, n_tones) sharded over time."""
        if self.path == "channelizer_wavetable":
            (st,) = state
            st, ys = self._exec(st)
            return (st,), ys
        if self._const_tx:
            (halo,) = state
            halo, ys = self._exec(halo, self._xconst, self.window, self.F,
                                  self._owners, self._local_idx)
            return (halo,), ys
        phase, halo = state
        phase, halo, ys = self._exec(phase, halo, self.window, self.F,
                                     self._owners, self._local_idx)
        return (phase, halo), ys

    # ------------------------------------------------------------------
    def run(self, sinks=(), usrp_number: int = 0, front_end: str = "A",
            n_blocks: int | None = None):
        """Stream a full acquisition through the sharded chain, feeding
        sinks packet-by-packet (the mesh analogue of
        engine/fused.FusedLoopback.run); on a multi-host mesh each host's
        sinks receive the gathered global stream."""
        from ..engine.pipeline import run_chunked
        K = self.blocks_per_exec
        nb = int(n_blocks) if n_blocks else K
        n_exec = max(1, -(-nb // K))
        rows_per_block = self.T * self.ft
        return run_chunked(self.run_exec, self.init_state, n_exec, nb,
                           self.block_len, self.n_tones,
                           rows_per_block * nb, sinks,
                           usrp_number=usrp_number, front_end=front_end,
                           to_np=_to_np_global)


def plan_sharded_chirp_table(tx, rx, mesh, block_len: int) -> bool:
    """Pure shape-math gate of ShardedFusedVNA._build_table (round 5):
    the single-chip table-oscillator lock-in (engine/fused.
    _ChirpWavetableChain — the config-2 chain) sharded over time.  The
    integer-phase chirp repeats exactly every period, so ONE resident
    period serves every shard; shard t's lock-in segments are a
    contiguous slice of the block's, reached by invoking the unchanged
    single-fetch kernel at tile index i*T + t with the per-shard
    segment count — zero collectives, no per-sample sincos.  Shared
    with engine/dispatch so the plan cannot drift from the builder."""
    from ..config import use_pallas_pfb
    from ..engine.replay import DEVICE_REPLAY_MAX_BYTES
    from ..ops import chirp as chirp_ops
    from ..params import chirp_steps_and_length
    if not use_pallas_pfb():
        return False
    if tx is None or tx.burst_on > 0 or int(rx.decim) < 1:
        return False
    for attr in ("freq", "chirp_f", "chirp_t", "swipe_s"):
        a, b = getattr(tx, attr), getattr(rx, attr)
        if not a or not b or a[0] != b[0]:
            return False
    steps, length = chirp_steps_and_length(rx)
    cfg = chirp_ops.ChirpConfig.from_params(
        rx.freq[0], rx.chirp_f[0], int(rx.rate), steps, rx.chirp_t[0])
    ppt = length * int(rx.decim)
    T = mesh.shape.get("time", 1)
    return bool(block_len % (T * ppt) == 0 and
                (block_len // (T * ppt)) % 8 == 0 and
                cfg.period % block_len == 0 and
                cfg.period * 8 <= DEVICE_REPLAY_MAX_BYTES)


@dataclasses.dataclass
class ShardedFusedVNA:
    """Compiled sharded K-block CHIRP->CHIRP (VNA) loopback chain.

    Chirp demod is elementwise and the lock-in segment-local, so the chain
    needs NO halo (see sharded_chirp.py): each time shard synthesizes its
    own chirp segment from a per-shard uint32 offset (exact mod-period
    arithmetic), mixes it down against itself (the loopback), and reduces
    whole lock-in segments.  The scan over K blocks runs inside the
    shard_map; the only replicated state is the uint32 block-start index.
    """

    tx: AntennaParams
    rx: AntennaParams
    mesh: Mesh
    blocks_per_exec: int = 8
    block_len: int = 1_000_000

    def __post_init__(self):
        from ..params import chirp_steps_and_length
        from ..ops import chirp as chirp_ops
        from ..ops.lockin import lockin_profile
        tx, rx, mesh, L = self.tx, self.rx, self.mesh, self.block_len
        assert tx.wave_type and tx.wave_type[0] == WaveType.CHIRP
        assert rx.wave_type and rx.wave_type[0] == WaveType.CHIRP
        steps, length = chirp_steps_and_length(rx)
        self.cfg = chirp_ops.ChirpConfig.from_params(
            rx.freq[0], rx.chirp_f[0], int(rx.rate), steps, rx.chirp_t[0])
        decim = int(rx.decim)
        assert decim > 0, "sharded fused VNA needs the lock-in (decim>=1)"
        self.ppt = length * decim
        self.T = mesh.shape.get("time", 1)
        assert L % (self.T * self.ppt) == 0, \
            "block must split into whole lock-in segments per time shard"
        self.Lt = L // self.T
        self.nseg_t = self.Lt // self.ppt
        self.scale = float(tx.ampl[0]) if tx.ampl else 1.0
        period = self.cfg.period
        t = np.arange(self.T, dtype=np.uint64)
        self._off = jnp.asarray(
            ((t * np.uint64(self.Lt)) % np.uint64(period)).astype(np.uint32))
        self.profile = jnp.asarray(lockin_profile(self.ppt))
        self.n_tones = 1
        # the table-oscillator lock-in (the single-chip config-2 chain)
        # sharded over time when the period is resident-sized — else the
        # per-shard sincos synth chain
        if plan_sharded_chirp_table(tx, rx, mesh, L):
            self.path = "chirp_table"
            self._build_table()
        else:
            self.path = "chirp_lockin"
            self._build()

    def _build(self):
        from ..ops.chirp import chirp_phase_index
        cfg, mesh = self.cfg, self.mesh
        Lt, ppt, nseg_t, K = self.Lt, self.ppt, self.nseg_t, \
            self.blocks_per_exec
        L = self.block_len
        time_ax = "time" if "time" in mesh.axis_names else None
        period = jnp.uint32(cfg.period)
        scale = jnp.float32(self.scale)

        def spmd_chain(last, off, profile):
            n = jnp.arange(Lt, dtype=jnp.uint32)

            def body(l, _):
                base = (l[0] % period) + off[0]
                base = jnp.where(base >= period, base - period, base)
                idx = chirp_phase_index(cfg, base, n)
                th = jnp.float32(np.pi) * (
                    idx.astype(jnp.float32) *
                    jnp.float32(1.0 / 2147483647.5))
                c = C(jnp.sin(th), -jnp.cos(th))      # unit chirp
                x = C(c.re * scale, c.im * scale)     # TX output
                z = cplx.conj_mul(c, x)               # RX mix-down
                seg = z.reshape(nseg_t, ppt)
                y = cplx.matmul_cr(seg, profile)
                l2 = (l + jnp.uint32(L % cfg.period)) % period
                return l2, y

            last, ys = jax.lax.scan(body, last, None, length=K)
            return last, ys

        self._exec = jax.jit(shard_map(
            spmd_chain, mesh=mesh,
            in_specs=(P(None), P(time_ax), P(None)),
            out_specs=(P(None), _cpair(None, time_ax)),
            check_vma=False))

    def _build_table(self):
        """Per-shard table-oscillator lock-in (round 5): one resident
        chirp period (generated once at build, exact uint32 phase
        accumulator) replicated over the mesh; each shard invokes the
        UNCHANGED single-fetch kernel
        (ops/pallas_lockin.pallas_chirp_lockin_table_self) at tile
        index i*T + t for its nseg_t contiguous segments — the kernel's
        row map (blk*nr + s) lands exactly on the shard's rows.  Zero
        collectives; the per-sample sincos the chirp_lockin path pays
        is replaced by an HBM read (measured 18.6 vs 40.6 Gsps
        single-chip, tools/perf_chirp_table.py)."""
        from jax.sharding import NamedSharding
        from ..ops import chirp as chirp_ops
        from ..ops.lockin import lockin_profile
        from ..ops.pallas_lockin import pallas_chirp_lockin_table_self
        cfg, mesh = self.cfg, self.mesh
        L, ppt, nseg_t, K, T = (self.block_len, self.ppt, self.nseg_t,
                                self.blocks_per_exec, self.T)
        period = cfg.period
        nblk = period // L
        scale = self.scale
        time_ax = "time" if "time" in mesh.axis_names else None
        has_time = time_ax is not None and T > 1
        # demod contract: conj(unit c) * x with x = scale*c; the
        # wavetable holds scale*c, so one scale divides back out
        # through the profile (same fold as the single-chip chain)
        prof = jnp.asarray(lockin_profile(ppt) /
                           (scale if scale else 1.0))

        @jax.jit
        def gen_period():
            def body(last, _):
                last, x = chirp_ops.chirp_block(cfg, last, L, scale=scale)
                return last, x
            _, xs = jax.lax.scan(body, jnp.uint32(0), None, length=nblk)
            return xs

        xs = gen_period()
        total_nseg = period // ppt
        rep = NamedSharding(mesh, P(None, None))
        self._Xf = C(
            jax.device_put(xs.re.reshape(total_nseg, ppt), rep),
            jax.device_put(xs.im.reshape(total_nseg, ppt), rep))

        def spmd(last, idx, profile, Xre, Xim):
            Xl = C(Xre, Xim)
            tidx = (jax.lax.axis_index("time") if has_time
                    else jnp.int32(0))

            def body(carry, _):
                l, i = carry
                y = pallas_chirp_lockin_table_self(
                    profile, Xl, i * T + tidx, nseg_t)
                nxt = i + 1
                nxt = jnp.where(nxt >= nblk, nxt - nblk, nxt)
                l2 = (l + jnp.uint32(L % period)) % jnp.uint32(period)
                return (l2, nxt), y

            (last, idx), ys = jax.lax.scan(
                body, (last, idx), None, length=K)
            return last, idx, ys

        smapped = shard_map(
            spmd, mesh=mesh,
            in_specs=(P(None), P(), P(None),
                      P(None, None), P(None, None)),
            out_specs=(P(None), P(), _cpair(None, time_ax)),
            check_vma=False)

        @jax.jit
        def exec_fn(last, idx, Xre, Xim):
            return smapped(last, idx, prof, Xre, Xim)

        self._exec_table = exec_fn

    # ------------------------------------------------------------------
    def init_state(self):
        if self.path == "chirp_table":
            return (jnp.zeros(1, dtype=jnp.uint32), jnp.int32(0))
        return (jnp.zeros(1, dtype=jnp.uint32),)

    def run_exec(self, state):
        """One execution: K blocks -> ys global (K, L//ppt, 1)."""
        if self.path == "chirp_table":
            last, idx = state
            last, idx, ys = self._exec_table(last, idx, self._Xf.re,
                                             self._Xf.im)
            ys = C(ys.re[..., None], ys.im[..., None])
            return (last, idx), ys
        (last,) = state
        last, ys = self._exec(last, self._off, self.profile)
        ys = C(ys.re[..., None], ys.im[..., None])
        return (last,), ys

    # reuse the generic acquisition loop
    ft = property(lambda self: self.nseg_t)
    run = ShardedFusedLoopback.run


@dataclasses.dataclass
class ShardedFusedDirect:
    """Sharded K-block TONES->DIRECT chain — ZERO collectives.

    The single-kernel chain (ops/pallas_chain.TonesDirectChain) shards
    embarrassingly: P/ramp rows split over 'time', tap/ramp columns over
    'channels', and — because a block's leading FIR-history halo is
    RE-SYNTHESIZED from the constant P with the previous block's rotation
    rather than exchanged — time sharding needs no ppermute at all (the
    cross-shard halo rows are constants staged at build).  Only the halo
    ROTATION differs per shard: shard 0's first tile wraps to the
    previous block (prev rotation), other shards' first tiles wrap to the
    previous shard's rows of the same block (current rotation).
    """

    tx: AntennaParams
    rx: AntennaParams
    mesh: Mesh
    blocks_per_exec: int = 8
    block_len: int = 1_000_000

    use_fold: bool = True    # prefer the shift-fold kernel when it tiles

    def __post_init__(self):
        from ..ops.ddc import DirectDDCConfig
        from ..ops.pallas_chain import (TonesDirectChain,
                                        TonesDirectFoldKernel)
        tx, rx, mesh, L = self.tx, self.rx, self.mesh, self.block_len
        assert tx.wave_type and tx.wave_type[0] == WaveType.TONES
        assert rx.wave_type and rx.wave_type[0] == WaveType.DIRECT
        self.T = mesh.shape.get("time", 1)
        self.Kc = mesh.shape.get("channels", 1)
        freqs = tuple(int(f) for f in tx.freq)
        ampls = tuple(float(a) for a in (tx.ampl or [1.0] * len(freqs)))
        rx_freqs = tuple(int(f) for f in rx.freq)
        dcfg = DirectDDCConfig(
            rate=int(rx.rate), decim=int(rx.decim),
            pf_average=int(rx.pf_average), freqs=rx_freqs,
            phases=(0,) * len(rx_freqs))
        # shift-fold kernel first (no halo machinery at all: P rows shard
        # over 'time', G2 columns over 'channels', zero collectives);
        # fall back to the G-fused chain when it doesn't tile
        self.fold = None
        self.n_pad = 0
        if self.use_fold:
            from ..config import pad_lanes
            from ..engine.fused import _pad_tone_lists
            # lane-pad the channel axis to 128 lanes PER SHARD (multiple
            # 128*Kc): a channel-sharded output tile below 128 lanes is
            # a lane-MASKED HBM write on EVERY shard (~212 vs 429 GB/s
            # dense, tools/perf_c3_ladder.py) — the same cap the
            # single-chip fold chain shed in round 5 (engine/fused.py);
            # dead channels are sliced off host-side after the fetch
            cands = [(freqs, ampls, rx_freqs, 0)]
            if pad_lanes():
                cands.insert(0, _pad_tone_lists(
                    freqs, ampls, rx_freqs, int(tx.rate),
                    multiple=128 * self.Kc))
            for kf, ka, kr, n_pad in cands:
                kcfg = dcfg if not n_pad else DirectDDCConfig(
                    rate=int(rx.rate), decim=int(rx.decim),
                    pf_average=int(rx.pf_average), freqs=kr,
                    phases=(0,) * len(kr))
                fold = TonesDirectFoldKernel(
                    rate=int(tx.rate), tx_freqs=kf, tx_ampls=ka,
                    cfg=kcfg, block_len=L, time_shards=self.T)
                if fold.ok and fold.Cp % self.Kc == 0:
                    if self.Kc > 1:
                        # the self-ramp shortcut reads the ramp off the P
                        # tile, whose columns are the FULL tx set while
                        # the output tile carries only the channel
                        # shard's columns — stream the sharded ramp
                        # instead
                        fold.self_ramp = False
                    self.fold = fold
                    self.n_pad = n_pad
                    break
        self.chain = self.fold if self.fold is not None else \
            TonesDirectChain(
                rate=int(tx.rate), tx_freqs=freqs, tx_ampls=ampls,
                cfg=dcfg, block_len=L, time_shards=self.T)
        self.ok = (self.chain.ok and
                   self.chain.Cp % self.Kc == 0 and
                   self.chain.nb % self.T == 0)
        if not self.ok:
            return
        # run() metadata: the REAL channel count — a lane-padded fold
        # emits chain.Cp > n_tones and run_chunked / the dual drain
        # slice the dead lanes host-side after the fetch
        self.n_tones = len(rx_freqs)
        self.out_channels = self.chain.Cp
        # dispatch sub-path (plan==actual battery)
        self.path = "fold_kernel" if self.fold is not None else "g_chain"
        self.ft = self.chain.nb // self.T        # output rows per shard
        if self.fold is not None:
            self._build_fold()
        else:
            self._build()

    def _build_fold(self):
        """SPMD program around the shift-fold kernel: P/ramp rows over
        'time', G2/drot columns over 'channels', srots replicated — no
        halo rows, no halo rotations, no collectives.  The stream's
        first-block startup correction is applied on the GLOBAL output
        (its f-1 rows live on time shard 0), outside the shard_map."""
        import jax.numpy as jnp
        mesh = self.mesh
        time_ax = "time" if "time" in mesh.axis_names else None
        ch_ax = "channels" if "channels" in mesh.axis_names else None
        chain = self.fold
        K = self.blocks_per_exec
        f, W = chain.cfg.f, chain.rate

        # Factored P (round 4, same as the single-chip multi_step): P1 is
        # REPLICATED (R rows, fetched once per shard by the constant
        # block spec), the Vandermonde tile factor rides the per-tile
        # rotation rows, and nothing of P is streamed — each shard's HBM
        # traffic drops to its output write alone.  The GLOBAL tile axis
        # of the rotation rows shards over 'time' (block_rotations_factored
        # flat=False keeps (K, ntiles*8, C)).
        nbt = chain.nb // max(1, chain.time_shards)

        def spmd(P1, G2, ramp1, crots, qrots):
            Ct = crots.re.shape[-1]
            Cpl = qrots.re.shape[-1]
            cr = C(crots.re.reshape(-1, Ct), crots.im.reshape(-1, Ct))
            qr = C(qrots.re.reshape(-1, Cpl), qrots.im.reshape(-1, Cpl))
            y = chain.invoke_factored(cr, qr, K, P1=P1, G2=G2,
                                      ramp1=ramp1)
            return y.reshape(K, nbt, Cpl)

        ramp1_spec = _cpair(None, ch_ax)
        smapped = shard_map(
            spmd, mesh=mesh,
            in_specs=(_cpair(None, None),         # P1 (replicated)
                      (P(None, ch_ax),) * 6,      # folded G2 constant
                      ramp1_spec,                 # ramp1 (replicated rows)
                      _cpair(None, time_ax, None),   # crots tiles
                      _cpair(None, time_ax, ch_ax)), # qrots tiles
            out_specs=_cpair(None, time_ax, ch_ax),
            check_vma=False)

        @jax.jit
        def exec_fn(state):
            sph0, dph0, pv = state
            state2, crots, qrots = chain.block_rotations_factored(
                state, K, flat=False)
            ramp1 = (chain._ramp1 if not chain.self_ramp
                     else C(chain._ramp.re[:1], chain._ramp.im[:1]))
            ys = smapped(chain._P1, chain._G2, ramp1, crots, qrots)
            if f > 1:
                # zero-history startup rows of the stream's first block
                # (same correction as the single-chip multi_step)
                two_pi_w = jnp.float32(2.0 * np.pi / W)
                srot0 = cplx.expi(sph0.astype(jnp.float32) * two_pi_w)
                drot0 = cplx.expi_neg(dph0.astype(jnp.float32) * two_pi_w)
                h = cplx.mul(chain._P[:f - 1],
                             C(srot0.re[None, :], srot0.im[None, :]))
                G2p = chain._G2p
                cr = (jnp.einsum("rt,rtc->rc", h.re, G2p.re) -
                      jnp.einsum("rt,rtc->rc", h.im, G2p.im))
                ci = (jnp.einsum("rt,rtc->rc", h.re, G2p.im) +
                      jnp.einsum("rt,rtc->rc", h.im, G2p.re))
                corr = cplx.mul(
                    cplx.mul(C(cr, ci), chain._ramp[:f - 1]),
                    C(drot0.re[None, :], drot0.im[None, :]))
                g = jnp.float32(1.0) - pv
                ys = C(ys.re.at[0, :f - 1].add(-g * corr.re),
                       ys.im.at[0, :f - 1].add(-g * corr.im))
            return state2, ys

        self._exec = exec_fn

    def _build(self):
        mesh = self.mesh
        time_ax = "time" if "time" in mesh.axis_names else None
        ch_ax = "channels" if "channels" in mesh.axis_names else None
        has_time = time_ax is not None and self.T > 1
        chain = self.chain
        K = self.blocks_per_exec

        def spmd(Pl, lPl, G, ramp, srots, hrots, drots):
            if has_time:
                tidx = jax.lax.axis_index("time")
                hr = C(jnp.where(tidx == 0, hrots.re, srots.re),
                       jnp.where(tidx == 0, hrots.im, srots.im))
            else:
                hr = hrots
            y = chain.invoke(Pl, lPl, G, ramp, srots, hr, drots, K)
            return y.reshape(K, Pl.shape[0], G[0].shape[2])

        smapped = shard_map(
            spmd, mesh=mesh,
            in_specs=(_cpair(time_ax),            # P rows
                      _cpair(time_ax),            # lP rows (per-tile halos)
                      (P(None, None, ch_ax),) * 6,  # fused G constant
                      _cpair(time_ax, ch_ax),     # ramp
                      _cpair(None),               # srots (replicated)
                      _cpair(None),               # hrots (replicated)
                      _cpair(None, ch_ax)),       # drots
            out_specs=_cpair(None, time_ax, ch_ax),
            check_vma=False)

        @jax.jit
        def exec_fn(state):
            state, srots, hrots, drots = chain.block_rotations(state, K)
            ys = smapped(chain._P, chain._lP, chain._G, chain._ramp,
                         srots, hrots, drots)
            return state, ys

        self._exec = exec_fn

    def init_state(self):
        return self.chain.init_state()

    def run_exec(self, state):
        """One execution: K blocks -> ys global (K, nb, C)."""
        return self._exec(state)

    # reuse the generic acquisition loop
    run = ShardedFusedLoopback.run


def can_fuse_sharded(tx: AntennaParams | None, rx: AntennaParams,
                     mesh: Mesh) -> bool:
    """True when the (tx, rx, mesh) triple maps onto the sharded fused
    chain: TONES->TONES, no frame averaging, bins splittable over the
    channel axis."""
    if tx is None or not tx.wave_type or not rx.wave_type:
        return False
    pair = (tx.wave_type[0], rx.wave_type[0])
    if pair == (WaveType.TONES, WaveType.TONES):
        if int(rx.decim) > 1:
            return False
        Kc = mesh.shape.get("channels", 1)
        nfft = int(rx.fft_tones)
        return nfft > 0 and nfft % Kc == 0
    if pair == (WaveType.CHIRP, WaveType.CHIRP):
        return int(rx.decim) >= 1 and len(rx.freq) == 1
    if pair == (WaveType.TONES, WaveType.DIRECT):
        from ..config import kernel_dot_precision, use_pallas_pfb
        Kc = mesh.shape.get("channels", 1)
        return (int(rx.decim) > 0 and int(rx.pf_average) >= 2 and
                tx.burst_on <= 0 and            # chain has no burst gate
                len(rx.freq) > 0 and len(rx.freq) % Kc == 0 and
                use_pallas_pfb() and kernel_dot_precision() == "tf32")
    return False


def make_sharded_fused(tx: AntennaParams, rx: AntennaParams, mesh: Mesh,
                       blocks_per_exec: int, block_len: int):
    """Build the fused sharded chain for a fusable (tx, rx) pair.
    Returns None when the geometry doesn't tile (callers fall back to the
    non-fused sharded path)."""
    if rx.wave_type[0] == WaveType.CHIRP:
        return ShardedFusedVNA(tx, rx, mesh, blocks_per_exec=blocks_per_exec,
                               block_len=block_len)
    if rx.wave_type[0] == WaveType.DIRECT:
        sf = ShardedFusedDirect(tx, rx, mesh,
                                blocks_per_exec=blocks_per_exec,
                                block_len=block_len)
        return sf if sf.ok else None
    return ShardedFusedLoopback(tx, rx, mesh,
                                blocks_per_exec=blocks_per_exec,
                                block_len=block_len)


def plan_sharded_block(rx: AntennaParams, mesh: Mesh):
    """(block_len, n_blocks) for a sharded fused acquisition: the planner's
    commensurate block rounded up so it splits over time shards in whole
    output strides (frames / lock-in segments) and — for the PFB — each
    shard's segment covers the overlap-save halo."""
    from ..engine.planner import mode_stride, plan_blocks
    plan = plan_blocks(rx)
    T = mesh.shape.get("time", 1)
    q = T * mode_stride(rx)
    L = -(-plan.block_len // q) * q
    if rx.wave_type and rx.wave_type[0] == WaveType.TONES:
        L = max(L, T * (int(rx.pf_average) - 1) * int(rx.fft_tones))
        L = -(-L // q) * q
    total = int(rx.samples) if int(rx.samples) > 0 else L
    return L, max(1, -(-total // L))
