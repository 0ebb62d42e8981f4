"""Mesh-dispatched device-resident replay.

The single-chip DeviceReplay (engine/replay.py) uploads a recording once
and scans the demodulator over HBM-resident blocks.  This is its
multi-chip form: the recording is uploaded ONCE with the blocks' time
axis already sharded over the mesh (block b, shard t holds samples
[b*L + t*Lt, b*L + (t+1)*Lt)), and each execution scans K blocks through
the SHARDED demodulator (parallel/sharded*.py) — the per-block input is
a cheap device-local slice of the resident recording, and the overlap-
save halos ride the demodulator's own ppermute ring exactly as in the
host-fed sharded path (no new collectives).

Reference analog: replay is this framework's --sw_loop
(cpp/USRP_hardware_manager.cpp:1331-1395); the reference has no
multi-device form at all.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import cplx
from ..ops.cplx import C
from ..params import AntennaParams
from ..engine.demodulator import make_demodulator
from ..engine.pipeline import PipelineResult
from .fused_sharded import _to_np_global


def plan_sharded_replay_kernel(rx, n: int, L: int, loop: bool,
                               mesh: Mesh) -> bool:
    """Pure shape-math gate of ShardedDeviceReplay._try_replay_kernel
    (round 5): looped DIRECT replay through the row-major replay kernel
    per time shard, with the cross-shard FIR-history rows STAGED at
    upload (zero collectives — the sharded form of
    ops/pallas_replay.ReplayDDC).  Shared with engine/dispatch."""
    from ..config import kernel_dot_precision, use_pallas_pfb
    from ..engine.replay import pad_rx_freqs
    from ..ops.ddc import DirectDDCConfig
    from ..ops.pallas_replay import ShardedReplayDDC
    from ..params import WaveType
    w = rx.wave_type[0] if rx.wave_type else None
    if not (loop and n % L == 0 and w == WaveType.DIRECT and
            int(rx.decim) > 0 and int(rx.pf_average) >= 2 and
            use_pallas_pfb() and kernel_dot_precision() == "tf32"):
        return False
    if mesh.shape.get("channels", 1) != 1:
        return False                 # channel axis stays device-local
    T = mesh.shape.get("time", 1)
    freqs = pad_rx_freqs(rx.freq, int(rx.rate))
    cfg = DirectDDCConfig(
        rate=int(rx.rate), decim=int(rx.decim),
        pf_average=int(rx.pf_average), freqs=freqs,
        phases=(0,) * len(freqs))
    return ShardedReplayDDC.plan_tiles(cfg, n, L, T) is not None


def plan_sharded_channelizer_replay(rx, n: int, L: int, loop: bool,
                                    mesh: Mesh) -> bool:
    """Pure shape-math gate of
    ShardedDeviceReplay._try_channelizer_replay (round 5): TONES/NOISE
    replay through the fused channelizer kernel on each time shard's
    local span of the resident recording, with the cross-shard halo
    frames STAGED at upload (the recording is static, so the frames a
    shard would otherwise ppermute for are precomputed host-side) —
    zero collectives, no per-shard presum round trip.  Shared with
    engine/dispatch so the plan cannot drift from the builder."""
    from ..config import kernel_dot_precision, use_pallas_pfb
    from ..ops import pfb as pfb_ops
    from ..ops.cplx import DFT
    from ..ops.pallas_channelizer import can_channelizer_at_halo
    from ..params import WaveType
    w = rx.wave_type[0] if rx.wave_type else None
    if not (loop and n % L == 0 and
            w in (WaveType.TONES, WaveType.NOISE) and
            int(rx.fft_tones) > 0 and use_pallas_pfb() and
            kernel_dot_precision() == "tf32"):
        return False
    if mesh.shape.get("channels", 1) != 1:
        return False                 # channel axis stays device-local
    T = mesh.shape.get("time", 1)
    nfft = int(rx.fft_tones)
    decim = int(rx.decim)
    if L % (T * nfft) != 0:
        return False
    ftl = L // (T * nfft)            # frames per shard per block
    if decim > 0 and ftl % decim != 0:
        return False
    try:
        bins = (None if w == WaveType.NOISE else tuple(
            int(b) for b in pfb_ops.tone_bins(rx.freq, rx.rate, nfft)))
    except Exception:
        return False
    cfg = pfb_ops.PFBConfig(nfft=nfft, avg=int(rx.pf_average),
                            rate=int(rx.rate), bins=bins, decim=decim)
    dft = DFT(nfft, two_stage=True)
    if dft.split is None:
        return False
    nblk = n // L
    return can_channelizer_at_halo(cfg, dft, ftl, nblk * ftl)


@dataclasses.dataclass
class ShardedDeviceReplay:
    """Compiled K-blocks-per-execution sharded demodulation of a
    mesh-resident recording."""

    rx: AntennaParams
    data: np.ndarray                  # complex64 recording (host side)
    mesh: Mesh
    blocks_per_exec: int = 8
    loop: bool = True

    def __post_init__(self):
        mesh = self.mesh
        self.demod = make_demodulator(self.rx, mesh=mesh)
        L = self.demod.plan.block_len
        n = len(self.data)
        self._kernel_path = self._try_replay_kernel(L, n)
        if self._kernel_path is not None:
            self.path = "replay_kernel"
        else:
            self._kernel_path = self._try_channelizer_replay(L, n)
            self.path = ("channelizer_at"
                         if self._kernel_path is not None else "scan")
        if self._kernel_path is not None:
            return
        nblk = max(1, -(-n // L))
        if self.loop:
            assert n % L == 0, \
                "looped sharded replay needs len(recording) % block == 0"
        # one trailing all-zero block serves post-recording reads (non-loop)
        buf = np.zeros((nblk + 1) * L, dtype=np.complex64)
        buf[:n] = np.asarray(self.data, dtype=np.complex64)[:n]
        time_ax = "time" if "time" in mesh.axis_names else None
        sh = NamedSharding(mesh, P(None, time_ax))
        xc = cplx.from_np(buf.reshape(nblk + 1, L))
        self._X = C(jax.device_put(xc.re, sh), jax.device_put(xc.im, sh))
        self.n_rec_blocks = nblk
        K = self.blocks_per_exec
        demod_step = self.demod.step
        loop = self.loop

        # the recording rides the jit as an ARGUMENT (a closure-captured
        # device array is inlined into the remote-compile request, which
        # the relay rejects/crashes on for large recordings)
        def body(X, carry, _):
            state, idx = carry
            x = C(jax.lax.dynamic_slice(X.re, (idx, 0), (1, L))[0],
                  jax.lax.dynamic_slice(X.im, (idx, 0), (1, L))[0])
            state, y = demod_step(state, x)
            nxt = idx + 1
            if loop:
                nxt = jnp.where(nxt >= nblk, nxt - nblk, nxt)
            else:
                nxt = jnp.minimum(nxt, nblk)    # stick at the zero block
            return (state, nxt), y

        import functools

        @jax.jit
        def multi(state, idx, X):
            (state, idx), ys = jax.lax.scan(
                functools.partial(body, X), (state, idx), None, length=K)
            return state, idx, ys

        self._multi = multi

    def _try_replay_kernel(self, L, n):
        """Looped DIRECT replay through the row-major replay kernel on
        each time shard's local span of the resident recording (round
        5: the sharded form of DeviceReplay._try_replay_kernel).  The
        recording is re-laid shard-major at upload; each block's
        first-tile FIR history comes from a staged per-(shard, block)
        halo array (ops/pallas_replay.ShardedReplayDDC — the recording
        is static, so the cross-shard rows are precomputed host-side;
        zero collectives); the replicated carrier state advances per
        GLOBAL block exactly as on a single chip."""
        try:  # jax >= 0.6 moved shard_map to the top level
            from jax import shard_map
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map
        from ..engine.replay import pad_rx_freqs
        from ..ops.ddc import DirectDDCConfig
        from ..ops.pallas_replay import ShardedReplayDDC
        from .fused_sharded import _cpair
        rx, mesh = self.rx, self.mesh
        if not plan_sharded_replay_kernel(rx, n, L, self.loop, mesh):
            return None
        T = mesh.shape.get("time", 1)
        freqs = pad_rx_freqs(rx.freq, int(rx.rate))
        cfg = DirectDDCConfig(
            rate=int(rx.rate), decim=int(rx.decim),
            pf_average=int(rx.pf_average), freqs=freqs,
            phases=(0,) * len(freqs))
        rk = ShardedReplayDDC(cfg, np.asarray(self.data, np.complex64),
                              L, T, blocks_per_exec=self.blocks_per_exec)
        assert rk.ok
        self.n_rec_blocks = rk.nblk
        K = self.blocks_per_exec
        Cp = cfg.n_channels
        nbr_t = rk.nbr_t
        time_ax = "time" if "time" in mesh.axis_names else None
        has_time = time_ax is not None and T > 1
        shr = NamedSharding(mesh, P(time_ax, None))

        def putc(a):
            ac = cplx.from_np(a)
            return C(jax.device_put(ac.re, shr),
                     jax.device_put(ac.im, shr))

        Xg = putc(rk.X_np)
        Hg = putc(rk.H_np)
        Rg = C(jax.device_put(rk._ramp.re, shr),
               jax.device_put(rk._ramp.im, shr))
        self._X = (Xg, Hg, Rg)

        def spmd(idxs, val, drots8, Xl, Hl, rampl):
            tidx = (jax.lax.axis_index("time") if has_time
                    else jnp.int32(0))
            # stream-start zero history applies only to the shard
            # owning the stream's first row
            val_l = jnp.where(tidx == 0, val, jnp.int32(1))
            y = rk.invoke_local(idxs, val_l, drots8, Xl, Hl, rampl)
            return C(y.re.reshape(K, nbr_t, Cp),
                     y.im.reshape(K, nbr_t, Cp))

        smapped = shard_map(
            spmd, mesh=mesh,
            in_specs=(P(), P(), _cpair(None, None),
                      _cpair(time_ax, None),
                      _cpair(time_ax, None),
                      _cpair(time_ax, None)),
            out_specs=_cpair(None, time_ax, None),
            check_vma=False)

        @jax.jit
        def multi(state, idx, X):
            Xg_, Hg_, Rg_ = X
            idxs, val, drots, new_state = \
                rk._block_rots_and_advance(state, K)
            rep8 = lambda a: jnp.repeat(a, 8, axis=0)
            drots8 = C(rep8(drots.re), rep8(drots.im))
            ys = smapped(idxs, val, drots8, Xg_, Hg_, Rg_)
            return new_state, idx, ys

        self._multi = multi
        self._kernel_state_init = rk.init_state
        return ("replay_kernel", cfg)

    def _try_channelizer_replay(self, L, n):
        """TONES/NOISE replay through the fused channelizer kernel on
        each time shard's local span of the resident recording (round 5:
        the sharded form of DeviceReplay._try_channelizer_replay).  The
        per-shard presum round trip of the scan path (~16 B/sample) is
        collapsed exactly as on the single chip — the kernel reads the
        shard-local transposed recording in place — and the cross-shard
        halo needs NO collectives: the recording is static, so each
        (shard, block)'s stream-preceding frames are precomputed
        host-side and staged once at upload
        (ops/pallas_channelizer.channelizer_frames_at_halo)."""
        try:  # jax >= 0.6 moved shard_map to the top level
            from jax import shard_map
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map
        from ..ops import pfb as pfb_ops
        from ..ops.cplx import DFT
        from ..ops.pallas_channelizer import (_HALO_T,
                                              channelizer_frames_at_halo,
                                              select_tones_t)
        from ..params import WaveType
        from .fused_sharded import _cpair
        rx, mesh = self.rx, self.mesh
        if not plan_sharded_channelizer_replay(rx, n, L, self.loop, mesh):
            return None
        nfft, avg = int(rx.fft_tones), int(rx.pf_average)
        decim = int(rx.decim)
        T = mesh.shape.get("time", 1)
        full_spectrum = rx.wave_type[0] == WaveType.NOISE
        bins = (np.arange(nfft) if full_spectrum
                else np.asarray(pfb_ops.tone_bins(rx.freq, rx.rate,
                                                  nfft)))
        cfg = pfb_ops.PFBConfig(
            nfft=nfft, avg=avg, rate=int(rx.rate),
            bins=None if full_spectrum else tuple(int(b) for b in bins),
            decim=decim)
        window = cfg.window()
        dft = DFT(nfft, two_stage=True)
        n1, n2 = dft.split
        nblk = n // L
        Tf = L // nfft                    # frames per block (global)
        ftl = Tf // T                     # frames per shard per block

        buf = np.asarray(self.data, dtype=np.complex64)
        # shard-major transposed recording: shard t's blocks contiguous
        # at [t*nblk*ftl, (t+1)*nblk*ftl) so P(None, 'time', None) lands
        # each shard exactly its spans (block b at [b*ftl, (b+1)*ftl))
        fr = buf.reshape(nblk, T, ftl, nfft)
        g = fr.transpose(1, 0, 2, 3).reshape(T * nblk * ftl, n1, n2)
        g = np.ascontiguousarray(g.transpose(1, 0, 2))
        # staged per-(shard, block) halo units: the _HALO_T stream
        # frames preceding the shard's span, wrap mod the recording
        allf = buf.reshape(nblk * Tf, nfft)
        tot = nblk * Tf
        h = np.empty((T, nblk, _HALO_T, nfft), np.complex64)
        for t in range(T):
            for b in range(nblk):
                p = b * Tf + t * ftl
                h[t, b] = allf[np.arange(p - _HALO_T, p) % tot]
        hg = h.reshape(T * nblk * _HALO_T, n1, n2)
        hg = np.ascontiguousarray(hg.transpose(1, 0, 2))

        time_ax = "time" if "time" in mesh.axis_names else None
        sh = NamedSharding(mesh, P(None, time_ax, None))

        def put(a):
            ac = cplx.from_np(a)
            return C(jax.device_put(ac.re, sh),
                     jax.device_put(ac.im, sh))

        self._X = (put(g), put(hg))
        self.n_rec_blocks = nblk
        K = self.blocks_per_exec
        has_time = time_ax is not None and T > 1

        def spmd(started, idx, Xt_l, Hs_l):
            tidx = (jax.lax.axis_index("time") if has_time
                    else jnp.int32(0))

            def body(carry, _):
                i, st = carry
                # only the shard owning the stream's first frame has
                # zero history at the stream start
                val = jnp.where(tidx == 0, st, jnp.int32(1))
                fr_t = channelizer_frames_at_halo(
                    cfg, window, dft, Xt_l, Hs_l, i, val, nframes=ftl)
                y = select_tones_t(fr_t, bins, n1, n2)
                if decim > 0:
                    y = pfb_ops.average_frames(y, decim)
                nxt = i + 1
                nxt = jnp.where(nxt >= nblk, nxt - nblk, nxt)
                return (nxt, jnp.int32(1)), y

            (idx2, st2), ys = jax.lax.scan(
                body, (idx, started), None, length=K)
            return st2, idx2, ys

        smapped = shard_map(
            spmd, mesh=mesh,
            in_specs=(P(), P(),
                      _cpair(None, time_ax, None),
                      _cpair(None, time_ax, None)),
            out_specs=(P(), P(), _cpair(None, time_ax, None)),
            check_vma=False)

        @jax.jit
        def multi(state, idx, X):
            Xt, Hs = X
            return smapped(state, idx, Xt, Hs)

        self._multi = multi
        self._kernel_state_init = lambda: jnp.int32(0)  # started flag
        return ("channelizer", cfg)

    def run(self, sinks=(), usrp_number: int = 0,
            front_end: str = "A") -> PipelineResult:
        """Demodulate the acquisition (rx.samples) into the sinks; on a
        multi-host mesh each host's sinks receive the gathered global
        stream."""
        from ..engine.pipeline import run_chunked
        plan = self.demod.plan
        K = self.blocks_per_exec
        n_exec = max(1, -(-plan.n_blocks // K))

        def init():
            st = (self._kernel_state_init()
                  if self._kernel_path is not None
                  else self.demod.init_state())
            return (st, jnp.int32(0))

        def step(carry):
            st, idx = carry
            st, idx, ys = self._multi(st, idx, self._X)
            return (st, idx), ys

        return run_chunked(step, init, n_exec, plan.n_blocks,
                           plan.block_len, self.demod.n_channels,
                           plan.total_out_rows, sinks,
                           usrp_number=usrp_number, front_end=front_end,
                           to_np=_to_np_global)


@dataclasses.dataclass
class ShardedSegmentedReplay:
    """Chunked HBM-refill replay under a mesh: the sharded form of
    engine/replay.SegmentedDeviceReplay.

    Recordings larger than the per-upload budget are cut into
    fixed-shape segments of `seg_blocks` blocks; each segment is staged
    to the mesh with an async sharded `jax.device_put` (time axis
    pre-sharded, so each device receives only its span) while the
    previous segment streams through the SHARDED demodulator, whose
    overlap-save halos ride its own ppermute ring.  State carries across
    segment boundaries exactly as across blocks, so the gathered output
    matches the single-host paths bit-for-block
    (tests/test_sharded_replay.py::test_sharded_segmented_*).
    """

    rx: AntennaParams
    data: np.ndarray                  # complex64 recording (may be mmap)
    mesh: Mesh
    blocks_per_exec: int = 8
    loop: bool = False
    segment_bytes: int | None = None

    def __post_init__(self):
        from ..engine.replay import DEVICE_REPLAY_MAX_BYTES
        mesh = self.mesh
        self.demod = make_demodulator(self.rx, mesh=mesh)
        L = self.demod.plan.block_len
        self.L = L
        n = len(self.data)
        if self.loop:
            assert n % L == 0, \
                "looped segmented replay needs len % block == 0"
        self.nblk_rec = max(1, -(-n // L))
        K = self.blocks_per_exec
        budget = self.segment_bytes or DEVICE_REPLAY_MAX_BYTES // 4
        self.seg_blocks = max(K, (budget // (L * 8)) // K * K)
        time_ax = "time" if "time" in mesh.axis_names else None
        self._sharding = NamedSharding(mesh, P(None, time_ax))
        demod_step = self.demod.step

        def body(X, carry, _):
            state, idx = carry
            x = C(jax.lax.dynamic_slice(X.re, (idx, 0), (1, L))[0],
                  jax.lax.dynamic_slice(X.im, (idx, 0), (1, L))[0])
            state, y = demod_step(state, x)
            return (state, idx + 1), y

        import functools

        @jax.jit
        def multi(state, idx0, X):
            (state, _), ys = jax.lax.scan(
                functools.partial(body, X), (state, idx0), None, length=K)
            return state, ys

        self._multi = multi

    def _segment(self, b0: int) -> np.ndarray:
        # same stream semantics as SegmentedDeviceReplay._segment
        L, S, n = self.L, self.seg_blocks, len(self.data)
        segL = S * L
        if self.loop:
            s0 = (b0 % self.nblk_rec) * L
            if s0 + segL <= n:
                return self.data[s0:s0 + segL]
            parts, need = [self.data[s0:]], segL - (n - s0)
            while need >= n:
                parts.append(self.data)
                need -= n
            if need:
                parts.append(self.data[:need])
            return np.concatenate(parts)
        s0 = b0 * L
        if s0 >= n:
            return np.zeros(segL, dtype=np.complex64)
        chunk = self.data[s0:s0 + segL]
        if len(chunk) == segL:
            return chunk
        buf = np.zeros(segL, dtype=np.complex64)
        buf[:len(chunk)] = chunk
        return buf

    def _stage(self, b0: int) -> C:
        seg = np.asarray(self._segment(b0), dtype=np.complex64)
        seg = seg.reshape(self.seg_blocks, self.L)
        return C(jax.device_put(np.ascontiguousarray(seg.real),
                                self._sharding),
                 jax.device_put(np.ascontiguousarray(seg.imag),
                                self._sharding))

    def run(self, sinks=(), usrp_number: int = 0,
            front_end: str = "A") -> PipelineResult:
        from ..engine.pipeline import run_chunked
        plan = self.demod.plan
        K = self.blocks_per_exec
        n_exec = max(1, -(-plan.n_blocks // K))
        exec_per_seg = self.seg_blocks // K
        n_seg = -(-n_exec // exec_per_seg)
        slot = {"cur": None, "nxt": None, "e": 0}

        def init():
            slot["cur"] = self._stage(0)
            slot["nxt"] = (self._stage(self.seg_blocks)
                           if n_seg > 1 else None)
            slot["e"] = 0
            return self.demod.init_state()

        def step(state):
            e = slot["e"]
            if e > 0 and e % exec_per_seg == 0:
                s = e // exec_per_seg
                slot["cur"] = slot["nxt"]
                slot["nxt"] = (self._stage((s + 1) * self.seg_blocks)
                               if s + 1 < n_seg else None)
            idx0 = jnp.int32((e % exec_per_seg) * K)
            state, ys = self._multi(state, idx0, slot["cur"])
            slot["e"] = e + 1
            return state, ys

        return run_chunked(step, init, n_exec, plan.n_blocks,
                           plan.block_len, self.demod.n_channels,
                           plan.total_out_rows, sinks,
                           usrp_number=usrp_number, front_end=front_end,
                           to_np=_to_np_global)
