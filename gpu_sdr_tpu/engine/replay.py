"""Device-resident replay: demodulate a recorded IQ stream from HBM.

The host-fed replay path (engine/sources.ReplaySource -> run_pipeline)
moves every block over the host link, which caps ingest far below the
chip's DSP rate (production TPU hosts stream ~O(10) GB/s; this rig's
relay ~33 MB/s).  For recordings that fit in device memory, upload ONCE
and scan the demodulator over HBM-resident blocks: per execution, K
blocks are sliced out with `lax.dynamic_slice` (block index wrapping mod
the recording length when looping) and demodulated with the streaming
state carried through the scan — the replay equivalent of the fused
loopback (engine/fused.py), and the "HBM-resident replay" ingest of
docs/05_performance.md.

Replaces the reference's replay-style --sw_loop file feeds with a form
that sustains the chip's full rate (the reference streams from the
radio/NIC at 10 GbE; a TPU replay bench would otherwise measure the
host link, not the DSP).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cplx
from ..ops.cplx import C
from ..params import AntennaParams
from .demodulator import make_demodulator
from .pipeline import PipelineResult

# recordings larger than this stay on the host-fed path (HBM budget)
DEVICE_REPLAY_MAX_BYTES = 2 << 30


def pad_rx_freqs(freqs, rate: int):
    """Lane-pad an RX tone list for the row-major replay kernel
    (config.pad_lanes): 9-127 channels make every output tile a
    lane-MASKED write (~212 GB/s useful vs 429 dense; padding measured
    +36% on the 100-channel DIRECT replay, tools/perf_replay_pad.py).
    Pads to the next 128 multiple with dummy tones (distinct, unused
    frequencies); the dead channels are sliced off host-side by
    run_chunked.  C <= 8 takes the channel-major ReplayDDCT (already
    dense) and is left alone."""
    from ..config import pad_lanes
    C = len(freqs)
    if not pad_lanes() or C <= 8 or C % 128 == 0:
        return tuple(int(f) for f in freqs)
    pad = (-C) % 128
    used = {int(f) % rate for f in freqs}
    dummies = []
    f = 1
    while len(dummies) < pad:
        if f % rate not in used:
            dummies.append(f)
            used.add(f % rate)
        f += 1
    return tuple(int(f) for f in freqs) + tuple(dummies)


def plan_channelizer_replay(rx, n: int, L: int, loop: bool) -> bool:
    """Pure shape-math gate of DeviceReplay._try_channelizer_replay
    (round 5): TONES/NOISE replay through the FUSED channelizer kernel
    reading the transposed resident recording in place — no presum
    round trip.  Shared with engine/dispatch.classify_device_replay."""
    from ..config import kernel_dot_precision, use_pallas_pfb
    from ..ops import pfb as pfb_ops
    from ..ops.cplx import DFT
    from ..ops.pallas_channelizer import can_channelizer_at
    from ..params import WaveType
    w = rx.wave_type[0] if rx.wave_type else None
    if not (loop and n % L == 0 and
            w in (WaveType.TONES, WaveType.NOISE) and
            int(rx.fft_tones) > 0 and use_pallas_pfb() and
            kernel_dot_precision() == "tf32"):
        return False
    nfft = int(rx.fft_tones)
    decim = int(rx.decim)
    if decim > 0 and (L // nfft) % decim != 0:
        return False
    full_spectrum = w == WaveType.NOISE
    try:
        bins = None if full_spectrum else tuple(
            int(b) for b in pfb_ops.tone_bins(rx.freq, rx.rate, nfft))
    except Exception:
        return False
    cfg = pfb_ops.PFBConfig(nfft=nfft, avg=int(rx.pf_average),
                            rate=int(rx.rate), bins=bins, decim=decim)
    dft = DFT(nfft, two_stage=True)
    if dft.split is None:
        return False
    return can_channelizer_at(cfg, dft, L, n)


def plan_pfb_replay(rx, n: int, L: int, loop: bool) -> bool:
    """Pure shape-math gate of DeviceReplay._try_pfb_replay, shared with
    engine/dispatch.classify_device_replay so the plan cannot drift from
    the builder (ADVICE r4)."""
    from ..config import use_pallas_pfb
    from ..ops.pallas_pfb import _HALO_PAD, _pick_bt
    from ..params import WaveType
    w = rx.wave_type[0] if rx.wave_type else None
    if not (loop and n % L == 0 and w in (WaveType.TONES, WaveType.NOISE)
            and int(rx.fft_tones) > 0 and use_pallas_pfb()):
        return False
    nfft, avg = int(rx.fft_tones), int(rx.pf_average)
    decim = int(rx.decim)
    frames_pb = L // nfft
    bt = _pick_bt(frames_pb, nfft)
    return bool(L % nfft == 0 and n % nfft == 0 and bt and
                bt % _HALO_PAD == 0 and 0 < avg - 1 <= _HALO_PAD and
                frames_pb % bt == 0 and (n // nfft) % _HALO_PAD == 0 and
                (decim == 0 or frames_pb % decim == 0))


def plan_chirp_replay(rx, n: int, L: int, loop: bool):
    """'chirp_table' / 'chirp_at' / None — the pure shape-math gate of
    DeviceReplay._try_chirp_replay, shared with classify_device_replay."""
    from ..config import use_pallas_pfb
    from ..ops import chirp as chirp_ops
    from ..params import WaveType, chirp_steps_and_length
    w = rx.wave_type[0] if rx.wave_type else None
    if not (loop and n % L == 0 and w == WaveType.CHIRP and
            int(rx.decim) >= 1 and use_pallas_pfb()):
        return None
    steps, length = chirp_steps_and_length(rx)
    cfg = chirp_ops.ChirpConfig.from_params(
        rx.freq[0], rx.chirp_f[0], int(rx.rate), steps, rx.chirp_t[0])
    ppt = length * int(rx.decim)
    if L % ppt != 0 or (L // ppt) % 8 != 0:
        return None
    if cfg.period % L == 0 and cfg.period * 8 <= DEVICE_REPLAY_MAX_BYTES:
        return "chirp_table"
    return "chirp_at"


@dataclasses.dataclass
class DeviceReplay:
    """Compiled K-blocks-per-execution demodulation of an HBM-resident
    recording."""

    rx: AntennaParams
    data: np.ndarray                  # complex64 recording (host side)
    blocks_per_exec: int = 8
    loop: bool = True

    def __post_init__(self):
        self.demod = make_demodulator(self.rx)
        L = self.demod.plan.block_len
        n = len(self.data)
        self._kernel_path = self._try_replay_kernel(L, n)
        if self._kernel_path is None:
            self._kernel_path = self._try_channelizer_replay(L, n)
        if self._kernel_path is None:
            self._kernel_path = self._try_pfb_replay(L, n)
        if self._kernel_path is None:
            self._kernel_path = self._try_chirp_replay(L, n)
        # which replay form this recording actually rides — compared
        # against engine/dispatch.plan_dispatch by test_dispatch_table
        if self._kernel_path is None:
            self.path = "scan"
        elif isinstance(self._kernel_path, tuple):
            self.path = {"pfb": "pfb_at", "chirp": "chirp_at",
                         "chirp_table": "chirp_table",
                         "channelizer": "channelizer_at"}[
                             self._kernel_path[0]]
        else:
            from ..ops.pallas_replay import ReplayDDCT
            self.path = ("replay_kernel_t"
                         if isinstance(self._kernel_path, ReplayDDCT)
                         else "replay_kernel")
        if self._kernel_path is not None:
            return
        nblk = max(1, -(-n // L))            # data blocks (tail padded)
        if self.loop:
            # exact host-path loop semantics need block-commensurate data
            assert n % L == 0, "looped device replay needs len % block == 0"
        # one trailing all-zero block: post-recording reads (non-loop)
        buf = np.zeros((nblk + 1) * L, dtype=np.complex64)
        buf[:n] = np.asarray(self.data[:nblk * L], dtype=np.complex64)[:n]
        self._X = cplx.from_np(buf)          # one upload, stays in HBM
        self._Xarg = self._X                 # rides the jit as an ARGUMENT
        self.n_rec_blocks = nblk
        K = self.blocks_per_exec
        demod_step = self.demod.step
        loop = self.loop

        # the recording is an argument, not a closure constant: closure-
        # captured device arrays get inlined into the remote-compile
        # request, which this rig's relay rejects/crashes on for large
        # recordings (HTTP 413 / broken pipe)
        def body(X, carry, _):
            state, idx = carry
            x = C(jax.lax.dynamic_slice(X.re, (idx * L,), (L,)),
                  jax.lax.dynamic_slice(X.im, (idx * L,), (L,)))
            state, y = demod_step(state, x)
            nxt = idx + 1
            if loop:
                nxt = jnp.where(nxt >= nblk, nxt - nblk, nxt)
            else:
                nxt = jnp.minimum(nxt, nblk)   # stick at the zero block
            return (state, nxt), y

        import functools

        @jax.jit
        def multi(state, idx, X):
            (state, idx), ys = jax.lax.scan(
                functools.partial(body, X), (state, idx), None, length=K)
            return state, idx, ys

        self._multi = multi

    def _try_replay_kernel(self, L, n):
        """Looped DIRECT-mode replay of a block-commensurate recording
        can run as ONE kernel per execution (ops/pallas_replay.py): tiles
        stream straight out of the recording via scalar-prefetched block
        indices — no dynamic_slice copies, no scan stacking."""
        from ..config import kernel_dot_precision, use_pallas_pfb
        from ..params import WaveType
        rx = self.rx
        if not (self.loop and n % L == 0 and rx.wave_type and
                rx.wave_type[0] == WaveType.DIRECT and
                int(rx.decim) > 0 and int(rx.pf_average) >= 2 and
                use_pallas_pfb() and
                kernel_dot_precision() == "tf32"):
            return None
        from ..ops.ddc import DirectDDCConfig
        from ..ops.pallas_replay import make_replay_ddc
        freqs = pad_rx_freqs(rx.freq, int(rx.rate))
        cfg = DirectDDCConfig(
            rate=int(rx.rate), decim=int(rx.decim),
            pf_average=int(rx.pf_average), freqs=freqs,
            phases=(0,) * len(freqs))
        rk = make_replay_ddc(cfg, np.asarray(self.data, np.complex64), L,
                             blocks_per_exec=self.blocks_per_exec)
        if not rk.ok:
            return None
        self.n_rec_blocks = rk.nblk
        K = self.blocks_per_exec
        nbr, Cp = rk.nbr, cfg.n_channels

        @jax.jit
        def multi(state, idx, X):
            # idx is unused (the kernel state carries it); kept for the
            # scan-path-compatible (state, idx, ys) calling convention
            state, y = rk.multi_step(state, X=X)
            return state, idx, y.reshape(K, nbr, Cp)

        self._multi = multi
        self._Xarg = rk._X
        self._kernel_state_init = rk.init_state
        return rk

    def _try_channelizer_replay(self, L, n):
        """TONES/NOISE replay through the FUSED channelizer kernel
        reading the TRANSPOSED resident recording in place (round 5):
        where pfb_at pays recording read + presum write + presum read +
        spectra write (the XLA DFT's round trip), this pays recording
        read + spectra write — the loopback chain's kernel with the
        wavetable broadcast replaced by scalar-prefetch block indexing
        (ops/pallas_channelizer.channelizer_frames_at).  The recording
        is transposed to the kernel layout once at upload."""
        from ..ops import pfb as pfb_ops
        from ..ops.cplx import DFT
        from ..ops.pallas_channelizer import (channelizer_frames_at,
                                              select_tones_t,
                                              transpose_block)
        from ..params import WaveType
        rx = self.rx
        if not plan_channelizer_replay(rx, n, L, self.loop):
            return None
        nfft, avg = int(rx.fft_tones), int(rx.pf_average)
        decim = int(rx.decim)
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
        T = L // nfft

        buf = np.asarray(self.data, dtype=np.complex64)
        Xt = transpose_block(cplx.from_np(buf), nfft, n1, n2)
        self.n_rec_blocks = nblk = n // L
        K = self.blocks_per_exec

        @jax.jit
        def multi(started, idx, Xt):
            def body(carry, _):
                i, st = carry
                fr = channelizer_frames_at(cfg, window, dft, Xt, i, st,
                                           nframes=T)
                y = select_tones_t(fr, bins, n1, n2)
                if decim > 0:
                    y = pfb_ops.average_frames(y, decim)
                nxt = i + 1
                nxt = jnp.where(nxt >= nblk, nxt - nblk, nxt)
                return (nxt, jnp.int32(1)), y
            (idx2, started2), ys = jax.lax.scan(
                body, (idx, started), None, length=K)
            return started2, idx2, ys

        self._multi = multi
        self._Xarg = Xt
        self._kernel_state_init = lambda: jnp.int32(0)   # started flag
        return ("channelizer", cfg)

    def _try_pfb_replay(self, L, n):
        """TONES/NOISE (channelizer) replay without dynamic_slice copies:
        the per-block pre-sum reads the recording in place via a
        scalar-prefetched block index (ops/pallas_pfb.pallas_presum_at);
        the spare carry disappears (a block's leading halo rows ARE the
        recording rows preceding it, wrapping at the loop seam)."""
        from ..ops import pfb as pfb_ops
        from ..ops.pallas_pfb import pallas_presum_at
        from ..params import WaveType
        rx = self.rx
        w = rx.wave_type[0] if rx.wave_type else None
        full_spectrum = w == WaveType.NOISE
        if not plan_pfb_replay(rx, n, L, self.loop):
            return None
        nfft, avg = int(rx.fft_tones), int(rx.pf_average)
        decim = int(rx.decim)
        frames_pb = L // nfft
        total_frames = n // nfft
        # DFT / select configuration mirrors demodulator._build_pfb
        bins = None if full_spectrum else tuple(
            int(b) for b in pfb_ops.tone_bins(rx.freq, rx.rate, nfft))
        cfg = pfb_ops.PFBConfig(nfft=nfft, avg=avg, rate=int(rx.rate),
                                bins=bins, decim=decim)
        window2d = jnp.asarray(cfg.window()).reshape(avg, nfft)
        dft_obj = cfg.dft(two_stage=True if nfft >= 512 else None)
        if not full_spectrum and dft_obj.split is not None:
            dft = dft_obj.scrambled
            bins_arr = jnp.asarray(dft_obj.scramble_index(bins))
        else:
            dft = dft_obj
            bins_arr = cfg.bins_array()

        buf = np.asarray(self.data, dtype=np.complex64)
        xc = cplx.from_np(buf)
        Xf = C(xc.re.reshape(total_frames, nfft),
               xc.im.reshape(total_frames, nfft))
        self.n_rec_blocks = nblk = n // L
        K = self.blocks_per_exec

        @jax.jit
        def multi(started, idx, Xf):
            def body(carry, _):
                i, st = carry
                pre = pallas_presum_at(window2d, Xf, i, st, frames_pb)
                frames = dft(pre)
                if decim > 0:
                    frames = pfb_ops.average_frames(frames, decim)
                if bins_arr is not None:
                    frames = pfb_ops.select_tones(frames, bins_arr)
                nxt = i + 1
                nxt = jnp.where(nxt >= nblk, nxt - nblk, nxt)
                return (nxt, jnp.int32(1)), frames
            (idx2, started2), ys = jax.lax.scan(
                body, (idx, started), None, length=K)
            return started2, idx2, ys

        self._multi = multi
        self._Xarg = Xf
        self._kernel_state_init = lambda: jnp.int32(0)   # started flag
        return ("pfb", cfg)

    def _try_chirp_replay(self, L, n):
        """CHIRP (VNA lock-in) replay without dynamic_slice copies or a
        materialized demodulated stream: segments are read in place from
        the recording (ops/pallas_lockin.pallas_chirp_lockin_at); the
        carried state is the stream's uint32 chirp phase position (the
        lock-in segments are disjoint — no halo at all)."""
        from ..ops import chirp as chirp_ops
        from ..ops import lockin as lockin_ops
        from ..ops.pallas_lockin import pallas_chirp_lockin_at
        from ..params import chirp_steps_and_length
        rx = self.rx
        kind = plan_chirp_replay(rx, n, L, self.loop)
        if kind is None:
            return None
        steps, length = chirp_steps_and_length(rx)
        cfg = chirp_ops.ChirpConfig.from_params(
            rx.freq[0], rx.chirp_f[0], int(rx.rate), steps, rx.chirp_t[0])
        ppt = length * int(rx.decim)
        nseg_pb = L // ppt
        profile = jnp.asarray(lockin_ops.lockin_profile(ppt))
        buf = np.asarray(self.data, dtype=np.complex64)
        xc = cplx.from_np(buf)
        Xf = C(xc.re.reshape(n // ppt, ppt), xc.im.reshape(n // ppt, ppt))
        self.n_rec_blocks = nblk = n // L
        K = self.blocks_per_exec

        if kind == "chirp_table":
            return self._chirp_table_replay(cfg, profile, Xf, nblk,
                                            nseg_pb, L, K)

        @jax.jit
        def multi(last, idx, Xf):
            def body(carry, _):
                lst, i = carry
                lst, y = pallas_chirp_lockin_at(cfg, profile, lst, Xf, i,
                                                nseg_pb)
                nxt = i + 1
                nxt = jnp.where(nxt >= nblk, nxt - nblk, nxt)
                return (lst, nxt), C(y.re[:, None], y.im[:, None])
            (last2, idx2), ys = jax.lax.scan(body, (last, idx), None,
                                             length=K)
            return last2, idx2, ys

        self._multi = multi
        self._Xarg = Xf
        self._kernel_state_init = lambda: jnp.uint32(0)
        return ("chirp", cfg)

    def _chirp_table_replay(self, cfg, profile, Xf, nblk, nseg_pb, L, K):
        """Table-oscillator chirp replay: the demod oscillator is READ
        from a resident one-period wavetable (generated once at build)
        instead of recomputed per sample — the in-kernel sincos is the
        measured bottleneck of the replay lock-in (see ROADMAP; loopback
        form measured 18.6 vs 40.6 Gsps, tools/perf_chirp_table.py).

        The oscillator block index wraps mod period//L while the
        recording index wraps mod the recording length; the kernel
        streams both through separate scalar-prefetched indices
        (pallas_chirp_lockin_table sig_idx).  Carried state: (uint32
        stream phase for checkpoint parity, int32 oscillator block,
        oscillator table riding the jit boundary as an argument)."""
        from ..ops import chirp as chirp_ops
        from ..ops.pallas_lockin import pallas_chirp_lockin_table
        ppt = profile.shape[0]
        period = cfg.period
        nblk_osc = period // L

        @jax.jit
        def gen_period():
            def body(last, _):
                last, x = chirp_ops.chirp_block(cfg, last, L)
                return last, x
            _, xs = jax.lax.scan(body, jnp.uint32(0), None,
                                 length=nblk_osc)
            return xs

        xs = gen_period()
        Ct = C(xs.re.reshape(period // ppt, ppt),
               xs.im.reshape(period // ppt, ppt))

        @jax.jit
        def multi(state, idx, Xf):
            last, o, Ct = state
            def body(carry, _):
                lst, oo, i = carry
                y = pallas_chirp_lockin_table(profile, Ct, Xf, oo,
                                              nseg_pb, sig_idx=i)
                lst = (lst + jnp.uint32(L % period)) % jnp.uint32(period)
                oo = jnp.where(oo + 1 >= nblk_osc, 0, oo + 1)
                nxt = i + 1
                nxt = jnp.where(nxt >= nblk, nxt - nblk, nxt)
                return (lst, oo, nxt), C(y.re[:, None], y.im[:, None])
            (last2, o2, idx2), ys = jax.lax.scan(
                body, (last, o, idx), None, length=K)
            return (last2, o2, Ct), idx2, ys

        self._multi = multi
        self._Xarg = Xf
        self._kernel_state_init = lambda: (jnp.uint32(0), jnp.int32(0),
                                           Ct)
        return ("chirp_table", cfg)

    def run(self, sinks=(), usrp_number: int = 0,
            front_end: str = "A") -> PipelineResult:
        """Demodulate the acquisition (rx.samples), feeding sinks
        packet-by-packet; exactly plan.n_blocks packets are emitted."""
        from .pipeline import run_chunked
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
            st, idx, ys = self._multi(st, idx, self._Xarg)
            return (st, idx), ys

        return run_chunked(step, init, n_exec, plan.n_blocks,
                           plan.block_len, self.demod.n_channels,
                           plan.total_out_rows, sinks,
                           usrp_number=usrp_number, front_end=front_end)


def can_device_replay(source) -> bool:
    """True when the source is a recording that fits the HBM budget."""
    from .sources import ArraySource, ReplaySource
    if not isinstance(source, (ReplaySource, ArraySource)):
        return False
    try:
        nbytes = source.data.size * 8        # complex64
    except AttributeError:
        return False
    return 0 < nbytes <= DEVICE_REPLAY_MAX_BYTES


def can_segmented_replay(source) -> bool:
    """True when the source is a recording too large for the one-upload
    path: it rides SegmentedDeviceReplay (HBM-refill) instead of falling
    all the way back to the per-block host-fed pipeline."""
    from .sources import ArraySource, ReplaySource
    if not isinstance(source, (ReplaySource, ArraySource)):
        return False
    try:
        nbytes = source.data.size * 8        # complex64
    except AttributeError:
        return False
    return nbytes > DEVICE_REPLAY_MAX_BYTES


@dataclasses.dataclass
class SegmentedDeviceReplay:
    """Chunked HBM-refill replay for recordings larger than device
    memory (VERDICT r3 #6).

    The reference streams unbounded-duration input by construction (the
    RX thread refills 1 Msample buffers forever,
    cpp/USRP_hardware_manager.cpp:1398-1611); this framework's
    equivalent is an hours-long recording, which cannot ride the
    one-upload DeviceReplay once it exceeds the HBM budget.  Instead of
    dropping to the per-block host-fed pipeline (every block over the
    host link, one dispatch each), the recording is cut into
    fixed-shape segments of `seg_blocks` demod blocks; segment s+1 is
    staged to the device with an async `jax.device_put` the moment
    segment s starts executing (host->device transfer overlaps the
    K-blocks-per-execution demod scan — the HostFeed double-buffering
    idea applied to the replay path), and the demodulator's streaming
    state carries across segment boundaries exactly as it does across
    blocks, so the output bit-matches the host-fed path
    (tests/test_segmented_replay.py).

    Dispatch rule (measure.run_measurement / engine/dispatch.py):
    recordings with nbytes <= DEVICE_REPLAY_MAX_BYTES take DeviceReplay;
    larger ones take this class; only non-recording sources fall back to
    the host-fed pipeline.
    """

    rx: AntennaParams
    data: np.ndarray                  # complex64 recording (may be mmap)
    blocks_per_exec: int = 8
    loop: bool = False
    segment_bytes: int | None = None  # per-segment HBM budget override

    def __post_init__(self):
        self.demod = make_demodulator(self.rx)
        L = self.demod.plan.block_len
        self.L = L
        n = len(self.data)
        if self.loop:
            # exact host-path loop semantics need block-commensurate data
            assert n % L == 0, \
                "looped segmented replay needs len % block == 0"
        self.nblk_rec = max(1, -(-n // L))
        K = self.blocks_per_exec
        # two segments are in flight (current + prefetched); keep their
        # combined footprint well inside the device-replay budget
        budget = self.segment_bytes or DEVICE_REPLAY_MAX_BYTES // 4
        self.seg_blocks = max(K, (budget // (L * 8)) // K * K)
        demod_step = self.demod.step

        def body(X, carry, _):
            state, idx = carry
            x = C(jax.lax.dynamic_slice(X.re, (idx * L,), (L,)),
                  jax.lax.dynamic_slice(X.im, (idx * L,), (L,)))
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
        """Stream blocks [b0, b0 + seg_blocks) as one contiguous
        complex64 array (wrapping when looped, zero-padded past the
        recording when not)."""
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
        """Async host->device upload of one segment (device_put returns
        immediately; the transfer overlaps the current segment's
        executions)."""
        seg = np.asarray(self._segment(b0), dtype=np.complex64)
        return C(jax.device_put(np.ascontiguousarray(seg.real)),
                 jax.device_put(np.ascontiguousarray(seg.imag)))

    def run(self, sinks=(), usrp_number: int = 0,
            front_end: str = "A") -> PipelineResult:
        from .pipeline import run_chunked
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
                s = e // exec_per_seg          # entering segment s
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
                           usrp_number=usrp_number, front_end=front_end)
