"""Fused on-device loopback measurements.

When a measurement's source is the synthetic loopback (TX generator feeding
RX directly — the reference's --sw_loop), the whole chain can live on the
device: `lax.scan` chains K TX->demod blocks per execution with all
streaming state carried through the scan, so nothing touches the host until
the demodulated results come back.  This is the production form of
bench.py's headline configuration.

Supported mode pairs: TONES->DIRECT, TONES->TONES (PFB), TONES->NOISE,
CHIRP->CHIRP (VNA).  Other combinations fall back to the host-driven path
(measure.run_measurement).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax

from ..params import AntennaParams, WaveType
from .demodulator import make_demodulator
from .generator import make_generator
from .pipeline import PipelineResult


def _pad_tone_lists(freqs, ampls, rx_freqs, rate, multiple=128):
    """Extend (tx_freqs, tx_ampls, rx_freqs) with the SAME zero-amplitude
    dummy tones up to the next `multiple` of the RX channel count, so
    the fold kernel's output tiles are lane-dense (config.pad_lanes).
    Padding both sides identically preserves the kernel's self-ramp
    identity (rx list == tx list mod rate).  Returns the padded tuples
    and the pad count (0 = already dense).

    `multiple` is 128 (the lane width) on a single chip; a
    channel-sharded mesh passes 128 * Kc so every SHARD's output tile
    is lane-dense (parallel/fused_sharded.ShardedFusedDirect)."""
    Cp = len(rx_freqs)
    pad = (-Cp) % multiple
    if pad == 0:
        return freqs, ampls, rx_freqs, 0
    used = {int(f) % rate for f in freqs} | \
           {int(f) % rate for f in rx_freqs}
    dummies = []
    f = 1
    while len(dummies) < pad:
        if f % rate not in used:
            dummies.append(f)
            used.add(f % rate)
        f += 1
    return (tuple(freqs) + tuple(dummies), tuple(ampls) + (0.0,) * pad,
            tuple(rx_freqs) + tuple(dummies), pad)


@dataclasses.dataclass
class FusedLoopback:
    """Compiled K-blocks-per-execution loopback chain."""

    tx: AntennaParams
    rx: AntennaParams
    blocks_per_exec: int = 8

    def __post_init__(self):
        self.demod = make_demodulator(self.rx)
        K = self.blocks_per_exec
        chain = self._try_tones_direct_chain()
        if chain is None:
            chain = self._try_chirp_chain()
        if chain is None:
            chain = self._try_channelizer_chain()
        # the chain replaces TX generation entirely — don't materialize an
        # unused generator (a periodic comb's wavetable constant is ~MBs)
        self._chain = chain
        # which chain this loopback actually runs — compared against
        # engine/dispatch.plan_dispatch by tests/test_dispatch_table.py
        self.path = (chain.path_name if chain is not None
                     else "generic_scan")
        self.gen = None if chain is not None else make_generator(
            self.tx, block_len=self.demod.plan.block_len)
        if chain is not None:
            # single-kernel chain: either in-kernel comb synthesis
            # (ops/pallas_chain.py) or the chirp wavetable + in-place
            # lock-in (the chirp is exactly periodic in the integer
            # accumulator, so one period generated at build time serves
            # the whole stream — the reference's TONES wavetable trick
            # applied to CHIRP)
            self._init_states = lambda: (chain.init_state(), ())
            rows = self.demod.plan.out_rows
            # lane-padded chains emit extra dead channels, sliced off
            # host-side in run_chunked after the fetch
            Cp = getattr(chain, "out_channels", None) or \
                self.demod.n_channels

            def _multi_impl(gstate, dstate):
                gstate, y = chain.multi_step(gstate, K)
                return gstate, dstate, y.reshape(K, rows, Cp)

            # donate the chain state on real hardware: the wavetable /
            # recording it carries then ALIASES through instead of being
            # copied on return (~16% at config 2's 800 MB chirp period).
            # Chains whose init_state hands out a resident master array
            # return a device COPY so a second acquisition still works
            # after the first call consumed the donated buffer.  A chain
            # can OPT OUT via donate_state=False — donating the XLA fold
            # chain's P/ramp state measured a 228 s compile and a 3.2x
            # slowdown (tools/perf_api_fold_probe.py).
            donate = (jax.default_backend() in ("tpu", "axon") and
                      getattr(chain, "donate_state", True))
            multi = jax.jit(_multi_impl,
                            donate_argnums=(0,) if donate else ())
        else:
            gen_step = self.gen.step
            demod_step = self.demod.step
            self._init_states = lambda: (self.gen.init_state(),
                                         self.demod.init_state())

            def body(carry, _):
                gstate, dstate = carry
                gstate, x = gen_step(gstate)
                dstate, y = demod_step(dstate, x)
                return (gstate, dstate), y

            @jax.jit
            def multi(gstate, dstate):
                (gstate, dstate), ys = jax.lax.scan(
                    body, (gstate, dstate), None, length=K)
                return gstate, dstate, ys

        self._multi = multi

    def _try_tones_direct_chain(self):
        """Build the closed-form TONES->DIRECT chain when it applies:
        no burst gating, decimating DIRECT RX.  Periodic combs go
        through the replay kernel first (_try_replay_loopback — config 1:
        21.6 Gsps via the transposed few-channel kernel); everything
        else takes the shift-fold chain (ops/fold_chain.py): synthesis,
        mix-down and FIR contracted into ONE (nb, C_t) x (C_t, C')
        matmul per block with exact single-stage DIRECT arithmetic —
        pf_average-fold fewer MXU passes than round 2's G-fused Pallas
        kernel (config 3 history: 7.9 G-fused v1 -> 9.6 G-fused v2 ->
        the fold chain; docs/05_performance.md)."""
        tx, rx = self.tx, self.rx
        if not (tx.wave_type and tx.wave_type[0] == WaveType.TONES
                and rx.wave_type and rx.wave_type[0] == WaveType.DIRECT):
            return None
        if tx.burst_on > 0 or int(rx.decim) <= 0 or int(rx.pf_average) < 2:
            return None
        freqs = tuple(int(f) for f in tx.freq)
        if not freqs or not rx.freq:
            return None
        L = self.demod.plan.block_len
        from ..config import use_pallas_pfb
        from ..ops.tonegen import comb_period
        period = comb_period(freqs, tx.rate)
        ampls = tuple(float(a) for a in (tx.ampl or [1.0] * len(freqs)))
        if (use_pallas_pfb() and L % period == 0 and period <= (1 << 22)):
            # periodic comb: the loopback IS a looped one-block recording,
            # so the scalar-prefetch replay kernel (ops/pallas_replay.py)
            # serves it — grid-axis K, stacked output written in place,
            # FIR history = the recording rows preceding each tile with
            # the loop-seam wrap matching the comb's periodicity exactly.
            chain = self._try_replay_loopback(freqs, ampls, L)
            if chain is not None:
                return chain
            if min(len(freqs), len(rx.freq)) < 8:
                return None     # small comb, untileable: wavetable path
        from ..config import kernel_dot_precision, pad_lanes
        from ..ops.ddc import DirectDDCConfig
        from ..ops.fold_chain import TonesDirectFoldChain
        from ..ops.pallas_chain import TonesDirectFoldKernel
        rx_freqs = tuple(int(f) for f in rx.freq)
        dcfg = DirectDDCConfig(
            rate=int(rx.rate), decim=int(rx.decim),
            pf_average=int(rx.pf_average), freqs=rx_freqs,
            phases=(0,) * len(rx_freqs))
        if use_pallas_pfb() and kernel_dot_precision() == "tf32":
            # shift-fold algebra in ONE HBM pass: 11.4 Gsps vs 9.2 for
            # the XLA fold scan at the config-3 shape
            # (tools/perf_fold_kernel.py, 2026-08-20).  A sub-128 channel
            # count makes every output tile a lane-MASKED write (212 vs
            # 429 GB/s dense, tools/perf_c3_ladder.py): pad both tone
            # lists with zero-amplitude dummies to the next 128 multiple
            # and slice the dead lanes off host-side after fetch
            # (run_chunked) — the masked write already streamed the
            # padded physical tile, so the padding costs no extra HBM.
            kfreqs, kampls, krx, n_pad = _pad_tone_lists(
                freqs, ampls, rx_freqs, int(tx.rate)) if pad_lanes() \
                else (freqs, ampls, rx_freqs, 0)
            kcfg = dcfg if not n_pad else DirectDDCConfig(
                rate=int(rx.rate), decim=int(rx.decim),
                pf_average=int(rx.pf_average), freqs=krx,
                phases=(0,) * len(krx))
            chain = TonesDirectFoldKernel(rate=int(tx.rate),
                                          tx_freqs=kfreqs, tx_ampls=kampls,
                                          cfg=kcfg, block_len=L)
            if chain.ok:
                chain.out_channels = kcfg.n_channels
                return chain
            if n_pad:          # padded form untileable: retry unpadded
                chain = TonesDirectFoldKernel(
                    rate=int(tx.rate), tx_freqs=freqs, tx_ampls=ampls,
                    cfg=dcfg, block_len=L)
                if chain.ok:
                    return chain
        chain = TonesDirectFoldChain(rate=int(tx.rate), tx_freqs=freqs,
                                     tx_ampls=ampls, cfg=dcfg,
                                     block_len=L)
        return chain if chain.ok else None

    def _try_replay_loopback(self, freqs, ampls, L):
        """Periodic-comb TONES->DIRECT loopback as a looped one-block
        recording through the ReplayDDC kernel."""
        from ..ops.ddc import DirectDDCConfig
        from ..ops.pallas_replay import make_replay_ddc
        from ..ops.tonegen import tone_comb_wavetable_block
        from ..ops import cplx
        from .replay import pad_rx_freqs
        rx = self.rx
        # lane-pad 9-127 RX channels so the row-major replay kernel's
        # output tiles write dense (+36% measured,
        # tools/perf_replay_pad.py); dead channels sliced host-side
        rx_freqs = pad_rx_freqs(rx.freq, int(rx.rate))
        cfg = DirectDDCConfig(
            rate=int(rx.rate), decim=int(rx.decim),
            pf_average=int(rx.pf_average), freqs=rx_freqs,
            phases=(0,) * len(rx_freqs))
        rec = cplx.to_np(tone_comb_wavetable_block(freqs, ampls,
                                                   int(self.tx.rate), L))
        rk = make_replay_ddc(cfg, rec, L,
                             blocks_per_exec=self.blocks_per_exec)
        if not rk.ok:
            return None
        chain = _ReplayLoopbackChain(rk)
        chain.out_channels = cfg.n_channels
        return chain

    def _try_chirp_chain(self):
        """CHIRP->CHIRP loopback via a one-period chirp wavetable + the
        in-place lock-in kernel.  The integer-phase chirp repeats exactly
        every num_steps*length samples, so one period generated at build
        time (in HBM) serves the whole stream, and each block costs only
        the demod+lock-in read — 15.6 Gsps honest at the config-2 shape
        with donated state (steady-state rounds, 2026-08-19)."""
        tx, rx = self.tx, self.rx
        if not (tx.wave_type and tx.wave_type[0] == WaveType.CHIRP
                and rx.wave_type and rx.wave_type[0] == WaveType.CHIRP):
            return None
        if tx.burst_on > 0 or int(rx.decim) < 1:
            return None
        from ..config import use_pallas_pfb
        if not use_pallas_pfb():
            return None
        # the wavetable is the TX signal; demod params must match it
        for attr in ("freq", "chirp_f", "chirp_t", "swipe_s"):
            a, b = getattr(tx, attr), getattr(rx, attr)
            if not a or not b or a[0] != b[0]:
                return None
        from ..ops import chirp as chirp_ops
        from ..params import chirp_steps_and_length
        steps, length = chirp_steps_and_length(rx)
        cfg = chirp_ops.ChirpConfig.from_params(
            rx.freq[0], rx.chirp_f[0], int(rx.rate), steps, rx.chirp_t[0])
        L = self.demod.plan.block_len
        ppt = length * int(rx.decim)
        period = cfg.period
        from .replay import DEVICE_REPLAY_MAX_BYTES
        if (L % ppt != 0 or (L // ppt) % 8 != 0 or period % L != 0 or
                period * 8 > DEVICE_REPLAY_MAX_BYTES):
            return None
        scale = float(tx.ampl[0]) if tx.ampl else 1.0
        return _ChirpWavetableChain(cfg, L, ppt, scale)

    def _try_channelizer_chain(self):
        """TONES->TONES / TONES->NOISE via the fused channelizer kernel
        (ops/pallas_channelizer.py): PFB pre-sum + two-stage DFT in one
        HBM pass, with a bin-quantized comb synthesized as ONE wavetable
        frame broadcast inside the kernel.  This is the headline bench
        chain (bench.py) running as the production loopback path."""
        tx, rx = self.tx, self.rx
        if not (tx.wave_type and tx.wave_type[0] == WaveType.TONES
                and rx.wave_type
                and rx.wave_type[0] in (WaveType.TONES, WaveType.NOISE)):
            return None
        if tx.burst_on > 0 or int(rx.fft_tones) <= 0:
            return None
        from ..config import kernel_dot_precision, use_pallas_pfb
        if not use_pallas_pfb() or kernel_dot_precision() != "tf32":
            return None
        from ..ops import pfb as pfb_ops
        from ..ops.cplx import DFT
        from ..ops.pallas_channelizer import can_fuse_channelizer
        from ..ops.tonegen import comb_period
        nfft, avg = int(rx.fft_tones), int(rx.pf_average)
        full_spectrum = rx.wave_type[0] == WaveType.NOISE
        L = self.demod.plan.block_len
        freqs = tuple(int(f) for f in tx.freq)
        if not freqs:
            return None
        period = comb_period(freqs, int(tx.rate))
        if nfft % period != 0:
            return None        # comb not one-frame-periodic: generic path
        bins = None if full_spectrum else tuple(
            int(b) for b in pfb_ops.tone_bins(rx.freq, rx.rate, nfft))
        cfg = pfb_ops.PFBConfig(nfft=nfft, avg=avg, rate=int(rx.rate),
                                bins=bins, decim=int(rx.decim))
        dft = DFT(nfft, two_stage=True)
        if not can_fuse_channelizer(cfg, dft, L):
            return None
        decim = int(rx.decim)
        if decim > 0 and (L // nfft) % decim != 0:
            return None
        ampls = tuple(float(a) for a in (tx.ampl or [1.0] * len(freqs)))
        return _ChannelizerWavetableChain(cfg, dft, freqs, ampls, L,
                                          full_spectrum, decim)

    def run(self, sinks=(), usrp_number: int = 0,
            front_end: str = "A") -> PipelineResult:
        """Stream the full acquisition through the fused chain."""
        from .pipeline import run_chunked
        plan = self.demod.plan
        K = self.blocks_per_exec
        n_exec = max(1, -(-plan.n_blocks // K))

        def step(st):
            g, d = st
            g, d, ys = self._multi(g, d)
            return (g, d), ys

        return run_chunked(step, self._init_states, n_exec, plan.n_blocks,
                           plan.block_len, self.demod.n_channels,
                           plan.total_out_rows, sinks,
                           usrp_number=usrp_number, front_end=front_end)


class _ReplayLoopbackChain:
    """Adapter: the ReplayDDC kernel as a FusedLoopback chain.  The
    one-block comb recording rides the chain state so it crosses the jit
    boundary as an argument (never a closure constant — see
    docs/05_performance.md on the relay's compile-request limits)."""

    def __init__(self, rk):
        self.rk = rk
        from ..ops.pallas_replay import ReplayDDCT
        self.path_name = ("replay_kernel_t" if isinstance(rk, ReplayDDCT)
                          else "replay_kernel")

    def init_state(self):
        import jax.numpy as jnp
        from ..ops.cplx import C
        # device copy: the master recording must survive donation
        return (self.rk.init_state(),
                C(jnp.copy(self.rk._X.re), jnp.copy(self.rk._X.im)))

    def multi_step(self, state, K: int):
        st, X = state
        assert K == self.rk.K
        st, y = self.rk.multi_step(st, X=X)
        return (st, X), y


class _ChannelizerWavetableChain:
    """One comb wavetable frame + the fused channelizer kernel
    (ops/pallas_channelizer.channelizer_frames_t).  Streaming state: the
    (n1, avg-1, n2) transposed spare-frame carry."""

    path_name = "channelizer_wavetable"

    def __init__(self, cfg, dft, freqs, ampls, L, full_spectrum, decim):
        import numpy as np
        from ..ops import pfb as pfb_ops
        from ..ops.pallas_channelizer import transpose_block
        from ..ops.tonegen import tone_comb_wavetable_block
        self.cfg, self.dft = cfg, dft
        self.full_spectrum = full_spectrum
        self.decim = decim
        self.n1, self.n2 = dft.split
        nfft = cfg.nfft
        self.T = L // nfft
        frame = tone_comb_wavetable_block(freqs, ampls, cfg.rate, nfft)
        self._f_t = transpose_block(frame, nfft, self.n1, self.n2)
        self._window = cfg.window()
        self._bins = (np.arange(nfft) if full_spectrum
                      else np.asarray(cfg.bins))
        self._spare0 = transpose_block(pfb_ops.pfb_spare_init(cfg),
                                       nfft, self.n1, self.n2)

    def init_state(self):
        return self._spare0

    def multi_step(self, spare_t, K: int):
        import jax
        from ..ops import pfb as pfb_ops
        from ..ops.pallas_channelizer import (channelizer_frames_t,
                                              select_tones_t)
        cfg, dft = self.cfg, self.dft
        n1, n2, T = self.n1, self.n2, self.T

        def body(sp, _):
            sp, fr = channelizer_frames_t(cfg, self._window, dft, sp,
                                          self._f_t, nframes=T)
            y = select_tones_t(fr, self._bins, n1, n2)
            if self.decim > 0:
                y = pfb_ops.average_frames(y, self.decim)
            return sp, y

        spare_t, ys = jax.lax.scan(body, spare_t, None, length=K)
        rows = ys.re.shape[1]
        C_ = ys.re.shape[2]
        from ..ops.cplx import C as _C
        return spare_t, _C(ys.re.reshape(K * rows, C_),
                           ys.im.reshape(K * rows, C_))


class _ChirpWavetableChain:
    """One-period chirp wavetable (generated on device at build) + the
    TABLE-OSCILLATOR lock-in kernel
    (ops/pallas_lockin.pallas_chirp_lockin_table): the demod oscillator
    is READ from the resident period instead of recomputed per sample —
    in-kernel sincos measured 18.6 vs 40.6 Gsps for the table form at
    the config-2 shape, bit-identical output
    (tools/perf_chirp_table.py, 2026-08-20).  In the loopback the signal
    IS the wavetable, so oscillator and signal rows stream from the same
    buffer; the TX amplitude is folded into the lock-in profile.
    Streaming state: (uint32 chirp phase position, int32 period-block
    index) — the phase position rides along for checkpoint parity."""

    path_name = "chirp_wavetable"

    def __init__(self, cfg, L: int, ppt: int, scale: float):
        import jax.numpy as jnp
        from ..ops import chirp as chirp_ops
        from ..ops import lockin as lockin_ops
        from ..ops.cplx import C
        self.cfg, self.L, self.ppt = cfg, L, ppt
        self.nseg_pb = L // ppt
        self.nblk = cfg.period // L
        # y = sum_k w_k * conj(scale*c) * (scale*c) = scale^2 * sum w|c|^2;
        # the demod contract is conj(c) * x with a UNIT oscillator, so
        # one scale factor divides back out through the profile
        self.profile = jnp.asarray(lockin_ops.lockin_profile(ppt) /
                                   (scale if scale else 1.0))

        @jax.jit
        def gen_period():
            def body(last, _):
                last, x = chirp_ops.chirp_block(cfg, last, L, scale=scale)
                return last, x
            _, xs = jax.lax.scan(body, jnp.uint32(0), None,
                                 length=self.nblk)
            return xs            # C((nblk, L), (nblk, L))

        xs = gen_period()
        total_nseg = cfg.period // ppt
        self._Xf = C(xs.re.reshape(total_nseg, ppt),
                     xs.im.reshape(total_nseg, ppt))

    def init_state(self):
        import jax.numpy as jnp
        from ..ops.cplx import C
        # the 800 MB-class wavetable rides the chain state so it crosses
        # the jit boundary as an ARGUMENT (a closure constant would be
        # inlined into the remote-compile request and crash the relay);
        # device-copied so the master survives donation
        return (jnp.uint32(0), jnp.int32(0),
                C(jnp.copy(self._Xf.re), jnp.copy(self._Xf.im)))

    def multi_step(self, state, K: int):
        import jax.numpy as jnp
        from ..ops.cplx import C
        from ..ops.pallas_lockin import pallas_chirp_lockin_table_self
        last, idx, Xf = state
        nblk, nseg_pb = self.nblk, self.nseg_pb
        L, period = self.L, self.cfg.period

        def body(carry, _):
            lst, i = carry
            # oscillator and signal rows both stream from the resident
            # period (the loopback signal IS the wavetable) — via the
            # SINGLE-FETCH kernel: Mosaic does not coalesce two block
            # specs over one buffer, so the aliased 4-spec call streamed
            # every byte twice (tools/perf_pallas_bw2.py /
            # tools/perf_lockin_self.py, 2026-08-21)
            y = pallas_chirp_lockin_table_self(self.profile, Xf, i,
                                               nseg_pb)
            nxt = i + 1
            nxt = jnp.where(nxt >= nblk, nxt - nblk, nxt)
            lst = (lst + jnp.uint32(L % period)) % jnp.uint32(period)
            return (lst, nxt), C(y.re[:, None], y.im[:, None])

        (last, idx), ys = jax.lax.scan(body, (last, idx), None, length=K)
        return (last, idx, Xf), C(ys.re.reshape(K * nseg_pb, 1),
                                  ys.im.reshape(K * nseg_pb, 1))


_FUSABLE = {
    (WaveType.TONES, WaveType.DIRECT),
    (WaveType.TONES, WaveType.TONES),
    (WaveType.TONES, WaveType.NOISE),
    (WaveType.CHIRP, WaveType.CHIRP),
}


def can_fuse(tx: Optional[AntennaParams], rx: AntennaParams) -> bool:
    if tx is None or not tx.wave_type or not rx.wave_type:
        return False
    return (tx.wave_type[0], rx.wave_type[0]) in _FUSABLE
