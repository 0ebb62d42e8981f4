"""The measurement dispatch table, as code (VERDICT r3 #7).

`run_measurement` is the framework's de-facto orchestrator (the
reference's TXRX::set role, cpp/USRP_server_link_threads.cpp:88-227): it
routes every (wave_type pair, mesh, periodicity, channel count,
recording) combination onto one of several execution paths — fused
loopback chains, the replay-rewrite kernels, sharded SPMD chains, mixed
parallel demodulators, lock-step dual frontends, or the host-fed
pipeline.  Those decisions live in `measure._run_measurement_inner`,
`engine/fused.FusedLoopback` and `engine/replay.DeviceReplay`; this
module exposes them as a queryable PLAN so the routing is inspectable
without running anything.

``plan_dispatch(params, ...)`` returns one :class:`Decision` per active
RX antenna naming the top-level path, the chain/kernel sub-path, and the
deciding predicate.  Wherever the production builders gate on pure shape
math, the plan calls the SAME functions (ReplayDDC.plan_tiles,
can_fuse_channelizer, plan_dual, can_device_replay, ...);
tests/test_dispatch_table.py asserts the plan matches what
run_measurement actually built (`measure.LAST_DISPATCH`) across a
branch-covering battery, so the table cannot silently drift from the
code.  docs/07_dispatch.md renders the same table for humans.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from ..params import AntMode, UsrpParams, WaveType

# top-level paths
DUAL_FUSED = "dual_fused"
DUAL_SHARDED = "dual_sharded_fused"
FUSED_LOOPBACK = "fused_loopback"
SHARDED_FUSED = "sharded_fused"
SHARDED_REPLAY = "sharded_replay"
SHARDED_SEGMENTED = "sharded_segmented_replay"
DEVICE_REPLAY = "device_replay"
SEGMENTED_REPLAY = "segmented_replay"
HOST_PIPELINE = "host_pipeline"
HOST_MIXED = "host_pipeline_mixed"


@dataclasses.dataclass
class Decision:
    rx_name: str
    path: str                      # top-level execution path
    subpath: Optional[str] = None  # chain / kernel variant inside it
    reason: str = ""               # the deciding predicate, for humans

    def key(self):
        return (self.rx_name, self.path, self.subpath)


def _is_mixed(rx) -> bool:
    from ..measure import _is_mixed as m
    return m(rx)


def classify_loopback_chain(tx, rx):
    """Which chain FusedLoopback will run for this (tx, rx) pair.
    Mirrors FusedLoopback.__post_init__'s _try_* ladder using the same
    shape math (engine/fused.py:36-52)."""
    from ..config import kernel_dot_precision, use_pallas_pfb
    from .planner import plan_blocks
    L = plan_blocks(rx).block_len
    w_tx = tx.wave_type[0] if tx.wave_type else None
    w_rx = rx.wave_type[0] if rx.wave_type else None

    if w_tx == WaveType.TONES and w_rx == WaveType.DIRECT:
        if tx.burst_on > 0 or int(rx.decim) <= 0 or int(rx.pf_average) < 2:
            return "generic_scan", "burst/decim/pf_average gate"
        freqs = tuple(int(f) for f in tx.freq)
        if not freqs or not rx.freq:
            return "generic_scan", "no tones"
        from ..ops.ddc import DirectDDCConfig
        from ..ops.tonegen import comb_period
        rx_freqs = tuple(int(f) for f in rx.freq)
        dcfg = DirectDDCConfig(
            rate=int(rx.rate), decim=int(rx.decim),
            pf_average=int(rx.pf_average), freqs=rx_freqs,
            phases=(0,) * len(rx_freqs))
        period = comb_period(freqs, tx.rate)
        if use_pallas_pfb() and L % period == 0 and period <= (1 << 22):
            from ..ops.pallas_replay import replay_ddc_kind
            kind = replay_ddc_kind(dcfg, n=L, L=L)
            if kind:
                return kind, ("periodic comb == looped one-block "
                              "recording (L % comb_period == 0)")
            if min(len(freqs), len(rx_freqs)) < 8:
                return "generic_scan", "small periodic comb, untileable"
        if (use_pallas_pfb() and kernel_dot_precision() == "tf32" and
                _fold_kernel_feasible(dcfg, len(freqs), L)):
            return "fold_kernel", "shift-fold algebra, Pallas tileable"
        if dcfg.decim > 0 and L % dcfg.M == 0 and freqs:
            return "fold_chain", "shift-fold algebra, XLA form"
        return "generic_scan", "fold chain infeasible"

    if w_tx == WaveType.CHIRP and w_rx == WaveType.CHIRP:
        if tx.burst_on > 0 or int(rx.decim) < 1:
            return "generic_scan", "burst/decim gate"
        if not use_pallas_pfb():
            return "generic_scan", "Pallas disabled"
        for attr in ("freq", "chirp_f", "chirp_t", "swipe_s"):
            a, b = getattr(tx, attr), getattr(rx, attr)
            if not a or not b or a[0] != b[0]:
                return "generic_scan", f"tx/rx {attr} mismatch"
        from ..ops import chirp as chirp_ops
        from ..params import chirp_steps_and_length
        from .replay import DEVICE_REPLAY_MAX_BYTES
        steps, length = chirp_steps_and_length(rx)
        cfg = chirp_ops.ChirpConfig.from_params(
            rx.freq[0], rx.chirp_f[0], int(rx.rate), steps, rx.chirp_t[0])
        ppt = length * int(rx.decim)
        if (L % ppt != 0 or (L // ppt) % 8 != 0 or cfg.period % L != 0 or
                cfg.period * 8 > DEVICE_REPLAY_MAX_BYTES):
            return "generic_scan", "chirp period/segment untileable"
        return "chirp_wavetable", "one-period wavetable fits HBM"

    if w_tx == WaveType.TONES and w_rx in (WaveType.TONES, WaveType.NOISE):
        if tx.burst_on > 0 or int(rx.fft_tones) <= 0:
            return "generic_scan", "burst/fft_tones gate"
        from ..config import kernel_dot_precision as kdp
        if not use_pallas_pfb() or kdp() != "tf32":
            return "generic_scan", "Pallas/tf32 disabled"
        from ..ops import pfb as pfb_ops
        from ..ops.cplx import DFT
        from ..ops.pallas_channelizer import can_fuse_channelizer
        from ..ops.tonegen import comb_period
        nfft = int(rx.fft_tones)
        freqs = tuple(int(f) for f in tx.freq)
        if not freqs:
            return "generic_scan", "no tones"
        if nfft % comb_period(freqs, int(tx.rate)) != 0:
            return "generic_scan", "comb not one-frame-periodic"
        full_spectrum = rx.wave_type[0] == WaveType.NOISE
        bins = None if full_spectrum else tuple(
            int(b) for b in pfb_ops.tone_bins(rx.freq, rx.rate, nfft))
        cfg = pfb_ops.PFBConfig(nfft=nfft, avg=int(rx.pf_average),
                                rate=int(rx.rate), bins=bins,
                                decim=int(rx.decim))
        dft = DFT(nfft, two_stage=True)
        if not can_fuse_channelizer(cfg, dft, L):
            return "generic_scan", "channelizer kernel untileable"
        if int(rx.decim) > 0 and (L // nfft) % int(rx.decim) != 0:
            return "generic_scan", "decim not frame-commensurate"
        return "channelizer_wavetable", "bin-quantized comb, fused kernel"

    return "generic_scan", "no fused chain for this mode pair"


def _fold_kernel_feasible(cfg, n_tx_tones, L, time_shards=1) -> bool:
    """Shape math of TonesDirectFoldKernel.ok
    (ops/pallas_chain.py:404-415)."""
    from ..ops.pallas_chain import _pick_rows
    M, f = cfg.M, cfg.f
    if not (cfg.decim > 0 and L % M == 0 and n_tx_tones > 0 and f >= 1):
        return False
    nb = L // M
    nbt = nb // time_shards if nb % time_shards == 0 else 0
    if not nbt:
        return False
    R = _pick_rows(nbt, n_tx_tones, cfg.n_channels, 1)
    return bool(R) and nbt % R == 0


def classify_sharded_fused(tx, rx, mesh):
    """Which chain make_sharded_fused builds — mirrors the builders in
    parallel/fused_sharded.py via the shared plan helpers (the
    plan==actual battery pins it, tests/test_dispatch_table.py)."""
    from ..parallel.fused_sharded import (plan_sharded_block,
                                          plan_sharded_channelizer_loopback,
                                          plan_sharded_chirp_table)
    w = rx.wave_type[0]
    L, _nb = plan_sharded_block(rx, mesh)
    if w == WaveType.CHIRP:
        if plan_sharded_chirp_table(tx, rx, mesh, L):
            return "chirp_table", ("resident one-period wavetable, "
                                   "per-shard table lock-in kernel")
        return "chirp_lockin", "per-shard chirp synth + lock-in, no halo"
    if w == WaveType.TONES:
        if plan_sharded_channelizer_loopback(tx, rx, mesh, L):
            return "channelizer_wavetable", (
                "bin-quantized comb, fused channelizer kernel per time "
                "shard, zero collectives")
        return "pfb_scan", "presum + DFT + psum-select SPMD chain"
    # TONES -> DIRECT: the shift-fold kernel when it tiles (lane-padded
    # candidate first, exactly as ShardedFusedDirect tries), else the
    # G-fused chain
    from ..config import pad_lanes
    from ..ops.ddc import DirectDDCConfig
    from .fused import _pad_tone_lists
    T = mesh.shape.get("time", 1)
    Kc = mesh.shape.get("channels", 1)
    freqs = tuple(int(f) for f in tx.freq)
    ampls = tuple(float(a) for a in (tx.ampl or [1.0] * len(freqs)))
    rx_freqs = tuple(int(f) for f in rx.freq)
    cands = [(freqs, ampls, rx_freqs, 0)]
    if pad_lanes():
        cands.insert(0, _pad_tone_lists(freqs, ampls, rx_freqs,
                                        int(tx.rate), multiple=128 * Kc))
    for kf, _ka, kr, _n_pad in cands:
        kcfg = DirectDDCConfig(rate=int(rx.rate), decim=int(rx.decim),
                               pf_average=int(rx.pf_average), freqs=kr,
                               phases=(0,) * len(kr))
        if (_fold_kernel_feasible(kcfg, len(kf), L, time_shards=T) and
                kcfg.n_channels % Kc == 0):
            return "fold_kernel", "shift-fold kernel tiles per shard"
    return "g_chain", "fold untileable: G-fused chain"


def classify_device_replay(rx, n: int, loop: bool):
    """Which form DeviceReplay will run for an n-sample recording.
    Mirrors DeviceReplay.__post_init__'s _try_* ladder
    (engine/replay.py)."""
    from ..config import kernel_dot_precision, use_pallas_pfb
    from .planner import plan_blocks
    L = plan_blocks(rx).block_len
    w = rx.wave_type[0] if rx.wave_type else None

    if (loop and n % L == 0 and w == WaveType.DIRECT and
            int(rx.decim) > 0 and int(rx.pf_average) >= 2 and
            use_pallas_pfb() and kernel_dot_precision() == "tf32"):
        from ..ops.ddc import DirectDDCConfig
        from ..ops.pallas_replay import replay_ddc_kind
        freqs = tuple(int(f) for f in rx.freq)
        cfg = DirectDDCConfig(
            rate=int(rx.rate), decim=int(rx.decim),
            pf_average=int(rx.pf_average), freqs=freqs,
            phases=(0,) * len(freqs))
        kind = replay_ddc_kind(cfg, n, L)
        if kind:
            return kind, "looped DIRECT recording, tileable"

    # channelizer/pfb/chirp gates shared with the DeviceReplay builders
    # (engine/replay.plan_channelizer_replay / plan_pfb_replay /
    # plan_chirp_replay): one plan function on the replay side, called
    # from both __post_init__ and this mirror, so the table cannot
    # drift (ADVICE r4)
    from .replay import (plan_channelizer_replay, plan_chirp_replay,
                         plan_pfb_replay)
    if plan_channelizer_replay(rx, n, L, loop):
        return "channelizer_at", ("fused channelizer over the resident "
                                  "recording (no presum round trip)")
    if plan_pfb_replay(rx, n, L, loop):
        return "pfb_at", "in-place PFB pre-sum over the recording"

    kind = plan_chirp_replay(rx, n, L, loop)
    if kind == "chirp_table":
        return "chirp_table", ("period-commensurate recording, "
                               "table-oscillator lock-in")
    if kind == "chirp_at":
        return "chirp_at", "in-place lock-in over the recording"

    return "scan", "generic dynamic_slice scan"


def plan_dispatch(params: UsrpParams, source=None, channel=None,
                  mesh=None) -> List[Decision]:
    """Predict run_measurement's routing without executing anything
    heavyweight.  Same decision order as measure._run_measurement_inner.
    """
    from ..measure import _is_mixed, _pair_tx
    from .replay import can_device_replay, can_segmented_replay
    decisions: List[Decision] = []

    if source is None and channel is None:
        from .dual import plan_dual
        pairs = plan_dual(params, mesh=mesh)
        if pairs is not None:
            path = DUAL_FUSED if mesh is None else DUAL_SHARDED
            for rx_name, tx, rx in pairs:
                sub = (classify_loopback_chain(tx, rx)[0]
                       if mesh is None else None)
                decisions.append(Decision(
                    rx_name, path, sub,
                    ">=2 fusable frontends, common block plan"))
            return decisions

    for rx_name, rx in params.active_antennas(AntMode.RX):
        mixed = _is_mixed(rx)
        tx_name = _pair_tx(params, rx_name)
        tx = params.antenna(tx_name) if tx_name else None

        if source is None and channel is None and not mixed:
            if mesh is None:
                from .fused import can_fuse
                if tx is not None and can_fuse(tx, rx) and \
                        rx.delay <= tx.delay:
                    sub, why = classify_loopback_chain(tx, rx)
                    decisions.append(
                        Decision(rx_name, FUSED_LOOPBACK, sub, why))
                    continue
            else:
                from ..parallel.fused_sharded import (can_fuse_sharded,
                                                      plan_sharded_block)
                if tx is not None and can_fuse_sharded(tx, rx, mesh) and \
                        rx.delay <= tx.delay:
                    sub, why = classify_sharded_fused(tx, rx, mesh)
                    decisions.append(Decision(
                        rx_name, SHARDED_FUSED, sub, why))
                    continue

        if source is not None and channel is None and not mixed:
            if mesh is not None and can_device_replay(source):
                from .demodulator import make_demodulator as _mk
                loop = bool(getattr(source, "loop", False))
                blk = _mk(rx, mesh=mesh).plan.block_len
                if not (loop and len(source.data) % blk != 0):
                    from ..parallel.sharded_replay import (
                        plan_sharded_channelizer_replay,
                        plan_sharded_replay_kernel)
                    if plan_sharded_replay_kernel(
                            rx, len(source.data), blk, loop, mesh):
                        sub, why = "replay_kernel", \
                            ("row-major replay kernel per time shard, "
                             "staged cross-shard FIR history (zero "
                             "collectives)")
                    elif plan_sharded_channelizer_replay(
                            rx, len(source.data), blk, loop, mesh):
                        sub, why = "channelizer_at", \
                            ("fused channelizer per time shard, "
                             "staged cross-shard halos (zero "
                             "collectives)")
                    else:
                        sub, why = "scan", "recording fits HBM, mesh given"
                    decisions.append(Decision(
                        rx_name, SHARDED_REPLAY, sub, why))
                    continue
            if mesh is not None and can_segmented_replay(source):
                from .demodulator import make_demodulator as _mk
                loop = bool(getattr(source, "loop", False))
                blk = _mk(rx, mesh=mesh).plan.block_len
                if not (loop and len(source.data) % blk != 0):
                    decisions.append(Decision(
                        rx_name, SHARDED_SEGMENTED, None,
                        "recording exceeds HBM budget, mesh given: "
                        "sharded segment refill"))
                    continue
            if mesh is None and can_device_replay(source):
                from .planner import plan_blocks
                loop = bool(getattr(source, "loop", False))
                blk = plan_blocks(rx).block_len
                if not (loop and len(source.data) % blk != 0):
                    sub, why = classify_device_replay(
                        rx, len(source.data), loop)
                    decisions.append(
                        Decision(rx_name, DEVICE_REPLAY, sub, why))
                    continue
            if mesh is None and can_segmented_replay(source):
                from .planner import plan_blocks
                loop = bool(getattr(source, "loop", False))
                blk = plan_blocks(rx).block_len
                if not (loop and len(source.data) % blk != 0):
                    decisions.append(Decision(
                        rx_name, SEGMENTED_REPLAY, None,
                        "recording exceeds HBM budget: double-buffered "
                        "segment refill"))
                    continue

        decisions.append(Decision(
            rx_name, HOST_MIXED if mixed else HOST_PIPELINE,
            None, "mixed wave types on one antenna" if mixed
            else "no fused/replay path applies"))
    return decisions
