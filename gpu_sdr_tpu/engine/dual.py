"""Concurrent, time-aligned dual-frontend execution.

The reference runs the A and B frontends as simultaneous thread chains on
one device timebase (TXRX::start spawns both workers against the same
set_time_unknown_pps clock, cpp/USRP_server_link_threads.cpp:249-397), so
dual measurements (correlated noise, Dual_VNA, beam mapping) sample the
same instants on both channels.

On one TPU the equivalent is ONE jitted program per execution advancing
BOTH frontends' fused chains by the same K blocks: packet k of A and
packet k of B cover exactly the same sample index range [k*L, (k+1)*L) by
construction — XLA schedules the two chains' work inside one program, the
closest thing to "simultaneous" a single accelerator has.  The sequential
fallback (one frontend after the other) is kept for non-fusable modes.
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence, Tuple

import jax

from ..ops import cplx
from ..params import AntennaParams
from .fused import FusedLoopback, can_fuse
from .pipeline import PipelineResult
from .sinks import PacketMeta, Sink


class DualFused:
    """Two (or more) fused loopback chains advanced in lock-step by one
    jitted program."""

    def __init__(self, pairs: Sequence[Tuple[str, AntennaParams,
                                             AntennaParams]],
                 blocks_per_exec: int = 8):
        assert len(pairs) >= 2
        self.rx_names = [name for name, _tx, _rx in pairs]
        # wire code = the FULL antenna name (A_TXRX/A_RX2/B_TXRX/B_RX2):
        # collapsing to the frontend letter would make e.g. a dual
        # measurement on A_TXRX + A_RX2 indistinguishable on the wire
        # (both streams coded 'A' with colliding packet numbers)
        self.front_ends = list(self.rx_names)
        self.chains = [FusedLoopback(tx, rx, blocks_per_exec=blocks_per_exec)
                       for _fe, tx, rx in pairs]
        self.blocks_per_exec = blocks_per_exec
        p0 = self.chains[0].demod.plan
        for ch in self.chains[1:]:
            p = ch.demod.plan
            assert (p.block_len == p0.block_len and
                    p.n_blocks == p0.n_blocks), \
                "lock-step chains need a common block plan"
        chains = self.chains

        @jax.jit
        def multi_all(states):
            new_states, outs = [], []
            for ch, (g, d) in zip(chains, states):
                g, d, ys = ch._multi(g, d)
                new_states.append((g, d))
                outs.append(ys)
            return new_states, outs

        self._multi_all = multi_all

    def run(self, sinks_per_fe: Sequence[Sequence[Sink]],
            usrp_number: int = 0) -> List[PipelineResult]:
        """Stream both acquisitions; sinks_per_fe[i] receives frontend
        i's packets.  Per execution both chains advance together, then
        the previous execution's results drain to the sinks (same
        one-in-flight overlap as pipeline.run_chunked)."""
        plans = [ch.demod.plan for ch in self.chains]
        n_blocks = plans[0].n_blocks
        K = self.blocks_per_exec
        n_exec = max(1, -(-n_blocks // K))
        for ch, sinks in zip(self.chains, sinks_per_fe):
            for s in sinks:
                s.on_start(ch.demod.n_channels, ch.demod.plan.total_out_rows)
        states = [ch._init_states() for ch in self.chains]
        pkts = [0] * len(self.chains)
        rows = [0] * len(self.chains)
        t0 = time.perf_counter()

        def drain(outs):
            for i, ys in enumerate(outs):
                data = cplx.to_np(ys)[:max(0, n_blocks - pkts[i])]
                for k in range(data.shape[0]):
                    d = data[k]
                    meta = PacketMeta(
                        usrp_number=usrp_number,
                        front_end_code=self.front_ends[i],
                        packet_number=pkts[i], length=int(d.size),
                        errors=0, channels=int(d.shape[1]))
                    for s in sinks_per_fe[i]:
                        s.on_packet(meta, d)
                    rows[i] += d.shape[0]
                    pkts[i] += 1

        pending = None
        for _ in range(n_exec):
            states, outs = self._multi_all(states)
            if pending is not None:
                drain(pending)
            pending = outs
        if pending is not None:
            drain(pending)
        elapsed = time.perf_counter() - t0
        for sinks in sinks_per_fe:
            for s in sinks:
                s.on_end()
        return [PipelineResult(n_blocks=pkts[i], rows=rows[i],
                               channels=self.chains[i].demod.n_channels,
                               elapsed_s=elapsed,
                               samples_in=pkts[i] * plans[i].block_len)
                for i in range(len(self.chains))]


def plan_dual(params, mesh=None) -> Optional[List[Tuple[str, AntennaParams,
                                                        AntennaParams]]]:
    """If the measurement is a multi-frontend fused loopback (>= 2 active
    RX, each with a fusable paired TX, common block plan), return the
    lock-step (rx_name, tx, rx) pairs; else None (sequential path)."""
    from ..measure import _pair_tx
    from ..params import AntMode
    from .planner import plan_blocks
    if mesh is not None:
        return None
    rxs = list(params.active_antennas(AntMode.RX))
    if len(rxs) < 2:
        return None
    pairs = []
    plan0 = None
    for rx_name, rx in rxs:
        if rx.wave_type and any(w != rx.wave_type[0]
                                for w in rx.wave_type):
            return None              # mixed-mode antennas run unfused
        tx_name = _pair_tx(params, rx_name)
        tx = params.antenna(tx_name) if tx_name else None
        if tx is None or not can_fuse(tx, rx) or rx.delay > tx.delay:
            return None
        p = plan_blocks(rx)
        if plan0 is None:
            plan0 = p
        elif (p.block_len != plan0.block_len or
              p.n_blocks != plan0.n_blocks):
            return None
        pairs.append((rx_name, tx, rx))
    return pairs
