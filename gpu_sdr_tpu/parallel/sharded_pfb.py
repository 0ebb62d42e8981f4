"""Sharded PFB channelizer over a (time, channels) mesh.

Multi-chip version of ops/pfb.py:

  * 'time' axis: the input block is split into contiguous segments; each
    device needs the (avg-1)*nfft samples preceding its segment — the PFB's
    overlap-save halo (reference buffer_helper spare samples) — exchanged
    between ring neighbors over ICI with ppermute, with the cross-block
    carry handled exactly like ShardedDDC (shard 0 consumes what last
    block's ppermute delivered).
  * 'channels' axis: the DFT matrix is column-sharded, so each device
    computes nfft/Kc of the output bins for every frame — the windowed
    pre-sum is computed redundantly per channel shard (cheap; it is the
    memory-bound part) and the MXU matmul is split.

Output: (frames, nfft) sharded over (time, channels); tone selection on the
sharded spectrum is a plain jnp.take (XLA inserts the gather collectives).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import cplx
from ..ops.cplx import C
from ..ops.pfb import PFBConfig

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _cpair(*spec):
    return C(P(*spec), P(*spec))


@dataclasses.dataclass
class ShardedPFB:
    """Compiled channel+time sharded PFB for one mesh."""

    cfg: PFBConfig
    mesh: Mesh
    block_len: int

    def __post_init__(self):
        cfg, mesh, L = self.cfg, self.mesh, self.block_len
        nfft, avg = cfg.nfft, cfg.avg
        self.T = mesh.shape.get("time", 1)
        self.Kc = mesh.shape.get("channels", 1)
        assert L % (self.T * nfft) == 0, \
            "block_len must split over time shards in whole frames"
        assert nfft % self.Kc == 0, "nfft must split over channel shards"
        self.Lt = L // self.T
        self.frames_t = self.Lt // nfft
        self.H = (avg - 1) * nfft

        from ..ops.cplx import dft_matrix
        self.F = dft_matrix(nfft)                 # (nfft, nfft) C pair
        self.window = cfg.window()
        self._build()

    def _build(self):
        cfg, mesh = self.cfg, self.mesh
        nfft, avg = cfg.nfft, cfg.avg
        T, H, ft = self.T, self.H, self.frames_t
        has_time = "time" in mesh.axis_names and T > 1
        time_ax = "time" if "time" in mesh.axis_names else None
        ch_ax = "channels" if "channels" in mesh.axis_names else None

        def spmd_step(carry, x, window, F):
            """Local shapes: carry (H,), x (Lt,), window (nfft*avg,),
            F (nfft, nfft/Kc)."""
            if H > 0 and has_time:
                tail = x[-H:]
                perm = [(i, (i + 1) % T) for i in range(T)]
                recv = C(jax.lax.ppermute(tail.re, "time", perm),
                         jax.lax.ppermute(tail.im, "time", perm))
                tidx = jax.lax.axis_index("time")
                halo = C(jnp.where(tidx == 0, carry.re, recv.re),
                         jnp.where(tidx == 0, carry.im, recv.im))
                new_carry = recv
            elif H > 0:
                halo, new_carry = carry, x[-H:]
            else:
                halo, new_carry = carry, carry
            ze = cplx.concat([halo, x]) if H else x
            X = ze.reshape(ft + avg - 1, nfft)
            W = window.reshape(avg, nfft)
            pre = cplx.zeros((ft, nfft), dtype=x.re.dtype)
            for i in range(avg):
                pre = pre + cplx.scale(X[i:i + ft, :], W[i][None, :])
            frames = cplx.matmul(pre, F)          # (ft, nfft/Kc)
            return new_carry, frames

        self._step = jax.jit(shard_map(
            spmd_step, mesh=mesh,
            in_specs=(_cpair(time_ax),            # carry (per time shard)
                      _cpair(time_ax),            # x
                      P(None),                    # window (replicated)
                      _cpair(None, ch_ax)),       # DFT columns
            out_specs=(_cpair(time_ax), _cpair(time_ax, ch_ax)),
            check_vma=False))

    # ------------------------------------------------------------------
    def init_state(self) -> C:
        return cplx.zeros(self.T * self.H)

    def step(self, carry: C, x: C):
        """Returns (carry', frames) with frames (L//nfft, nfft) sharded."""
        carry, frames = self._step(carry, x, self.window, self.F)
        return carry, frames

    def shard_input(self, x_np: np.ndarray) -> C:
        spec = NamedSharding(
            self.mesh,
            P("time" if "time" in self.mesh.axis_names else None))
        xc = cplx.from_np(x_np)
        return C(jax.device_put(xc.re, spec), jax.device_put(xc.im, spec))
