"""Lock-in segment decimator (VNA averaging).

The reference averages each ppt-sample segment of the chirp-demodulated
stream with a flat profile that zeroes the first ppt//10 settling samples,
implemented as a cuBLAS cgemv (cublas_decim, cpp/kernels.cu:852-872, profile
from make_flat_window(ppt, ppt/10), cpp/USRP_demodulator.cpp:246).

Here it is a single (nseg, ppt) x (ppt,) contraction; the engine picks block
lengths that are multiples of ppt so segment boundaries never straddle
blocks (replacing VNA_decimator_helper's remainder dance,
cpp/USRP_server_memory_management.cpp:30-56).
"""

from __future__ import annotations

import jax
import numpy as np

from . import cplx
from .cplx import C
from .windows import flat_window


def lockin_profile(ppt: int, dtype=np.float32) -> np.ndarray:
    """Flat profile of length ppt with the first ppt//10 samples zeroed,
    normalized to unit sum (reference cpp/USRP_demodulator.cpp:246)."""
    return flat_window(ppt, ppt // 10, dtype=dtype)


def lockin_decimate(profile: jax.Array, z: C) -> C:
    """Average segments: z (nseg*ppt,) -> (nseg,) via out[s] = z_s . profile."""
    ppt = profile.shape[0]
    nseg = z.shape[0] // ppt
    seg = z[:nseg * ppt].reshape(nseg, ppt)
    return cplx.matmul_cr(seg, profile)
