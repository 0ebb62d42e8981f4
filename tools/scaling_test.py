#!/usr/bin/env python3
"""Functional scaling validation on a virtual device mesh.

Runs the sharded DDC chain at 1/2/4/8 devices (CPU virtual mesh by
default) and reports output-parity against the single-device op at every
width — the functional half of the 1->N scaling story (real ICI timing
needs a multi-chip slice; see docs/05_performance.md).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
           python tools/scaling_test.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from gpu_sdr_tpu import golden  # noqa: E402
from gpu_sdr_tpu.ops import cplx  # noqa: E402
from gpu_sdr_tpu.ops.ddc import DirectDDCConfig  # noqa: E402
from gpu_sdr_tpu.parallel import ShardedDDC, make_mesh  # noqa: E402


def main():
    rate, decim, pfa = 1_000_000, 10, 4
    n_tones = 8
    freqs = tuple(int(f) for f in np.linspace(-400_000, 400_000, n_tones))
    cfg = DirectDDCConfig(rate=rate, decim=decim, pf_average=pfa,
                          freqs=freqs, phases=(0,) * n_tones)
    L = 80_000
    rng = np.random.default_rng(0)
    blocks = [(rng.standard_normal(L) + 1j * rng.standard_normal(L)
               ).astype(np.complex64) for _ in range(3)]
    gold = golden.GoldenDirectDemodulator(list(freqs), rate, decim, pfa)
    ref = np.concatenate([gold(b) for b in blocks], axis=1).T

    print("devices  mesh        SNR vs golden")
    for n in (1, 2, 4, 8):
        t = 2 if n >= 4 else (2 if n == 2 else 1)
        shape = (t, n // t)
        mesh = make_mesh(shape, ("time", "channels"))
        sd = ShardedDDC(cfg, mesh, L)
        state = sd.init_state()
        outs = []
        for b in blocks:
            state, y = sd.step(state, sd.shard_input(b))
            outs.append(cplx.to_np(y))
        out = np.concatenate(outs, axis=0)
        snr = golden.snr_db(ref, out)
        status = "OK" if snr > 90 else "FAIL"
        print(f"{n:7d}  {str(shape):10s}  {snr:6.1f} dB  {status}")


if __name__ == "__main__":
    main()
