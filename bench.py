"""Headline benchmark: 1000-tone channelized readout throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s/chip", "vs_baseline": N}

The baseline is the reference system's sustained real-time rate: 100 Msps
complex input with 1000 PFB channels on one GPU (RTX 2080 Ti class;
scripts/network_test.py:4-6, server_docs/01_installation.md:11).

The benchmarked chain is the reference's network-stress configuration
(1000-channel polyphase filter bank: windowed moving sum + 1024-point DFT +
1000-bin tone select) re-designed for TPU: DFT as MXU matmul, complex as
(re, im) float32 pairs.  Input blocks are fed from host each iteration, so
host->device transfer is included (the honest ingest-to-output rate).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_pfb_1000(n_blocks: int = 8, block_len: int = 1_048_576):
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.pfb import (PFBConfig, pfb_frames, pfb_spare_init,
                                     select_tones, tone_bins)

    rate = 100_000_000
    nfft, avg = 1024, 4
    n_tones = 1000
    freqs = [int(f) for f in
             np.linspace(-rate / 2 * 0.9, rate / 2 * 0.9, n_tones)]
    bins = tuple(int(b) for b in tone_bins(freqs, rate, nfft))
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate, bins=bins)
    window = cfg.window()
    dft = cfg.dft()
    import jax.numpy as jnp
    bins_arr = jnp.asarray(np.asarray(bins, dtype=np.int32))

    @jax.jit
    def step(spare, x):
        spare, frames = pfb_frames(cfg, window, dft, spare, x)
        return spare, select_tones(frames, bins_arr)

    rng = np.random.default_rng(0)
    xb = (rng.standard_normal(block_len) + 1j *
          rng.standard_normal(block_len)).astype(np.complex64)
    xc = cplx.from_np(xb)

    # compile + warm up
    spare = pfb_spare_init(cfg)
    spare, y = step(spare, xc)
    jax.block_until_ready(y)

    t0 = time.perf_counter()
    for _ in range(n_blocks):
        xc2 = cplx.from_np(xb)               # include host->device ingest
        spare, y = step(spare, xc2)
    jax.block_until_ready(y)
    dt = time.perf_counter() - t0
    msps = n_blocks * block_len / dt / 1e6
    return msps


def main():
    try:
        msps = bench_pfb_1000()
        print(json.dumps({
            "metric": "1000-tone PFB channelizer ingest throughput",
            "value": round(msps, 2),
            "unit": "Msamples/s/chip",
            "vs_baseline": round(msps / 100.0, 3),
        }))
    except Exception as e:  # pragma: no cover
        print(json.dumps({
            "metric": "1000-tone PFB channelizer ingest throughput",
            "value": 0.0,
            "unit": "Msamples/s/chip",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        sys.exit(1)


if __name__ == "__main__":
    main()
