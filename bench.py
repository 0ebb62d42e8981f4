"""Headline benchmark: 1000-tone channelized readout throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s/chip", "vs_baseline": N,
   "tflops_tf32_equiv": N, "hbm_gbps": N}

Baseline: the reference sustains 100 Msps complex input with 1000 PFB
channels on one GPU in real time (scripts/network_test.py:4-6,
server_docs/01_installation.md:11) => vs_baseline = value / 100.

The benchmarked chain is the full DSP loop of the reference's network-stress
configuration, executed entirely on-chip (the production deployment shape —
ingest DMA'd to HBM, no host round-trip):

  1000-tone comb synthesis (tones bin-quantized like the reference's PFB
      mode, pyUSRP/USRP_low_level.py:261, so the comb is nfft-periodic and
      synthesis is ONE wavetable frame broadcast inside the kernel — the
      TPU form of tone_gen's pointer rotation)
    -> fused channelizer kernel (ops/pallas_channelizer.py, transposed
       layout): PFB windowed pre-sum + two-stage DFT with the twiddle
       folded into per-k1 stage-2 constants, one HBM write of the spectra
    -> 1000-bin tone selection (dense transpose + lane roll — the comb
       covers every bin consecutively)

with all streaming state (PFB spare frames) carried across blocks.
Complex math is float32 (re, im) pairs (no complex dtype on this backend);
in-kernel dots use the bf16 hi/lo split = tensorfloat32 grade (~100 dB vs
the float64 oracle in tests).

Timing is fetch-synced: this rig's block_until_ready can ack before
execution completes until a real device->host fetch drains the pipeline
(see CLAUDE.md / tools/rig_probe.py), which silently inflated the round-1
numbers by 30-90%.  Geometry (scan 64 x 4M) re-chosen under honest timing
(tools/perf_honest_sweep.py); round size amortizes the ~50 ms
per-round relay drain (measured convergence 16.0 -> 18.8 -> 19.3 Gsps at
4k / 16k / 32k blocks).

Note: this rig reaches the chip through a loopback relay whose
host<->device link runs at ~33 MB/s — three orders of magnitude below a
real TPU host link — so host-fed ingest is not a meaningful measurement
here; the on-device chain is the honest per-chip DSP throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _enable_compile_cache():
    """Persistent compilation cache: compiles on this rig can take minutes,
    so cache across processes when the backend supports it."""
    try:
        import jax
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   os.path.expanduser("~/.cache/jax_bench"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def bench_loopback_1000(n_blocks: int = 16384,
                        block_len: int = 8_000_000,
                        blocks_per_exec: int = 32):
    """The fused channelizer chain at the steady-state sweep optimum
    (32 x 8M: 25.9 / 64 x 8M: 25.7 / 64 x 4M: 19.4 / 32 x 16M: 13.9 Gsps,
    equal-work rounds, 2026-08-19; 128 x 8M and 16M+ geometries exhaust
    HBM via the stacked per-exec output)."""
    import numpy as np
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.cplx import DFT
    from gpu_sdr_tpu.ops.pallas_channelizer import (
        can_fuse_channelizer, channelizer_frames_t, select_tones_t,
        transpose_block)
    from gpu_sdr_tpu.ops.pfb import PFBConfig, pfb_spare_init, tone_bins
    from gpu_sdr_tpu.ops.tonegen import comb_period, tone_comb_wavetable_block

    rate = 100_000_000
    # the reference network-stress configuration: a 1000-channel PFB at
    # 100 Msps (scripts/network_test.py) -> integer 100 kHz bins
    nfft, avg = 1000, 4
    n_tones = 1000
    freqs = tuple(int(k * (rate // nfft))
                  for k in range(-nfft // 2, nfft // 2))
    bins_np = np.asarray(tone_bins(freqs, rate, nfft))
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate,
                    bins=tuple(int(b) for b in bins_np))
    window = cfg.window()
    dft = DFT(nfft, two_stage=True)
    n1, n2 = dft.split
    assert can_fuse_channelizer(cfg, dft, block_len)
    T = block_len // nfft
    K = blocks_per_exec

    # bin-quantized comb => nfft-periodic => ONE wavetable frame,
    # broadcast inside the kernel (reference pointer-rotation analog)
    period = comb_period(freqs, rate)
    assert nfft % period == 0, (nfft, period)
    frame = tone_comb_wavetable_block(freqs, (1.0 / n_tones,) * n_tones,
                                      rate, nfft)
    f_t = transpose_block(frame, nfft, n1, n2)

    def body(spare_t, _):
        spare_t, fr = channelizer_frames_t(cfg, window, dft, spare_t, f_t,
                                           nframes=T)
        return spare_t, select_tones_t(fr, bins_np, n1, n2)

    @jax.jit
    def multi(spare_t):
        return jax.lax.scan(body, spare_t, None, length=K)

    def hard_sync(arr):
        # block_until_ready alone can ack early through the relay; a real
        # 4-byte fetch is the only hard sync (tools/rig_probe.py)
        return float(np.asarray(jax.device_get(arr.re.reshape(-1)[0])))

    s0 = transpose_block(pfb_spare_init(cfg), nfft, n1, n2)
    s, ys = multi(s0)                       # compile + warm up
    jax.block_until_ready(ys)
    hard_sync(ys)

    n_exec = max(1, n_blocks // K)
    per_round = max(1, n_exec // 4)
    best = 0.0
    for _ in range(4):
        s = s0
        t0 = time.perf_counter()
        for _ in range(per_round):
            s, ys = multi(s)
        # hard_sync ONLY (no block_until_ready in the timed region): a
        # per-round block_until_ready on the stacked output costs ~20%
        # on this relay (tools/perf_bur_cost.py, 2026-08-21) while the
        # 4-byte fetch is already the complete execution barrier
        hard_sync(ys)
        dt = time.perf_counter() - t0
        best = max(best, per_round * K * block_len / dt / 1e6)
    return best


def main():
    try:
        _enable_compile_cache()
        from gpu_sdr_tpu.config import configure_precision
        configure_precision()
        msps = bench_loopback_1000()
        # roofline attribution (VERDICT r1 #10): the chain executes the
        # two-stage DFT's (n1 + n2) complex MACs per sample (8 real flops
        # each at the tensorfloat32 grade) and moves 24 B/sample of HBM
        # traffic (spectra write + select read + stack write; the raw
        # block never exists in HBM) — per-stage byte counts corroborated
        # by measurement (tools/perf_bench_ablate.py, docs/05).  Day
        # ceilings: python tools/rig_probe.py.
        tflops = msps * 1e6 * (8 + 125) * 8 / 1e12
        hbm = msps * 1e6 * 24 / 1e9
        print(json.dumps({
            "metric": "1000-tone synth+PFB channelizer chain throughput",
            "value": round(msps, 1),
            "unit": "Msamples/s/chip",
            "vs_baseline": round(msps / 100.0, 3),
            "tflops_tf32_equiv": round(tflops, 1),
            "hbm_gbps": round(hbm, 1),
        }))
    except Exception as e:  # pragma: no cover
        print(json.dumps({
            "metric": "1000-tone synth+PFB channelizer chain throughput",
            "value": 0.0,
            "unit": "Msamples/s/chip",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        sys.exit(1)


if __name__ == "__main__":
    main()
