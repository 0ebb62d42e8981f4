"""TPU performance experiments for the hot DSP steps.

Run on the real chip:  nohup python tools/perf_experiments.py [stages] > log &
e.g. `python tools/perf_experiments.py 4 5` runs only stages 4 and 5.
Each variant compiles once (slow on this rig's remote-compile path) and is
then timed device-resident.
"""

# NOTE: this tool predates the fetch-synced timing rule (CLAUDE.md): numbers it
# printed historically are unreliable (block_until_ready early-ack / short-round
# deflation). Use bench.py / tools/bench_configs.py / tools/perf_honest_sweep.py
# or add hard_sync + steady-state rounds before trusting new runs.

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main(stages):
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.cplx import DFT
    from gpu_sdr_tpu.ops.pfb import (PFBConfig, pfb_frames, pfb_spare_init,
                                     select_tones, tone_bins)
    from gpu_sdr_tpu.ops.ddc import (DirectDDCConfig, ddc_carrier_init,
                                     ddc_carrier_step, direct_ddc_fir)
    from gpu_sdr_tpu.ops.tonegen import ToneCombConfig, tone_comb_block

    rate = 100_000_000
    L = 1_048_576
    rng = np.random.default_rng(0)
    xb = (rng.standard_normal(L) + 1j * rng.standard_normal(L)
          ).astype(np.complex64)
    xc = cplx.from_np(xb)
    jax.block_until_ready(xc.re)

    nfft, avg = 1024, 4
    freqs = [int(f) for f in np.linspace(-45e6, 45e6, 1000)]
    bins = tuple(int(b) for b in tone_bins(freqs, rate, nfft))
    bins_arr = jnp.asarray(np.asarray(bins, np.int32))

    def build_pfb(two_stage):
        cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate, bins=bins)
        window = cfg.window()
        dft = DFT(nfft, two_stage=two_stage)

        @jax.jit
        def step(spare, x):
            spare, frames = pfb_frames(cfg, window, dft, spare, x)
            return spare, select_tones(frames, bins_arr)

        return step, pfb_spare_init(cfg)

    if "1" in stages:
        step, spare = build_pfb(False)
        dt = timeit(lambda: step(spare, xc)[1])
        print(f"pfb_dense_dft: {L/dt/1e6:.0f} Msps ({dt*1e3:.2f} ms/blk)",
              flush=True)

    if "2" in stages:
        step2, spare2 = build_pfb(True)
        dt = timeit(lambda: step2(spare2, xc)[1])
        print(f"pfb_two_stage_dft: {L/dt/1e6:.0f} Msps ({dt*1e3:.2f} ms/blk)",
              flush=True)

    if "3" in stages:
        cfg3 = PFBConfig(nfft=nfft, avg=avg, rate=rate)
        w3 = cfg3.window()
        d3 = DFT(nfft, two_stage=True)

        @jax.jit
        def step3(spare, x):
            return pfb_frames(cfg3, w3, d3, spare, x)

        sp3 = pfb_spare_init(cfg3)
        dt = timeit(lambda: step3(sp3, xc)[1])
        print(f"pfb_full_spec_2stage: {L/dt/1e6:.0f} Msps "
              f"({dt*1e3:.2f} ms/blk)", flush=True)

    if "4" in stages:
        Ld = 1_000_000
        xd = cplx.from_np(xb[:Ld])
        ddc_freqs = tuple(int(f) for f in np.linspace(-45e6, 45e6, 100))
        dcfg = DirectDDCConfig(rate=rate, decim=100, pf_average=4,
                               freqs=ddc_freqs, phases=(0,) * 100)
        hmod = dcfg.modulated_taps()
        ramp = dcfg.carrier_ramp(Ld // 100)
        stepv = ddc_carrier_step(dcfg, Ld)

        @jax.jit
        def dstep(ph, hist, x):
            return direct_ddc_fir(hmod, ramp, stepv, dcfg.rate, dcfg.M,
                                  dcfg.f, ph, hist, x)

        ph0 = ddc_carrier_init(dcfg, Ld)
        h0 = cplx.zeros((dcfg.f - 1) * dcfg.M)
        dt = timeit(lambda: dstep(ph0, h0, xd)[2])
        print(f"ddc_direct_100t: {Ld/dt/1e6:.0f} Msps ({dt*1e3:.2f} ms/blk)",
              flush=True)

    if "5" in stages:
        tcfg = ToneCombConfig(rate=rate, freqs=tuple(freqs),
                              ampls=(0.001,) * 1000, block_len=L)
        P, Q = tcfg.factors()
        st = tcfg.phase_step()

        @jax.jit
        def gstep(ph):
            return tone_comb_block(P, Q, st, rate, ph)

        ph = tcfg.phase_init()
        dt = timeit(lambda: gstep(ph)[1])
        print(f"tone_comb_1000t: {L/dt/1e6:.0f} Msps ({dt*1e3:.2f} ms/blk)",
              flush=True)


if __name__ == "__main__":
    main(set(sys.argv[1:]) or {"1", "2", "3", "4", "5"})
