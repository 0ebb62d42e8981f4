"""Per-config measured roofline ladders (VERDICT r3 #2).

The headline chain got a measured per-stage ladder in round 3
(tools/perf_bench_ablate.py, docs/05); this gives BASELINE configs 1-4
the same treatment, all in ONE process so the rates are comparable:

  anchor : the day's XLA elementwise ceiling (3-pass axpy fori probe)
  raw    : the config's production kernel/chain stepped directly
           (chain.multi_step — the grid-axis kernels already write
           their stacked output in place, so for configs 1-3 this IS
           kernel+closed-form rotations with no separate stack stage)
  api    : the full engine chain (FusedLoopback._multi = what
           run_measurement executes per K-block round)
  config 4 adds a kernel-sliced stage (spectra write only, output
  sliced to 8 floats) — its chain is the one with a real stack stage
  (full NOISE spectra: ~8 B/sample of stacked output).

Interpretation against the calibrated walls (tools/perf_pallas_bw*.py,
same rig, 2026-08-21): single-stream Pallas DMA caps ~270 GB/s,
multi-stream aggregates 390-440, XLA anchor ~440; MXU ceilings from
tools/rig_probe.py.  docs/05's per-config table names each config's
binding resource from these numbers.

Run: nohup python tools/perf_config_ladder.py > logs/config_ladder.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

TARGET = 16_384_000_000         # samples per stage (matches bench_configs;
                                # short rounds understate by the ~50 ms drain)


def hard_sync(arr):
    import jax
    import jax.numpy as jnp
    x = arr.re if hasattr(arr, "re") else arr
    return float(np.asarray(jax.device_get(jnp.ravel(x)[0])))


def time_steps(step, state0, samples_per_exec, rounds=4):
    """Chained step timing: state threads through; fetch-synced."""
    state = step(state0)
    hard_sync(state[1])
    n_exec = max(1, int(TARGET // samples_per_exec))
    per_round = max(1, n_exec // rounds)
    best = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(per_round):
            state = step(state[0])
        hard_sync(state[1])
        dt = time.perf_counter() - t0
        best = max(best, per_round * samples_per_exec / dt / 1e6)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.engine.fused import FusedLoopback
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType
    from tools.bench_configs import time_chain

    rate = 100_000_000
    out = lambda **kw: print(json.dumps(kw), flush=True)

    # ---- anchor: XLA elementwise ceiling ------------------------------
    n_el = 64 * 1024 * 1024
    u0 = jax.random.normal(jax.random.PRNGKey(0), (n_el,), jnp.float32)
    v0 = jax.random.normal(jax.random.PRNGKey(1), (n_el,), jnp.float32)
    R = 48

    @jax.jit
    def xla_sweep(u, v):
        def body(k, uu):
            return uu * (jnp.float32(1.0)
                         + jnp.float32(1e-12) * uu[0]) + v
        return jax.lax.fori_loop(0, R, body, u)

    u = xla_sweep(u0, v0)
    hard_sync(u)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        u = xla_sweep(u, v0)
        hard_sync(u)
        best = min(best, time.perf_counter() - t0)
    out(stage="anchor_xla_axpy", gbps=round(R * 3 * 4 * n_el / best / 1e9, 1))

    # ---- config 1: single-tone replay kernel --------------------------
    tx1 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=[10_000_000], ampl=[1.0],
                        wave_type=[WaveType.TONES])
    rx1 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=100, pf_average=4, freq=[10_000_000],
                        wave_type=[WaveType.DIRECT])
    fl1 = FusedLoopback(tx1, rx1, blocks_per_exec=64)
    assert fl1.path == "replay_kernel_t", fl1.path
    rk = fl1._chain.rk
    L1, K1 = rk.L, rk.K

    @jax.jit
    def c1_raw(st, Xre, Xim):
        from gpu_sdr_tpu.ops.cplx import C
        st, y = rk.multi_step(st, X=C(Xre, Xim))
        return st, y

    X = rk._X
    msps = time_steps(lambda s: c1_raw(s, X.re, X.im),
                      rk.init_state(), K1 * L1)
    out(config=1, stage="raw_kernel", msps=round(msps, 1),
        gbps_at_8p5=round(msps * 8.5 / 1e3, 1))
    msps, _, _ = time_chain(tx1, rx1, K=64)
    out(config=1, stage="api_chain", msps=round(msps, 1),
        gbps_at_8p5=round(msps * 8.5 / 1e3, 1))

    # ---- config 2: single-fetch chirp-table lock-in -------------------
    kw2 = dict(rate=rate, buffer_len=4_000_000, freq=[-40_000_000],
               chirp_f=[40_000_000], chirp_t=[1.0], swipe_s=[5000])
    tx2 = AntennaParams(mode=AntMode.TX, ampl=[1.0],
                        wave_type=[WaveType.CHIRP], **kw2)
    rx2 = AntennaParams(mode=AntMode.RX, decim=1,
                        wave_type=[WaveType.CHIRP], **kw2)
    fl2 = FusedLoopback(tx2, rx2, blocks_per_exec=32)
    assert fl2.path == "chirp_wavetable", fl2.path
    ch2 = fl2._chain

    @jax.jit
    def c2_raw(st):
        return ch2.multi_step(st, 32)

    # NOTE: this raw stage reads ~half the API chain — the API's jit
    # donates the chain state, aliasing the 800 MB wavetable through
    # each execution; this undonated form copies it per call.  The API
    # row is the production number (engine/fused.py donate_argnums).
    msps = time_steps(c2_raw, ch2.init_state(), 32 * 4_000_000)
    out(config=2, stage="raw_chain_undonated", msps=round(msps, 1),
        gbps_at_8=round(msps * 8 / 1e3, 1))
    msps, _, _ = time_chain(tx2, rx2, K=32)
    out(config=2, stage="api_chain", msps=round(msps, 1),
        gbps_at_8=round(msps * 8 / 1e3, 1))

    # ---- config 3: 100-tone fold kernel -------------------------------
    freqs100 = [int(f) for f in np.linspace(-45e6, 45e6, 100)]
    tx3 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=freqs100, ampl=[0.01] * 100,
                        wave_type=[WaveType.TONES] * 100)
    rx3 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=100, pf_average=4, freq=freqs100,
                        wave_type=[WaveType.DIRECT] * 100)
    fl3 = FusedLoopback(tx3, rx3, blocks_per_exec=64)
    assert fl3.path == "fold_kernel", fl3.path
    ch3 = fl3._chain

    @jax.jit
    def c3_raw(st):
        return ch3.multi_step(st, 64)

    msps = time_steps(c3_raw, ch3.init_state(), 64 * 4_000_000)
    # bytes: the lane-padded factored fold streams ONLY its output —
    # nb * 128 * 8 / L = 10.24 B/sample physical (128 lanes incl. the
    # zero-amplitude padding, round 5); flops: 3 bf16 passes of
    # (R,128)x(128,128) per R rows = 6*128*128 / M = 983 flops/sample
    out(config=3, stage="raw_chain", msps=round(msps, 1),
        gbps_at_10p24=round(msps * 10.24 / 1e3, 1),
        tflops_bf16=round(msps * 1e6 * 983 / 1e12, 1))
    msps, _, _ = time_chain(tx3, rx3, K=64)
    out(config=3, stage="api_chain", msps=round(msps, 1),
        gbps_at_10p24=round(msps * 10.24 / 1e3, 1),
        tflops_bf16=round(msps * 1e6 * 983 / 1e12, 1))

    # ---- config 4: full-spectrum channelizer (6M blocks) --------------
    from gpu_sdr_tpu.ops.cplx import C, DFT
    from gpu_sdr_tpu.ops.pallas_channelizer import (
        can_fuse_channelizer, channelizer_frames_t, select_tones_t,
        transpose_block)
    from gpu_sdr_tpu.ops.pfb import PFBConfig, pfb_spare_init
    from gpu_sdr_tpu.ops.tonegen import tone_comb_wavetable_block
    nfft, avg = 1000, 4
    L4, K4 = 6_000_000, 64
    bins1000 = [int(k * (rate // nfft)) for k in range(-500, 500)]
    cfg4 = PFBConfig(nfft=nfft, avg=avg, rate=rate, bins=None)
    window = cfg4.window()
    dft = DFT(nfft, two_stage=True)
    n1, n2 = dft.split
    assert can_fuse_channelizer(cfg4, dft, L4)
    T4 = L4 // nfft
    frame = tone_comb_wavetable_block(bins1000, (0.001,) * 1000, rate,
                                      nfft)
    f_t = transpose_block(frame, nfft, n1, n2)
    s0 = transpose_block(pfb_spare_init(cfg4), nfft, n1, n2)
    bins_np = np.arange(nfft)

    @jax.jit
    def c4_kernel(spare_t):
        def body(sp, _):
            sp, fr = channelizer_frames_t(cfg4, window, dft, sp, f_t,
                                          nframes=T4)
            return sp, fr.re[0, :8, 0]
        return jax.lax.scan(body, spare_t, None, length=K4)

    @jax.jit
    def c4_full(spare_t):
        def body(sp, _):
            sp, fr = channelizer_frames_t(cfg4, window, dft, sp, f_t,
                                          nframes=T4)
            return sp, select_tones_t(fr, bins_np, n1, n2)
        return jax.lax.scan(body, spare_t, None, length=K4)

    msps = time_steps(lambda s: c4_kernel(s), s0, K4 * L4)
    out(config=4, stage="kernel_sliced", msps=round(msps, 1),
        gbps_at_8=round(msps * 8 / 1e3, 1))
    msps = time_steps(lambda s: c4_full(s), s0, K4 * L4)
    out(config=4, stage="kernel_select_stack", msps=round(msps, 1),
        gbps_at_24=round(msps * 24 / 1e3, 1))
    tx4 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=6_000_000,
                        freq=bins1000, ampl=[0.001] * 1000,
                        wave_type=[WaveType.TONES] * 1000)
    rx4 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=6_000_000,
                        fft_tones=1000, pf_average=4,
                        wave_type=[WaveType.NOISE])
    msps, _, _ = time_chain(tx4, rx4, K=64)
    out(config=4, stage="api_chain", msps=round(msps, 1),
        gbps_at_24=round(msps * 24 / 1e3, 1))


if __name__ == "__main__":
    main()
