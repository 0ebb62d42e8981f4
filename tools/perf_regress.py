"""Same-run perf regression gate, anchor-normalized (VERDICT r4 #3).

Runs the headline chain, BASELINE configs 1-5 AND the device-replay
sub-paths (ReplayDDCT at C=1/C=8, the chirp-table lock-in, the in-place
PFB pre-sum) back-to-back in ONE process, measures the day's XLA
elementwise anchor in the SAME process, and gates each row on its
msps / anchor ratio against the recorded ratio.

Why ratios: the rig's LARGE-program throughput drifts up to ~25% across
hours (multi-tenant/thermal; CLAUDE.md), so the round-4 gate floored at
0.65 x recorded absolute Msps — loose enough that a 34% single-config
regression passed.  The anchor drifts WITH the chains (both ride the
same HBM/dispatch machinery), so normalizing by a same-process anchor
cancels most of the drift and allows a 0.85 floor that catches ~20%
regressions.  Config 5 additionally gates its dual/single split ratio,
which is dimensionless already.

One JSON line per row: {"config", "msps", "ratio", "band_min_ratio",
"recorded_ratio", "pass"}; exits 1 if any row falls below its band.
Pass --record to print the measured ratios formatted for updating BANDS
after an intentional perf change.

Run:  nohup python tools/perf_regress.py > logs/perf_regress.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RATIO_FLOOR = 0.85
# recorded msps/anchor_gbps ratios — 2026-08-21 round-5 sweep
# (logs/perf_regress5.log, anchor that day: 448.5 GB/s), after the
# lane-padded fold chain (config 3: 185x -> ~380x)
BANDS = {
    "headline_1000ch_channelizer": 59.1,
    "1_single_tone_ddc_fir": 60.7,
    "2_vna_chirp_lockin": 119.3,
    "3_100tone_readout": 89.0,
    "4_full_spectrum": 46.5,
    "5_dual_1000tone_per_frontend": 15.0,
    "replay_ddct_c1": 62.4,
    "replay_ddct_c8": 102.6,
    "replay_chirp_table": 33.7,
    # full-spectrum replay through the round-5 fused channelizer_at
    # kernel (was pfb_at at 19.1 before the +65% fusion,
    # tools/perf_channelizer_at.py); ratio re-recorded from the
    # all-green confirmation run (logs/perf_regress5c.log: 14,377 Msps
    # at a 431.3 anchor)
    "replay_channelizer_at": 33.3,
    # recorded from tools/perf_replay_pad.py (12,935 Msps padded) against
    # the same-day 444 GB/s anchor; confirmed by the next all-green run
    "replay_rowmajor_c100": 29.1,
    # sharded chains on a 1-device mesh (round 5: the mesh path rides
    # the single-chip kernels — tools/perf_sharded_replay_at.py /
    # perf_sharded_loopback_at.py / perf_sharded_vna_table.py); initial
    # ratios from the 2026-08-21 probes against that day's 431 GB/s
    # anchor, confirmed by the first gated run
    "sharded_replay_channelizer_at": 31.1,
    "sharded_loopback_channelizer": 45.7,
    "sharded_vna_chirp_table": 125.0,
    # sharded row-major DIRECT replay (lane-padded C=100): 12,250 Msps
    # same-day probe (tools/perf_sharded_replay_kernel.py, 6.14x the
    # sharded scan, 0.999 of single-chip) over the 470.7 anchor
    "sharded_replay_kernel_c100": 26.0,
}
# dual/single split ratio (dimensionless, gated directly)
SPLIT_BAND = 0.438


def hard_sync(x):
    import jax
    import jax.numpy as jnp
    arr = x.re if hasattr(x, "re") else x
    return float(np.asarray(jax.device_get(jnp.ravel(arr)[0])))


def measure_anchor():
    """The day's XLA elementwise ceiling (3-pass axpy fori probe), GB/s."""
    import jax
    import jax.numpy as jnp
    n_el = 64 * 1024 * 1024
    u0 = jax.random.normal(jax.random.PRNGKey(0), (n_el,), jnp.float32)
    v0 = jax.random.normal(jax.random.PRNGKey(1), (n_el,), jnp.float32)
    REP = 48

    @jax.jit
    def sweep(u, v):
        def body(k, uu):
            return uu * (jnp.float32(1.0)
                         + jnp.float32(1e-12) * uu[0]) + v
        return jax.lax.fori_loop(0, REP, body, u)

    u = sweep(u0, v0)
    hard_sync(u)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        u = sweep(u, v0)
        hard_sync(u)
        best = min(best, time.perf_counter() - t0)
    return REP * 3 * 4 * n_el / best / 1e9


def time_replay(dr, target=4_096_000_000):
    """Steady-state device-replay rate, fetch-synced (hard_sync ONLY —
    a per-round block_until_ready costs ~20%, tools/perf_bur_cost.py)."""
    import jax.numpy as jnp
    state = (dr._kernel_state_init() if dr._kernel_path is not None
             else dr.demod.init_state())
    idx = jnp.int32(0)
    state, idx, ys = dr._multi(state, idx, dr._Xarg)
    hard_sync(ys)
    K, L = dr.blocks_per_exec, dr.demod.plan.block_len
    n_exec = max(1, int(target // (K * L)))
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n_exec):
            state, idx, ys = dr._multi(state, idx, dr._Xarg)
        hard_sync(ys)
        dt = time.perf_counter() - t0
        best = max(best, n_exec * K * L / dt / 1e6)
    return best


def main():
    record = "--record" in sys.argv
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu import golden
    from gpu_sdr_tpu.engine.replay import DeviceReplay
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType
    from tools.bench_configs import time_chain

    anchor = measure_anchor()
    print(json.dumps({"anchor_gbps": round(anchor, 1)}), flush=True)

    failures = []
    recorded_ratios = {}

    def gate(name, msps):
        ratio = msps / anchor
        recorded_ratios[name] = ratio
        rec = BANDS[name]
        band_min = rec * RATIO_FLOOR
        ok = ratio >= band_min
        if not ok and not record:
            failures.append(name)
        print(json.dumps({"config": name, "msps": round(msps, 1),
                          "ratio": round(ratio, 2),
                          "band_min_ratio": round(band_min, 2),
                          "recorded_ratio": rec, "pass": ok}), flush=True)

    # headline first.  Round lengths must match the recorded
    # measurements (~16 Gsample rounds): short rounds understate
    # steady-state rates by up to 2x via the ~50 ms per-round drain.
    gate("headline_1000ch_channelizer",
         bench.bench_loopback_1000(n_blocks=16384))

    rate = 100_000_000
    tx1 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=[10_000_000], ampl=[1.0],
                        wave_type=[WaveType.TONES])
    rx1 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=100, pf_average=4, freq=[10_000_000],
                        wave_type=[WaveType.DIRECT])
    gate("1_single_tone_ddc_fir",
         time_chain(tx1, rx1, K=64, target_samples=16_384_000_000)[0])

    tx2 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=[-40_000_000], chirp_f=[40_000_000],
                        chirp_t=[1.0], swipe_s=[5000], ampl=[1.0],
                        wave_type=[WaveType.CHIRP])
    rx2 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=1, freq=[-40_000_000],
                        chirp_f=[40_000_000], chirp_t=[1.0],
                        swipe_s=[5000], wave_type=[WaveType.CHIRP])
    gate("2_vna_chirp_lockin",
         time_chain(tx2, rx2, K=32, target_samples=16_384_000_000)[0])

    freqs100 = [int(f) for f in np.linspace(-45e6, 45e6, 100)]
    tx3 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=freqs100, ampl=[0.01] * 100,
                        wave_type=[WaveType.TONES] * 100)
    rx3 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=100, pf_average=4, freq=freqs100,
                        wave_type=[WaveType.DIRECT] * 100)
    gate("3_100tone_readout",
         time_chain(tx3, rx3, K=64, target_samples=16_384_000_000)[0])

    bins1000 = [int(k * (rate // 1000)) for k in range(-500, 500)]
    tx4 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=6_000_000,
                        freq=bins1000, ampl=[0.001] * 1000,
                        wave_type=[WaveType.TONES] * 1000)
    rx4 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=6_000_000,
                        fft_tones=1000, pf_average=4,
                        wave_type=[WaveType.NOISE])
    gate("4_full_spectrum",
         time_chain(tx4, rx4, K=64, target_samples=16_384_000_000)[0])

    # ---- config 5: dual 1000-tone lock-step + split ratio -------------
    from gpu_sdr_tpu.engine.dual import DualFused
    from gpu_sdr_tpu.engine.fused import FusedLoopback
    L5, K5 = 4_000_000, 16

    def fe_pair():
        tx = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=L5,
                           freq=bins1000, ampl=[0.001] * 1000,
                           wave_type=[WaveType.TONES] * 1000)
        rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=L5,
                           fft_tones=1000, pf_average=4, freq=bins1000,
                           wave_type=[WaveType.TONES] * 1000)
        return tx, rx

    txa, rxa = fe_pair()
    fls = FusedLoopback(txa, rxa, blocks_per_exec=K5)
    g, d, ys = fls._multi(*fls._init_states())
    hard_sync(ys)
    n_exec5 = max(1, 8_192_000_000 // (K5 * L5) // 4)
    single = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n_exec5):
            g, d, ys = fls._multi(g, d)
        hard_sync(ys)
        single = max(single, n_exec5 * K5 * L5 /
                     (time.perf_counter() - t0) / 1e6)
    pairs = [("A_RX2",) + fe_pair(), ("B_RX2",) + fe_pair()]
    dual = DualFused(pairs, blocks_per_exec=K5)
    states = [ch._init_states() for ch in dual.chains]
    states, outs = dual._multi_all(states)
    hard_sync(outs[0])
    per_fe = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n_exec5):
            states, outs = dual._multi_all(states)
        hard_sync(outs[0])
        hard_sync(outs[1])
        per_fe = max(per_fe, n_exec5 * K5 * L5 /
                     (time.perf_counter() - t0) / 1e6)
    gate("5_dual_1000tone_per_frontend", per_fe)
    split = per_fe / single
    ok = split >= SPLIT_BAND * RATIO_FLOOR
    if not ok and not record:
        failures.append("5_split_ratio")
    print(json.dumps({"config": "5_split_ratio",
                      "single_msps": round(single, 1),
                      "split": round(split, 3),
                      "band_min": round(SPLIT_BAND * RATIO_FLOOR, 3),
                      "recorded": SPLIT_BAND, "pass": ok}), flush=True)

    # ---- replay sub-paths (half the dispatch table; VERDICT r4 #3) ----
    rec1 = golden.tone_block([10_000_000], [0.5], rate, 0, 16_000_000)
    rxr1 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                         samples=1_024_000_000, decim=100, pf_average=4,
                         freq=[10_000_000], wave_type=[WaveType.DIRECT])
    dr1 = DeviceReplay(rxr1, rec1, blocks_per_exec=16, loop=True)
    assert dr1.path == "replay_kernel_t", dr1.path
    gate("replay_ddct_c1", time_replay(dr1))

    freqs8 = [int(f) for f in np.linspace(-40e6, 40e6, 8)]
    rec8 = golden.tone_block(freqs8, [0.1] * 8, rate, 0, 16_000_000)
    rxr8 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                         samples=1_024_000_000, decim=100, pf_average=4,
                         freq=freqs8, wave_type=[WaveType.DIRECT] * 8)
    dr8 = DeviceReplay(rxr8, rec8, blocks_per_exec=16, loop=True)
    assert dr8.path == "replay_kernel_t", dr8.path
    gate("replay_ddct_c8", time_replay(dr8))

    rng = np.random.default_rng(1)
    recc = (rng.standard_normal(16_000_000) +
            1j * rng.standard_normal(16_000_000)).astype(np.complex64)
    rxrc = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                         samples=1_024_000_000, freq=[-40_000_000],
                         chirp_f=[40_000_000], chirp_t=[1.0],
                         swipe_s=[5000], decim=1,
                         wave_type=[WaveType.CHIRP])
    drc = DeviceReplay(rxrc, recc, blocks_per_exec=16, loop=True)
    assert drc.path == "chirp_table", drc.path
    gate("replay_chirp_table", time_replay(drc))

    rxrp = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                         samples=1_024_000_000, fft_tones=1000,
                         pf_average=4, wave_type=[WaveType.NOISE])
    drp = DeviceReplay(rxrp, recc, blocks_per_exec=16, loop=True)
    assert drp.path == "channelizer_at", drp.path
    gate("replay_channelizer_at", time_replay(drp))

    # row-major (lane-padded) DIRECT replay at C=100 — the padding
    # measured +36% (tools/perf_replay_pad.py, round 5)
    rxr100 = AntennaParams(mode=AntMode.RX, rate=rate,
                           buffer_len=4_000_000, samples=1_024_000_000,
                           decim=100, pf_average=4, freq=freqs100,
                           wave_type=[WaveType.DIRECT] * 100)
    dr100 = DeviceReplay(rxr100, recc, blocks_per_exec=16, loop=True)
    assert dr100.path == "replay_kernel", dr100.path
    gate("replay_rowmajor_c100", time_replay(dr100))

    # ---- sharded chains at T=1 (round 5: the mesh dispatch must keep
    # riding the single-chip kernels; probes under tools/perf_sharded_*)
    import jax.numpy as jnp
    from gpu_sdr_tpu.parallel import make_mesh
    from gpu_sdr_tpu.parallel.fused_sharded import (ShardedFusedLoopback,
                                                    ShardedFusedVNA)
    from gpu_sdr_tpu.parallel.sharded_replay import ShardedDeviceReplay
    mesh1 = make_mesh((1, 1), ("time", "channels"))

    def time_exec(step, state, L, K, target=8_192_000_000):
        state, ys = step(state)
        hard_sync(ys)
        n_exec = max(1, int(target // (K * L)) // 4)
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(n_exec):
                state, ys = step(state)
            hard_sync(ys)
            dt = time.perf_counter() - t0
            best = max(best, n_exec * K * L / dt / 1e6)
        return best

    srs = ShardedDeviceReplay(rxrp, recc, mesh1, blocks_per_exec=16,
                              loop=True)
    assert srs.path == "channelizer_at", srs.path

    def step_sr(carry):
        st, idx = carry
        st, idx, ys = srs._multi(st, idx, srs._X)
        return (st, idx), ys

    gate("sharded_replay_channelizer_at",
         time_exec(step_sr, (srs._kernel_state_init(), jnp.int32(0)),
                   4_000_000, 16))

    Llb = 8_000_000
    txlb = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=Llb,
                         freq=bins1000, ampl=[0.001] * 1000,
                         wave_type=[WaveType.TONES] * 1000)
    rxlb = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=Llb,
                         fft_tones=1000, pf_average=4, freq=bins1000,
                         wave_type=[WaveType.TONES] * 1000)
    sflb = ShardedFusedLoopback(txlb, rxlb, mesh1, blocks_per_exec=8,
                                block_len=Llb)
    assert sflb.path == "channelizer_wavetable", sflb.path
    gate("sharded_loopback_channelizer",
         time_exec(sflb.run_exec, sflb.init_state(), Llb, 8))

    sfv = ShardedFusedVNA(tx2, rx2, mesh1, blocks_per_exec=32,
                          block_len=4_000_000)
    assert sfv.path == "chirp_table", sfv.path
    gate("sharded_vna_chirp_table",
         time_exec(sfv.run_exec, sfv.init_state(), 4_000_000, 32,
                   target=16_384_000_000))

    srk = ShardedDeviceReplay(rxr100, recc, mesh1, blocks_per_exec=16,
                              loop=True)
    assert srk.path == "replay_kernel", srk.path

    def step_srk(carry):
        st, idx = carry
        st, idx, ys = srk._multi(st, idx, srk._X)
        return (st, idx), ys

    gate("sharded_replay_kernel_c100",
         time_exec(step_srk, (srk._kernel_state_init(), jnp.int32(0)),
                   4_000_000, 16))

    if record:
        print(json.dumps({"record_ratios":
                          {k: round(v, 1)
                           for k, v in recorded_ratios.items()},
                          "split": round(split, 3)}), flush=True)
        return
    if failures:
        print(json.dumps({"regressions": failures}), flush=True)
        sys.exit(1)
    print(json.dumps({"regressions": []}), flush=True)


if __name__ == "__main__":
    main()
