"""Config-5 single-chip throughput (VERDICT r3 #9).

BASELINE config 5 is "1000-tone dual-channel readout ... with triggered
capture"; its multi-host sharded form is functional-only on this
one-chip rig (tests/test_config5_sharded_capture.py,
tests/test_multihost.py).  This measures the part that IS measurable
today: the dual-frontend 1000-tone readout chain on the real chip —
DualFused advancing both frontends' fused channelizer chains in
lock-step inside ONE jitted program (engine/dual.py), the single-chip
form of config 5's compute (the trigger is a host-side packet hook,
USRP_triggers semantics, applied in the drain path; it costs no device
time).  Reported as Msps/frontend alongside the single-frontend rate
from the same run (the split ratio).

Also runs a short triggered capture through the FULL public API
(run_measurement with an amplitude trigger on both frontends) as the
functional receipt that the measured chain is the config-5 path.

Run: nohup python tools/perf_config5_chip.py > logs/config5_chip.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def hard_sync(x):
    import jax
    import jax.numpy as jnp
    arr = x.re if hasattr(x, "re") else x
    return float(np.asarray(jax.device_get(jnp.ravel(arr)[0])))


def main():
    import jax
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.engine.dual import DualFused
    from gpu_sdr_tpu.engine.fused import FusedLoopback
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    rate = 100_000_000
    nfft = 1000
    bins1000 = [int(k * (rate // nfft)) for k in range(-500, 500)]
    L, K = 4_000_000, 16

    def fe_pair():
        tx = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=L,
                           freq=bins1000, ampl=[0.001] * nfft,
                           wave_type=[WaveType.TONES] * nfft)
        rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=L,
                           fft_tones=nfft, pf_average=4, freq=bins1000,
                           wave_type=[WaveType.TONES] * nfft)
        return tx, rx

    # single-frontend rate, same process (the split-ratio denominator)
    txa, rxa = fe_pair()
    fls = FusedLoopback(txa, rxa, blocks_per_exec=K)
    assert fls.path == "channelizer_wavetable", fls.path
    state = fls._init_states()
    g, d, ys = fls._multi(*state)
    hard_sync(ys)
    target = 8_192_000_000
    n_exec = max(1, target // (K * L))
    per_round = max(1, n_exec // 4)
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(per_round):
            g, d, ys = fls._multi(g, d)
        hard_sync(ys)
        dt = time.perf_counter() - t0
        best = max(best, per_round * K * L / dt / 1e6)
    single = best
    print(json.dumps({"stage": "single_1000tone", "msps": round(single, 1)}),
          flush=True)

    # dual lock-step
    pairs = [("A_RX2",) + fe_pair(), ("B_RX2",) + fe_pair()]
    dual = DualFused(pairs, blocks_per_exec=K)
    states = [ch._init_states() for ch in dual.chains]
    states, outs = dual._multi_all(states)
    hard_sync(outs[0])
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(per_round):
            states, outs = dual._multi_all(states)
        hard_sync(outs[0])
        hard_sync(outs[1])
        dt = time.perf_counter() - t0
        best = max(best, per_round * K * L / dt / 1e6)
    print(json.dumps({"stage": "dual_1000tone", "msps_per_frontend":
                      round(best, 1), "aggregate": round(2 * best, 1),
                      "split_ratio": round(best / single, 3)}),
          flush=True)

    # functional receipt: short triggered capture through the public API
    from gpu_sdr_tpu.client.triggers import deriv_test
    from gpu_sdr_tpu.measure import run_measurement
    from gpu_sdr_tpu.params import UsrpParams
    import os
    cmd = UsrpParams()
    for tx_name, rx_name in (("A_TXRX", "A_RX2"), ("B_TXRX", "B_RX2")):
        tx, rx = fe_pair()
        tx.samples = rx.samples = 8 * L
        setattr(cmd, tx_name, tx)
        setattr(cmd, rx_name, rx)
    os.makedirs("logs", exist_ok=True)
    t0 = time.perf_counter()
    fn = run_measurement(cmd, filename="logs/config5_capture",
                         trigger=deriv_test(threshold=1.1))
    from gpu_sdr_tpu import measure as measure_mod
    print(json.dumps({"stage": "api_triggered_capture", "h5": fn,
                      "dispatch": measure_mod.LAST_DISPATCH,
                      "wall_s": round(time.perf_counter() - t0, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
