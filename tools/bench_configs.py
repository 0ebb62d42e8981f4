"""Per-config throughput benchmarks (BASELINE.json configs 1-4) on one chip.

Each config builds its production fused loopback chain (engine/fused.py:
TX generator -> demodulator, lax.scan K blocks per execution) through the
public params API, and times the compiled chain device-resident.  Prints
one JSON line per config.  Config 5 (multi-host sharded + triggered
capture) is functional-only on this single-chip rig — see
tests/test_config5_sharded_capture.py and parallel/fused_sharded.py.

Run:  nohup python tools/bench_configs.py > log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def time_chain(tx, rx, K, target_samples=16_384_000_000):
    import jax
    from gpu_sdr_tpu.engine.fused import FusedLoopback
    fl = FusedLoopback(tx, rx, blocks_per_exec=K)
    B = fl.demod.plan.block_len

    def hard_sync(arr):
        # block_until_ready alone can ack early through this rig's relay
        # (tools/rig_probe.py); force a real 4-byte fetch
        return float(np.asarray(jax.device_get(arr.re.reshape(-1)[0])))

    gstate, dstate = fl._init_states()
    t0 = time.perf_counter()
    gstate, dstate, ys = fl._multi(gstate, dstate)
    jax.block_until_ready(ys)
    hard_sync(ys)
    compile_s = time.perf_counter() - t0
    n_exec = max(1, target_samples // (K * B))
    per_round = max(1, n_exec // 4)
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(per_round):
            gstate, dstate, ys = fl._multi(gstate, dstate)
        # hard_sync ONLY: a per-round block_until_ready on the large
        # output costs ~20% on this relay (measured A/B/A,
        # tools/perf_bur_cost.py — every pre-round-4 time_chain number
        # was understated by it); the 4-byte fetch is the complete
        # barrier (the buffer cannot materialize before the execution
        # finishes, and prior executions finish before the last)
        hard_sync(ys)
        dt = time.perf_counter() - t0
        best = max(best, per_round * K * B / dt / 1e6)
    return best, B, compile_s


def main():
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    rate = 100_000_000
    results = {}

    # config 1: single-tone DDC + polyphase FIR decimate-by-100
    tx1 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=[10_000_000], ampl=[1.0],
                        wave_type=[WaveType.TONES])
    rx1 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=100, pf_average=4, freq=[10_000_000],
                        wave_type=[WaveType.DIRECT])
    def emit(name, r):
        msps, B, compile_s = r
        results[name] = r
        print(json.dumps({"config": name, "value": round(msps, 1),
                          "unit": "Msamples/s/chip",
                          "vs_baseline": round(msps / 100.0, 2),
                          "block_len": B,
                          "compile_s": round(compile_s, 1)}), flush=True)

    emit("1_single_tone_ddc_fir", time_chain(tx1, rx1, K=64))

    # config 2: swept VNA chirp (server-side lock-in, ppt=20000)
    tx2 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=[-40_000_000], chirp_f=[40_000_000],
                        chirp_t=[1.0], swipe_s=[5000], ampl=[1.0],
                        wave_type=[WaveType.CHIRP])
    rx2 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=1, freq=[-40_000_000], chirp_f=[40_000_000],
                        chirp_t=[1.0], swipe_s=[5000],
                        wave_type=[WaveType.CHIRP])
    emit("2_vna_chirp_lockin", time_chain(tx2, rx2, K=32))

    # config 3: 100-tone multiplexed readout (comb TX + fused DDC+FIR)
    freqs100 = [int(f) for f in np.linspace(-45e6, 45e6, 100)]
    tx3 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=freqs100, ampl=[0.01] * 100,
                        wave_type=[WaveType.TONES] * 100)
    rx3 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=100, pf_average=4, freq=freqs100,
                        wave_type=[WaveType.DIRECT] * 100)
    emit("3_100tone_readout", time_chain(tx3, rx3, K=64))

    # config 4: full-spectrum 1000-bin channelizer (NOISE mode)
    bins1000 = [int(k * (rate // 1000)) for k in range(-500, 500)]
    tx4 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=6_000_000,
                        freq=bins1000, ampl=[0.001] * 1000,
                        wave_type=[WaveType.TONES] * 1000)
    rx4 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=6_000_000,
                        fft_tones=1000, pf_average=4,
                        wave_type=[WaveType.NOISE])
    emit("4_full_spectrum", time_chain(tx4, rx4, K=64))


if __name__ == "__main__":
    main()
