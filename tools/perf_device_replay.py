"""Throughput of HBM-resident replay (engine/replay.py) on the chip:
BASELINE config 1 driven from a recorded stream instead of loopback.

Run:  nohup python tools/perf_device_replay.py > log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")




def _time_replay(dr, label):
    import jax
    import jax.numpy as jnp
    state = (dr._kernel_state_init() if dr._kernel_path is not None
             else dr.demod.init_state())
    idx = jnp.int32(0)

    def hard_sync(arr):
        # fetch-sync: block_until_ready can ack early through the relay
        return float(np.asarray(jax.device_get(arr.re.reshape(-1)[0])))

    state, idx, ys = dr._multi(state, idx, dr._Xarg)   # compile + warmup
    jax.block_until_ready(ys)
    hard_sync(ys)
    K, L = dr.blocks_per_exec, dr.demod.plan.block_len
    n_exec = 128
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n_exec):
            state, idx, ys = dr._multi(state, idx, dr._Xarg)
        # hard_sync ONLY: a per-round block_until_ready on the large
        # output costs ~20% through this relay (tools/perf_bur_cost.py)
        hard_sync(ys)
        dt = time.perf_counter() - t0
        best = max(best, n_exec * K * L / dt / 1e6)
    print(json.dumps({"variant": label, "Msps_best": round(best, 1),
                      "kernel_path": dr._kernel_path is not None}),
          flush=True)
    return ys


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    import jax
    from gpu_sdr_tpu import golden
    from gpu_sdr_tpu.engine.replay import DeviceReplay
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    rate = 100_000_000
    rec_samples = 16_000_000            # 128 MB recording in HBM
    f0 = 10_000_000
    rec = golden.tone_block([f0], [0.5], rate, 0, rec_samples)

    rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                       samples=1_024_000_000, decim=100, pf_average=4,
                       freq=[f0], wave_type=[WaveType.DIRECT])
    dr = DeviceReplay(rx, rec, blocks_per_exec=16, loop=True)
    ys = _time_replay(dr, "device_replay_config1")
    print(json.dumps({"mean_amp_check": round(float(
        np.abs(np.asarray(ys.re)[-1] +
               1j * np.asarray(ys.im)[-1]).mean()), 4)}), flush=True)


def main_pfb():
    """Full-spectrum (config-4 style) replay from a recording."""
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu import golden
    from gpu_sdr_tpu.engine.replay import DeviceReplay
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    rate = 100_000_000
    rec_samples = 16_000_000
    rng = np.random.default_rng(0)
    rec = (rng.standard_normal(rec_samples) +
           1j * rng.standard_normal(rec_samples)).astype(np.complex64)
    rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                       samples=1_024_000_000, fft_tones=1000,
                       pf_average=4, wave_type=[WaveType.NOISE])
    dr = DeviceReplay(rx, rec, blocks_per_exec=16, loop=True)
    _time_replay(dr, "device_replay_config4_fullspec")


def main_chirp():
    """VNA (chirp lock-in) replay from a recording, config-2 shape."""
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu.engine.replay import DeviceReplay
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    rate = 100_000_000
    rec_samples = 16_000_000
    rng = np.random.default_rng(1)
    rec = (rng.standard_normal(rec_samples) +
           1j * rng.standard_normal(rec_samples)).astype(np.complex64)
    rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                       samples=1_024_000_000, freq=[-40_000_000],
                       chirp_f=[40_000_000], chirp_t=[1.0],
                       swipe_s=[5000], decim=1,
                       wave_type=[WaveType.CHIRP])
    dr = DeviceReplay(rx, rec, blocks_per_exec=16, loop=True)
    _time_replay(dr, "device_replay_config2_vna")


if __name__ == "__main__":
    main()
    main_pfb()
    main_chirp()
