"""A/B the round-5 fused channelizer replay (channelizer_at) against the
presum + XLA-DFT path (pfb_at) at the config-4 replay shape.

pfb_at pays recording read + presum write + presum read + spectra write
+ select (48 B/sample); channelizer_at removes the presum round trip
(32 B/sample) by reading the transposed resident recording inside the
fused kernel via scalar-prefetched block indices.

Run: nohup python tools/perf_channelizer_at.py > logs/channelizer_at.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RATE = 100_000_000


def hard_sync(x):
    import jax
    import jax.numpy as jnp
    arr = x.re if hasattr(x, "re") else x
    return float(np.asarray(jax.device_get(jnp.ravel(arr)[0])))


def time_replay(dr, target=8_192_000_000):
    import jax.numpy as jnp
    state = dr._kernel_state_init()
    idx = jnp.int32(0)
    state, idx, ys = dr._multi(state, idx, dr._Xarg)
    hard_sync(ys)
    K, L = dr.blocks_per_exec, dr.demod.plan.block_len
    n_exec = max(1, int(target // (K * L)) // 4)
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n_exec):
            state, idx, ys = dr._multi(state, idx, dr._Xarg)
        hard_sync(ys)
        dt = time.perf_counter() - t0
        best = max(best, n_exec * K * L / dt / 1e6)
    return best, ys


def main():
    import jax
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.engine.replay import DeviceReplay
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    out = lambda **kw: print(json.dumps(kw), flush=True)
    rng = np.random.default_rng(1)
    rec = (rng.standard_normal(16_000_000) +
           1j * rng.standard_normal(16_000_000)).astype(np.complex64)
    rx = AntennaParams(mode=AntMode.RX, rate=RATE, buffer_len=4_000_000,
                       samples=1_024_000_000, fft_tones=1000,
                       pf_average=4, wave_type=[WaveType.NOISE])

    def build(force_pfb):
        if force_pfb:
            orig = DeviceReplay._try_channelizer_replay
            DeviceReplay._try_channelizer_replay = lambda self, L, n: None
            try:
                dr = DeviceReplay(rx, rec, blocks_per_exec=16, loop=True)
            finally:
                DeviceReplay._try_channelizer_replay = orig
        else:
            dr = DeviceReplay(rx, rec, blocks_per_exec=16, loop=True)
        return dr

    dr_new = build(False)
    dr_old = build(True)
    out(stage="paths", new=dr_new.path, old=dr_old.path)
    assert dr_new.path == "channelizer_at" and dr_old.path == "pfb_at"

    results = {}
    ys_ref = {}
    for tag, dr in (("pfb_at", dr_old), ("channelizer_at", dr_new),
                    ("pfb_at", dr_old), ("channelizer_at", dr_new)):
        msps, ys = time_replay(dr)
        results.setdefault(tag, []).append(msps)
        ys_ref[tag] = ys
        out(stage=tag, msps=round(msps, 1))
    a = np.asarray(jax.device_get(ys_ref["pfb_at"].re))[-1, :64, :]
    b = np.asarray(jax.device_get(ys_ref["channelizer_at"].re))[-1, :64, :]
    snr = 10 * np.log10(np.sum(a * a) / max(np.sum((a - b) ** 2), 1e-30))
    out(stage="parity_snr_db", snr=round(float(snr), 1))
    best_old = max(results["pfb_at"])
    best_new = max(results["channelizer_at"])
    out(stage="summary", gain=round(best_new / best_old, 3),
        old=round(best_old, 1), new=round(best_new, 1))


if __name__ == "__main__":
    main()
