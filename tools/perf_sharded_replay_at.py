"""A/B the round-5 SHARDED fused channelizer replay (dispatch row 4
sub-path channelizer_at) against the sharded scan path, on a 1-device
mesh on the real chip.

At T=1 the mesh path's work is identical to the single-chip forms, so
the A/B isolates what the fusion buys the MESH code path: the scan path
scans the sharded demodulator over dynamic_slice blocks (recording read
+ presum write + presum read + spectra write + scan stacking), while
channelizer_at reads the shard-local transposed recording inside the
fused kernel (recording read + spectra write, staged halos, zero
collectives).  Multi-shard (T>1) rates need a real slice; this pins the
per-shard number the prediction scales from.

Run: nohup python tools/perf_sharded_replay_at.py > logs/sharded_replay_at.log 2>&1 &
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


def time_multi(sr, init_state, target=8_192_000_000):
    import jax.numpy as jnp
    state = init_state()
    idx = jnp.int32(0)
    state, idx, ys = sr._multi(state, idx, sr._X)
    hard_sync(ys)
    K, L = sr.blocks_per_exec, sr.demod.plan.block_len
    n_exec = max(1, int(target // (K * L)) // 4)
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n_exec):
            state, idx, ys = sr._multi(state, idx, sr._X)
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
    from gpu_sdr_tpu.parallel import make_mesh
    from gpu_sdr_tpu.parallel.sharded_replay import ShardedDeviceReplay
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    out = lambda **kw: print(json.dumps(kw), flush=True)
    rng = np.random.default_rng(1)
    rec = (rng.standard_normal(16_000_000) +
           1j * rng.standard_normal(16_000_000)).astype(np.complex64)
    rx = AntennaParams(mode=AntMode.RX, rate=RATE, buffer_len=4_000_000,
                       samples=1_024_000_000, fft_tones=1000,
                       pf_average=4, wave_type=[WaveType.NOISE])
    mesh = make_mesh((1, 1), ("time", "channels"))

    def build(force_scan):
        if force_scan:
            orig = ShardedDeviceReplay._try_channelizer_replay
            ShardedDeviceReplay._try_channelizer_replay = \
                lambda self, L, n: None
            try:
                sr = ShardedDeviceReplay(rx, rec, mesh,
                                         blocks_per_exec=16, loop=True)
            finally:
                ShardedDeviceReplay._try_channelizer_replay = orig
        else:
            sr = ShardedDeviceReplay(rx, rec, mesh, blocks_per_exec=16,
                                     loop=True)
        return sr

    sr_new = build(False)
    sr_old = build(True)
    out(stage="paths", new=sr_new.path, old=sr_old.path)
    assert sr_new.path == "channelizer_at" and sr_old.path == "scan"

    # numeric cross-check before timing (one execution each)
    import jax.numpy as jnp
    from gpu_sdr_tpu.ops import cplx
    st_n = sr_new._kernel_state_init()
    _, _, ys_n = sr_new._multi(st_n, jnp.int32(0), sr_new._X)
    st_o = sr_old.demod.init_state()
    _, _, ys_o = sr_old._multi(st_o, jnp.int32(0), sr_old._X)
    a = cplx.to_np(ys_n).reshape(-1, 1000)
    b = cplx.to_np(ys_o).reshape(-1, 1000)
    err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)
    out(stage="parity", rel_err=float(err))
    assert err < 1e-3, err

    msps_new, _ = time_multi(sr_new, sr_new._kernel_state_init)
    out(stage="rate", path="channelizer_at_sharded", msps=round(msps_new))
    msps_old, _ = time_multi(sr_old, sr_old.demod.init_state)
    out(stage="rate", path="scan_sharded", msps=round(msps_old))
    # A/B/A: re-time the fused path to bound drift
    msps_new2, _ = time_multi(sr_new, sr_new._kernel_state_init)
    out(stage="rate", path="channelizer_at_sharded_again",
        msps=round(msps_new2))
    out(stage="summary", fused=round(max(msps_new, msps_new2)),
        scan=round(msps_old),
        speedup=round(max(msps_new, msps_new2) / msps_old, 2))


if __name__ == "__main__":
    main()
