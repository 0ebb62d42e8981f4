"""A/B the round-5 SHARDED row-major replay kernel (dispatch row 4
sub-path replay_kernel) against the sharded scan path, on a 1-device
mesh on the real chip at the 100-channel DIRECT replay shape, with the
single-chip row-major kernel as the anchor.

At T=1 the mesh path's work is identical to the single-chip kernel
(same tiles, same staged-halo rows = the in-recording rows), so the A/B
isolates what the kernel buys the MESH code path over scanning the
sharded demodulator with dynamic_slice blocks.

Run: nohup python tools/perf_sharded_replay_kernel.py > logs/sharded_replay_kernel.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RATE = 100_000_000
L = 4_000_000
K = 16


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
    from gpu_sdr_tpu.engine.replay import DeviceReplay
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.parallel import make_mesh
    import gpu_sdr_tpu.parallel.sharded_replay as srm
    from gpu_sdr_tpu.parallel.sharded_replay import ShardedDeviceReplay
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    out = lambda **kw: print(json.dumps(kw), flush=True)
    rng = np.random.default_rng(1)
    rec = (rng.standard_normal(16_000_000) +
           1j * rng.standard_normal(16_000_000)).astype(np.complex64)
    freqs100 = [int(f) for f in np.linspace(-45e6, 45e6, 100)]
    rx = AntennaParams(mode=AntMode.RX, rate=RATE, buffer_len=L,
                       samples=1_024_000_000, decim=100, pf_average=4,
                       freq=freqs100, wave_type=[WaveType.DIRECT] * 100)
    mesh = make_mesh((1, 1), ("time", "channels"))

    sr_new = ShardedDeviceReplay(rx, rec, mesh, blocks_per_exec=K,
                                 loop=True)
    orig = srm.plan_sharded_replay_kernel
    srm.plan_sharded_replay_kernel = lambda *a, **k: False
    try:
        sr_old = ShardedDeviceReplay(rx, rec, mesh, blocks_per_exec=K,
                                     loop=True)
    finally:
        srm.plan_sharded_replay_kernel = orig
    out(stage="paths", new=sr_new.path, old=sr_old.path)
    assert sr_new.path == "replay_kernel" and sr_old.path == "scan"

    # numeric cross-check before timing (one execution each)
    import jax.numpy as jnp
    st_n = sr_new._kernel_state_init()
    _, _, ys_n = sr_new._multi(st_n, jnp.int32(0), sr_new._X)
    st_o = sr_old.demod.init_state()
    _, _, ys_o = sr_old._multi(st_o, jnp.int32(0), sr_old._X)
    a = cplx.to_np(ys_n)[:, :, :100].reshape(-1, 100)
    b = cplx.to_np(ys_o).reshape(-1, 100)
    err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)
    out(stage="parity", rel_err=float(err))
    assert err < 1e-3, err

    msps_new, _ = time_multi(sr_new, sr_new._kernel_state_init)
    out(stage="rate", path="replay_kernel_sharded", msps=round(msps_new))
    msps_old, _ = time_multi(sr_old, sr_old.demod.init_state)
    out(stage="rate", path="scan_sharded", msps=round(msps_old))

    # single-chip anchor: the row-major kernel through DeviceReplay
    dr = DeviceReplay(rx, rec, blocks_per_exec=K, loop=True)
    out(stage="single_chip_path", path=dr.path)

    def time_dr(target=8_192_000_000):
        state = dr._kernel_state_init()
        idx = jnp.int32(0)
        state, idx, ys = dr._multi(state, idx, dr._Xarg)
        hard_sync(ys)
        n_exec = max(1, int(target // (K * L)) // 4)
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(n_exec):
                state, idx, ys = dr._multi(state, idx, dr._Xarg)
            hard_sync(ys)
            dt = time.perf_counter() - t0
            best = max(best, n_exec * K * L / dt / 1e6)
        return best

    msps_1 = time_dr()
    out(stage="rate", path="replay_kernel_single", msps=round(msps_1))
    msps_new2, _ = time_multi(sr_new, sr_new._kernel_state_init)
    out(stage="rate", path="replay_kernel_sharded_again",
        msps=round(msps_new2))
    fused = max(msps_new, msps_new2)
    out(stage="summary", kernel_sharded=round(fused),
        scan_sharded=round(msps_old), single_chip=round(msps_1),
        speedup=round(fused / msps_old, 2),
        vs_single=round(fused / msps_1, 3))


if __name__ == "__main__":
    main()
