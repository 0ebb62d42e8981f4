"""Chirp REPLAY path, table-oscillator vs in-kernel sincos, on the chip.

The replay lock-in previously recomputed the demod oscillator per sample
inside the kernel (pallas_chirp_lockin_at); the table form reads it from
a resident one-period wavetable (pallas_chirp_lockin_table with a
separate signal index) — the loopback form of the same trade measured
18.6 vs 40.6 Gsps (tools/perf_chirp_table.py).  This times the actual
DeviceReplay dispatch at the BASELINE config-2 shape: 100 Msps,
+-40 MHz, 5000-point sweep (ppt=20000), 4M blocks, K=32, 3-block
random recording (recording index wraps mod 3, oscillator mod 25:
exercises the diverging-index form).

Run: nohup python tools/perf_chirp_replay.py > /tmp/perf_chirp_replay.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.engine import replay as replay_mod
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    rate = 100_000_000
    L, K = 4_000_000, 32
    rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=L,
                       samples=40 * L, freq=[-40_000_000],
                       chirp_f=[40_000_000], chirp_t=[1.0],
                       swipe_s=[5000], decim=1,
                       wave_type=[WaveType.CHIRP])
    rng = np.random.default_rng(5)
    rec = (rng.standard_normal(3 * L) + 1j * rng.standard_normal(3 * L)
           ).astype(np.complex64)

    def hard_sync(ys):
        return float(np.asarray(jax.device_get(ys.re.reshape(-1)[0])))

    def timeit(name, dr, rounds=6):
        st = (dr._kernel_state_init(), jnp.int32(0))
        state, idx = st
        state, idx, ys = dr._multi(state, idx, dr._Xarg)
        hard_sync(ys)                         # warm-up + pipeline drain
        best = 0.0
        for _ in range(rounds):
            t0 = time.perf_counter()
            reps = 8                          # amortize round overhead
            for _ in range(reps):
                state, idx, ys = dr._multi(state, idx, dr._Xarg)
            hard_sync(ys)
            dt = time.perf_counter() - t0
            gsps = reps * K * L / dt / 1e9
            best = max(best, gsps)
            print(f"  {name}: {gsps:.2f} Gsps", flush=True)
        return best

    dr_new = replay_mod.DeviceReplay(rx, rec, blocks_per_exec=K, loop=True)
    assert dr_new._kernel_path[0] == "chirp_table", dr_new._kernel_path
    g_new = timeit("table", dr_new)
    del dr_new

    # force the in-kernel-sincos fallback by shrinking the table budget
    saved = replay_mod.DEVICE_REPLAY_MAX_BYTES
    replay_mod.DEVICE_REPLAY_MAX_BYTES = 1
    try:
        dr_old = replay_mod.DeviceReplay(rx, rec, blocks_per_exec=K,
                                         loop=True)
        assert dr_old._kernel_path[0] == "chirp", dr_old._kernel_path
        g_old = timeit("sincos", dr_old)
    finally:
        replay_mod.DEVICE_REPLAY_MAX_BYTES = saved

    print(json.dumps({"shape": "config2-replay 4Mx32",
                      "sincos_gsps": round(g_old, 2),
                      "table_gsps": round(g_new, 2),
                      "speedup": round(g_new / g_old, 2)}))


if __name__ == "__main__":
    main()
