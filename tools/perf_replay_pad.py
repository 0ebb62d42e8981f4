"""Does the lane-masked-write cap also bind the row-major DIRECT replay
kernel at sub-128 channel counts?  (Round-5 follow-up to the config-3
lane-padding win, tools/perf_c3_ladder.py.)

The row-major ReplayDDC writes (K*nb, C) tiles; at C=100 the write is
lane-masked exactly like the fold kernel's was.  Unlike the loopback,
the replay also READS the recording (a concurrent 8 B/sample stream), so
the write is not the only stream — this measures how much padding the
RX tone list to 128 recovers, back-to-back:

  replay_c100        production DeviceReplay on a 100-tone recording
  replay_c128_pad    the same recording demodulated at 128 rx tones
                     (100 real + 28 zero-amplitude-band dummies)

Run: nohup python tools/perf_replay_pad.py > logs/replay_pad.log 2>&1 &
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


def main():
    import jax
    import jax.numpy as jnp
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu import golden
    from gpu_sdr_tpu.engine.replay import DeviceReplay
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    out = lambda **kw: print(json.dumps(kw), flush=True)
    freqs100 = [int(f) for f in np.linspace(-45e6, 45e6, 100)]
    freqs128 = freqs100 + list(range(1, 29))
    rec = golden.tone_block(freqs100, [0.01] * 100, RATE, 0, 16_000_000)

    def time_replay(freqs, tag):
        rx = AntennaParams(mode=AntMode.RX, rate=RATE,
                           buffer_len=4_000_000, samples=1_024_000_000,
                           decim=100, pf_average=4, freq=freqs,
                           wave_type=[WaveType.DIRECT] * len(freqs))
        dr = DeviceReplay(rx, rec, blocks_per_exec=16, loop=True)
        out(stage=tag + "_path", path=dr.path)
        state = (dr._kernel_state_init() if dr._kernel_path is not None
                 else dr.demod.init_state())
        idx = jnp.int32(0)
        state, idx, ys = dr._multi(state, idx, dr._Xarg)
        hard_sync(ys)
        K, L = dr.blocks_per_exec, dr.demod.plan.block_len
        n_exec = max(1, 4_096_000_000 // (K * L))
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(n_exec):
                state, idx, ys = dr._multi(state, idx, dr._Xarg)
            hard_sync(ys)
            dt = time.perf_counter() - t0
            best = max(best, n_exec * K * L / dt / 1e6)
        out(stage=tag, msps=round(best, 1))
        return best

    a = time_replay(freqs100, "replay_c100")
    b = time_replay(freqs128, "replay_c128_pad")
    a2 = time_replay(freqs100, "replay_c100_again")
    out(stage="summary", gain=round(b / ((a + a2) / 2), 3))


if __name__ == "__main__":
    main()
