"""Long-stream phase-coherence evidence for the transposed replay
kernel (ops/pallas_replay.ReplayDDCT) on real hardware.

Streams ~3 Gsamples of a periodic 8-tone comb loopback through the
public FusedLoopback dispatch (which routes C <= 8 periodic combs onto
ReplayDDCT) and checks every channel's end-of-stream mean sits at its
tone amplitude with ~zero phase error — the recording index and the
output-rotation phase accumulators are exact integers, so phase error
must NOT accumulate across loop seams (reference property: int-phase
oscillators, cpp/kernels.cu:45-86; loop seam = the reference's sw_loop
requeueing, cpp/USRP_hardware_manager.cpp:1331-1395).

Run:  nohup python tools/phase_coherence_replay.py > log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(target_gsamples: float = 3.0):
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    import jax
    from gpu_sdr_tpu.engine.fused import FusedLoopback, \
        _ReplayLoopbackChain
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.pallas_replay import ReplayDDCT
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    rate, L, K = 100_000_000, 4_000_000, 32
    n_tones = 8
    # periodic comb: all tones multiples of rate/1000 -> period 1000
    freqs = [int(k * (rate // 1000)) for k in
             (-400, -250, -120, -30, 40, 160, 280, 410)]
    amp = 1.0 / n_tones
    tx = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=L,
                       freq=freqs, ampl=[amp] * n_tones,
                       wave_type=[WaveType.TONES] * n_tones)
    rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=L,
                       decim=100, pf_average=4, freq=freqs,
                       wave_type=[WaveType.DIRECT] * n_tones)
    fl = FusedLoopback(tx, rx, blocks_per_exec=K)
    assert isinstance(fl._chain, _ReplayLoopbackChain) and \
        isinstance(fl._chain.rk, ReplayDDCT), type(fl._chain)

    def hard_sync(y):
        # block_until_ready can ack early through this rig's relay;
        # end every timed region with a real 4-byte fetch (CLAUDE.md)
        return float(np.asarray(jax.device_get(y.re.reshape(-1)[0])))

    gstate, dstate = fl._init_states()
    gstate, dstate, y = fl._multi(gstate, dstate)
    jax.block_until_ready(y)
    hard_sync(y)
    n_exec = max(1, int(target_gsamples * 1e9) // (K * L))
    t0 = time.perf_counter()
    for _ in range(n_exec - 1):
        gstate, dstate, y = fl._multi(gstate, dstate)
    jax.block_until_ready(y)
    hard_sync(y)
    dt = time.perf_counter() - t0
    # y is (K, rows, C) stacked blocks; take the last block's tail rows
    tail = cplx.to_np(cplx.C(y.re[-1], y.im[-1]))[-2000:, :]
    mean = tail.mean(axis=0)
    amp_err = float(np.abs(np.abs(mean) - amp).max())
    phase_err = float(np.abs(np.angle(mean)).max())
    print(json.dumps({
        "streamed_gsamples": round(n_exec * K * L / 1e9, 2),
        "msps": round((n_exec - 1) * K * L / dt / 1e6, 1) if n_exec > 1
        else None,
        "worst_amp_err": amp_err,
        "worst_phase_err_urad": round(phase_err * 1e6, 2),
    }))


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 3.0)
