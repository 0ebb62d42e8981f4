"""Long-stream phase-coherence evidence on real hardware.

Streams ~3 Gsamples of a 16-tone comb through the single-kernel
TONES->DIRECT chain (ops/pallas_chain.py) and checks that every channel's
end-of-stream mean sits at its tone amplitude with ~zero phase error —
the integer phase accumulators are exact, so phase error must NOT
accumulate across the stream (reference property: int-phase oscillators,
direct_demodulator_integer, cpp/kernels.cu:45-86).

Run:  nohup python tools/phase_coherence.py > log 2>&1 &
Prints one JSON line with the worst-channel amplitude and phase errors.
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
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_chain import TonesDirectChain

    rate, L, K = 100_000_000, 4_000_000, 32
    n_tones = 16
    freqs = tuple(int(f) for f in np.linspace(-40e6, 40e6, n_tones))
    dcfg = DirectDDCConfig(rate=rate, decim=100, pf_average=4,
                           freqs=freqs, phases=(0,) * n_tones)
    chain = TonesDirectChain(rate=rate, tx_freqs=freqs,
                             tx_ampls=(1.0 / n_tones,) * n_tones,
                             cfg=dcfg, block_len=L)
    assert chain.ok

    multi = jax.jit(lambda st: chain.multi_step(st, K))
    state = chain.init_state()
    state, y = multi(state)                      # compile + block 0..K-1
    jax.block_until_ready(y)
    n_exec = max(1, int(target_gsamples * 1e9) // (K * L))
    t0 = time.perf_counter()
    for _ in range(n_exec - 1):
        state, y = multi(state)
    jax.block_until_ready(y)
    dt = time.perf_counter() - t0
    tail = cplx.to_np(y)[-2000:, :]              # end-of-stream rows
    mean = tail.mean(axis=0)
    amp_err = float(np.abs(np.abs(mean) - 1.0 / n_tones).max())
    phase_err = float(np.abs(np.angle(mean)).max())
    print(json.dumps({
        "streamed_gsamples": round(n_exec * K * L / 1e9, 2),
        "msps": round((n_exec - 1) * K * L / dt / 1e6, 1) if n_exec > 1
        else None,
        "worst_amp_err": amp_err,
        "worst_phase_err_urad": round(phase_err * 1e6, 2),
        "mean_ch0": [round(float(mean[0].real), 7),
                     round(float(mean[0].imag), 9)],
    }))


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 3.0)
