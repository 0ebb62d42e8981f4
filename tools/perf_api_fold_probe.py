"""Reconcile config-3 API throughput vs the raw fold chain: same
process, back-to-back — (a) FusedLoopback._multi as dispatched (donating
jit of the chain), (b) the same _multi_impl without donation, (c) the raw
jitted chain.multi_step.  Run: nohup python tools/perf_api_fold_probe.py &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.engine.fused import FusedLoopback
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    rate, K = 100_000_000, 64
    freqs100 = [int(f) for f in np.linspace(-45e6, 45e6, 100)]
    tx = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                       freq=freqs100, ampl=[0.01] * 100,
                       wave_type=[WaveType.TONES] * 100)
    rx = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                       decim=100, pf_average=4, freq=freqs100,
                       wave_type=[WaveType.DIRECT] * 100)
    fl = FusedLoopback(tx, rx, blocks_per_exec=K)
    B = fl.demod.plan.block_len
    chain = fl._chain
    print(json.dumps({"chain": type(chain).__name__}), flush=True)

    def hard_sync(arr):
        return float(np.asarray(jax.device_get(arr.re.reshape(-1)[0])))

    def bench(name, call, init):
        st = init()
        t0 = time.perf_counter()
        st, y = call(st)
        jax.block_until_ready(y)
        hard_sync(y)
        compile_s = time.perf_counter() - t0
        n_exec = max(1, 16_384_000_000 // (K * B))
        per_round = max(1, n_exec // 4)
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(per_round):
                st, y = call(st)
            jax.block_until_ready(y)
            hard_sync(y)
            dt = time.perf_counter() - t0
            best = max(best, per_round * K * B / dt / 1e6)
        print(json.dumps({"variant": name, "msps": round(best, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)

    # (a) as dispatched: donating jit wrapping the chain
    def call_api(st):
        g, d = st
        g, d, y = fl._multi(g, d)
        return (g, d), y
    bench("api_donating", call_api, fl._init_states)

    # (b) same body, no donation
    rows = fl.demod.plan.out_rows
    Cp = fl.demod.n_channels

    def impl(g, d):
        g, y = chain.multi_step(g, K)
        return g, d, y.reshape(K, rows, Cp)
    nod = jax.jit(impl)

    def call_nod(st):
        g, d = st
        g, d, y = nod(g, d)
        return (g, d), y
    bench("api_no_donate", call_nod, fl._init_states)

    # (c) raw chain
    raw = jax.jit(lambda st: chain.multi_step(st, K))
    bench("raw_chain", lambda st: raw(st), chain.init_state)


if __name__ == "__main__":
    main()
