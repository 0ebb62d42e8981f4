"""Config-5 dual working-set probe (VERDICT r4 #4).

The dual 1000-tone lock-step split is 0.431 vs the 0.506 perfect split
DualFused achieves on config-1 chains; the named cause is the doubled
stacked-spectra working set (docs/05_performance.md).  This measures the
recovery levers back-to-back in one process:

  single_K16      single-frontend chain (the split denominator)
  dual_K16        production DualFused (baseline split)
  dual_K8/K4      halved/quartered blocks_per_exec: smaller stacked
                  outputs per execution
  dual_serial_K16 both chains in ONE program but with a data dependency
                  forcing B after A (staggered scheduling: single-chain
                  working set at any instant, zero overlap)

Run: nohup python tools/perf_c5_probe.py > logs/c5_probe.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RATE = 100_000_000
L = 4_000_000
TARGET = 8_192_000_000


def hard_sync(x):
    import jax
    import jax.numpy as jnp
    arr = x.re if hasattr(x, "re") else x
    return float(np.asarray(jax.device_get(jnp.ravel(arr)[0])))


def main():
    import jax
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.engine.dual import DualFused
    from gpu_sdr_tpu.engine.fused import FusedLoopback
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    nfft = 1000
    bins1000 = [int(k * (RATE // nfft)) for k in range(-500, 500)]

    def fe_pair():
        tx = AntennaParams(mode=AntMode.TX, rate=RATE, buffer_len=L,
                           freq=bins1000, ampl=[0.001] * nfft,
                           wave_type=[WaveType.TONES] * nfft)
        rx = AntennaParams(mode=AntMode.RX, rate=RATE, buffer_len=L,
                           fft_tones=nfft, pf_average=4, freq=bins1000,
                           wave_type=[WaveType.TONES] * nfft)
        return tx, rx

    def out(**kw):
        print(json.dumps(kw), flush=True)

    def time_fn(step, state, K):
        state = step(state)
        hard_sync(state[-1])
        n_exec = max(1, TARGET // (K * L) // 4)
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(n_exec):
                state = step(state)
            hard_sync(state[-1])
            dt = time.perf_counter() - t0
            best = max(best, n_exec * K * L / dt / 1e6)
        return best

    # ---- single (denominator) ----------------------------------------
    txa, rxa = fe_pair()
    fls = FusedLoopback(txa, rxa, blocks_per_exec=16)

    def single_step(st):
        g, d, _ = st
        g, d, ys = fls._multi(g, d)
        return (g, d, ys)

    g0, d0 = fls._init_states()
    single = time_fn(single_step, (g0, d0, None), 16)
    out(stage="single_K16", msps=round(single, 1))

    # ---- dual at K in {16, 8, 4} -------------------------------------
    duals = {}
    for K in (16, 8, 4):
        pairs = [("A_RX2",) + fe_pair(), ("B_RX2",) + fe_pair()]
        dual = DualFused(pairs, blocks_per_exec=K)

        def dual_step(st, dual=dual):
            states, _ = st
            states, outs = dual._multi_all(states)
            return (states, outs[1])

        st0 = [ch._init_states() for ch in dual.chains]
        best = time_fn(dual_step, (st0, None), K)
        duals[K] = best
        out(stage=f"dual_K{K}", msps_per_frontend=round(best, 1),
            split=round(best / single, 3))

    # ---- serialized dual (staggered scheduling) ----------------------
    pa = fe_pair()
    pb = fe_pair()
    cha = FusedLoopback(*pa, blocks_per_exec=16)
    chb = FusedLoopback(*pb, blocks_per_exec=16)
    K = 16
    chain_a, chain_b = cha._chain, chb._chain

    @jax.jit
    def serial_impl(sa, sb):
        sa, ya = chain_a.multi_step(sa, K)
        # force B strictly after A: B's state depends on A's output
        eps = ya.re.reshape(-1)[0] * jax.numpy.float32(0.0)
        sb = jax.tree.map(lambda t: t + eps.astype(t.dtype), sb)
        sb, yb = chain_b.multi_step(sb, K)
        return sa, sb, yb

    def serial_step(st):
        sa, sb, _ = st
        sa, sb, yb = serial_impl(sa, sb)
        return (sa, sb, yb)

    best = time_fn(serial_step,
                   (chain_a.init_state(), chain_b.init_state(), None), K)
    out(stage="dual_serial_K16", msps_per_frontend=round(best, 1),
        split=round(best / single, 3))


if __name__ == "__main__":
    main()
