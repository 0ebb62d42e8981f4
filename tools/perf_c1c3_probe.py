"""Follow-ups from the per-config ladders (docs/05, 2026-08-21):

  * config 1 measured a ~20% raw-kernel -> API-chain gap (23.4 -> 18.8
    Gsps).  Bisect it in one process: raw multi_step / + reshape /
    + donation / the production fl._multi.
  * config 3's fold kernel streams ~200 KB per-stream blocks at R=800
    (below the >= 256-512 KB knee the copy ladder measured); rows
    ladder 400 / 800 / 1000 via the kernel's rows= override.

Run: nohup python tools/perf_c1c3_probe.py > logs/c1c3_probe.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

TARGET = 16_384_000_000


def hard_sync(x):
    import jax
    import jax.numpy as jnp
    arr = x.re if hasattr(x, "re") else x
    return float(np.asarray(jax.device_get(jnp.ravel(arr)[0])))


def time_steps(step, state0, samples_per_exec, rounds=4):
    state = step(state0)
    hard_sync(state[1])
    per_round = max(1, int(TARGET // samples_per_exec) // rounds)
    best = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(per_round):
            state = step(state[0])
        hard_sync(state[1])
        dt = time.perf_counter() - t0
        best = max(best, per_round * samples_per_exec / dt / 1e6)
    return best


def main():
    import jax
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.engine.fused import FusedLoopback
    from gpu_sdr_tpu.ops.cplx import C
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    out = lambda **kw: print(json.dumps(kw), flush=True)
    rate = 100_000_000

    # ---------------- config 1 gap bisect ------------------------------
    tx1 = AntennaParams(mode=AntMode.TX, rate=rate, buffer_len=4_000_000,
                        freq=[10_000_000], ampl=[1.0],
                        wave_type=[WaveType.TONES])
    rx1 = AntennaParams(mode=AntMode.RX, rate=rate, buffer_len=4_000_000,
                        decim=100, pf_average=4, freq=[10_000_000],
                        wave_type=[WaveType.DIRECT])
    fl1 = FusedLoopback(tx1, rx1, blocks_per_exec=64)
    rk = fl1._chain.rk
    L1, K1 = rk.L, rk.K
    rows = fl1.demod.plan.out_rows
    Cp = fl1.demod.n_channels
    X = rk._X

    @jax.jit
    def raw(st, Xre, Xim):
        st, y = rk.multi_step(st, X=C(Xre, Xim))
        return st, y

    msps = time_steps(lambda s: raw(s, X.re, X.im), rk.init_state(),
                      K1 * L1)
    out(probe="c1_raw", msps=round(msps, 1))

    @jax.jit
    def raw_reshape(st, Xre, Xim):
        st, y = rk.multi_step(st, X=C(Xre, Xim))
        return st, y.reshape(K1, rows, Cp)

    msps = time_steps(lambda s: raw_reshape(s, X.re, X.im),
                      rk.init_state(), K1 * L1)
    out(probe="c1_raw_reshape", msps=round(msps, 1))

    # the production form: recording rides the DONATED chain state
    chain = fl1._chain

    def _impl(gstate, dstate):
        gstate, y = chain.multi_step(gstate, K1)
        return gstate, dstate, y.reshape(K1, rows, Cp)

    for name, donate in (("c1_state_nodonate", ()),
                         ("c1_state_donate", (0,))):
        multi = jax.jit(_impl, donate_argnums=donate)

        def step(st):
            g, d, y = multi(st[0], st[1])
            return ((g, d), y)

        msps = time_steps(step, (chain.init_state(), ()), K1 * L1)
        out(probe=name, msps=round(msps, 1))

    # ---------------- config 3 rows ladder ------------------------------
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_chain import TonesDirectFoldKernel
    freqs100 = tuple(int(f) for f in np.linspace(-45e6, 45e6, 100))
    dcfg = DirectDDCConfig(rate=rate, decim=100, pf_average=4,
                           freqs=freqs100, phases=(0,) * 100)
    for R in (400, 800, 1000):
        ch = TonesDirectFoldKernel(rate=rate, tx_freqs=freqs100,
                                   tx_ampls=(0.01,) * 100, cfg=dcfg,
                                   block_len=4_000_000, rows=R)
        if not ch.ok:
            out(probe=f"c3_rows{R}", error="untileable")
            continue

        @jax.jit
        def c3(st):
            return ch.multi_step(st, 64)

        try:
            msps = time_steps(c3, ch.init_state(), 64 * 4_000_000)
            out(probe=f"c3_rows{R}", msps=round(msps, 1))
        except Exception as e:
            out(probe=f"c3_rows{R}",
                error=f"{type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()
