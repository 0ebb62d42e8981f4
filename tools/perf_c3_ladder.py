"""Config-3 per-tile dispatch-cost ladder (VERDICT r4 #1).

The factored fold kernel streams ONLY its output, yet config 3 measures
18.5 Gsps = 148 GB/s at the 8 B/sample model vs the ~270 GB/s measured
per-stream DMA cap — the one chain below every wall, with its binding
resource ("output write + per-tile dispatch") asserted, not measured.
This ladder decomposes it, all back-to-back in one process:

  anchor     the day's XLA elementwise ceiling
  writeonly  a kernel with the production grid/tile/output geometry that
             ONLY writes (broadcast of the per-tile rotation row): the
             true output-write wall, at the production C'=100 lane count
             AND at C'=128 (is the sub-128 lane-masked write the cost?)
  R ladder   the production factored kernel at tile heights 200..4000 at
             fixed total work: per-tile dispatch cost vs tile size
  rotg       the rotate-G2 variant (P1 presplit host-side, per-tile VPU
             work moved off the (R, C_t) operand — ops/pallas_chain.py
             _fold_rotg_kernel): is in-kernel VPU serialization the gap?
  K ladder   per-execution overhead share
  Cp=128     the full production kernel at a lane-aligned channel count

Run: nohup python tools/perf_c3_ladder.py > logs/c3_ladder.log 2>&1 &
"""

import functools
import json
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")

RATE = 100_000_000
L = 4_000_000
TARGET = 16_384_000_000


def hard_sync(arr):
    import jax
    import jax.numpy as jnp
    x = arr.re if hasattr(arr, "re") else arr
    return float(np.asarray(jax.device_get(jnp.ravel(x)[0])))


def time_steps(step, state0, samples_per_exec, rounds=4):
    state = step(state0)
    hard_sync(state[1])
    n_exec = max(1, int(TARGET // samples_per_exec))
    per_round = max(1, n_exec // rounds)
    best = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(per_round):
            state = step(state[0])
        hard_sync(state[1])
        dt = time.perf_counter() - t0
        best = max(best, per_round * samples_per_exec / dt / 1e6)
    return best


def out(**kw):
    print(json.dumps(kw), flush=True)


def make_chain(n_tones, R=None, rotg=False):
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_chain import TonesDirectFoldKernel
    freqs = tuple(int(f) for f in np.linspace(-45e6, 45e6, n_tones))
    dcfg = DirectDDCConfig(rate=RATE, decim=100, pf_average=4,
                           freqs=freqs, phases=(0,) * n_tones)
    ch = TonesDirectFoldKernel(rate=RATE, tx_freqs=freqs,
                               tx_ampls=(1.0 / n_tones,) * n_tones,
                               cfg=dcfg, block_len=L, rows=R, rotg=rotg)
    assert ch.ok, (n_tones, R)
    return ch


def _writeonly_kernel(R, qdr_ref, qdi_ref, yr_ref, yi_ref):
    import jax.numpy as jnp
    Cp = yr_ref.shape[1]
    yr_ref[:] = jnp.broadcast_to(qdr_ref[0:1], (R, Cp))
    yi_ref[:] = jnp.broadcast_to(qdi_ref[0:1], (R, Cp))


def run_writeonly(ch, K):
    """Production-geometry write-only kernel: same grid, tile and output
    shapes as the factored fold, but the body is one broadcast store —
    the pure output-write wall.  The rotation rows advance with the
    carried phase state, so no two executions are identical."""
    import jax
    import jax.experimental.pallas as pl
    import jax.numpy as jnp
    R, Cp = ch.R, ch.Cp

    def impl(st):
        st, crots, qrots = ch.block_rotations_factored(st, K)
        n_tiles = qrots.re.shape[0] // 8
        kern = functools.partial(_writeonly_kernel, R)
        y_re, y_im = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((8, Cp), lambda r: (r, 0)),
                      pl.BlockSpec((8, Cp), lambda r: (r, 0))],
            out_specs=(pl.BlockSpec((R, Cp), lambda r: (r, 0)),
                       pl.BlockSpec((R, Cp), lambda r: (r, 0))),
            out_shape=(jax.ShapeDtypeStruct((n_tiles * R, Cp), jnp.float32),
                       jax.ShapeDtypeStruct((n_tiles * R, Cp), jnp.float32)),
        )(qrots.re, qrots.im)
        return st, y_re
    return jax.jit(impl)


def main():
    import jax
    import jax.numpy as jnp
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()

    # ---- anchor -------------------------------------------------------
    n_el = 64 * 1024 * 1024
    u0 = jax.random.normal(jax.random.PRNGKey(0), (n_el,), jnp.float32)
    v0 = jax.random.normal(jax.random.PRNGKey(1), (n_el,), jnp.float32)
    REP = 48

    @jax.jit
    def xla_sweep(u, v):
        def body(k, uu):
            return uu * (jnp.float32(1.0)
                         + jnp.float32(1e-12) * uu[0]) + v
        return jax.lax.fori_loop(0, REP, body, u)

    u = xla_sweep(u0, v0)
    hard_sync(u)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        u = xla_sweep(u, v0)
        hard_sync(u)
        best = min(best, time.perf_counter() - t0)
    out(stage="anchor_xla_axpy",
        gbps=round(REP * 3 * 4 * n_el / best / 1e9, 1))

    def stage(name, fn):
        try:
            fn()
        except Exception as e:
            out(stage=name, error=f"{type(e).__name__}: {e}")
            traceback.print_exc()

    # ---- write-only walls --------------------------------------------
    def writeonly(n_tones, R, K=64):
        ch = make_chain(n_tones, R=R)
        step = run_writeonly(ch, K)
        msps = time_steps(step, ch.init_state(), K * L)
        # bytes/sample at the OUTPUT geometry: nb*Cp*8/L for the logical
        # lanes, nb*Cpad*8/L for the padded physical tile
        nb = ch.nb
        bl = nb * ch.Cp * 8 / L
        bp = nb * (-(-ch.Cp // 128) * 128) * 8 / L
        out(stage="writeonly", Cp=ch.Cp, R=R, K=K, msps=round(msps, 1),
            gbps_logical=round(msps * bl / 1e3, 1),
            gbps_padded=round(msps * bp / 1e3, 1))

    for nt, R in ((100, 1000), (128, 1000), (100, 200), (100, 4000)):
        stage(f"writeonly_{nt}_{R}", lambda nt=nt, R=R: writeonly(nt, R))

    # ---- production factored fold: R ladder ---------------------------
    def fold(n_tones, R, K=64, rotg=False):
        ch = make_chain(n_tones, R=R, rotg=rotg)

        @jax.jit
        def step(st):
            return ch.multi_step(st, K)

        msps = time_steps(step, ch.init_state(), K * L)
        out(stage="fold_rotg" if rotg else "fold", Cp=ch.Cp, R=R, K=K,
            msps=round(msps, 1),
            gbps_at_8=round(msps * 8 / 1e3, 1))

    for R in (200, 1000, 2000, 4000):
        stage(f"fold_{R}", lambda R=R: fold(100, R))

    # ---- rotg variant -------------------------------------------------
    for R in (1000, 2000):
        stage(f"rotg_{R}", lambda R=R: fold(100, R, rotg=True))

    # ---- K ladder at R=1000 ------------------------------------------
    stage("fold_K16", lambda: fold(100, 1000, K=16))

    # ---- lane-aligned channel count -----------------------------------
    stage("fold_128t", lambda: fold(128, 1000))
    stage("rotg_128t", lambda: fold(128, 1000, rotg=True))


if __name__ == "__main__":
    main()
