"""Ladder 3b: is the config-1 replay fetch slow because its tile's LANE
dimension is ragged?  (1, M, RT) blocks with RT = 2128 = 16.625 x 128
measured 81-103 GB/s for the 2-stream fetch (ladder 3); probe the same
pattern at lane-aligned RT.

Run: nohup python tools/perf_pallas_bw3b.py > logs/pallas_bw3b_r4.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

SMOKE = bool(int(os.environ.get("PALLAS_BW_SMOKE", "0")))
R_CALLS = 2 if SMOKE else 24
ROUNDS = 1 if SMOKE else 4


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()

    interpret = jax.default_backend() not in ("tpu", "axon")
    CpP = 8

    def hard_sync(x):
        return float(np.asarray(jax.device_get(jnp.ravel(x)[0])))

    def run_variant(name, step, nbytes, *args):
        @jax.jit
        def sweep(acc, *a):
            def body(k, acc):
                c = jnp.float32(1.0) + jnp.float32(1e-12) * acc \
                    + jnp.float32(1e-9) * k
                return acc + step(c, *a)
            return jax.lax.fori_loop(0, R_CALLS, body, acc)

        try:
            acc = sweep(jnp.float32(0), *args)
            hard_sync(acc)
            best = float("inf")
            for _ in range(ROUNDS):
                t0 = time.perf_counter()
                acc = sweep(acc, *args)
                hard_sync(acc)
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({"variant": name,
                              "gbps": round(R_CALLS * nbytes / best / 1e9,
                                            1)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"[:250]}),
                  flush=True)

    def make(M, RT, NT):
        xr = jax.random.normal(jax.random.PRNGKey(2), (NT, M, RT),
                               jnp.float32) * 1e-6
        xi = jax.random.normal(jax.random.PRNGKey(3), (NT, M, RT),
                               jnp.float32) * 1e-6
        W = min(RT, 2000)

        def kern(c_ref, xr_ref, xi_ref, or_ref, oi_ref):
            a = xr_ref[0] * c_ref[0]
            b = xi_ref[0]
            or_ref[0] = jnp.broadcast_to(
                jnp.sum(a[:, :W], axis=0, keepdims=True), (CpP, W))
            oi_ref[0] = jnp.broadcast_to(
                jnp.sum(b[:, :W], axis=0, keepdims=True), (CpP, W))

        call = pl.pallas_call(
            kern, grid=(NT,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, M, RT), lambda s: (s, 0, 0)),
                      pl.BlockSpec((1, M, RT), lambda s: (s, 0, 0))],
            out_specs=(pl.BlockSpec((1, CpP, W), lambda s: (s, 0, 0)),
                       pl.BlockSpec((1, CpP, W), lambda s: (s, 0, 0))),
            out_shape=(jax.ShapeDtypeStruct((NT, CpP, W), jnp.float32),
                       jax.ShapeDtypeStruct((NT, CpP, W), jnp.float32)),
            interpret=interpret)

        def step(c, xr, xi):
            yr, yi = call(c.reshape(1), xr, xi)
            return yr[0, 0, 0] + yi[0, 0, 0]
        return step, 2 * 4 * NT * M * RT, (xr, xi)

    NT0 = 4 if SMOKE else 80
    cases = [(100, 2128), (100, 2048), (128, 2048), (100, 4096),
             (8, 2048), (104, 2048), (100, 1024)]
    for M, RT in cases:
        NT = max(1, NT0 * 2128 * 100 // (M * RT))
        step, nbytes, args = make(M, RT, NT)
        run_variant(f"M{M}_RT{RT}_NT{NT}", step, nbytes, *args)

    # 2D control at the same bytes: (M*NT, RT) with (M, RT) blocks
    M, RT = 104, 2048
    NT = NT0 * 2128 * 100 // (M * RT)
    x2r = jax.random.normal(jax.random.PRNGKey(4), (M * NT, RT),
                            jnp.float32) * 1e-6
    x2i = jax.random.normal(jax.random.PRNGKey(5), (M * NT, RT),
                            jnp.float32) * 1e-6

    def kern2(c_ref, xr_ref, xi_ref, or_ref, oi_ref):
        a = xr_ref[:] * c_ref[0]
        b = xi_ref[:]
        or_ref[:] = jnp.broadcast_to(
            jnp.sum(a[:, :2000], axis=0, keepdims=True), (CpP, 2000))
        oi_ref[:] = jnp.broadcast_to(
            jnp.sum(b[:, :2000], axis=0, keepdims=True), (CpP, 2000))

    call2 = pl.pallas_call(
        kern2, grid=(NT,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((M, RT), lambda s: (s, 0)),
                  pl.BlockSpec((M, RT), lambda s: (s, 0))],
        out_specs=(pl.BlockSpec((CpP, 2000), lambda s: (s, 0)),
                   pl.BlockSpec((CpP, 2000), lambda s: (s, 0))),
        out_shape=(jax.ShapeDtypeStruct((NT * CpP, 2000), jnp.float32),
                   jax.ShapeDtypeStruct((NT * CpP, 2000), jnp.float32)),
        interpret=interpret)

    def step2(c, xr, xi):
        yr, yi = call2(c.reshape(1), xr, xi)
        return yr[0, 0] + yi[0, 0]

    run_variant(f"ctrl2d_M{M}_RT{RT}_NT{NT}", step2,
                2 * 4 * NT * M * RT, x2r, x2i)


if __name__ == "__main__":
    main()
