"""Pallas streaming ladder, round 3: the config-1 replay access pattern.

The per-config ladder measured the ReplayDDCT kernel at ~205 GB/s of
recording fetch — below even the single-stream reduce wall (~270), with
two ~850 KB input streams that "should" amortize toward ~380.  The
kernel's x block is (1, M=100, R+128=2128): a 3D block whose SUBLANE
dimension (100) is not a multiple of 8.  This ladder isolates the
pattern: same shapes, pure fetch+reduce (no DDC math), varying

  * M = 100 (production, ragged sublanes) / 104 / 128 (aligned);
  * the scalar-prefetch dynamic map vs a static map;
  * with and without the kernel's f=4 split-dot tap work (MXU overlap).

Run: nohup python tools/perf_pallas_bw3.py > logs/pallas_bw3_r4.log 2>&1 &
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, ".")

SMOKE = bool(int(os.environ.get("PALLAS_BW_SMOKE", "0")))
R_CALLS = 2 if SMOKE else 24
ROUNDS = 1 if SMOKE else 4
NT = 4 if SMOKE else 80          # tiles per array (80 x 851KB ~ 68 MB/comp)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.ops.pallas_ddc import hilo_split, split_dot

    interpret = jax.default_backend() not in ("tpu", "axon")
    RT = 2128                    # R + _TLEAD lanes per tile
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

    def make_variant(M, sp, dots):
        f = 4
        xr = jax.random.normal(jax.random.PRNGKey(2), (NT, M, RT),
                               jnp.float32) * 1e-6
        xi = jax.random.normal(jax.random.PRNGKey(3), (NT, M, RT),
                               jnp.float32) * 1e-6
        hts = [jnp.asarray(np.random.default_rng(7 + i)
                           .standard_normal((f * CpP, M))
                           .astype(np.float32)).astype(jnp.bfloat16)
               for i in range(2)]

        def kern(*refs):
            if sp:
                # (idx_ref, val_ref, xr, xi, hh, hl, or, oi)
                xr_ref, xi_ref = refs[2], refs[3]
                hh, hl = refs[4], refs[5]
                or_ref, oi_ref = refs[6], refs[7]
                c = jnp.float32(1.0)
            else:
                c_ref, xr_ref, xi_ref, hh, hl = refs[:5]
                or_ref, oi_ref = refs[5], refs[6]
                c = c_ref[0]
            a = xr_ref[0] * c                    # (M, RT)
            b = xi_ref[0]
            if dots:
                # the kernel's style of tap work: f split dots of
                # (CpP, M) x (M, R) per component
                a_hi, a_lo = hilo_split(a[:, :RT - 128])
                b_hi, b_lo = hilo_split(b[:, :RT - 128])
                d = functools.partial(
                    jnp.dot, precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
                acc_r = acc_i = None
                for j in range(f):
                    hj = hh[j * CpP:(j + 1) * CpP]
                    lj = hl[j * CpP:(j + 1) * CpP]
                    rr = d(hj, a_hi) + d(lj, a_hi) + d(hj, a_lo)
                    ii = d(hj, b_hi) + d(lj, b_hi) + d(hj, b_lo)
                    acc_r = rr if acc_r is None else acc_r + rr
                    acc_i = ii if acc_i is None else acc_i + ii
                or_ref[0] = acc_r
                oi_ref[0] = acc_i
            else:
                # pure fetch + cheap sublane sum (consumes both streams)
                or_ref[0] = jnp.broadcast_to(
                    jnp.sum(a[:, :RT - 128], axis=0, keepdims=True),
                    (CpP, RT - 128))
                oi_ref[0] = jnp.broadcast_to(
                    jnp.sum(b[:, :RT - 128], axis=0, keepdims=True),
                    (CpP, RT - 128))

        x_block = pl.BlockSpec((1, M, RT),
                               (lambda r, i, v: (i[r % NT], 0, 0)) if sp
                               else (lambda s: (s, 0, 0)))
        ht_spec = pl.BlockSpec((f * CpP, M),
                               (lambda r, i, v: (0, 0)) if sp
                               else (lambda s: (0, 0)))
        o_spec = pl.BlockSpec((1, CpP, RT - 128),
                              (lambda r, i, v: (r, 0, 0)) if sp
                              else (lambda s: (s, 0, 0)))
        out_shape = (jax.ShapeDtypeStruct((NT, CpP, RT - 128),
                                          jnp.float32),
                     jax.ShapeDtypeStruct((NT, CpP, RT - 128),
                                          jnp.float32))
        if sp:
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=(NT,),
                in_specs=[x_block, x_block, ht_spec, ht_spec],
                out_specs=(o_spec, o_spec))
            call = pl.pallas_call(kern, grid_spec=gs,
                                  out_shape=out_shape,
                                  interpret=interpret)

            def step(c, xr, xi):
                i1 = (c * jnp.float32(1e-30)).astype(jnp.int32)
                idxs = jnp.arange(NT, dtype=jnp.int32) + i1
                val = jnp.ones((NT,), jnp.int32)
                yr, yi = call(idxs, val, xr, xi, hts[0], hts[1])
                return yr[0, 0, 0] + yi[0, 0, 0]
        else:
            call = pl.pallas_call(
                kern, grid=(NT,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          x_block, x_block, ht_spec, ht_spec],
                out_specs=(o_spec, o_spec),
                out_shape=out_shape, interpret=interpret)

            def step(c, xr, xi):
                yr, yi = call(c.reshape(1), xr, xi, hts[0], hts[1])
                return yr[0, 0, 0] + yi[0, 0, 0]

        nbytes = 2 * 4 * NT * M * RT             # both input streams
        return step, nbytes, (xr, xi)

    for M in (100, 104, 128):
        for sp in (False, True):
            for dots in (False, True):
                name = (f"c1shape_M{M}_{'sp' if sp else 'static'}"
                        f"_{'dots' if dots else 'sum'}")
                step, nbytes, args = make_variant(M, sp, dots)
                run_variant(name, step, nbytes, *args)


if __name__ == "__main__":
    main()
