"""Pallas HBM streaming ladder, round 2 (follow-up to perf_pallas_bw.py).

Round-1 findings (logs/pallas_bw_r4.log, 2026-08-21): Pallas copies
stream at 363-379 GB/s once the block is >= ~256 KB (the historic
"250-300 GB/s wall" was the 64 KB (8, 2048) tile); lane alignment and
dimension_semantics are noise; but a SINGLE-stream weighted row-reduce
caps at ~270 GB/s at every tile height, while the 4-stream lock-in
amortizes the same reduction to 385-390 GB/s aggregate (XLA elementwise
baseline that day: 443).  This round pins the remaining questions:

  * block-bytes curve: copy at w2048 x th16/64 (128/512 KB blocks);
  * the MXU reduce, fixed: round 1's jax.lax.dot inherited the global
    HIGH default, which Mosaic cannot lower — use the framework's
    split_dot (explicit DEFAULT precision, bf16 hi/lo = tf32 grade);
  * a VPU strided two-level reduce (explicit chunked accumulate) vs
    Mosaic's jnp.sum lowering;
  * scalar-prefetch dynamic index maps (the production replay kernels'
    form) vs static maps — does SP cost bandwidth?
  * the ALIASED 2-stream lock-in (the loopback form passes the same
    buffer as oscillator and signal): effective bytes per sample.

Run:  nohup python tools/perf_pallas_bw2.py > logs/pallas_bw2_r4.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

SMOKE = bool(int(os.environ.get("PALLAS_BW_SMOKE", "0")))
R = 2 if SMOKE else 48
ROUNDS = 1 if SMOKE else 4
SCALE = 64 if SMOKE else 1


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

    def hard_sync(x):
        return float(np.asarray(jax.device_get(jnp.ravel(x)[0])))

    def run_variant(name, make_step, nbytes_per_call, *args):
        @jax.jit
        def sweep(acc, *a):
            def body(k, acc):
                c = jnp.float32(1.0) + jnp.float32(1e-12) * acc \
                    + jnp.float32(1e-9) * k
                return acc + make_step(c, *a)
            return jax.lax.fori_loop(0, R, body, acc)

        try:
            acc = sweep(jnp.float32(0), *args)
            hard_sync(acc)
            best = float("inf")
            for _ in range(ROUNDS):
                t0 = time.perf_counter()
                acc = sweep(acc, *args)
                hard_sync(acc)
                best = min(best, time.perf_counter() - t0)
            gbps = R * nbytes_per_call / best / 1e9
            print(json.dumps({"variant": name, "gbps": round(gbps, 1),
                              "ms_per_call": round(best / R * 1e3, 3)}),
                  flush=True)
            return gbps
        except Exception as e:
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            return None

    def mk_arr(H, W, seed=2):
        return jax.random.normal(jax.random.PRNGKey(seed), (H, W),
                                 jnp.float32) * 1e-6

    # ---------------- XLA drift anchor --------------------------------
    n_el = 64 * 1024 * 1024 // SCALE
    u0 = mk_arr(1, n_el).reshape(-1)
    v0 = mk_arr(1, n_el, seed=3).reshape(-1)

    @jax.jit
    def xla_sweep(u, v):
        def body(k, uu):
            return uu * (jnp.float32(1.0)
                         + jnp.float32(1e-12) * uu[0]) + v
        return jax.lax.fori_loop(0, R, body, u)

    u = xla_sweep(u0, v0)
    hard_sync(u)
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        u = xla_sweep(u, v0)
        hard_sync(u)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"variant": "xla_axpy_3pass",
                      "gbps": round(R * 3 * 4 * n_el / best / 1e9, 1)}),
          flush=True)

    # ---------------- copy block-bytes curve ---------------------------
    def copy_kernel(c_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] * c_ref[0]

    def make_copy(H, W, th):
        call = pl.pallas_call(
            copy_kernel, grid=(H // th,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((th, W), lambda s: (s, 0))],
            out_specs=pl.BlockSpec((th, W), lambda s: (s, 0)),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            interpret=interpret)

        def step(c, x):
            return call(c.reshape(1), x)[0, 0]
        return step

    H, W = 32768 // SCALE, 2048
    x = mk_arr(H, W)
    nbytes = 2 * 4 * H * W
    for th in (16, 64):
        run_variant(f"copy_w2048_th{th}", make_copy(H, W, th), nbytes, x)

    # ---------------- reduce formulations ------------------------------
    H3, W3 = 3200 // SCALE, 20096
    x3 = mk_arr(H3, W3)
    nread3 = 4 * H3 * W3
    w_np = np.random.default_rng(0).standard_normal(W3).astype(np.float32)

    def make_reduce(H, W, th, form):
        w_prof = jnp.asarray(w_np[:W])
        ones_h = jnp.ones((W, 1), jnp.bfloat16)
        import functools
        d = functools.partial(jnp.dot,
                              precision=jax.lax.Precision.DEFAULT,
                              preferred_element_type=jnp.float32)

        def red_kernel(c_ref, x_ref, w_ref, ones_ref, o_ref):
            z = x_ref[:] * c_ref[0]
            w = w_ref[:]
            if form == "mxu":
                # p = z*w on the VPU, then the SUM as a split MXU dot
                # against ones (tf32 grade; the reference's cgemv form,
                # cpp/kernels.cu:852-872)
                p = z * w[None, :]
                p_hi, p_lo = hilo_split(p)
                o_ref[:] = d(p_hi, ones_ref[:]) + d(p_lo, ones_ref[:])
            elif form == "mxu_w":
                # fold w into the dot operand: z @ w via split_dot
                z_hi, z_lo = hilo_split(z)
                o_ref[:] = split_dot(z_hi, z_lo, w.reshape(W, 1))
            elif form == "tree2":
                # explicit two-level: chunked accumulate then one
                # cross-lane reduce of (th, 128)
                p = z * w[None, :]
                nch = W // 128
                acc = p[:, :128]
                for j in range(1, nch):
                    acc = acc + p[:, j * 128:(j + 1) * 128]
                o_ref[:] = jnp.sum(acc, axis=1, keepdims=True)
            else:
                o_ref[:] = jnp.sum(z * w[None, :], axis=1,
                                   keepdims=True)

        call = pl.pallas_call(
            red_kernel, grid=(H // th,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((th, W), lambda s: (s, 0)),
                      pl.BlockSpec((W,), lambda s: (0,)),
                      pl.BlockSpec((W, 1), lambda s: (0, 0))],
            out_specs=pl.BlockSpec((th, 1), lambda s: (s, 0)),
            out_shape=jax.ShapeDtypeStruct((H, 1), jnp.float32),
            interpret=interpret)

        def step(c, x):
            return call(c.reshape(1), x, w_prof, ones_h)[0, 0]
        return step

    for form in ("mxu", "mxu_w", "tree2"):
        for th in (8, 32):
            run_variant(f"reduce_w20096_th{th}_{form}",
                        make_reduce(H3, W3, th, form), nread3, x3)

    # ---------------- lock-in: SP maps, MXU reduce, aliasing -----------
    def make_lockin(H, W, th, sp=False, mxu=False, aliased=False):
        w_prof = jnp.asarray(w_np[:W])
        ones_h = jnp.ones((W, 1), jnp.bfloat16)
        nr = H // th
        import functools
        d = functools.partial(jnp.dot,
                              precision=jax.lax.Precision.DEFAULT,
                              preferred_element_type=jnp.float32)

        def body(cr, ci, xr, xi, c, w, ones, or_ref, oi_ref):
            crc = cr * c
            zr = crc * xr + ci * xi
            zi = crc * xi - ci * xr
            if mxu:
                pr = zr * w[None, :]
                pi = zi * w[None, :]
                prh, prl = hilo_split(pr)
                pih, pil = hilo_split(pi)
                or_ref[:] = d(prh, ones) + d(prl, ones)
                oi_ref[:] = d(pih, ones) + d(pil, ones)
            else:
                or_ref[:] = jnp.sum(zr * w[None, :], axis=1,
                                    keepdims=True)
                oi_ref[:] = jnp.sum(zi * w[None, :], axis=1,
                                    keepdims=True)

        if sp:
            # the production replay kernels' form: block indices arrive
            # as a scalar-prefetch array consumed by dynamic index maps
            def kern2(idx_ref, cr_ref, ci_ref, xr_ref, xi_ref, w_ref,
                      ones_ref, or_ref, oi_ref):
                body(cr_ref[:], ci_ref[:], xr_ref[:], xi_ref[:],
                     jnp.float32(1.0), w_ref[:], ones_ref[:],
                     or_ref, oi_ref)

            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nr,),
                in_specs=[pl.BlockSpec((th, W),
                                       lambda s, i: (i[0] * nr + s, 0))] * 2
                + [pl.BlockSpec((th, W),
                                lambda s, i: (i[1] * nr + s, 0))] * 2
                + [pl.BlockSpec((W,), lambda s, i: (0,)),
                   pl.BlockSpec((W, 1), lambda s, i: (0, 0))],
                out_specs=(pl.BlockSpec((th, 1), lambda s, i: (s, 0)),
                           pl.BlockSpec((th, 1), lambda s, i: (s, 0))),
            )
            call = pl.pallas_call(
                kern2, grid_spec=gs,
                out_shape=(jax.ShapeDtypeStruct((H, 1), jnp.float32),
                           jax.ShapeDtypeStruct((H, 1), jnp.float32)),
                interpret=interpret)

            def step(c, cr, ci, xr, xi):
                # runtime-zero but data-dependent indices: the call can
                # neither be hoisted out of the timing loop nor folded
                i1 = (c * jnp.float32(1e-30)).astype(jnp.int32)
                idx = jnp.stack([i1, i1])
                yr, yi = call(idx, cr, ci, xr, xi, w_prof, ones_h)
                return yr[0, 0] + yi[0, 0]
            return step

        def kern(c_ref, cr_ref, ci_ref, xr_ref, xi_ref, w_ref,
                 ones_ref, or_ref, oi_ref):
            body(cr_ref[:], ci_ref[:], xr_ref[:], xi_ref[:], c_ref[0],
                 w_ref[:], ones_ref[:], or_ref, oi_ref)

        call = pl.pallas_call(
            kern, grid=(nr,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec((th, W), lambda s: (s, 0))] * 4
            + [pl.BlockSpec((W,), lambda s: (0,)),
               pl.BlockSpec((W, 1), lambda s: (0, 0))],
            out_specs=(pl.BlockSpec((th, 1), lambda s: (s, 0)),
                       pl.BlockSpec((th, 1), lambda s: (s, 0))),
            out_shape=(jax.ShapeDtypeStruct((H, 1), jnp.float32),
                       jax.ShapeDtypeStruct((H, 1), jnp.float32)),
            interpret=interpret)

        if aliased:
            def step(c, cr, ci):
                yr, yi = call(c.reshape(1), cr, ci, cr, ci, w_prof,
                              ones_h)
                return yr[0, 0] + yi[0, 0]
        else:
            def step(c, cr, ci, xr, xi):
                yr, yi = call(c.reshape(1), cr, ci, xr, xi, w_prof,
                              ones_h)
                return yr[0, 0] + yi[0, 0]
        return step

    H4 = 1600 // SCALE
    args4 = tuple(mk_arr(H4, W3, seed=7 + i) for i in range(4))
    n4 = 4 * 4 * H4 * W3
    run_variant("lockin4_th8_static", make_lockin(H4, W3, 8), n4, *args4)
    run_variant("lockin4_th16_static", make_lockin(H4, W3, 16), n4, *args4)
    run_variant("lockin4_th8_mxu", make_lockin(H4, W3, 8, mxu=True),
                n4, *args4)
    run_variant("lockin4_th16_mxu", make_lockin(H4, W3, 16, mxu=True),
                n4, *args4)
    run_variant("lockin4_th8_sp", make_lockin(H4, W3, 8, sp=True),
                n4, *args4)
    # aliased (loopback form): unique bytes = 2 streams
    run_variant("lockin2_aliased_th8",
                make_lockin(H4, W3, 8, aliased=True),
                2 * 4 * H4 * W3, *args4[:2])


if __name__ == "__main__":
    main()
