"""Root-cause the Pallas HBM streaming deficit (VERDICT r3 #1).

docs/05 records Pallas custom calls streaming HBM at ~250-320 GB/s vs
XLA's ~500 GB/s "for the same access patterns" — an empirical wall that
gates the chirp-table replay (~320 GB/s stream-bound), the fold kernel,
and every future kernel.  This ladder measures a minimal family of
copy/reduce kernels back-to-back against the XLA elementwise probe,
varying exactly the knobs the production kernels differ in:

  * block tile height (8 -> 256 rows) and width;
  * lane alignment: the lock-in kernels stream (tile, 20000) blocks and
    20000 % 128 != 0 — the ragged last dimension is a prime suspect;
  * grid dimension_semantics ("arbitrary" default vs "parallel");
  * stream count (1-in-1-out copy vs 2-in / 4-in like the table
    lock-in);
  * full-width output (copy) vs tiny reduced output (the lock-in's
    (tile, 1) write) — does the in-kernel 20000-lane weighted row-sum
    stall the stream?
  * the reduction formulation: VPU row-sum vs MXU dot (the reference's
    own cgemv form, cpp/kernels.cu:852-872).

Methodology (CLAUDE.md): every timed region is a fori_loop of R pallas
calls INSIDE one jitted program; each call receives a loop-dependent
SMEM scalar so no two invocations are identical (relay dedup / CSE
proof), and one element of each output is folded into the carried
accumulator (consumption proof).  Fetch-synced via a 4-byte device_get.

Run:  nohup python tools/perf_pallas_bw.py > logs/pallas_bw.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

SMOKE = bool(int(os.environ.get("PALLAS_BW_SMOKE", "0")))
R = 2 if SMOKE else 48          # pallas calls per timed execution
ROUNDS = 1 if SMOKE else 4
SCALE = 64 if SMOKE else 1      # divide array heights in smoke mode


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()

    interpret = jax.default_backend() not in ("tpu", "axon")

    def hard_sync(x):
        return float(np.asarray(jax.device_get(jnp.ravel(x)[0])))

    key = jax.random.PRNGKey(0)

    def run_variant(name, make_step, nbytes_per_call, *args):
        """make_step(c, *args) -> scalar contribution; timed R-deep."""
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
            print(json.dumps({"variant": name,
                              "gbps": round(gbps, 1),
                              "ms_per_call": round(best / R * 1e3, 3)}),
                  flush=True)
            return gbps
        except Exception as e:
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            return None

    # ---------------- XLA baseline: u' = u*c + v (3 passes) -----------
    n_el = 64 * 1024 * 1024 // SCALE                      # 256 MB f32
    u0 = jax.random.normal(key, (n_el,), jnp.float32) * 1e-6
    v0 = jax.random.normal(jax.random.PRNGKey(1), (n_el,), jnp.float32) * 1e-6

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

    # ---------------- Pallas copy kernels -----------------------------
    def copy_kernel(c_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] * c_ref[0]

    def make_copy(H, W, th, sem=None, vmem_mb=None):
        grid = (H // th,)
        cp = None
        if sem is not None or vmem_mb is not None:
            kw = {}
            if sem is not None:
                kw["dimension_semantics"] = (sem,)
            if vmem_mb is not None:
                kw["vmem_limit_bytes"] = vmem_mb * 1024 * 1024
            cp = pltpu.CompilerParams(**kw)
        call = pl.pallas_call(
            copy_kernel, grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((th, W), lambda s: (s, 0))],
            out_specs=pl.BlockSpec((th, W), lambda s: (s, 0)),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            interpret=interpret,
            **({"compiler_params": cp} if cp is not None else {}))

        def step(c, x):
            y = call(c.reshape(1), x)
            return y[0, 0]
        return step

    def mk_arr(H, W, seed=2):
        return jax.random.normal(jax.random.PRNGKey(seed), (H, W),
                                 jnp.float32) * 1e-6

    # width 2048 (lane-aligned), tile-height ladder
    H, W = 32768 // SCALE, 2048
    x = mk_arr(H, W)
    nbytes = 2 * 4 * H * W                       # read + write
    for th in (8, 32, 128, 256):
        run_variant(f"copy_w2048_th{th}", make_copy(H, W, th), nbytes, x)
    run_variant("copy_w2048_th256_parallel",
                make_copy(H, W, 256, sem="parallel"), nbytes, x)
    run_variant("copy_w2048_th256_arbitrary",
                make_copy(H, W, 256, sem="arbitrary"), nbytes, x)

    # the lock-in's access pattern: ragged 20000-lane rows
    H2, W2 = 3200 // SCALE, 20000
    x2 = mk_arr(H2, W2)
    nbytes2 = 2 * 4 * H2 * W2
    run_variant("copy_w20000_th8", make_copy(H2, W2, 8), nbytes2, x2)
    run_variant("copy_w20000_th32", make_copy(H2, W2, 32), nbytes2, x2)
    # lane-aligned variant of the same: 20096 = 157*128
    H3, W3 = 3200 // SCALE, 20096
    x3 = mk_arr(H3, W3)
    nbytes3 = 2 * 4 * H3 * W3
    run_variant("copy_w20096_th8", make_copy(H3, W3, 8), nbytes3, x3)
    run_variant("copy_w20096_th32", make_copy(H3, W3, 32), nbytes3, x3)

    # ---------------- reduce kernels (the lock-in shape) ---------------
    # read (th, W), write (th, 1): traffic ~= one read pass
    def make_reduce(H, W, th, mxu=False):
        w_prof = jnp.asarray(np.random.default_rng(0)
                             .standard_normal(W).astype(np.float32))

        def red_kernel(c_ref, x_ref, w_ref, o_ref):
            z = x_ref[:] * c_ref[0]
            w = w_ref[:]
            if mxu:
                # bf16 hi/lo split dot (tf32 grade): z @ w on the MXU
                zh = z.astype(jnp.bfloat16)
                zl = (z - zh.astype(jnp.float32)).astype(jnp.bfloat16)
                wh = w.astype(jnp.bfloat16)
                wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
                wc = wh.reshape(W, 1)
                o_ref[:] = (
                    jax.lax.dot(zh, wc, preferred_element_type=jnp.float32)
                    + jax.lax.dot(zl, wc,
                                  preferred_element_type=jnp.float32)
                    + jax.lax.dot(zh, wl.reshape(W, 1),
                                  preferred_element_type=jnp.float32))
            else:
                o_ref[:] = jnp.sum(z * w[None, :], axis=1, keepdims=True)

        call = pl.pallas_call(
            red_kernel, grid=(H // th,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((th, W), lambda s: (s, 0)),
                      pl.BlockSpec((W,), lambda s: (0,))],
            out_specs=pl.BlockSpec((th, 1), lambda s: (s, 0)),
            out_shape=jax.ShapeDtypeStruct((H, 1), jnp.float32),
            interpret=interpret)

        def step(c, x):
            y = call(c.reshape(1), x, w_prof)
            return y[0, 0]
        return step

    nread2 = 4 * H2 * W2
    run_variant("reduce_w20000_th8_vpu", make_reduce(H2, W2, 8), nread2, x2)
    run_variant("reduce_w20000_th32_vpu", make_reduce(H2, W2, 32),
                nread2, x2)
    nread3 = 4 * H3 * W3
    run_variant("reduce_w20096_th8_vpu", make_reduce(H3, W3, 8), nread3, x3)
    run_variant("reduce_w20096_th32_vpu", make_reduce(H3, W3, 32),
                nread3, x3)
    run_variant("reduce_w20096_th8_mxu",
                make_reduce(H3, W3, 8, mxu=True), nread3, x3)
    run_variant("reduce_w20096_th32_mxu",
                make_reduce(H3, W3, 32, mxu=True), nread3, x3)

    # ---------------- 4-stream reduce: the table lock-in itself --------
    # reads cr, ci, xr, xi (th, W); writes (th, 1) x2
    def make_lockin(H, W, th):
        w_prof = jnp.asarray(np.random.default_rng(0)
                             .standard_normal(W).astype(np.float32))

        def kern(c_ref, cr_ref, ci_ref, xr_ref, xi_ref, w_ref,
                 or_ref, oi_ref):
            cr, ci = cr_ref[:] * c_ref[0], ci_ref[:]
            xr, xi = xr_ref[:], xi_ref[:]
            zr = cr * xr + ci * xi
            zi = cr * xi - ci * xr
            w = w_ref[:]
            or_ref[:] = jnp.sum(zr * w[None, :], axis=1, keepdims=True)
            oi_ref[:] = jnp.sum(zi * w[None, :], axis=1, keepdims=True)

        call = pl.pallas_call(
            kern, grid=(H // th,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec((th, W), lambda s: (s, 0))] * 4
            + [pl.BlockSpec((W,), lambda s: (0,))],
            out_specs=(pl.BlockSpec((th, 1), lambda s: (s, 0)),
                       pl.BlockSpec((th, 1), lambda s: (s, 0))),
            out_shape=(jax.ShapeDtypeStruct((H, 1), jnp.float32),
                       jax.ShapeDtypeStruct((H, 1), jnp.float32)),
            interpret=interpret)

        def step(c, cr, ci, xr, xi):
            yr, yi = call(c.reshape(1), cr, ci, xr, xi, w_prof)
            return yr[0, 0] + yi[0, 0]
        return step

    # halve H so the 4-stream working set stays 256 MB total
    H4 = H2 // 2
    args2 = tuple(mk_arr(H4, W2, seed=3 + i) for i in range(4))
    n4read2 = 4 * 4 * H4 * W2
    run_variant("lockin4_w20000_th8", make_lockin(H4, W2, 8),
                n4read2, *args2)
    H5 = H3 // 2
    args3 = tuple(mk_arr(H5, W3, seed=7 + i) for i in range(4))
    n4read3 = 4 * 4 * H5 * W3
    run_variant("lockin4_w20096_th8", make_lockin(H5, W3, 8),
                n4read3, *args3)
    run_variant("lockin4_w20096_th32", make_lockin(H5, W3, 32),
                n4read3, *args3)


if __name__ == "__main__":
    main()
