"""Probe the chip's achievable HBM bandwidth and matmul rate *today*.

The rig's large-program throughput drifts up to ~25% across hours
(multi-tenant / thermal); this probe pins down the day's hardware ceiling so
chain numbers are attributable: chain Msps scales with these ceilings, so a
slow probe day explains a slow bench day.

Run:  nohup python tools/rig_probe.py > log 2>&1 &
Emits one JSON line: {"hbm_gbps": ..., "mxu_tf32_tflops": ..., "mxu_bf16_tflops": ...}
"""

import json
import sys
import time

sys.path.insert(0, ".")


def _hard_sync(x):
    """4-byte fetch: the only reliable execution barrier on this relay
    (block_until_ready can ack early — and costs ~65 ms when it does
    drain; see tools/perf_bur_cost.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    return float(np.asarray(jax.device_get(jnp.ravel(x)[0])))


def _timeit_chained(fn, x, n=30):
    """Time fn applied n times with a data dependency between calls (the
    relay appears to elide back-to-back identical executions, so unchained
    timing reads absurdly high).  Fetch-synced."""
    out = fn(x)
    _hard_sync(out)
    best = float("inf")
    for _ in range(4):
        out = x
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(out)
        _hard_sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def probe(quiet=False):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()

    # All loops live INSIDE one compiled program (lax.fori_loop with a data
    # dependency between iterations) so one dispatch carries work far above
    # the relay's ~30 us dispatch floor; external-loop timing measures only
    # that floor on this rig.

    # HBM: a 192-iteration fori_loop of u += (1+i)*v over 256 MB arrays ->
    # three passes per iteration (read u, read v, write u).  Pitfalls
    # established empirically on this rig: literal-constant adds fold to
    # one op at ANY trip count; data movement (roll) is elided; and trip
    # counts <= ~64 get fully unrolled and algebraically collapsed even
    # with varying coefficients — 192 iterations with an i-dependent
    # coefficient measure real traffic (verified: time scales with reps
    # and the result value is exact).
    n_el = 64 * 1024 * 1024
    nbytes = 4 * n_el
    reps = 192
    mk = jax.jit(lambda k: jax.random.normal(k, (n_el,), jnp.float32))
    x = mk(jax.random.PRNGKey(0)) * 1e-6
    v = mk(jax.random.PRNGKey(1)) * 1e-6

    # v rides as a jit argument (a closure constant would be inlined
    # as a 256 MB literal into the remote-compile request)
    @jax.jit
    def sweep(u, vv):
        def body(i, uu):
            # the coefficient depends on the carried data, making the
            # recurrence nonlinear: un-foldable at any unroll depth
            # (i-dependent affine coefficients were still collapsed to
            # closed form by the compiler, non-deterministically)
            return uu + vv * (1.0 + 1e-12 * uu[0])
        return lax.fori_loop(0, reps, body, u)

    # chain u through the timing loop: repeated executions with identical
    # inputs can return at dispatch cost on this rig (dedup somewhere in
    # the relay), so every call must have fresh inputs
    u = sweep(x, v)
    _hard_sync(u)
    dt = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        u = sweep(u, v)
        _hard_sync(u)
        dt = min(dt, time.perf_counter() - t0)
    hbm = reps * 3 * nbytes / dt / 1e9

    # MXU: 40 chained 4096^3 matmuls at the framework default precision
    # (tensorfloat32 = 3 bf16 passes) and at raw bf16
    m, mreps = 4096, 40
    a = jnp.full((m, m), 1e-3, jnp.float32)
    mm = jax.jit(lambda u: lax.fori_loop(
        0, mreps, lambda i, v: (v @ a) * 1e-3, u))
    dt = _timeit_chained(mm, a, n=1)
    tf32 = mreps * 2 * m**3 / dt / 1e12
    ab = a.astype(jnp.bfloat16)
    mmb = jax.jit(lambda u: lax.fori_loop(
        0, mreps, lambda i, v: (v @ ab).astype(jnp.bfloat16) * 1e-3, u))
    dt = _timeit_chained(mmb, ab, n=1)
    bf16 = mreps * 2 * m**3 / dt / 1e12

    out = {"hbm_gbps": round(hbm, 1), "mxu_tf32_tflops": round(tf32, 2),
           "mxu_bf16_tflops": round(bf16, 2)}
    if not quiet:
        print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    probe()
