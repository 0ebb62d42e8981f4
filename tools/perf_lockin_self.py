"""Single-fetch vs aliased-double-fetch chirp-table lock-in at the
config-2 loopback shape (VERDICT r3 #3: the lock-in's cheaper in-kernel
form — resolved by the bandwidth ladder as a FETCH problem, not a
reduction problem).

Ladder findings (tools/perf_pallas_bw*.py, 2026-08-21): the weighted
row-sum formulation is irrelevant (VPU sum == MXU split dot == two-level
tree, all ~270 GB/s single-stream), but Mosaic does not coalesce two
block specs over the same buffer — the loopback chain's
pallas_chirp_lockin_table(profile, Xf, Xf, ...) call streams the
wavetable TWICE.  This probe measures the production chain against the
single-fetch kernel (pallas_chirp_lockin_table_self) back-to-back in
one process at the config-2 geometry (L=4M, ppt=20000, nseg_pb=200,
period=1e8), plus the raw-kernel forms, fetch-synced.

Run:  nohup python tools/perf_lockin_self.py > logs/lockin_self.log 2>&1 &
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.ops import chirp as chirp_ops
    from gpu_sdr_tpu.ops import lockin as lockin_ops
    from gpu_sdr_tpu.ops.cplx import C
    from gpu_sdr_tpu.ops.pallas_lockin import (
        pallas_chirp_lockin_table, pallas_chirp_lockin_table_self)

    rate = 100_000_000
    L, K = 4_000_000, 32
    steps, tt = 5000, 1.0
    cfg = chirp_ops.ChirpConfig.from_params(-40_000_000, 40_000_000,
                                            rate, steps, tt)
    length = cfg.length
    ppt = length * 1
    nseg_pb = L // ppt
    period = cfg.period
    nblk = period // L
    print(json.dumps({"shape": {"L": L, "ppt": ppt, "nseg_pb": nseg_pb,
                                "period": period, "nblk": nblk}}),
          flush=True)
    profile = jnp.asarray(lockin_ops.lockin_profile(ppt))

    @jax.jit
    def gen_period():
        def body(last, _):
            last, x = chirp_ops.chirp_block(cfg, last, L)
            return last, x
        _, xs = jax.lax.scan(body, jnp.uint32(0), None, length=nblk)
        return xs

    xs = gen_period()
    Xf = C(xs.re.reshape(period // ppt, ppt),
           xs.im.reshape(period // ppt, ppt))
    jax.block_until_ready(Xf.re)

    def hard_sync(arr):
        return float(np.asarray(jax.device_get(arr.re.reshape(-1)[0])))

    import functools

    def chain(form):
        def body(X, i, _):
            if form == "aliased":
                y = pallas_chirp_lockin_table(profile, X, X, i, nseg_pb)
            else:
                y = pallas_chirp_lockin_table_self(profile, X, i, nseg_pb)
            nxt = i + 1
            nxt = jnp.where(nxt >= nblk, nxt - nblk, nxt)
            return nxt, C(y.re[:, None], y.im[:, None])

        @jax.jit
        def multi(i, Xre, Xim):
            i, ys = jax.lax.scan(functools.partial(body, C(Xre, Xim)),
                                 i, None, length=K)
            return i, ys
        return multi

    results = {}
    for form in ("aliased", "self", "aliased"):   # A/B/A for drift
        multi = chain(form)
        i, ys = multi(jnp.int32(0), Xf.re, Xf.im)
        hard_sync(ys)
        n_exec = 4_096_000_000 // (K * L)
        per_round = max(1, n_exec // 4)
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(per_round):
                i, ys = multi(i, Xf.re, Xf.im)
            hard_sync(ys)
            dt = time.perf_counter() - t0
            best = max(best, per_round * K * L / dt / 1e6)
        results.setdefault(form, []).append(best)
        print(json.dumps({"form": form, "msps": round(best, 1)}),
              flush=True)

    # numeric identity on one block (re bit-identical; im: the self form
    # is exactly 0, the aliased form leaves FMA residue)
    ya = pallas_chirp_lockin_table(profile, Xf, Xf, jnp.int32(3), nseg_pb)
    yb = pallas_chirp_lockin_table_self(profile, Xf, jnp.int32(3),
                                        nseg_pb)
    print(json.dumps({
        "re_bit_identical": bool(np.array_equal(np.asarray(ya.re),
                                                np.asarray(yb.re))),
        "self_im_max": float(np.abs(np.asarray(yb.im)).max()),
        "aliased_im_max": float(np.abs(np.asarray(ya.im)).max()),
    }), flush=True)


if __name__ == "__main__":
    main()
