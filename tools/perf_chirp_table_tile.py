"""Tile-height probe for the two-buffer (replay) table lock-in.

The replay form streams oscillator AND recording rows (distinct
buffers), unlike the loopback where both specs alias one buffer; at
seg_tile=8 the config-2 replay measured 15.25 Gsps (244 GB/s of the
~550 GB/s ceiling).  Probe whether taller tiles close the gap.
Run: nohup python tools/perf_chirp_table_tile.py > /tmp/tile.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.ops import chirp as chirp_ops
    from gpu_sdr_tpu.ops import lockin as lockin_ops
    from gpu_sdr_tpu.ops.chirp import ChirpConfig
    from gpu_sdr_tpu.ops.cplx import C
    from gpu_sdr_tpu.ops.pallas_lockin import pallas_chirp_lockin_table

    rate = 100_000_000
    cfg = ChirpConfig.from_params(-40_000_000, 40_000_000, rate, 5000, 1.0)
    ppt = cfg.length                      # 20000
    L, K = 4_000_000, 32
    nseg_pb = L // ppt                    # 200
    nblk = cfg.period // L                # 25
    profile = jnp.asarray(lockin_ops.lockin_profile(ppt))

    @jax.jit
    def gen_period():
        def body(last, _):
            last, x = chirp_ops.chirp_block(cfg, last, L)
            return last, x
        _, xs = jax.lax.scan(body, jnp.uint32(0), None, length=nblk)
        return xs

    xs = gen_period()
    total = cfg.period // ppt
    Ct = C(xs.re.reshape(total, ppt), xs.im.reshape(total, ppt))
    rng = np.random.default_rng(3)
    rec = rng.standard_normal((2, 3 * L)).astype(np.float32)
    Xf = C(jnp.asarray(rec[0].reshape(3 * nseg_pb, ppt)),
           jnp.asarray(rec[1].reshape(3 * nseg_pb, ppt)))
    nrec = 3

    def make_multi(seg_tile):
        @jax.jit
        def multi(o, i, Ct, Xf):
            def body(carry, _):
                oo, ii = carry
                y = pallas_chirp_lockin_table(profile, Ct, Xf, oo,
                                              nseg_pb, seg_tile=seg_tile,
                                              sig_idx=ii)
                oo = jnp.where(oo + 1 >= nblk, 0, oo + 1)
                ii = jnp.where(ii + 1 >= nrec, 0, ii + 1)
                return (oo, ii), C(y.re[:, None], y.im[:, None])
            (o, i), ys = jax.lax.scan(body, (o, i), None, length=K)
            return o, i, ys
        return multi

    def hard_sync(ys):
        return float(np.asarray(jax.device_get(ys.re.reshape(-1)[0])))

    for seg_tile in (8, 10, 20, 25, 40):
        multi = make_multi(seg_tile)
        o, i = jnp.int32(0), jnp.int32(0)
        try:
            o, i, ys = multi(o, i, Ct, Xf)
            hard_sync(ys)
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"seg_tile={seg_tile}: FAILED {type(e).__name__}: {msg}",
                  flush=True)
            continue
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(8):
                o, i, ys = multi(o, i, Ct, Xf)
            hard_sync(ys)
            dt = time.perf_counter() - t0
            best = max(best, 8 * K * L / dt / 1e9)
        print(f"seg_tile={seg_tile}: {best:.2f} Gsps", flush=True)


if __name__ == "__main__":
    main()
