"""Ablate the fused channelizer kernel stage by stage on the chip to
find where its time goes (full kernel measured SLOWER than the unfused
chain: 3815 vs 5639 Msps).  Variants (same IO shapes, same tiling):

  io      : copy tile in -> out                        (pure IO)
  presum  : windowed pre-sum only
  stage1  : presum + the 64 scalar*chunk stage-1 adds
  full    : + the 72 small split-dot matmuls (the real kernel)

Run:  nohup python tools/perf_chan_ablate.py > log 2>&1 &
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops import pallas_channelizer as pc

    nfft, avg, n1, n2 = 1000, 4, 8, 125
    block_len = 4_000_000
    nframes = block_len // nfft
    bt = 80
    nr = nframes // bt
    lead = avg - 1

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(block_len) +
         1j * rng.standard_normal(block_len)).astype(np.complex64)
    xc = cplx.from_np(x)
    X3 = xc.reshape(nframes, n1, n2)
    from gpu_sdr_tpu.ops.windows import pfb_window
    W3 = jnp.asarray(pfb_window(nfft, avg).astype(np.float32)).reshape(
        avg, n1, n2)
    idx = (np.arange(1, nr)[:, None] * bt - lead +
           np.arange(lead)[None, :]).reshape(-1).astype(np.int32)
    lr = jnp.concatenate([jnp.zeros((lead, n1, n2), jnp.float32),
                          jnp.take(X3.re, jnp.asarray(idx), axis=0)])
    li = jnp.concatenate([jnp.zeros((lead, n1, n2), jnp.float32),
                          jnp.take(X3.im, jnp.asarray(idx), axis=0)])
    g6 = pc.stage2_consts(nfft, n1, n2)
    F1 = pc.stage1_scalars(n1)

    def kernel(mode, ar_ref, ai_ref, lr_ref, li_ref, wr_ref,
               grh_ref, grl_ref, gih_ref, gil_ref, gsh_ref, gsl_ref,
               or_ref, oi_ref):
        if mode == "io":
            or_ref[:] = ar_ref[:]
            oi_ref[:] = ai_ref[:]
            return
        ext_r = jnp.concatenate([lr_ref[:], ar_ref[:]], axis=0)
        ext_i = jnp.concatenate([li_ref[:], ai_ref[:]], axis=0)
        w = wr_ref[:]
        pre_r = ext_r[lead:] * w[lead][None]
        pre_i = ext_i[lead:] * w[lead][None]
        for i in range(lead):
            pre_r = pre_r + ext_r[i:i + bt] * w[i][None]
            pre_i = pre_i + ext_i[i:i + bt] * w[i][None]
        if mode == "presum":
            or_ref[:] = pre_r
            oi_ref[:] = pre_i
            return
        d = functools.partial(jnp.dot,
                              precision=jax.lax.Precision.DEFAULT,
                              preferred_element_type=jnp.float32)
        from gpu_sdr_tpu.ops.pallas_ddc import hilo_split
        for k1 in range(n1):
            acc = (None, None)
            for a in range(n1):
                acc = pc._cmul_acc(acc, pre_r[:, a, :], pre_i[:, a, :],
                                   float(F1[a, k1].real),
                                   float(F1[a, k1].imag))
            z_r, z_i = acc
            if mode == "stage1":
                or_ref[:, k1, :] = z_r
                oi_ref[:, k1, :] = z_i
                continue
            zr_hi, zr_lo = hilo_split(z_r)
            zi_hi, zi_lo = hilo_split(z_i)
            zs_hi, zs_lo = hilo_split(z_r + z_i)
            rr = (d(zr_hi, grh_ref[k1]) + d(zr_hi, grl_ref[k1]) +
                  d(zr_lo, grh_ref[k1]))
            ii = (d(zi_hi, gih_ref[k1]) + d(zi_hi, gil_ref[k1]) +
                  d(zi_lo, gih_ref[k1]))
            ss = (d(zs_hi, gsh_ref[k1]) + d(zs_hi, gsl_ref[k1]) +
                  d(zs_lo, gsh_ref[k1]))
            or_ref[:, k1, :] = rr - ii
            oi_ref[:, k1, :] = ss - rr - ii

    const3 = lambda r: (0, 0, 0)

    def build(mode):
        @jax.jit
        def run(xr, xi, lr, li):
            return pl.pallas_call(
                functools.partial(kernel, mode),
                grid=(nr,),
                in_specs=[
                    pl.BlockSpec((bt, n1, n2), lambda r: (r, 0, 0)),
                    pl.BlockSpec((bt, n1, n2), lambda r: (r, 0, 0)),
                    pl.BlockSpec((lead, n1, n2), lambda r: (r, 0, 0)),
                    pl.BlockSpec((lead, n1, n2), lambda r: (r, 0, 0)),
                    pl.BlockSpec((avg, n1, n2), const3),
                ] + [pl.BlockSpec((n1, n2, n2), const3)] * 6,
                out_specs=(pl.BlockSpec((bt, n1, n2), lambda r: (r, 0, 0)),
                           pl.BlockSpec((bt, n1, n2), lambda r: (r, 0, 0))),
                out_shape=(jax.ShapeDtypeStruct((nframes, n1, n2),
                                                jnp.float32),
                           jax.ShapeDtypeStruct((nframes, n1, n2),
                                                jnp.float32)),
            )(xr, xi, lr, li, W3, *g6)
        return run

    def hard_sync(o):
        return float(np.asarray(jax.device_get(o.reshape(-1)[0])))

    # measure inside a lax.scan like the production chain (standalone
    # dispatches carry ~6 ms of relay overhead each, drowning the signal);
    # each block's kernel output is consumed by a tiny slice so nothing
    # big stacks
    K = 16

    def build_scan(mode, with_select):
        run = build(mode)
        from gpu_sdr_tpu.ops.pfb import tone_bins
        from gpu_sdr_tpu.ops.cplx import DFT
        dftop = DFT(nfft, two_stage=True)
        bins = tone_bins(tuple(int(k * (100_000_000 // nfft))
                               for k in range(-nfft // 2, nfft // 2)),
                         100_000_000, nfft)
        bins_arr = jnp.asarray(dftop.scramble_index(bins))

        def body(c, _):
            o_re, o_im = run(X3.re + c, X3.im, lr, li)
            if with_select:
                y = jnp.take(o_re.reshape(nframes, nfft), bins_arr, axis=1)
                return c + o_re[0, 0, 0] * 0, y[:4]
            return c + o_re[0, 0, 0] * 0, o_re[0, 0, :4]

        @jax.jit
        def scan():
            _, ys = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return ys
        return scan

    for mode, wsel in (("io", False), ("presum", False), ("stage1", False),
                       ("full", False), ("full", True)):
        fn = build_scan(mode, wsel)
        o = fn()
        jax.block_until_ready(o)
        hard_sync(o)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(2):
                o = fn()
            jax.block_until_ready(o)
            hard_sync(o)
            best = min(best, (time.perf_counter() - t0) / (2 * K))
        print(json.dumps({"mode": mode + ("+select" if wsel else ""),
                          "ms_per_block": round(best * 1e3, 3),
                          "Msps": round(block_len / best / 1e6, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
