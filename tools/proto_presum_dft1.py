"""Prototype: presum + DFT stage-1 + twiddle in ONE Pallas kernel.

The headline chain's pre-sum kernel writes (frames, 1000) to HBM and the
XLA two-stage DFT immediately reads it back (one 64 MB/block round trip).
With the (8, 125) Cooley-Tukey split, the reshape x[t, n] -> x3[t, a, b]
(n = 125a + b) is a FREE reinterpretation of the flat rows as
(frames*8, 125): window shifts become 8-row (sublane-aligned) shifts and
DFT stage 1 is a batched (8x8)@(8x125) dot that keeps the (t, k1, b)
layout — no transpose, no lane reshape (what killed the earlier
full-DFT fusion, tools/proto_fused_dft*.py).  The kernel emits
z[t, k1, b] = TW[b, k1] * sum_a pre[t, a, b] F1[a, k1]; XLA then does
only stage 2 (contract b with F2) + the select gather.

Correctness is checked against the production path, then both are timed
at the bench geometry (K x 4M blocks).

Run:  nohup python tools/proto_presum_dft1.py > log 2>&1 &
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

K = 32
BLOCK = 4_000_000
N1, N2 = 8, 125
NFFT = 1000
AVG = 4
_HP8 = 32          # halo rows in X8 space: (AVG-1)*8 = 24, padded to 32


def build(jax, jnp, cplx):
    import jax.experimental.pallas as pl
    from gpu_sdr_tpu.ops.cplx import C
    from gpu_sdr_tpu.ops.pallas_ddc import hilo_split
    from gpu_sdr_tpu.ops.pfb import PFBConfig, pfb_spare_init, \
        select_tones, tone_bins
    from gpu_sdr_tpu.ops.tonegen import tone_comb_wavetable_block

    rate = 100_000_000
    freqs = tuple(int(k * (rate // NFFT))
                  for k in range(-NFFT // 2, NFFT // 2))
    bins = tuple(int(b) for b in tone_bins(freqs, rate, NFFT))
    cfg = PFBConfig(nfft=NFFT, avg=AVG, rate=rate, bins=bins)
    window = np.asarray(cfg.window(), np.float32)
    dft_full = cfg.dft(two_stage=True)
    assert dft_full.split == (N1, N2), dft_full.split
    bins_arr = jnp.asarray(dft_full.scramble_index(bins))
    xconst = tone_comb_wavetable_block(freqs, (1.0 / NFFT,) * NFFT,
                                       rate, BLOCK)
    frames = BLOCK // NFFT
    lead8 = (AVG - 1) * N1

    from gpu_sdr_tpu.ops.pallas_pfb import _pick_bt
    bt = _pick_bt(frames, NFFT)
    bt8 = bt * N1
    nr = frames // bt

    X8 = C(xconst.re.reshape(frames * N1, N2),
           xconst.im.reshape(frames * N1, N2))
    W8 = jnp.asarray(window.reshape(AVG * N1, N2))

    # stage-1 factors: F1 (a, k1) batched to (bt, a? -> lhs (bt, k1, a));
    # pre-split to bf16 hi/lo host-side
    sign = -1.0
    a = np.arange(N1, dtype=np.float64)
    F1 = np.exp(sign * 2j * np.pi * np.outer(a, a) / N1)   # (a, k1)
    F1T = F1.T                                              # (k1, a)
    b = np.arange(N2, dtype=np.float64)
    k1 = np.arange(N1, dtype=np.float64)
    T2 = np.exp(sign * 2j * np.pi * np.outer(k1, b) / NFFT)  # (k1, b)

    def bsplit(m):
        hi = m.astype(np.float32).astype(jnp.bfloat16)
        lo = (m.astype(np.float32) -
              np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        bt_hi = jnp.broadcast_to(jnp.asarray(hi), (bt, N1, N1))
        bt_lo = jnp.broadcast_to(jnp.asarray(lo), (bt, N1, N1))
        return bt_hi, bt_lo

    f1r_hi, f1r_lo = bsplit(F1T.real)
    f1i_hi, f1i_lo = bsplit(F1T.imag)
    f1s_hi, f1s_lo = bsplit(F1T.real + F1T.imag)
    t2r = jnp.asarray(T2.real.astype(np.float32))
    t2i = jnp.asarray(T2.imag.astype(np.float32))

    dg = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)

    def kernel(ar_ref, ai_ref, lr_ref, li_ref, sr_ref, si_ref, w_ref,
               ur_hi_ref, ur_lo_ref, ui_hi_ref, ui_lo_ref,
               us_hi_ref, us_lo_ref, t2r_ref, t2i_ref,
               or_ref, oi_ref):
        pid = pl.program_id(0)
        first = pid == 0
        h_r = jnp.where(first, sr_ref[:], lr_ref[:])
        h_i = jnp.where(first, si_ref[:], li_ref[:])
        ext_r = jnp.concatenate([h_r[_HP8 - lead8:], ar_ref[:]], axis=0)
        ext_i = jnp.concatenate([h_i[_HP8 - lead8:], ai_ref[:]], axis=0)
        w = w_ref[:]
        pre_r = pre_i = None
        for i in range(AVG):
            wi = w[i * N1:(i + 1) * N1][None]            # (1, 8, 125)
            tr = ext_r[i * N1:i * N1 + bt8].reshape(bt, N1, N2) * wi
            ti = ext_i[i * N1:i * N1 + bt8].reshape(bt, N1, N2) * wi
            pre_r = tr if pre_r is None else pre_r + tr
            pre_i = ti if pre_i is None else pre_i + ti
        # stage-1 DFT: z[t, k1, b] = sum_a F1T[k1, a] * pre[t, a, b]
        pr_hi, pr_lo = hilo_split(pre_r)
        pi_hi, pi_lo = hilo_split(pre_i)
        ps_hi, ps_lo = hilo_split(pre_r + pre_i)

        def sdg(l_hi, l_lo, r_hi, r_lo):
            return (dg(l_hi, r_hi) + dg(l_hi, r_lo) + dg(l_lo, r_hi))

        rr = sdg(ur_hi_ref[:], ur_lo_ref[:], pr_hi, pr_lo)
        ii = sdg(ui_hi_ref[:], ui_lo_ref[:], pi_hi, pi_lo)
        ri = sdg(us_hi_ref[:], us_lo_ref[:], ps_hi, ps_lo)
        z_r = rr - ii
        z_i = ri - rr - ii
        # twiddle: z *= T2[k1, b]
        t2r_ = t2r_ref[:][None]
        t2i_ = t2i_ref[:][None]
        y_r = z_r * t2r_ - z_i * t2i_
        y_i = z_r * t2i_ + z_i * t2r_
        or_ref[:] = y_r.reshape(bt8, N2)
        oi_ref[:] = y_i.reshape(bt8, N2)

    # halo staging in X8 rows, wrapped mod frames*N1 (periodic const)
    idx = ((np.arange(nr)[:, None]) * bt8 - lead8 +
           np.arange(_HP8)[None, :] - (_HP8 - lead8))
    lX = C(jnp.take(X8.re, jnp.asarray(idx.reshape(-1) % (frames * N1)),
                    axis=0),
           jnp.take(X8.im, jnp.asarray(idx.reshape(-1) % (frames * N1)),
                    axis=0))

    in_blk = lambda r: (r % nr, 0)
    H = (AVG - 1) * NFFT
    F2 = cplx.const(
        np.exp(sign * 2j * np.pi *
               np.outer(np.arange(N2), np.arange(N2)) / N2)
        .astype(np.complex64))

    @jax.jit
    def exec_once(spare):
        S = spare.reshape(lead8, N2)
        pad = jnp.zeros((_HP8 - lead8, N2), jnp.float32)
        s_r = jnp.concatenate([pad, S.re], axis=0)
        s_i = jnp.concatenate([pad, S.im], axis=0)
        out_shape = (
            jax.ShapeDtypeStruct((K * frames * N1, N2), jnp.float32),
            jax.ShapeDtypeStruct((K * frames * N1, N2), jnp.float32))
        z_r, z_i = pl.pallas_call(
            kernel,
            grid=(K * nr,),
            in_specs=[
                pl.BlockSpec((bt8, N2), in_blk),
                pl.BlockSpec((bt8, N2), in_blk),
                pl.BlockSpec((_HP8, N2), in_blk),
                pl.BlockSpec((_HP8, N2), in_blk),
                pl.BlockSpec((_HP8, N2), lambda r: (0, 0)),
                pl.BlockSpec((_HP8, N2), lambda r: (0, 0)),
                pl.BlockSpec((AVG * N1, N2), lambda r: (0, 0)),
                pl.BlockSpec((bt, N1, N1), lambda r: (0, 0, 0)),
                pl.BlockSpec((bt, N1, N1), lambda r: (0, 0, 0)),
                pl.BlockSpec((bt, N1, N1), lambda r: (0, 0, 0)),
                pl.BlockSpec((bt, N1, N1), lambda r: (0, 0, 0)),
                pl.BlockSpec((bt, N1, N1), lambda r: (0, 0, 0)),
                pl.BlockSpec((bt, N1, N1), lambda r: (0, 0, 0)),
                pl.BlockSpec((N1, N2), lambda r: (0, 0)),
                pl.BlockSpec((N1, N2), lambda r: (0, 0)),
            ],
            out_specs=(pl.BlockSpec((bt8, N2), lambda r: (r, 0)),
                       pl.BlockSpec((bt8, N2), lambda r: (r, 0))),
            out_shape=out_shape,
        )(X8.re, X8.im, lX.re, lX.im, s_r, s_i, W8,
          f1r_hi, f1r_lo, f1i_hi, f1i_lo, f1s_hi, f1s_lo, t2r, t2i)
        # stage 2 (contract b with F2) + select, in XLA as before
        z = C(z_r.reshape(K * frames, N1, N2),
              z_i.reshape(K * frames, N1, N2))
        fr = cplx.matmul(z, F2)                  # (T, k1, k2)
        fr = fr.reshape(K * frames, NFFT)        # flat k1*N2 + k2
        y = select_tones(fr, bins_arr)
        new_spare = xconst[BLOCK - H:]
        return new_spare, y

    return exec_once, pfb_spare_init(cfg), cfg, xconst, window, dft_full, \
        bins_arr


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.pallas_pfb import pfb_frames_fused
    from gpu_sdr_tpu.ops.pfb import pfb_spare_init, select_tones

    (exec_once, spare0, cfg, xconst, window, dft_full,
     bins_arr) = build(jax, jnp, cplx)

    t0 = time.perf_counter()
    spare, y = exec_once(spare0)
    jax.block_until_ready(y)
    compile_s = time.perf_counter() - t0

    # correctness vs the production scan-form chain, first 2 blocks
    win = jnp.asarray(window)
    sp = pfb_spare_init(cfg)
    fn = jax.jit(lambda s: pfb_frames_fused(
        cfg, win, dft_full.scrambled, s, xconst))
    refs = []
    for _ in range(2):
        sp, frr = fn(sp)
        refs.append(cplx.to_np(select_tones(frr, bins_arr)))
    ref = np.concatenate(refs, axis=0)
    got = cplx.to_np(y)[:ref.shape[0]]
    num = float(np.sum(np.abs(ref - got) ** 2))
    den = float(np.sum(np.abs(ref) ** 2))
    print(json.dumps({"rel_err_db": round(10 * np.log10(num / den), 1)
                      if num else -999}), flush=True)

    n_exec = max(1, 512 // K)
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n_exec):
            spare, y = exec_once(spare)
        jax.block_until_ready(y)
        dt = time.perf_counter() - t0
        best = max(best, n_exec * K * BLOCK / dt / 1e6)
    print(json.dumps({"variant": "presum+dft1 fused", "K": K,
                      "Msps_best": round(best, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)

    # reference: production chain timed in the same process/conditions
    sp = pfb_spare_init(cfg)

    @jax.jit
    def multi(s):
        def body(sp_, _):
            sp_, frr = pfb_frames_fused(cfg, win, dft_full.scrambled,
                                        sp_, xconst)
            return sp_, select_tones(frr, bins_arr)
        return jax.lax.scan(body, s, None, length=K)

    sp, ys = multi(sp)
    jax.block_until_ready(ys)
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n_exec):
            sp, ys = multi(sp)
        jax.block_until_ready(ys)
        dt = time.perf_counter() - t0
        best = max(best, n_exec * K * BLOCK / dt / 1e6)
    print(json.dumps({"variant": "production scan", "K": K,
                      "Msps_best": round(best, 1)}), flush=True)


if __name__ == "__main__":
    main()
