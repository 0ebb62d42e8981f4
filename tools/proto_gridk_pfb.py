"""Prototype: scan-free headline chain — K blocks as one presum grid.

The headline bench (bench.py) scans K blocks per execution; the Pallas
pre-sum output can't fuse into the scan's stacking write, and the DFT
consumes a fresh kernel output per block.  Here the whole execution is
ONE program with no scan: a single pallas presum call over grid
(K * nr,) writing (K*frames, nfft), followed by one two-stage DFT and
one tone-select gather over the full execution's rows.

The comb is the reference-faithful bin-quantized wavetable: every block
reads the SAME (frames, nfft) constant (the TPU form of the reference's
pointer rotation), so the presum input specs index block-locally
(r % nr) and block k's leading halo rows wrap to the constant's tail —
except the execution's very first tile, which consumes the carried
spare (bit-identical streaming semantics).

Run:  nohup python tools/proto_gridk_pfb.py > log 2>&1 &
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

K = 32
BLOCK = 4_000_000


def build(jax, jnp, cplx):
    import jax.experimental.pallas as pl
    from gpu_sdr_tpu.ops.pallas_pfb import _HALO_PAD, _pick_bt
    from gpu_sdr_tpu.ops.pfb import PFBConfig, pfb_spare_init, \
        select_tones, tone_bins
    from gpu_sdr_tpu.ops.tonegen import comb_period, \
        tone_comb_wavetable_block

    rate = 100_000_000
    nfft, avg = 1000, 4
    freqs = tuple(int(k * (rate // nfft))
                  for k in range(-nfft // 2, nfft // 2))
    bins = tuple(int(b) for b in tone_bins(freqs, rate, nfft))
    cfg = PFBConfig(nfft=nfft, avg=avg, rate=rate, bins=bins)
    window = cfg.window().reshape(avg, nfft)
    dft_full = cfg.dft(two_stage=True)
    bins_arr = jnp.asarray(dft_full.scramble_index(bins))
    xconst = tone_comb_wavetable_block(
        freqs, (1.0 / nfft,) * nfft, rate, BLOCK)
    frames = BLOCK // nfft
    X = xconst.reshape(frames, nfft)
    lead = avg - 1
    bt = _pick_bt(frames, nfft)
    nr = frames // bt

    # halo staging: rows preceding each tile, wrapped mod frames (the
    # first tile of each block wraps to the previous block's tail — the
    # same constant); padded to _HALO_PAD, real rows LAST
    idx = ((np.arange(nr)[:, None]) * bt - lead +
           np.arange(_HALO_PAD)[None, :] - (_HALO_PAD - lead))
    lX = cplx.C(jnp.take(X.re, jnp.asarray(idx.reshape(-1) % frames),
                         axis=0),
                jnp.take(X.im, jnp.asarray(idx.reshape(-1) % frames),
                         axis=0))

    def kernel(ar_ref, ai_ref, lr_ref, li_ref, sr_ref, si_ref, w_ref,
               or_ref, oi_ref):
        pid = pl.program_id(0)
        a_r, a_i = ar_ref[:], ai_ref[:]
        w = w_ref[:]
        out_r = a_r * w[avg - 1][None, :]
        out_i = a_i * w[avg - 1][None, :]
        first = pid == 0           # carried spare, not the wrapped halo
        h_r = jnp.where(first, sr_ref[:], lr_ref[:])
        h_i = jnp.where(first, si_ref[:], li_ref[:])
        for i in range(lead):
            k = lead - i
            rr = jnp.concatenate([h_r[_HALO_PAD - k:], a_r[:bt - k]],
                                 axis=0)
            ri = jnp.concatenate([h_i[_HALO_PAD - k:], a_i[:bt - k]],
                                 axis=0)
            out_r = out_r + rr * w[i][None, :]
            out_i = out_i + ri * w[i][None, :]
        or_ref[:] = out_r
        oi_ref[:] = out_i

    in_blk = lambda r: (r % nr, 0)
    out_shape = (jax.ShapeDtypeStruct((K * frames, nfft), jnp.float32),
                 jax.ShapeDtypeStruct((K * frames, nfft), jnp.float32))

    H = lead * nfft

    @jax.jit
    def exec_once(spare):
        S = spare.reshape(lead, nfft)
        pad = jnp.zeros((_HALO_PAD - lead, nfft), jnp.float32)
        s_r = jnp.concatenate([pad, S.re], axis=0)
        s_i = jnp.concatenate([pad, S.im], axis=0)
        pre_r, pre_i = pl.pallas_call(
            kernel,
            grid=(K * nr,),
            in_specs=[
                pl.BlockSpec((bt, nfft), in_blk),
                pl.BlockSpec((bt, nfft), in_blk),
                pl.BlockSpec((_HALO_PAD, nfft), in_blk),
                pl.BlockSpec((_HALO_PAD, nfft), in_blk),
                pl.BlockSpec((_HALO_PAD, nfft), lambda r: (0, 0)),
                pl.BlockSpec((_HALO_PAD, nfft), lambda r: (0, 0)),
                pl.BlockSpec((avg, nfft), lambda r: (0, 0)),
            ],
            out_specs=(pl.BlockSpec((bt, nfft), lambda r: (r, 0)),
                       pl.BlockSpec((bt, nfft), lambda r: (r, 0))),
            out_shape=out_shape,
        )(X.re, X.im, lX.re, lX.im, s_r, s_i, window)
        fr = dft_full.scrambled(cplx.C(pre_r, pre_i))
        y = select_tones(fr, bins_arr)
        new_spare = xconst[BLOCK - H:]
        return new_spare, y

    return exec_once, pfb_spare_init(cfg), cfg


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu.ops import cplx

    exec_once, spare, cfg = build(jax, jnp, cplx)
    t0 = time.perf_counter()
    spare, y = exec_once(spare)
    jax.block_until_ready(y)
    compile_s = time.perf_counter() - t0

    # correctness: first 2 blocks vs the sequential (scan-form) chain
    from gpu_sdr_tpu.ops.pallas_pfb import pfb_frames_fused
    from gpu_sdr_tpu.ops.pfb import (PFBConfig, pfb_spare_init,
                                     select_tones, tone_bins)
    from gpu_sdr_tpu.ops.tonegen import tone_comb_wavetable_block
    rate, nfft, avg = 100_000_000, 1000, 4
    freqs = tuple(int(k * (rate // nfft))
                  for k in range(-nfft // 2, nfft // 2))
    bins = tuple(int(b) for b in tone_bins(freqs, rate, nfft))
    dft_full = cfg.dft(two_stage=True)
    bins_arr = jnp.asarray(dft_full.scramble_index(bins))
    window1d = cfg.window()
    xconst = tone_comb_wavetable_block(freqs, (1.0 / nfft,) * nfft, rate,
                                       BLOCK)
    sp = pfb_spare_init(cfg)
    refs = []
    fn = jax.jit(lambda s: pfb_frames_fused(
        cfg, window1d, dft_full.scrambled, s, xconst))
    for _ in range(2):
        sp, fr = fn(sp)
        refs.append(cplx.to_np(select_tones(fr, bins_arr)))
    ref = np.concatenate(refs, axis=0)
    got = cplx.to_np(y)[:ref.shape[0]]
    err = float(np.abs(ref - got).max())
    print(json.dumps({"check_max_abs_err_vs_scan_form": err}), flush=True)

    n_exec = max(1, 512 // K)
    t0 = time.perf_counter()
    for _ in range(n_exec):
        spare, y = exec_once(spare)
    jax.block_until_ready(y)
    dt = time.perf_counter() - t0
    msps = n_exec * K * BLOCK / dt / 1e6
    print(json.dumps({"variant": "gridk_presum", "K": K,
                      "block_len": BLOCK, "Msps": round(msps, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
