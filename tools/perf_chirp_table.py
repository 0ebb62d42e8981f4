"""Config-2 chirp lock-in variants, back-to-back on the real chip.

  sincos — production kernel (pallas_chirp_lockin_at): oscillator
           recomputed per sample from the uint32 accumulator (VPU
           sincos), signal rows streamed from the resident period.
  table  — pallas_chirp_lockin_table: oscillator rows READ from a
           resident one-period wavetable (the TONES wavetable trick
           applied to the CHIRP demodulator); pure mix+reduce per tile,
           two streamed inputs.

Geometry = BASELINE config 2: 100 Msps, +-40 MHz sweep, 5000 points,
ppt=20000, 4M blocks, K=32 per execution.
Run: nohup python tools/perf_chirp_table.py > log 2>&1 &
"""

import json
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
    from gpu_sdr_tpu.ops.pallas_lockin import (pallas_chirp_lockin_at,
                                               pallas_chirp_lockin_table)

    rate = 100_000_000
    cfg = ChirpConfig.from_params(-40_000_000, 40_000_000, rate, 5000, 1.0)
    ppt = cfg.length                      # decim = 1
    L, K = 4_000_000, 32
    nseg_pb = L // ppt
    nblk = cfg.period // L
    profile = jnp.asarray(lockin_ops.lockin_profile(ppt))

    @jax.jit
    def gen_period():
        def body(last, _):
            last, x = chirp_ops.chirp_block(cfg, last, L)
            return last, x
        _, xs = jax.lax.scan(body, jnp.uint32(0), None, length=nblk)
        return xs

    xs = gen_period()
    total_nseg = cfg.period // ppt
    Xf = C(xs.re.reshape(total_nseg, ppt), xs.im.reshape(total_nseg, ppt))

    def hard_sync(arr):
        return float(np.asarray(jax.device_get(arr.re.reshape(-1)[0])))

    def timeit(name, multi, state0):
        st, ys = multi(state0)
        jax.block_until_ready(ys)
        hard_sync(ys)
        n_exec = max(1, 16_384 // K)
        per_round = max(1, n_exec // 4)
        best = 0.0
        for _ in range(4):
            st = state0
            t0 = time.perf_counter()
            for _ in range(per_round):
                st, ys = multi(st)
            jax.block_until_ready(ys)
            hard_sync(ys)
            dt = time.perf_counter() - t0
            best = max(best, per_round * K * L / dt / 1e6)
        print(json.dumps({"variant": name, "msps": round(best, 1),
                          "vs_baseline": round(best / 100.0, 2)}),
              flush=True)

    # the 800 MB period must cross the jit boundary as an ARGUMENT — a
    # closure constant is inlined into this rig's remote-compile request
    # (HTTP 413; same rule as the production chains' state-carried
    # wavetables, docs/05_performance.md)

    # --- sincos: the current production chain body ---
    def body_sincos(X, carry, _):
        last, i = carry
        last, y = pallas_chirp_lockin_at(cfg, profile, last, X, i,
                                         nseg_pb)
        nxt = i + 1
        nxt = jnp.where(nxt >= nblk, nxt - nblk, nxt)
        return (last, nxt), C(y.re[:, None], y.im[:, None])

    import functools
    sincos = jax.jit(lambda s, X: jax.lax.scan(
        functools.partial(body_sincos, X), s, None, length=K))
    timeit("sincos", lambda s: sincos(s, Xf),
           (jnp.uint32(0), jnp.int32(0)))

    # --- table: oscillator rows read from the same resident period ---
    def body_table(X, i, _):
        y = pallas_chirp_lockin_table(profile, X, X, i, nseg_pb)
        nxt = i + 1
        nxt = jnp.where(nxt >= nblk, nxt - nblk, nxt)
        return nxt, C(y.re[:, None], y.im[:, None])

    table = jax.jit(lambda s, X: jax.lax.scan(
        functools.partial(body_table, X), s, None, length=K))
    timeit("table", lambda s: table(s, Xf), jnp.int32(0))

    # numerics: one block, table vs sincos
    _, y_s = pallas_chirp_lockin_at(cfg, profile, jnp.uint32(0), Xf,
                                    jnp.int32(0), nseg_pb)
    y_t = pallas_chirp_lockin_table(profile, Xf, Xf, jnp.int32(0),
                                    nseg_pb)
    a = np.asarray(y_s.re) + 1j * np.asarray(y_s.im)
    b = np.asarray(y_t.re) + 1j * np.asarray(y_t.im)
    err = np.sum(np.abs(a - b) ** 2) / (np.sum(np.abs(a) ** 2) or 1.0)
    snr = -10 * np.log10(err) if err else 999.0
    print(json.dumps({"table_vs_sincos_snr_db": round(float(snr), 1)}),
          flush=True)


if __name__ == "__main__":
    main()
