"""Channel-major (transposed) fold kernel vs the lane-padded row-major
form at the config-3 shape (round 5, the last named config-3 headroom).

The padded row-major chain writes 10.24 B/sample (28 dead lanes of 128);
the transposed kernel writes the SAME samples dense at 8 B/sample with
the time rows on the lane axis — ceiling 429/8 = 53.6 Gsps vs the padded
form's 41.9.  Needs nb % 128 == 0, so both forms run at
block_len = 4_096_000 (plus the production 4_000_000 padded control).

Run: nohup python tools/perf_c3_t.py > logs/c3_t.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RATE = 100_000_000


def hard_sync(x):
    import jax
    import jax.numpy as jnp
    arr = x.re if hasattr(x, "re") else x
    return float(np.asarray(jax.device_get(jnp.ravel(arr)[0])))


def main():
    import jax
    import bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_chain import (TonesDirectFoldKernel,
                                              TonesDirectFoldT)

    freqs100 = tuple(int(f) for f in np.linspace(-45e6, 45e6, 100))
    pad = tuple(range(1, 29))
    freqs128 = freqs100 + pad
    out = lambda **kw: print(json.dumps(kw), flush=True)

    def make_row(n_tones, L, R=None):
        fs = freqs128 if n_tones == 128 else freqs100
        amp = (0.01,) * 100 + ((0.0,) * 28 if n_tones == 128 else ())
        dcfg = DirectDDCConfig(rate=RATE, decim=100, pf_average=4,
                               freqs=fs, phases=(0,) * n_tones)
        ch = TonesDirectFoldKernel(rate=RATE, tx_freqs=fs, tx_ampls=amp,
                                   cfg=dcfg, block_len=L, rows=R)
        assert ch.ok, (n_tones, L)
        return ch

    def make_t(L, R=None):
        dcfg = DirectDDCConfig(rate=RATE, decim=100, pf_average=4,
                               freqs=freqs100, phases=(0,) * 100)
        ch = TonesDirectFoldT(rate=RATE, tx_freqs=freqs100,
                              tx_ampls=(0.01,) * 100, cfg=dcfg,
                              block_len=L, rows=R)
        assert ch.ok, (L, R, getattr(ch, "R", None))
        return ch

    # numeric check on chip: T vs padded row-major, first 100 lanes
    L = 4_096_000
    ct = make_t(L)
    cr = make_row(128, L)
    out(stage="geometry", R_t=ct.R, R_row=cr.R)
    st, yt = jax.jit(lambda s: ct.multi_step(s, 2))(ct.init_state())
    sr, yr = jax.jit(lambda s: cr.multi_step(s, 2))(cr.init_state())
    a = np.asarray(jax.device_get(yr.re))[: 2 * ct.nb, :100]
    b = np.asarray(jax.device_get(yt.re))[:100, : 2 * ct.nb].T
    snr = 10 * np.log10(np.sum(a * a) / max(np.sum((a - b) ** 2), 1e-30))
    out(stage="t_vs_padded_row_snr_db", snr=round(float(snr), 1))

    def time_chain(ch, K=64, tag=""):
        @jax.jit
        def step(st):
            return ch.multi_step(st, K)
        st = ch.init_state()
        st, y = step(st)
        hard_sync(y)
        n_exec = max(1, 16_384_000_000 // (K * ch.block_len) // 4)
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(n_exec):
                st, y = step(st)
            hard_sync(y)
            dt = time.perf_counter() - t0
            best = max(best, n_exec * K * ch.block_len / dt / 1e6)
        out(stage=tag, msps=round(best, 1))
        return best

    time_chain(make_row(128, 4_000_000), tag="row_padded_4.0M")
    time_chain(cr, tag="row_padded_4.096M")
    time_chain(ct, tag="t_dense_4.096M")
    # tile ladder for the T form
    for R in (1024, 2048):
        try:
            time_chain(make_t(L, R=R), tag=f"t_dense_R{R}")
        except Exception as e:
            out(stage=f"t_dense_R{R}", error=str(e)[:150])
    time_chain(make_row(128, 4_000_000), tag="row_padded_4.0M_again")


if __name__ == "__main__":
    main()
