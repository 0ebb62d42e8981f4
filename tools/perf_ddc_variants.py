"""Config-3 (100-tone DIRECT DDC+FIR) performance decomposition on the chip.

The full config-3 chain (comb synth -> fused DDC+FIR, engine/fused.py)
measures ~1655 Msps, but its MXU FLOP count predicts several times more —
this script isolates where the time goes:

  stage 1: pure-matmul roofline at the chain's exact shapes
  stage 2: synthesis-only scan (tone_comb_block)
  stage 3: DDC-only scan (direct_ddc_fir, current 4-matmul loop form)
  stage 4: DDC-only scan, stacked single-matmul variant (nb, f*M)x(f*M, C)
  stage 5: DDC-only scan, channels padded to 128
  stage 6: full chain (synth+DDC), K=16 — comparable baseline
  stage 7: full chain at bf16 matmul precision (pass-count scaling)
  stage 8: memory-ops-only scan (concat+slices+adds, no matmuls)

Run:  nohup python tools/perf_ddc_variants.py 1 2 3 > log 2>&1 &
Each stage compiles separately (remote compiles are slow on this rig).
"""

# NOTE: this tool predates the fetch-synced timing rule (CLAUDE.md): numbers it
# printed historically are unreliable (block_until_ready early-ack / short-round
# deflation). Use bench.py / tools/bench_configs.py / tools/perf_honest_sweep.py
# or add hard_sync + steady-state rounds before trusting new runs.

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RATE = 100_000_000
L = 4_000_000          # block length (matches bench_configs config 3)
K = 16                 # blocks per execution (scan length)
CTONES = 100
DECIM, PFA = 100, 4


def timeit(fn, args, n=10):
    import jax
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, compile_s


def report(name, dt, compile_s, samples=None, cmacs=None):
    rec = {"stage": name, "ms": round(dt * 1e3, 3),
           "compile_s": round(compile_s, 1)}
    if samples:
        rec["Msps"] = round(samples / dt / 1e6, 1)
    if cmacs:
        # 1 cMAC = 3 real MACs (Karatsuba) = 6 flop per matmul pass
        rec["GcMAC_s"] = round(cmacs / dt / 1e9, 1)
    print(json.dumps(rec), flush=True)


def freqs100():
    return tuple(int(f) for f in np.linspace(-45e6, 45e6, CTONES))


def stage1():
    import jax
    from gpu_sdr_tpu.ops import cplx
    rng = np.random.default_rng(0)

    def mk(m, k):
        a = rng.standard_normal((m, k)) + 1j * rng.standard_normal((m, k))
        return cplx.from_np(a.astype(np.complex64))

    nb = L // DECIM
    shapes = [
        ("mm_square_2048", (2048, 2048), (2048, 2048)),
        ("mm_ddc_loop", (nb, DECIM), (DECIM, CTONES)),
        ("mm_ddc_pad128", (nb, 128), (128, 128)),
        ("mm_ddc_stacked", (nb, PFA * DECIM), (PFA * DECIM, CTONES)),
        ("mm_synth", (2000, CTONES), (CTONES, 2000)),
        ("mm_synth_pad128", (2000, 128), (128, 2000)),
    ]
    for name, sa, sb in shapes:
        a, b = mk(*sa), mk(*sb)
        jax.block_until_ready((a.re, b.re))
        f = jax.jit(lambda a, b: cplx.matmul(a, b))
        dt, cs = timeit(f, (a, b), n=50)
        report(name, dt, cs, cmacs=sa[0] * sa[1] * sb[1])


def _synth_cfg():
    from gpu_sdr_tpu.ops.tonegen import ToneCombConfig
    return ToneCombConfig(rate=RATE, freqs=freqs100(),
                          ampls=(0.01,) * CTONES, block_len=L)


def stage2():
    import jax
    from gpu_sdr_tpu.ops.tonegen import tone_comb_block
    cfg = _synth_cfg()
    P, Q = cfg.factors()
    step = cfg.phase_step()

    @jax.jit
    def multi(phase):
        def body(ph, _):
            ph, x = tone_comb_block(P, Q, step, RATE, ph)
            return ph, x.re[::65536].sum() + x.im[::65536].sum()
        return jax.lax.scan(body, phase, None, length=K)

    dt, cs = timeit(multi, (cfg.phase_init(),))
    report("synth_only", dt, cs, samples=K * L, cmacs=K * L * CTONES)


def _ddc_cfg():
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    return DirectDDCConfig(rate=RATE, decim=DECIM, pf_average=PFA,
                           freqs=freqs100(), phases=(0,) * CTONES)


def _const_block():
    from gpu_sdr_tpu.ops import cplx
    rng = np.random.default_rng(1)
    xb = (rng.standard_normal(L) + 1j * rng.standard_normal(L)
          ).astype(np.complex64)
    return cplx.const(xb)


def stage3():
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import (ddc_carrier_init, ddc_carrier_step,
                                     direct_ddc_fir)
    cfg = _ddc_cfg()
    hmod = cfg.modulated_taps()
    ramp = cfg.carrier_ramp(L // cfg.M)
    stepv = ddc_carrier_step(cfg, L)
    xconst = _const_block()

    @jax.jit
    def multi(phase, hist):
        def body(carry, _):
            ph, h = carry
            ph, h, y = direct_ddc_fir(hmod, ramp, stepv, cfg.rate, cfg.M,
                                      cfg.f, ph, h, xconst)
            return (ph, h), y[:1]
        return jax.lax.scan(body, (phase, hist), None, length=K)

    dt, cs = timeit(
        multi, (ddc_carrier_init(cfg, L), cplx.zeros((cfg.f - 1) * cfg.M)))
    report("ddc_only_loop", dt, cs, samples=K * L,
           cmacs=K * L * PFA * CTONES)


def _ddc_stacked(hmod, ramp, stepv, W, M, f, phase, hist, x, C_out):
    """Variant: one (nb, f*M) x (f*M, C) matmul over stacked windows."""
    import jax.numpy as jnp
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.cplx import C
    L_ = x.shape[0]
    nb = L_ // M
    ze = cplx.concat([hist, x]) if hist.shape[0] else x
    X = ze.reshape(nb + f - 1, M)
    # Xw[n, j*M+m] = ze[(n+j)*M + m] matches hmod's (j*M+m) tap order as-is
    Xw = cplx.concat([X[j:j + nb, :] for j in range(f)], axis=1)  # (nb, f*M)
    acc = cplx.matmul(Xw, hmod)
    theta = phase.astype(jnp.float32) * jnp.float32(2.0 * np.pi / W)
    rot = cplx.expi_neg(theta)
    y = cplx.mul(cplx.mul(acc, ramp), C(rot.re[None, :], rot.im[None, :]))
    new_phase = phase + stepv
    new_phase = jnp.where(new_phase >= W, new_phase - W, new_phase)
    new_hist = ze[L_:] if hist.shape[0] else hist
    return new_phase, new_hist, y


def stage4():
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import ddc_carrier_init, ddc_carrier_step
    cfg = _ddc_cfg()
    # stacked taps need H[j*M+m, c] contracted as window col j*M+m = X[n+j, m]
    # -> reorder taps to (m-major, j-minor)? build via transpose inside.
    hmod = cfg.modulated_taps()
    ramp = cfg.carrier_ramp(L // cfg.M)
    stepv = ddc_carrier_step(cfg, L)
    xconst = _const_block()

    @jax.jit
    def multi(phase, hist):
        def body(carry, _):
            ph, h = carry
            ph, h, y = _ddc_stacked(hmod, ramp, stepv, cfg.rate, cfg.M,
                                    cfg.f, ph, h, xconst, cfg.n_channels)
            return (ph, h), y[:1]
        return jax.lax.scan(body, (phase, hist), None, length=K)

    dt, cs = timeit(
        multi, (ddc_carrier_init(cfg, L), cplx.zeros((cfg.f - 1) * cfg.M)))
    report("ddc_only_stacked", dt, cs, samples=K * L,
           cmacs=K * L * PFA * CTONES)


def stage5():
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import (DirectDDCConfig, ddc_carrier_init,
                                     ddc_carrier_step, direct_ddc_fir)
    fr = freqs100() + tuple(range(1_000_000, 1_028_000, 1000))  # pad to 128
    cfg = DirectDDCConfig(rate=RATE, decim=DECIM, pf_average=PFA,
                          freqs=fr, phases=(0,) * 128)
    hmod = cfg.modulated_taps()
    ramp = cfg.carrier_ramp(L // cfg.M)
    stepv = ddc_carrier_step(cfg, L)
    xconst = _const_block()

    @jax.jit
    def multi(phase, hist):
        def body(carry, _):
            ph, h = carry
            ph, h, y = direct_ddc_fir(hmod, ramp, stepv, cfg.rate, cfg.M,
                                      cfg.f, ph, h, xconst)
            return (ph, h), y[:1]
        return jax.lax.scan(body, (phase, hist), None, length=K)

    dt, cs = timeit(
        multi, (ddc_carrier_init(cfg, L), cplx.zeros((cfg.f - 1) * cfg.M)))
    report("ddc_only_pad128", dt, cs, samples=K * L,
           cmacs=K * L * PFA * 128)


def _full_chain():
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import (ddc_carrier_init, ddc_carrier_step,
                                     direct_ddc_fir)
    from gpu_sdr_tpu.ops.tonegen import tone_comb_block
    scfg = _synth_cfg()
    P, Q = scfg.factors()
    sstep = scfg.phase_step()
    dcfg = _ddc_cfg()
    hmod = dcfg.modulated_taps()
    ramp = dcfg.carrier_ramp(L // dcfg.M)
    dstep = ddc_carrier_step(dcfg, L)

    @jax.jit
    def multi(sphase, dphase, hist):
        def body(carry, _):
            sph, dph, h = carry
            sph, x = tone_comb_block(P, Q, sstep, RATE, sph)
            dph, h, y = direct_ddc_fir(hmod, ramp, dstep, dcfg.rate,
                                       dcfg.M, dcfg.f, dph, h, x)
            return (sph, dph, h), y[:1]
        return jax.lax.scan(body, (sphase, dphase, hist), None, length=K)

    args = (scfg.phase_init(), ddc_carrier_init(dcfg, L),
            cplx.zeros((dcfg.f - 1) * dcfg.M))
    return multi, args


def stage6():
    multi, args = _full_chain()
    dt, cs = timeit(multi, args)
    report("full_chain_K16", dt, cs, samples=K * L,
           cmacs=K * L * (PFA + 1) * CTONES)


def stage7():
    import jax
    jax.config.update("jax_default_matmul_precision", "bfloat16")
    try:
        multi, args = _full_chain()
        dt, cs = timeit(multi, args)
        report("full_chain_K16_bf16", dt, cs, samples=K * L,
               cmacs=K * L * (PFA + 1) * CTONES)
    finally:
        jax.config.update("jax_default_matmul_precision", "tensorfloat32")


def stage8():
    import jax
    from gpu_sdr_tpu.ops import cplx
    cfg = _ddc_cfg()
    xconst = _const_block()
    nb, M, f = L // cfg.M, cfg.M, cfg.f

    @jax.jit
    def multi(hist):
        def body(h, _):
            ze = cplx.concat([h, xconst])
            X = ze.reshape(nb + f - 1, M)
            acc = X[0:nb, :]
            for j in range(1, f):
                acc = acc + X[j:j + nb, :]
            return ze[L:], acc.re[:1, :1] + acc.im[:1, :1]
        return jax.lax.scan(body, hist, None, length=K)

    dt, cs = timeit(multi, (cplx.zeros((f - 1) * M),))
    report("memops_only", dt, cs, samples=K * L)


def stage9():
    """DDC-only scan with the fused Pallas kernel (ops/pallas_ddc.py)."""
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import ddc_carrier_init, ddc_carrier_step
    from gpu_sdr_tpu.ops.pallas_ddc import ddc_fused
    cfg = _ddc_cfg()
    hmod = cfg.modulated_taps()
    ramp = cfg.carrier_ramp(L // cfg.M)
    stepv = ddc_carrier_step(cfg, L)
    xconst = _const_block()

    @jax.jit
    def multi(phase, hist):
        def body(carry, _):
            ph, h = carry
            ph, h, y = ddc_fused(hmod, ramp, stepv, cfg.rate, cfg.M,
                                 cfg.f, ph, h, xconst)
            return (ph, h), y[:1]
        return jax.lax.scan(body, (phase, hist), None, length=K)

    dt, cs = timeit(
        multi, (ddc_carrier_init(cfg, L), cplx.zeros((cfg.f - 1) * cfg.M)))
    report("ddc_only_pallas", dt, cs, samples=K * L,
           cmacs=K * L * PFA * CTONES)


def stage10():
    """Full chain (synth + fused Pallas DDC), K=16."""
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import ddc_carrier_init, ddc_carrier_step
    from gpu_sdr_tpu.ops.pallas_ddc import ddc_fused
    from gpu_sdr_tpu.ops.tonegen import tone_comb_block
    scfg = _synth_cfg()
    P, Q = scfg.factors()
    sstep = scfg.phase_step()
    dcfg = _ddc_cfg()
    hmod = dcfg.modulated_taps()
    ramp = dcfg.carrier_ramp(L // dcfg.M)
    dstep = ddc_carrier_step(dcfg, L)

    @jax.jit
    def multi(sphase, dphase, hist):
        def body(carry, _):
            sph, dph, h = carry
            sph, x = tone_comb_block(P, Q, sstep, RATE, sph)
            dph, h, y = ddc_fused(hmod, ramp, dstep, dcfg.rate,
                                  dcfg.M, dcfg.f, dph, h, x)
            return (sph, dph, h), y[:1]
        return jax.lax.scan(body, (sphase, dphase, hist), None, length=K)

    args = (scfg.phase_init(), ddc_carrier_init(dcfg, L),
            cplx.zeros((dcfg.f - 1) * dcfg.M))
    dt, cs = timeit(multi, args)
    report("full_chain_pallas_K16", dt, cs, samples=K * L,
           cmacs=K * L * (PFA + 1) * CTONES)


def stage12():
    """DDC-only scan, fused Pallas kernel with bf16 hi/lo split dots."""
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import ddc_carrier_init, ddc_carrier_step
    from gpu_sdr_tpu.ops.pallas_ddc import ddc_fused
    cfg = _ddc_cfg()
    hmod = cfg.modulated_taps()
    ramp = cfg.carrier_ramp(L // cfg.M)
    stepv = ddc_carrier_step(cfg, L)
    xconst = _const_block()

    @jax.jit
    def multi(phase, hist):
        def body(carry, _):
            ph, h = carry
            ph, h, y = ddc_fused(hmod, ramp, stepv, cfg.rate, cfg.M,
                                 cfg.f, ph, h, xconst, precision="tf32")
            return (ph, h), y[:1]
        return jax.lax.scan(body, (phase, hist), None, length=K)

    dt, cs = timeit(
        multi, (ddc_carrier_init(cfg, L), cplx.zeros((cfg.f - 1) * cfg.M)))
    report("ddc_only_pallas_tf32", dt, cs, samples=K * L,
           cmacs=K * L * PFA * CTONES)


def stage13():
    """Full chain (synth + fused Pallas DDC, tf32 split), K=16; plus the
    on-chip numerics of the split vs the XLA tf32 path."""
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import (ddc_carrier_init, ddc_carrier_step,
                                     direct_ddc_fir)
    from gpu_sdr_tpu.ops.pallas_ddc import ddc_fused
    from gpu_sdr_tpu.ops.tonegen import tone_comb_block
    dcfg = _ddc_cfg()
    hmod = dcfg.modulated_taps()
    ramp = dcfg.carrier_ramp(L // dcfg.M)
    dstep = ddc_carrier_step(dcfg, L)
    xconst = _const_block()
    ph = ddc_carrier_init(dcfg, L)
    hist = cplx.zeros((dcfg.f - 1) * dcfg.M)
    _, _, ya = jax.jit(lambda: direct_ddc_fir(
        hmod, ramp, dstep, dcfg.rate, dcfg.M, dcfg.f, ph, hist, xconst))()
    _, _, yb = jax.jit(lambda: ddc_fused(
        hmod, ramp, dstep, dcfg.rate, dcfg.M, dcfg.f, ph, hist, xconst,
        precision="tf32"))()
    a, b = cplx.to_np(ya), cplx.to_np(yb)
    num = float(np.sum(np.abs(a - b) ** 2))
    den = float(np.sum(np.abs(a) ** 2))
    print(json.dumps({"stage": "pallas_tf32_vs_xla_onchip",
                      "rel_err_db": round(10 * np.log10(num / den), 1)
                      if num else -999}), flush=True)

    scfg = _synth_cfg()
    P, Q = scfg.factors()
    sstep = scfg.phase_step()

    @jax.jit
    def multi(sphase, dphase, hist):
        def body(carry, _):
            sph, dph, h = carry
            sph, x = tone_comb_block(P, Q, sstep, RATE, sph)
            dph, h, y = ddc_fused(hmod, ramp, dstep, dcfg.rate,
                                  dcfg.M, dcfg.f, dph, h, x,
                                  precision="tf32")
            return (sph, dph, h), y[:1]
        return jax.lax.scan(body, (sphase, dphase, hist), None, length=K)

    args = (scfg.phase_init(), ddc_carrier_init(dcfg, L),
            cplx.zeros((dcfg.f - 1) * dcfg.M))
    dt, cs = timeit(multi, args)
    report("full_chain_pallas_tf32_K16", dt, cs, samples=K * L,
           cmacs=K * L * (PFA + 1) * CTONES)


def stage14():
    """Single-kernel TONES->DIRECT chain (ops/pallas_chain.py), K=16,
    plus numerics vs the composed XLA path."""
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import (ddc_carrier_init, ddc_carrier_step,
                                     direct_ddc_fir)
    from gpu_sdr_tpu.ops.pallas_chain import TonesDirectChain
    from gpu_sdr_tpu.ops.tonegen import tone_comb_block
    fr = freqs100()
    dcfg = _ddc_cfg()
    chain = TonesDirectChain(rate=RATE, tx_freqs=fr,
                             tx_ampls=(0.01,) * CTONES, cfg=dcfg,
                             block_len=L)
    assert chain.ok, "chain geometry must tile"

    # numerics: one block vs composed XLA synth + XLA DDC
    scfg = _synth_cfg()
    P, Q = scfg.factors()
    sstep = scfg.phase_step()
    hmod = dcfg.modulated_taps()
    ramp = dcfg.carrier_ramp(L // dcfg.M)
    dstep = ddc_carrier_step(dcfg, L)

    @jax.jit
    def composed():
        _, x = tone_comb_block(P, Q, sstep, RATE, scfg.phase_init())
        _, _, y = direct_ddc_fir(
            hmod, ramp, dstep, dcfg.rate, dcfg.M, dcfg.f,
            ddc_carrier_init(dcfg, L), cplx.zeros((dcfg.f - 1) * dcfg.M),
            x)
        return y
    ya = cplx.to_np(composed())
    _, yb = jax.jit(chain.step)(chain.init_state())
    b = cplx.to_np(yb)
    num = float(np.sum(np.abs(ya - b) ** 2))
    den = float(np.sum(np.abs(ya) ** 2))
    print(json.dumps({"stage": "chain_vs_composed_onchip",
                      "rel_err_db": round(10 * np.log10(num / den), 1)
                      if num else -999}), flush=True)

    chain_step = chain.step

    @jax.jit
    def multi(state):
        def body(st, _):
            st, y = chain_step(st)
            return st, y[:1]
        return jax.lax.scan(body, state, None, length=K)

    dt, cs = timeit(multi, (chain.init_state(),))
    report("full_chain_single_kernel_K16", dt, cs, samples=K * L,
           cmacs=K * L * (PFA + 1) * CTONES)


def stage11():
    """On-chip numerics: fused Pallas kernel vs the XLA path, one block."""
    import jax
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops.ddc import (ddc_carrier_init, ddc_carrier_step,
                                     direct_ddc_fir)
    from gpu_sdr_tpu.ops.pallas_ddc import ddc_fused
    cfg = _ddc_cfg()
    hmod = cfg.modulated_taps()
    ramp = cfg.carrier_ramp(L // cfg.M)
    stepv = ddc_carrier_step(cfg, L)
    xconst = _const_block()
    ph = ddc_carrier_init(cfg, L)
    hist = cplx.zeros((cfg.f - 1) * cfg.M)
    _, _, ya = jax.jit(lambda: direct_ddc_fir(
        hmod, ramp, stepv, cfg.rate, cfg.M, cfg.f, ph, hist, xconst))()
    _, _, yb = jax.jit(lambda: ddc_fused(
        hmod, ramp, stepv, cfg.rate, cfg.M, cfg.f, ph, hist, xconst))()
    a, b = cplx.to_np(ya), cplx.to_np(yb)
    num = float(np.sum(np.abs(a - b) ** 2))
    den = float(np.sum(np.abs(a) ** 2))
    print(json.dumps({"stage": "pallas_vs_xla_onchip",
                      "rel_err_db": round(10 * np.log10(num / den), 1)
                      if num else -999}), flush=True)


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    stages = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4, 5, 6, 7, 8]
    import jax
    print(json.dumps({"backend": jax.default_backend(),
                      "stages": stages}), flush=True)
    for s in stages:
        globals()[f"stage{s}"]()


if __name__ == "__main__":
    main()
