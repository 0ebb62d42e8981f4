"""Single-kernel fused TONES->DIRECT chain (interpret mode) vs the
composed reference path (tone_comb_block -> direct_ddc_fir)."""

import jax
import numpy as np
import pytest

from gpu_sdr_tpu import golden
from gpu_sdr_tpu.ops import cplx
from gpu_sdr_tpu.ops.ddc import (DirectDDCConfig, ddc_carrier_init,
                                 ddc_carrier_step, direct_ddc_fir)
from gpu_sdr_tpu.ops.pallas_chain import TonesDirectChain
from gpu_sdr_tpu.ops.tonegen import ToneCombConfig, tone_comb_block


def composed_blocks(rate, tx_freqs, ampls, dcfg, L, n_blocks):
    """Reference path: XLA comb synthesis feeding the XLA DDC+FIR."""
    scfg = ToneCombConfig(rate=rate, freqs=tx_freqs, ampls=ampls,
                          block_len=L)
    P, Q = scfg.factors()
    sstep = scfg.phase_step()
    hmod = dcfg.modulated_taps()
    ramp = dcfg.carrier_ramp(L // dcfg.M)
    dstep = ddc_carrier_step(dcfg, L)
    sph = scfg.phase_init()
    dph = ddc_carrier_init(dcfg, L)
    hist = cplx.zeros((dcfg.f - 1) * dcfg.M)
    outs = []
    for _ in range(n_blocks):
        sph, x = tone_comb_block(P, Q, sstep, rate, sph)
        dph, hist, y = direct_ddc_fir(hmod, ramp, dstep, dcfg.rate,
                                      dcfg.M, dcfg.f, dph, hist, x)
        outs.append(cplx.to_np(y))
    return np.concatenate(outs, axis=0)


@pytest.mark.parametrize("n_tx,n_rx,M,f,L", [
    (5, 3, 10, 4, 480),
    (2, 2, 16, 2, 512),
    (4, 1, 8, 8, 1024),
])
def test_chain_matches_composed(n_tx, n_rx, M, f, L):
    rate = 10_000
    tx_freqs = tuple(int(x) for x in np.linspace(-3000, 3000, n_tx))
    ampls = tuple(0.3 + 0.1 * i for i in range(n_tx))
    rx_freqs = tx_freqs[:n_rx]
    dcfg = DirectDDCConfig(rate=rate, decim=M, pf_average=f,
                           freqs=rx_freqs, phases=(0,) * n_rx)
    ref = composed_blocks(rate, tx_freqs, ampls, dcfg, L, 4)
    chain = TonesDirectChain(rate=rate, tx_freqs=tx_freqs, tx_ampls=ampls,
                             cfg=dcfg, block_len=L, interpret=True)
    assert chain.ok
    state = chain.init_state()
    outs = []
    step = jax.jit(chain.step)
    for _ in range(4):
        state, y = step(state)
        outs.append(cplx.to_np(y))
    out = np.concatenate(outs, axis=0)
    assert out.shape == ref.shape
    snr = golden.snr_db(ref, out)
    assert snr > 90.0, snr


def test_chain_first_block_zero_history():
    """Block 0's FIR history must be zero (not synthesized from a
    nonexistent block -1): its first outputs match the composed path."""
    rate, M, f, L = 10_000, 10, 4, 480
    tx_freqs = (1000, -2000)
    ampls = (0.5, 0.25)
    dcfg = DirectDDCConfig(rate=rate, decim=M, pf_average=f,
                           freqs=tx_freqs, phases=(0, 0))
    ref = composed_blocks(rate, tx_freqs, ampls, dcfg, L, 1)
    chain = TonesDirectChain(rate=rate, tx_freqs=tx_freqs, tx_ampls=ampls,
                             cfg=dcfg, block_len=L, interpret=True)
    state = chain.init_state()
    _, y = chain.step(state)
    out = cplx.to_np(y)
    assert golden.snr_db(ref, out) > 90.0


def test_chain_matches_golden_end_to_end():
    """Chain output vs the float64 numpy oracle over several blocks."""
    rate, M, f, L = 10_000, 10, 4, 800
    tx_freqs = (1000, -2500, 400)
    ampls = (0.5, 0.3, 0.2)
    dcfg = DirectDDCConfig(rate=rate, decim=M, pf_average=f,
                           freqs=tx_freqs, phases=(0,) * 3)
    n_blocks = 3
    x = golden.tone_block(tx_freqs, ampls, rate, 0, n_blocks * L)
    gold = golden.GoldenDirectDemodulator(tx_freqs, rate, M, f)
    ref = np.concatenate(
        [gold(x[i * L:(i + 1) * L]) for i in range(n_blocks)], axis=1)
    chain = TonesDirectChain(rate=rate, tx_freqs=tx_freqs, tx_ampls=ampls,
                             cfg=dcfg, block_len=L, interpret=True)
    state = chain.init_state()
    outs = []
    for _ in range(n_blocks):
        state, y = chain.step(state)
        outs.append(cplx.to_np(y).T)
    out = np.concatenate(outs, axis=1)
    assert out.shape == ref.shape
    assert golden.snr_db(ref, out) > 95.0


def test_chain_untileable_geometry_rejected():
    dcfg = DirectDDCConfig(rate=10_000, decim=7, pf_average=4,
                           freqs=(100,), phases=(0,))
    chain = TonesDirectChain(rate=10_000, tx_freqs=(100,), tx_ampls=(1.0,),
                             cfg=dcfg, block_len=7 * 13, interpret=True)
    assert not chain.ok


def test_chain_multi_step_equals_sequential():
    """multi_step(state, K) must produce exactly the K sequential step()
    outputs (same kernel, same rotations, no carry drift)."""
    rate, M, f, L = 10_000, 10, 4, 480
    tx_freqs = (1234, -2777, 401)
    ampls = (0.5, 0.3, 0.2)
    dcfg = DirectDDCConfig(rate=rate, decim=M, pf_average=f,
                           freqs=tx_freqs[:2], phases=(0, 0))
    chain = TonesDirectChain(rate=rate, tx_freqs=tx_freqs, tx_ampls=ampls,
                             cfg=dcfg, block_len=L, interpret=True)
    assert chain.ok
    st = chain.init_state()
    seq = []
    for _ in range(3):
        st, y = chain.step(st)
        seq.append(cplx.to_np(y))
    st2 = chain.init_state()
    st2, ym = chain.multi_step(st2, 3)
    assert np.array_equal(np.concatenate(seq, axis=0), cplx.to_np(ym))
    assert np.array_equal(np.asarray(st[0]), np.asarray(st2[0]))
    assert np.array_equal(np.asarray(st[1]), np.asarray(st2[1]))


# ----------------------------------------------------------------------
# Shift-fold kernel (TonesDirectFoldKernel): the fold_chain algebra in
# one HBM pass
# ----------------------------------------------------------------------

from gpu_sdr_tpu.ops.pallas_chain import TonesDirectFoldKernel


@pytest.mark.parametrize("n_tx,n_rx,M,f,L", [
    (5, 3, 10, 4, 480),
    (2, 2, 16, 2, 512),
    (4, 1, 8, 8, 1024),
])
def test_fold_kernel_matches_composed(n_tx, n_rx, M, f, L):
    rate = 10_000
    tx_freqs = tuple(int(x) for x in np.linspace(-3000, 3000, n_tx))
    ampls = tuple(0.3 + 0.1 * i for i in range(n_tx))
    rx_freqs = tx_freqs[:n_rx]
    dcfg = DirectDDCConfig(rate=rate, decim=M, pf_average=f,
                           freqs=rx_freqs, phases=(0,) * n_rx)
    ref = composed_blocks(rate, tx_freqs, ampls, dcfg, L, 4)
    chain = TonesDirectFoldKernel(rate=rate, tx_freqs=tx_freqs,
                                  tx_ampls=ampls, cfg=dcfg, block_len=L,
                                  interpret=True)
    assert chain.ok
    state = chain.init_state()
    outs = []
    step = jax.jit(chain.step)
    for _ in range(4):
        state, y = step(state)
        outs.append(cplx.to_np(y))
    out = np.concatenate(outs, axis=0)
    assert out.shape == ref.shape
    snr = golden.snr_db(ref.ravel(), out.ravel())
    assert snr > 90.0, f"SNR {snr:.1f} dB"
    # the startup rows specifically (the outside-the-kernel correction)
    snr0 = golden.snr_db(ref[:f - 1].ravel(), out[:f - 1].ravel()) \
        if f > 1 else 999.0
    assert snr0 > 80.0, f"startup rows SNR {snr0:.1f} dB"


def test_fold_kernel_matches_fold_chain_and_multi_step():
    """The kernel form must agree with the XLA fold chain (same algebra)
    and its K-block grid invocation with the sequential one."""
    from gpu_sdr_tpu.ops.fold_chain import TonesDirectFoldChain
    rate = 1_000_000
    freqs = tuple(int(x) for x in np.linspace(-450_000, 450_000, 24))
    ampls = (0.05,) * len(freqs)
    dcfg = DirectDDCConfig(rate=rate, decim=20, pf_average=4,
                           freqs=freqs, phases=(0,) * len(freqs))
    L = 8_000
    xla = TonesDirectFoldChain(rate=rate, tx_freqs=freqs, tx_ampls=ampls,
                               cfg=dcfg, block_len=L)
    krn = TonesDirectFoldKernel(rate=rate, tx_freqs=freqs, tx_ampls=ampls,
                                cfg=dcfg, block_len=L, interpret=True)
    assert xla.ok and krn.ok

    sx = xla.init_state()
    sx, yx = xla.multi_step(sx, 4)
    sk = krn.init_state()
    sk, yk = krn.multi_step(sk, 4)
    snr = golden.snr_db(cplx.to_np(yx).ravel(), cplx.to_np(yk).ravel())
    assert snr > 90.0, f"kernel vs XLA fold SNR {snr:.1f} dB"

    # K-block grid == sequential single blocks (state carry across calls)
    sk2 = krn.init_state()
    outs = []
    for _ in range(4):
        sk2, y1 = krn.multi_step(sk2, 1)
        outs.append(cplx.to_np(y1))
    seq = np.concatenate(outs, axis=0)
    snr2 = golden.snr_db(seq.ravel(), cplx.to_np(yk).ravel())
    assert snr2 > 120.0, f"multi vs sequential SNR {snr2:.1f} dB"


def test_fold_kernel_factored_matches_streamed():
    """invoke_factored (P1 constant block + Vandermonde rotation rows;
    round 4, +26% on chip) must match the streamed-P invoke to float32
    accuracy for both self-ramp and streamed-ramp configurations."""
    import jax
    from gpu_sdr_tpu import golden
    from gpu_sdr_tpu.ops import cplx as _cplx
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_chain import TonesDirectFoldKernel

    rate = 1_000_000
    tx_freqs = (12_345, -67_891, 300_001)
    for rx_freqs in (tx_freqs,                      # self_ramp
                     (12_345, -67_891, 299_999)):   # streamed ramp
        cfg = DirectDDCConfig(rate=rate, decim=100, pf_average=4,
                              freqs=rx_freqs, phases=(0,) * 3)
        ch = TonesDirectFoldKernel(rate=rate, tx_freqs=tx_freqs,
                                   tx_ampls=(0.3, 0.3, 0.4), cfg=cfg,
                                   block_len=100_000, interpret=True)
        assert ch.ok
        assert ch.self_ramp == (rx_freqs == tx_freqs)
        K = 2
        st = ch.init_state()
        st_f, crots, qrots = ch.block_rotations_factored(st, K)
        y_f = ch.invoke_factored(crots, qrots, K, interpret=True)
        st_s, srots, drots = ch.block_rotations(st, K)
        y_s = ch.invoke(ch._P, ch._G2, ch._ramp, srots, drots, K,
                        interpret=True)
        a = _cplx.to_np(y_f)
        b = _cplx.to_np(y_s)
        snr = golden.snr_db(b, a)
        assert snr > 110, f"factored vs streamed: {snr:.1f} dB"


def test_fold_kernel_rotg_matches_factored():
    """The rotate-G2 variant (_fold_rotg_kernel: per-tile rotation moved
    onto the small G2 constant, P1 presplit host-side) must match the
    factored form for both ramp configurations.  Perf-rejected on chip
    (18.3 vs 18.6 Gsps, tools/perf_c3_ladder.py — the kernel is
    write-bound, not VPU-bound) but kept available and correct."""
    rate = 1_000_000
    tx_freqs = (12_345, -67_891, 300_001)
    for rx_freqs in (tx_freqs,                      # self_ramp
                     (12_345, -67_891, 299_999)):   # streamed ramp
        cfg = DirectDDCConfig(rate=rate, decim=100, pf_average=4,
                              freqs=rx_freqs, phases=(0,) * 3)
        kw = dict(rate=rate, tx_freqs=tx_freqs, tx_ampls=(0.3, 0.3, 0.4),
                  cfg=cfg, block_len=100_000, interpret=True)
        a = TonesDirectFoldKernel(**kw)
        b = TonesDirectFoldKernel(rotg=True, **kw)
        assert a.ok and b.ok
        sa, sb = a.init_state(), b.init_state()
        for _ in range(2):                          # state carry too
            sa, ya = a.multi_step(sa, 2)
            sb, yb = b.multi_step(sb, 2)
            snr = golden.snr_db(cplx.to_np(ya).ravel(),
                                cplx.to_np(yb).ravel())
            assert snr > 95, f"rotg vs factored: {snr:.1f} dB"


def test_fold_t_kernel_matches_row_major():
    """The channel-major fold kernel (TonesDirectFoldT) must match the
    row-major factored form transposed, for both ramp configurations and
    across the state carry (incl. the transposed startup correction)."""
    from gpu_sdr_tpu.ops.pallas_chain import TonesDirectFoldT
    rate = 1_000_000
    tx_freqs = tuple(int(x) for x in np.linspace(-400_000, 400_000, 10))
    for rx_freqs in (tx_freqs, tuple(f + 1000 for f in tx_freqs)):
        cfg = DirectDDCConfig(rate=rate, decim=10, pf_average=4,
                              freqs=rx_freqs, phases=(0,) * 10)
        kw = dict(rate=rate, tx_freqs=tx_freqs, tx_ampls=(0.1,) * 10,
                  cfg=cfg, block_len=25_600, interpret=True)
        a = TonesDirectFoldKernel(**kw)
        b = TonesDirectFoldT(**kw)
        assert a.ok and b.ok
        assert b.R % 128 == 0 and b.self_ramp == a.self_ramp
        sa, sb = a.init_state(), b.init_state()
        for _ in range(2):
            sa, ya = a.multi_step(sa, 3)
            sb, yb = b.multi_step(sb, 3)
            ra = cplx.to_np(ya)
            rb = cplx.to_np(yb).T
            assert ra.shape == rb.shape
            snr = golden.snr_db(ra.ravel(), rb.ravel())
            assert snr > 95, f"fold-T vs row-major: {snr:.1f} dB"
