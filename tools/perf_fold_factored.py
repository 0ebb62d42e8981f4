"""A/B/A the factored fold kernel vs the streamed-P form at config 3."""
import json, sys, time
import numpy as np
sys.path.insert(0, ".")

def main():
    import jax, bench
    bench._enable_compile_cache()
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    from gpu_sdr_tpu.ops.ddc import DirectDDCConfig
    from gpu_sdr_tpu.ops.pallas_chain import TonesDirectFoldKernel
    freqs100 = tuple(int(f) for f in np.linspace(-45e6, 45e6, 100))
    dcfg = DirectDDCConfig(rate=100_000_000, decim=100, pf_average=4,
                           freqs=freqs100, phases=(0,) * 100)
    ch = TonesDirectFoldKernel(rate=100_000_000, tx_freqs=freqs100,
                               tx_ampls=(0.01,) * 100, cfg=dcfg,
                               block_len=4_000_000)
    assert ch.ok

    def hard_sync(arr):
        return float(np.asarray(jax.device_get(arr.re.reshape(-1)[0])))

    def make(form):
        K = 64
        def impl(st):
            if form == "factored":
                st, crots, qrots = ch.block_rotations_factored(st, K)
                y = ch.invoke_factored(crots, qrots, K)
            else:
                st, srots, drots = ch.block_rotations(st, K)
                y = ch.invoke(ch._P, ch._G2, ch._ramp, srots, drots, K)
            return st, y
        return jax.jit(impl), K

    # numeric check first (one block each, vs each other)
    fj, K = make("factored")
    sj, _ = make("streamed")
    st0 = ch.init_state()
    _, yf = fj(st0)
    _, ys = sj(ch.init_state())
    a = np.asarray(yf.re[:1000]); b = np.asarray(ys.re[:1000])
    snr = 10*np.log10(np.sum(b*b) / max(np.sum((a-b)**2), 1e-30))
    print(json.dumps({"factored_vs_streamed_snr_db": round(float(snr),1)}),
          flush=True)

    for form in ("streamed", "factored", "streamed", "factored"):
        jf, K = make(form)
        st = ch.init_state()
        st, y = jf(st)
        hard_sync(y)
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(16):
                st, y = jf(st)
            hard_sync(y)
            dt = time.perf_counter() - t0
            best = max(best, 16 * K * 4_000_000 / dt / 1e6)
        print(json.dumps({"form": form, "msps": round(best, 1)}),
              flush=True)

if __name__ == "__main__":
    main()
