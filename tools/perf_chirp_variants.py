"""Config-2 (VNA chirp + lock-in) variants: XLA vs Pallas fused demod.

Run:  nohup python tools/perf_chirp_variants.py > log 2>&1 &
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

RATE, L, K = 100_000_000, 4_000_000, 16


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    import jax
    import jax.numpy as jnp
    from gpu_sdr_tpu.ops import chirp as chirp_ops
    from gpu_sdr_tpu.ops import cplx
    from gpu_sdr_tpu.ops import lockin as lockin_ops
    from gpu_sdr_tpu.ops.pallas_lockin import pallas_chirp_lockin

    steps = 5000
    cfg = chirp_ops.ChirpConfig.from_params(-40_000_000, 40_000_000,
                                            RATE, steps, 1.0)
    ppt = cfg.length * 1          # decim=1 -> ppt = length
    profile = jnp.asarray(lockin_ops.lockin_profile(ppt))
    print(json.dumps({"ppt": int(ppt), "nseg": L // int(ppt)}), flush=True)

    def timed(name, multi, state):
        t0 = time.perf_counter()
        st, y = multi(state)
        jax.block_until_ready(y)
        cs = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(10):
            st, y = multi(st)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / 10
        print(json.dumps({"stage": name,
                          "Msps": round(K * L / dt / 1e6, 1),
                          "compile_s": round(cs, 1)}), flush=True)

    # (a) XLA chain: chirp gen -> chirp demod -> lock-in
    @jax.jit
    def multi_xla(state):
        def body(carry, _):
            lg, ld = carry
            lg, x = chirp_ops.chirp_block(cfg, lg, L)
            ld, z = chirp_ops.chirp_demod_block(cfg, ld, x)
            y = lockin_ops.lockin_decimate(profile, z)
            return (lg, ld), y
        return jax.lax.scan(body, state, None, length=K)

    timed("xla_chain", multi_xla, (jnp.uint32(0), jnp.uint32(0)))

    # (b) gen (XLA) -> Pallas fused demod+lockin
    @jax.jit
    def multi_pallas(state):
        def body(carry, _):
            lg, ld = carry
            lg, x = chirp_ops.chirp_block(cfg, lg, L)
            ld, y = pallas_chirp_lockin(cfg, profile, ld, x)
            return (lg, ld), y
        return jax.lax.scan(body, state, None, length=K)

    timed("pallas_demod", multi_pallas, (jnp.uint32(0), jnp.uint32(0)))

    # numerics: one block
    lg, x = chirp_ops.chirp_block(cfg, jnp.uint32(0), L)
    _, z = chirp_ops.chirp_demod_block(cfg, jnp.uint32(0), x)
    ya = cplx.to_np(lockin_ops.lockin_decimate(profile, z))
    _, yb0 = pallas_chirp_lockin(cfg, profile, jnp.uint32(0), x)
    yb = cplx.to_np(yb0)
    num = float(np.sum(np.abs(ya - yb) ** 2))
    den = float(np.sum(np.abs(ya) ** 2))
    print(json.dumps({"stage": "numerics",
                      "rel_err_db": round(10 * np.log10(num / den), 1)
                      if num else -999}), flush=True)


if __name__ == "__main__":
    main()
