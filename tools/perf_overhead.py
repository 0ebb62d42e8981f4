"""Isolate dispatch overhead vs compute: raw matmul rates and the bench
chain at increasing block sizes."""

# NOTE: this tool predates the fetch-synced timing rule (CLAUDE.md): numbers it
# printed historically are unreliable (block_until_ready early-ack / short-round
# deflation). Use bench.py / tools/bench_configs.py / tools/perf_honest_sweep.py
# or add hard_sync + steady-state rounds before trusting new runs.

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, n=20):
    import jax
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    # raw matmul rates
    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        a = jnp.ones((2048, 2048), dt)
        b = jnp.ones((2048, 2048), dt)
        f = jax.jit(lambda a, b: a @ b)
        sec = timeit(lambda: f(a, b))
        fl = 2 * 2048**3
        print(f"matmul2048_{name}: {fl/sec/1e12:.1f} Tf/s "
              f"({sec*1e3:.3f} ms)", flush=True)

    # trivial dispatch overhead
    x = jnp.ones((8, 128), jnp.float32)
    g = jax.jit(lambda x: x + 1)
    sec = timeit(lambda: g(x), n=50)
    print(f"tiny_dispatch: {sec*1e3:.3f} ms", flush=True)

    # bench chain at growing block sizes
    from bench import bench_loopback_1000
    for mult in (1, 4, 8):
        L = 1_048_576 * mult
        msps = bench_loopback_1000(n_blocks=10, block_len=L)
        print(f"chain_L{mult}M: {msps:.0f} Msps", flush=True)


if __name__ == "__main__":
    main()
