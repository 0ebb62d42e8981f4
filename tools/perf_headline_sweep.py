"""Re-sweep the headline bench geometry (block_len x blocks_per_exec).

The original sweep ran when this rig's per-execution dispatch cost ~2.7 ms
and compiles took ~15 min; both have since dropped by orders of magnitude,
so the (64 x 4M) choice may be stale.  Each point calls bench.py's own
chain builder.

Run:  nohup python tools/perf_headline_sweep.py > log 2>&1 &
"""

# NOTE: this tool predates the fetch-synced timing rule (CLAUDE.md): numbers it
# printed historically are unreliable (block_until_ready early-ack / short-round
# deflation). Use bench.py / tools/bench_configs.py / tools/perf_honest_sweep.py
# or add hard_sync + steady-state rounds before trusting new runs.

import json
import sys

sys.path.insert(0, ".")


def main():
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    import bench

    points = [
        (4_000_000, 64),       # current choice
        (4_000_000, 128),
        (4_000_000, 32),
        (8_000_000, 32),
        (8_000_000, 64),
        (2_000_000, 128),
        (16_000_000, 16),
    ]
    for bl, K in points:
        try:
            msps = bench.bench_loopback_1000(n_blocks=max(512, 4 * K),
                                             block_len=bl,
                                             blocks_per_exec=K)
            print(json.dumps({"block_len": bl, "K": K,
                              "Msps": round(msps, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"block_len": bl, "K": K,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
