"""Segmented (HBM-refill) replay: steady-state characterization
(VERDICT r4 #5a).

The round-4 receipt (logs/segmented_onchip.log) showed the segmented
path 12x FASTER than one-shot replay — a compile/warmup artifact the log
didn't flag.  This tool produces the honest numbers, warm and
compile-excluded, in one process:

  resident   DeviceReplay steady-state rate on the same recording
             (the dispatch row segmented replay is the fallback FOR)
  refill     host->device staging bandwidth of one segment (the
             resource segment refill actually consumes)
  segmented  SegmentedDeviceReplay end-to-end rate across >= 4 segment
             boundaries, warm (second run of the same compiled step)
  bit-identity of segmented vs resident output

On THIS rig the host link is a ~33 MB/s relay (CLAUDE.md), so the
segmented rate is relay-capped ~3 orders below the resident rate — the
mechanism is what's being certified; on a production TPU host
(~O(10) GB/s staging) the same math gives ~1-2 Gsps/direction.

Run: nohup python tools/perf_segmented_replay.py > logs/segmented_perf.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RATE = 100_000_000
L = 4_000_000


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
    from gpu_sdr_tpu.engine.replay import (DeviceReplay,
                                           SegmentedDeviceReplay)
    from gpu_sdr_tpu.engine.sinks import MemorySink
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    out = lambda **kw: print(json.dumps(kw), flush=True)
    n_blocks = 16                       # 64 Msamples acquisition
    n = n_blocks * L
    rng = np.random.default_rng(3)
    rec = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
           ).astype(np.complex64)
    rx = AntennaParams(mode=AntMode.RX, rate=RATE, buffer_len=L,
                       samples=n, decim=100, pf_average=4,
                       freq=[10_000_000], wave_type=[WaveType.DIRECT])

    # ---- resident reference (same recording, one upload) -------------
    dr = DeviceReplay(rx, rec, blocks_per_exec=8, loop=False)
    sink_r = MemorySink()
    dr.run([sink_r])                    # cold (compiles)
    t0 = time.perf_counter()
    sink_r = MemorySink()
    res_r = dr.run([sink_r])            # warm
    wall_resident = time.perf_counter() - t0
    out(stage="resident", msps=round(n / wall_resident / 1e6, 1),
        wall_s=round(wall_resident, 3))

    # ---- segment staging bandwidth -----------------------------------
    seg_blocks = 4                      # 16 Msamples = 128 MB per segment
    sr = SegmentedDeviceReplay(rx, rec, blocks_per_exec=2, loop=False,
                               segment_bytes=seg_blocks * L * 8)
    assert sr.seg_blocks == seg_blocks, sr.seg_blocks
    seg = sr._stage(0)
    hard_sync(seg)
    t0 = time.perf_counter()
    seg = sr._stage(seg_blocks)
    hard_sync(seg)
    dt = time.perf_counter() - t0
    seg_bytes = seg_blocks * L * 8
    out(stage="refill_link", seg_mb=round(seg_bytes / 1e6, 1),
        stage_s=round(dt, 3), mbps=round(seg_bytes / dt / 1e6, 1))

    # ---- segmented end-to-end, warm ----------------------------------
    sink_c = MemorySink()
    sr.run([sink_c])                    # cold (compiles + first staging)
    t0 = time.perf_counter()
    sink_s = MemorySink()
    res_s = sr.run([sink_s])            # warm
    wall_seg = time.perf_counter() - t0
    out(stage="segmented", msps=round(n / wall_seg / 1e6, 1),
        wall_s=round(wall_seg, 3),
        n_segments=n_blocks // seg_blocks,
        fraction_of_resident=round(wall_resident / wall_seg, 4))

    identical = (sink_s.data.shape == sink_r.data.shape and
                 np.array_equal(sink_s.data, sink_r.data))
    out(stage="bit_identity", identical=bool(identical),
        shape=list(sink_s.data.shape))
    assert identical, "segmented output must bit-match resident replay"


if __name__ == "__main__":
    main()
