"""SegmentedDeviceReplay mechanism proof on the real chip (VERDICT r3
#6, final clause): a recording forced across >= 3 HBM segment
boundaries demodulates on the TPU bit-identically to the one-upload
DeviceReplay of the same recording.

Relay-capped (each segment crosses the ~33 MB/s tunnel), so sized small:
16 blocks of 50 ksamples, segments of 2 blocks -> 8 segments, with the
double-buffered device_put prefetch exercised at every boundary.

Run: nohup python tools/segmented_replay_onchip.py > logs/segmented_onchip.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    from gpu_sdr_tpu.config import configure_precision
    configure_precision()
    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
    from gpu_sdr_tpu.engine.replay import (DeviceReplay,
                                           SegmentedDeviceReplay)
    from gpu_sdr_tpu.engine.sinks import MemorySink
    from gpu_sdr_tpu.params import AntennaParams, AntMode, WaveType

    BLK = 50_000
    rx = AntennaParams(mode=AntMode.RX, rate=1_000_000,
                       buffer_len=20_000, samples=16 * BLK,
                       decim=10, pf_average=4,
                       freq=[100_000, -250_000],
                       wave_type=[WaveType.DIRECT] * 2)
    rng = np.random.default_rng(3)
    rec = (rng.standard_normal(16 * BLK) +
           1j * rng.standard_normal(16 * BLK)).astype(np.complex64)

    t0 = time.perf_counter()
    one = DeviceReplay(rx, rec, loop=False)
    s1 = MemorySink()
    one.run([s1])
    t_one = time.perf_counter() - t0

    t0 = time.perf_counter()
    seg = SegmentedDeviceReplay(rx, rec, loop=False, blocks_per_exec=2,
                                segment_bytes=2 * BLK * 8)
    s2 = MemorySink()
    seg.run([s2])
    t_seg = time.perf_counter() - t0

    same = bool(np.array_equal(s1.data, s2.data))
    print(json.dumps({
        "backend": jax.default_backend(),
        "device_replay_path": one.path,
        "segments": -(-16 // seg.seg_blocks),
        "seg_blocks": seg.seg_blocks,
        "rows": int(s2.data.shape[0]),
        "bit_identical_vs_device_replay": same,
        "wall_one_s": round(t_one, 1),
        "wall_segmented_s": round(t_seg, 1),
    }), flush=True)
    assert same


if __name__ == "__main__":
    main()
