"""Reading 'old mode' files (per-packet datasets written by the reference
server's H5_file_writer)."""

import h5py
import numpy as np

from gpu_sdr_tpu.client import files as Ufiles


def test_old_mode_read(tmp_path):
    fn = str(tmp_path / "old_style.h5")
    rng = np.random.default_rng(0)
    packets = [rng.standard_normal((2, 100)).astype(np.complex64)
               for _ in range(4)]
    with h5py.File(fn, "w") as f:
        g = f.create_group("raw_data0").create_group("A_RX2")
        g.attrs.create("mode", "RX")
        g.attrs.create("wave_type",
                       np.asarray(["DIRECT", "DIRECT"],
                                  dtype=h5py.string_dtype()))
        for i, p in enumerate(packets):
            ds = g.create_dataset(f"dataset_{i + 1}", data=p)
            ds.attrs.create("errors", 1 if i == 2 else 0)
    data, errs = Ufiles.openH5file(fn, error_coord=True)
    assert data.shape == (2, 400)
    assert np.allclose(data, np.concatenate(packets, axis=1))
    assert len(errs) == 1
    assert tuple(errs[0]) == (200, 300)
    # channel and sample slicing
    sel = Ufiles.openH5file(fn, ch_list=[1], start_sample=50,
                            last_sample=150)
    assert sel.shape == (1, 100)
    assert np.allclose(sel[0], np.concatenate(packets, axis=1)[1, 50:150])
