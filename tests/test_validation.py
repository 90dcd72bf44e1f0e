"""Tile-stream integrity: every format delivers exactly the frames of
the source array, in order, under ROI and sync_offset."""
import numpy as np
import pytest

from libertem_tpu.io.dataset.memory import MemoryDataSet

from conftest import _mk_random
from utils import ValidationUDF


@pytest.fixture
def data():
    return _mk_random((6, 7, 10, 12), dtype="float32")


def _validate(lt_ctx, ds, expected_flat, roi=None):
    udf = ValidationUDF(ref_flat=expected_flat)
    res = lt_ctx.run_udf(ds, udf, roi=roi)
    seen = res["seen"].raw_data
    assert (seen == 1.0).all()


def test_memory_stream(lt_ctx, data):
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=3
    ).initialize()
    _validate(lt_ctx, ds, data.reshape(-1, 10, 12))


def test_memory_stream_roi(lt_ctx, data):
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=3
    ).initialize()
    rng = np.random.default_rng(0)
    roi = rng.random(42) > 0.5
    flat = data.reshape(-1, 10, 12)
    _validate(lt_ctx, ds, flat[roi], roi=roi)


def test_raw_stream_sync_offset(lt_ctx, tmp_path, data):
    path = str(tmp_path / "t.raw")
    data.astype(np.float32).tofile(path)
    ds = lt_ctx.load(
        "raw", path=path, dtype="float32",
        nav_shape=(6, 7), sig_shape=(10, 12), sync_offset=3,
    )
    flat = data.reshape(-1, 10, 12)
    expected = np.zeros_like(flat)
    expected[:42 - 3] = flat[3:]
    _validate(lt_ctx, ds, expected)


def test_hdf5_stream(lt_ctx, tmp_path, data):
    import h5py
    path = str(tmp_path / "t.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data)
    ds = lt_ctx.load("hdf5", path=path)
    _validate(lt_ctx, ds, data.reshape(-1, 10, 12))
