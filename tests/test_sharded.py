import jax
import numpy as np
import pytest

from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf import (
    ApplyMasksUDF, PickUDF, StdDevUDF, SumSigUDF, SumUDF,
)
from libertem_tpu.udf.base import UDFRunner
from libertem_tpu import masks as mask_lib

from utils import naive_mask_apply
from conftest import _mk_random


@pytest.fixture
def data():
    return _mk_random((16, 16, 24, 24), dtype="float32")


@pytest.fixture
def ds(data):
    return MemoryDataSet(
        data=data, sig_dims=2, num_partitions=5
    ).initialize()


def devices():
    return jax.devices()


def test_sharded_sum(ds, data):
    res = UDFRunner([SumUDF(), SumSigUDF()]).run_for_dataset(
        ds, devices=devices()
    )
    assert np.allclose(
        res.buffers[0]["intensity"].data, data.sum(axis=(0, 1)),
        rtol=1e-4,
    )
    assert np.allclose(
        res.buffers[1]["intensity"].data, data.sum(axis=(2, 3)),
        rtol=1e-4,
    )


def test_sharded_stddev_masks(ds, data):
    m0 = mask_lib.circular(12, 12, 24, 24, 6)
    res = UDFRunner([
        StdDevUDF(), ApplyMasksUDF(mask_factories=[lambda: m0]),
    ]).run_for_dataset(ds, devices=devices())
    flat = data.reshape(-1, 24, 24)
    assert float(res.buffers[0]["num_frames"].data) == flat.shape[0]
    assert np.allclose(
        res.buffers[0]["var"].data, flat.var(axis=0),
        rtol=1e-3, atol=1e-4,
    )
    expected = naive_mask_apply([m0], data)
    assert np.allclose(
        res.buffers[1]["intensity"].data, expected,
        rtol=5e-3, atol=1e-2,
    )


def test_sharded_roi_pick(ds, data):
    roi = np.zeros(16 * 16, dtype=bool)
    roi[[5, 100, 200, 255]] = True
    res = UDFRunner([PickUDF()]).run_for_dataset(
        ds, roi=roi, devices=devices()
    )
    flat = data.reshape(-1, 24, 24)
    assert np.allclose(
        res.buffers[0]["intensity"].data, flat[[5, 100, 200, 255]]
    )


def test_sharded_partial_iter(ds, data):
    partials = list(UDFRunner([SumSigUDF()]).run_for_dataset_iter(
        ds, devices=devices()
    ))
    assert len(partials) >= 1
    assert partials[-1].damage.data.all()
    assert np.allclose(
        partials[-1].buffers[0]["intensity"].data,
        data.sum(axis=(2, 3)), rtol=1e-4,
    )


def test_sharded_roi_corrections(ds, data):
    from libertem_tpu.io.corrections import CorrectionSet
    rng = np.random.default_rng(8)
    dark = rng.normal(size=(24, 24)).astype(np.float32)
    gain = (1 + 0.05 * rng.random((24, 24))).astype(np.float32)
    ex = np.zeros((24, 24), dtype=bool)
    ex[5, 7] = True
    corr = CorrectionSet(dark=dark, gain=gain, excluded_pixels=ex)
    roi = rng.random(16 * 16) > 0.3
    res = UDFRunner([SumUDF(), SumSigUDF()]).run_for_dataset(
        ds, roi=roi, corrections=corr, devices=devices()
    )
    flat = data.reshape(-1, 24, 24)[roi]
    expected = corr.apply_numpy(flat)
    assert np.allclose(
        res.buffers[0]["intensity"].data, expected.sum(axis=0),
        rtol=1e-3, atol=1e-2,
    )
    out = res.buffers[1]["intensity"].data.reshape(-1)
    assert np.allclose(
        out[roi], expected.sum(axis=(1, 2)), rtol=1e-3,
    )


def test_io_backend_compat():
    from libertem_tpu.io.dataset.base import (
        BufferedBackend, DirectBackend, IOBackend, MMapBackend,
    )
    assert isinstance(
        IOBackend.from_json({"id": "mmap"}), MMapBackend
    )
    assert isinstance(
        IOBackend.from_json({"id": "buffered"}), BufferedBackend
    )
    assert isinstance(
        IOBackend.from_json({"id": "direct"}), DirectBackend
    )


def test_sharded_partition_method(ds, data):
    """PARTITION-method UDFs run on the mesh (each device block plays
    the partition role)."""
    from libertem_tpu.udf.base import UDF

    class PartSum(UDF):
        def get_result_buffers(self):
            return {"intensity": self.buffer(kind="sig",
                                             dtype="float32")}

        def process_partition(self, partition):
            vmask = self.meta.tile_valid.reshape(
                (-1,) + (1,) * (partition.ndim - 1)
            )
            self.results.intensity += (
                partition * vmask
            ).sum(axis=0)

        def merge(self, dest, src):
            dest.intensity = dest.intensity + src.intensity

    res = UDFRunner([PartSum()]).run_for_dataset(
        ds, devices=devices()
    )
    assert np.allclose(
        res.buffers[0]["intensity"].data, data.sum(axis=(0, 1)),
        rtol=1e-4,
    )


def test_sharded_fewer_frames_than_devices():
    """8-device mesh, 3 frames: most shards are empty."""
    data = _mk_random((3, 10, 10), dtype="float32")
    ds = MemoryDataSet(data=data, sig_dims=2).initialize()
    res = UDFRunner([SumUDF(), SumSigUDF()]).run_for_dataset(
        ds, devices=devices()
    )
    assert np.allclose(
        res.buffers[0]["intensity"].data, data.sum(axis=0),
        rtol=1e-4,
    )
    assert np.allclose(
        res.buffers[1]["intensity"].data, data.sum(axis=(1, 2)),
        rtol=1e-4,
    )
    assert res.buffers[1]["intensity"].data.shape == (3,)


def test_sharded_single_frame():
    data = _mk_random((1, 8, 8), dtype="float32")
    ds = MemoryDataSet(data=data, sig_dims=2).initialize()
    res = UDFRunner([SumUDF()]).run_for_dataset(
        ds, devices=devices()
    )
    assert np.allclose(
        res.buffers[0]["intensity"].data, data[0], rtol=1e-5
    )
