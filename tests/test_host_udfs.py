"""Host execution path: numpy-backend UDFs with reference-style
mutable views (in-place slice mutation, scipy calls, Python control
flow), sharing one pass with device UDFs."""
import numpy as np
import pytest

from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf import SumSigUDF, SumUDF
from libertem_tpu.udf.base import UDF, UDFException

from conftest import _mk_random


class NumpySumUDF(UDF):
    """Reference-style UDF: in-place mutation, numpy only."""

    def get_backends(self):
        return (self.BACKEND_NUMPY,)

    def get_result_buffers(self):
        return {
            "intensity": self.buffer(kind="sig", dtype="float32"),
        }

    def process_tile(self, tile):
        assert isinstance(tile, np.ndarray)
        assert self.xp is np
        self.results.intensity[:] += tile.sum(axis=0)

    def merge(self, dest, src):
        dest.intensity[:] += src.intensity


class NumpyMedianUDF(UDF):
    """Per-frame scipy/numpy work that jax couldn't trace the same
    way (data-dependent percentile)."""

    def get_backends(self):
        return (self.BACKEND_NUMPY,)

    def get_result_buffers(self):
        return {
            "median": self.buffer(kind="nav", dtype="float32"),
            "n_above": self.buffer(kind="nav", dtype="float32"),
        }

    def process_frame(self, frame):
        med = float(np.median(frame))
        self.results.median = med
        # data-dependent python control flow
        if med > 0:
            self.results.n_above = float((frame > med).sum())
        else:
            self.results.n_above = -1.0


@pytest.fixture
def data():
    return _mk_random((5, 6, 12, 12), dtype="float32")


@pytest.fixture
def ds(data):
    return MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()


def test_host_tile_udf(lt_ctx, ds, data):
    res = lt_ctx.run_udf(ds, NumpySumUDF())
    assert np.allclose(
        res["intensity"].data, data.sum(axis=(0, 1)), rtol=1e-4
    )


def test_host_frame_udf(lt_ctx, ds, data):
    res = lt_ctx.run_udf(ds, NumpyMedianUDF())
    flat = data.reshape(-1, 12, 12)
    med = np.median(flat, axis=(1, 2))
    assert np.allclose(
        res["median"].data.reshape(-1), med, rtol=1e-5
    )
    expected_above = np.array([
        (flat[i] > med[i]).sum() if med[i] > 0 else -1.0
        for i in range(len(flat))
    ])
    assert np.allclose(
        res["n_above"].data.reshape(-1), expected_above
    )


def test_mixed_host_device_pass(lt_ctx, ds, data):
    """numpy and jax UDFs share one read pass."""
    res_np, res_sum, res_ss = lt_ctx.run_udf(
        ds, [NumpySumUDF(), SumUDF(), SumSigUDF()]
    )
    assert np.allclose(
        res_np["intensity"].data, data.sum(axis=(0, 1)), rtol=1e-4
    )
    assert np.allclose(
        res_sum["intensity"].data, data.sum(axis=(0, 1)), rtol=1e-4
    )
    assert np.allclose(
        res_ss["intensity"].data, data.sum(axis=(2, 3)), rtol=1e-4
    )


def test_host_roi(lt_ctx, ds, data):
    rng = np.random.default_rng(1)
    roi = rng.random(30) > 0.5
    res = lt_ctx.run_udf(ds, NumpySumUDF(), roi=roi)
    flat = data.reshape(-1, 12, 12)
    assert np.allclose(
        res["intensity"].data, flat[roi].sum(axis=0), rtol=1e-4
    )


def test_host_udf_runs_on_sharded(ds, data):
    """Round-2 gap closed: numpy-backend UDFs run under the sharded
    executor (fed from the host-side super-step assembly)."""
    import jax
    from libertem_tpu.udf.base import UDFRunner
    res = UDFRunner([NumpySumUDF()]).run_for_dataset(
        ds, devices=jax.devices()
    )
    flat = data.reshape((-1,) + data.shape[2:])
    assert np.allclose(
        res.buffers[0]["intensity"].data, flat.sum(axis=0),
        rtol=1e-4,
    )


class DualBackendSumUDF(UDF):
    """Supports both backends — xp-agnostic math."""

    def get_backends(self):
        return (self.BACKEND_JAX, self.BACKEND_NUMPY)

    def get_result_buffers(self):
        return {"intensity": self.buffer(kind="sig",
                                         dtype="float32")}

    def process_tile(self, tile):
        if self.xp is np:
            self.results.intensity[:] += tile.sum(axis=0)
        else:
            self.results.intensity += tile.sum(axis=0)

    def merge(self, dest, src):
        if isinstance(dest.intensity, np.ndarray):
            dest.intensity[:] += src.intensity
        else:
            dest.intensity = dest.intensity + src.intensity


def test_backend_restriction(lt_ctx, ds, data):
    # default: runs on device
    res = lt_ctx.run_udf(ds, DualBackendSumUDF())
    assert np.allclose(
        res["intensity"].data, data.sum(axis=(0, 1)), rtol=1e-4
    )
    # restricted to numpy: runs on host
    res = lt_ctx.run_udf(
        ds, DualBackendSumUDF(), backends=("numpy",)
    )
    assert np.allclose(
        res["intensity"].data, data.sum(axis=(0, 1)), rtol=1e-4
    )
    # impossible restriction raises
    with pytest.raises(UDFException):
        lt_ctx.run_udf(ds, NumpySumUDF(), backends=("jax",))


def test_mixed_pass_keeps_fusion(lt_ctx, ds, data):
    """A host UDF in the set must not disable fusion for the device
    subset."""
    from libertem_tpu.udf import StdDevUDF
    from libertem_tpu.udf.base import UDFRunner
    udfs = [NumpySumUDF(), SumUDF(), StdDevUDF()]
    runner = UDFRunner(udfs)
    prep = runner._prepare(ds, None, None, None)
    assert prep["fused"] is not None
    assert [s["ui"] for s in prep["fused"]["specs"]] == [1, 2]
    res = runner.run_for_dataset(ds)
    flat = data.reshape(-1, 12, 12)
    assert np.allclose(
        res.buffers[0]["intensity"].data, flat.sum(axis=0),
        rtol=1e-4,
    )
    assert np.allclose(
        res.buffers[1]["intensity"].data, flat.sum(axis=0),
        rtol=1e-4,
    )
    assert np.allclose(
        res.buffers[2]["var"].data, flat.var(axis=0),
        rtol=1e-3, atol=1e-4,
    )


def test_sig_tiled_scheme_keeps_fusion(monkeypatch):
    """Sig tiling (huge frames split by MAX_SIG_BYTES) must not drop
    the pass to the generic path: device blocks hold whole frames, so
    the fused op consumes the full flat frame regardless of the
    scheme's sig slices."""
    from libertem_tpu.io import tiling
    from libertem_tpu.io.dataset.memory import MemoryDataSet
    from libertem_tpu.udf import (
        ApplyMasksUDF, StdDevUDF, SumSigUDF, SumUDF,
    )
    from libertem_tpu.udf.base import UDFRunner
    from conftest import _mk_random

    # force a sig split on a small frame
    monkeypatch.setattr(tiling.Negotiator, "MAX_SIG_BYTES", 2048)
    data = _mk_random((6, 5, 24, 24), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    udfs = [
        SumUDF(), SumSigUDF(), StdDevUDF(),
        ApplyMasksUDF(mask_factories=[
            lambda: np.ones((24, 24), dtype=np.float32),
        ]),
    ]
    runner = UDFRunner(udfs)
    prep = runner._prepare(ds, None, None, None)
    assert len(prep["scheme"]) > 1, "sig split must be active"
    assert prep["fused"] is not None, "fusion must survive sig tiling"
    res = runner.run_for_dataset(ds)
    flat = data.reshape(-1, 24, 24)
    assert np.allclose(
        res.buffers[0]["intensity"].data, flat.sum(axis=0), rtol=1e-4
    )
    assert np.allclose(
        res.buffers[1]["intensity"].data.reshape(-1),
        flat.sum(axis=(1, 2)), rtol=1e-4,
    )
    assert np.allclose(
        res.buffers[2]["var"].data, flat.var(axis=0),
        rtol=1e-3, atol=1e-4,
    )
    assert np.allclose(
        res.buffers[3]["intensity"].data.reshape(-1),
        flat.sum(axis=(1, 2)), rtol=1e-4,
    )


def test_nav_only_library_udfs_have_no_custom_merge():
    """Nav-only library UDFs must NOT declare a custom merge: under
    the host engine's custom-merge contract (merge_partition hands
    nav rows to custom merges as src with a zeroed dest and writes
    dest back) a no-op ``merge(dest, src): pass`` silently returns
    all-zero results (advisor round-3 finding)."""
    from libertem_tpu.udf.masks import ApplyMasksUDF
    from libertem_tpu.udf.com import CoMUDF

    masks = [lambda: np.ones((12, 12), dtype=np.float32)]
    assert not ApplyMasksUDF(mask_factories=masks)._has_custom_merge()
    assert not CoMUDF.with_params()._has_custom_merge()


def test_default_merge_nav_only_on_host_engine(lt_ctx, ds, data):
    """A nav-only UDF WITHOUT a custom merge must round-trip the host
    engine (the default merge copies nav rows positionally)."""
    class NavOnlySum(UDF):
        def get_backends(self):
            return (self.BACKEND_NUMPY,)

        def get_result_buffers(self):
            return {"s": self.buffer(kind="nav", dtype="float32")}

        def process_frame(self, frame):
            self.results.s = float(frame.sum())

    res = lt_ctx.run_udf(ds, NavOnlySum())
    assert np.allclose(
        res["s"].data, data.sum(axis=(2, 3)), rtol=1e-4
    )
