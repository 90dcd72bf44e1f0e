"""DelayedJobExecutor: lazy results semantics
(reference: executor/delayed.py:211 returns dask arrays; here results
materialize on first data access, exactly once)."""
import numpy as np

from libertem_tpu.api import Context
from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf import SumSigUDF, SumUDF

from conftest import _mk_random


def _counting_runner(monkeypatch):
    from libertem_tpu.udf import base as udf_base
    calls = {"n": 0}
    orig = udf_base.UDFRunner.run_for_dataset

    def counted(self, *args, **kwargs):
        calls["n"] += 1
        return orig(self, *args, **kwargs)

    monkeypatch.setattr(udf_base.UDFRunner, "run_for_dataset", counted)
    return calls


def test_delayed_lazy_single(monkeypatch):
    calls = _counting_runner(monkeypatch)
    ctx = Context.make_with("delayed")
    data = _mk_random((6, 7, 12, 12), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=3
    ).initialize()
    res = ctx.run_udf(ds, SumUDF())
    # nothing ran yet; declarations available
    assert calls["n"] == 0
    assert res["intensity"].kind == "sig"
    assert calls["n"] == 0
    # first data access runs the pass
    got = res["intensity"].data
    assert calls["n"] == 1
    assert np.allclose(got, data.sum(axis=(0, 1)), rtol=1e-4)
    # second access reuses the result
    _ = res["intensity"].data
    _ = np.asarray(res["intensity"])
    assert calls["n"] == 1


def test_delayed_multi_udf_single_pass(monkeypatch):
    calls = _counting_runner(monkeypatch)
    ctx = Context.make_with("delayed")
    data = _mk_random((4, 5, 8, 8), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    res_sum, res_sumsig = ctx.run_udf(ds, [SumUDF(), SumSigUDF()])
    assert calls["n"] == 0
    # materializing ONE udf's buffer runs the whole fused pass once
    assert np.allclose(
        res_sumsig["intensity"].data.reshape(-1),
        data.reshape(-1, 64).sum(axis=1), rtol=1e-4,
    )
    assert calls["n"] == 1
    assert np.allclose(
        res_sum["intensity"].data, data.sum(axis=(0, 1)), rtol=1e-4,
    )
    assert calls["n"] == 1  # shared computation


def test_delayed_compute_and_roi(monkeypatch):
    calls = _counting_runner(monkeypatch)
    ctx = Context.make_with("delayed")
    data = _mk_random((4, 5, 8, 8), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    roi = np.zeros(20, dtype=bool)
    roi[[1, 7, 13]] = True
    res = ctx.run_udf(ds, SumUDF(), roi=roi)
    eager = res.compute()
    assert calls["n"] == 1
    expected = data.reshape(-1, 8, 8)[roi].sum(axis=0)
    assert np.allclose(eager["intensity"].data, expected, rtol=1e-4)
