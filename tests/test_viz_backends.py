"""BQ/GMS live-plot backends driven with mocked widget modules.

These classes are optional-dependency-gated (bqplot / the Gatan GMS
embedded Python); the mocks let CI execute their display()/update()
logic instead of leaving the code dead (round-2 weak spot #4).
Reference behavior: libertem/viz/bqp.py:11, viz/gms.py:8.
"""
import sys
import types

import numpy as np
import pytest

from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf import SumSigUDF

from conftest import _mk_random


@pytest.fixture
def ds():
    data = _mk_random((4, 5, 8, 8), dtype="float32")
    return MemoryDataSet(data=data, sig_dims=2).initialize()


class _Obj:
    """Attribute bag accepting any ctor kwargs."""

    def __init__(self, *a, **kw):
        self.__dict__.update(kw)
        self.args = a


@pytest.fixture
def fake_bqplot(monkeypatch):
    bq = types.ModuleType("bqplot")
    bq.LinearScale = _Obj
    bq.Axis = _Obj
    bq.Figure = _Obj

    class ColorScale(_Obj):
        pass

    bq.ColorScale = ColorScale
    gl = types.ModuleType("bqplot_image_gl")

    class ImageGL(_Obj):
        pass

    gl.ImageGL = ImageGL
    monkeypatch.setitem(sys.modules, "bqplot", bq)
    monkeypatch.setitem(sys.modules, "bqplot_image_gl", gl)
    return bq, gl


@pytest.fixture
def fake_gms(monkeypatch):
    dm = types.ModuleType("DigitalMicrograph")

    class FakeImage:
        def __init__(self, arr):
            self._arr = np.array(arr)
            self.name = None
            self.shown = 0
            self.updated = 0

        def SetName(self, name):
            self.name = name

        def ShowImage(self):
            self.shown += 1

        def GetNumArray(self):
            return self._arr

        def UpdateImage(self):
            self.updated += 1

    dm.CreateImage = FakeImage
    monkeypatch.setitem(sys.modules, "DigitalMicrograph", dm)
    return dm


def test_bq_live_plot(ds, fake_bqplot):
    from libertem_tpu.viz.bqp import BQLive2DPlot

    plot = BQLive2DPlot(dataset=ds, udf=SumSigUDF())
    fig = plot.display()
    assert fig is plot.figure
    assert plot.figure.marks == (plot.image,)
    # feed a partial result through the normal new_data path
    data = np.arange(20, dtype=np.float64).reshape(4, 5)
    data[0, 0] = np.nan  # un-damaged regions arrive as nan
    damage = np.ones((4, 5), dtype=bool)
    damage[0, 0] = False
    plot.data = data
    plot.update(damage, force=True)
    assert np.allclose(
        plot.image.image, np.nan_to_num(data)
    )
    cs = plot.image.scales["image"]
    # color scale follows the finite values
    assert cs.min == 0.0
    assert cs.max >= 19.0


def test_bq_plot_requires_modules(ds):
    from libertem_tpu.viz.bqp import BQLive2DPlot

    assert "bqplot" not in sys.modules
    with pytest.raises(ImportError, match="bqplot"):
        BQLive2DPlot(dataset=ds, udf=SumSigUDF())


def test_gms_live_plot(ds, fake_gms):
    from libertem_tpu.viz.gms import GMSLive2DPlot

    plot = GMSLive2DPlot(dataset=ds, udf=SumSigUDF())
    plot.display()
    assert plot.image is not None
    # reference title format: "<UDF class>: <channel>"
    assert plot.image.name == "SumSigUDF: intensity"
    assert plot.image.shown == 1
    data = np.full((4, 5), 7.5)
    plot.data = data
    plot.update(np.ones((4, 5), dtype=bool), force=True)
    assert plot.image.updated == 1
    assert np.allclose(plot.image.GetNumArray(), 7.5)


def test_gms_plot_requires_module(ds):
    from libertem_tpu.viz.gms import GMSLive2DPlot

    assert "DigitalMicrograph" not in sys.modules
    with pytest.raises(ImportError, match="Digital"):
        GMSLive2DPlot(dataset=ds, udf=SumSigUDF())


def test_bq_plot_in_live_run(ds, fake_bqplot):
    """End-to-end: BQ plot updated by Context.run_udf plots=."""
    from libertem_tpu.api import Context
    from libertem_tpu.viz.bqp import BQLive2DPlot

    ctx = Context.make_with("inline")
    plot = BQLive2DPlot(
        dataset=ds, udf=SumSigUDF(), min_delta=0.0
    )
    plot.display()
    ctx.run_udf(ds, plot.udf, plots=[plot])
    got = np.asarray(plot.image.image)
    expected = np.asarray(ds.data).sum(axis=(2, 3))
    assert np.allclose(got, expected, rtol=1e-4)
