import numpy as np
import pytest

from libertem_tpu.io.dataset.memory import MemoryDataSet

from conftest import _mk_random


@pytest.fixture
def data():
    return _mk_random((8, 9, 20, 22), dtype="float32")


@pytest.fixture
def ds(data):
    return MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()


def test_sum_analysis(lt_ctx, ds, data):
    analysis = lt_ctx.create_sum_analysis(dataset=ds)
    res = lt_ctx.run(analysis)
    assert np.allclose(
        res.intensity.raw_data, data.sum(axis=(0, 1)), rtol=1e-4
    )
    assert res.intensity.visualized.shape == (20, 22, 4)
    # reference channel pair (sum.py:118): bare key log-scaled +
    # explicit lin channel
    assert "intensity_lin" in res.keys()


def test_disk_analysis(lt_ctx, ds, data):
    analysis = lt_ctx.create_disk_analysis(
        dataset=ds, cx=11, cy=10, r=5
    )
    res = lt_ctx.run(analysis)
    from libertem_tpu import masks as mask_lib
    m = mask_lib.circular(11, 10, 22, 20, 5, antialiased=True)
    expected = (
        data.reshape(-1, 20, 22) * m
    ).sum(axis=(1, 2)).reshape(8, 9)
    assert np.allclose(
        res.intensity.raw_data, expected, rtol=5e-3, atol=1e-2
    )


def test_ring_analysis(lt_ctx, ds):
    analysis = lt_ctx.create_ring_analysis(
        dataset=ds, cx=11, cy=10, ri=4, ro=8
    )
    res = lt_ctx.run(analysis)
    assert res.intensity.raw_data.shape == (8, 9)


def test_point_analysis(lt_ctx, ds, data):
    analysis = lt_ctx.create_point_analysis(dataset=ds, x=5, y=7)
    res = lt_ctx.run(analysis)
    assert np.allclose(
        res.intensity.raw_data, data[..., 7, 5], rtol=1e-3,
        atol=1e-3,
    )


def test_sumsig_analysis(lt_ctx, ds, data):
    res = lt_ctx.run(lt_ctx.create_sumsig_analysis(dataset=ds))
    assert np.allclose(
        res.intensity.raw_data, data.sum(axis=(2, 3)), rtol=1e-4
    )


def test_sd_analysis(lt_ctx, ds, data):
    res = lt_ctx.run(lt_ctx.create_sd_analysis(dataset=ds))
    flat = data.reshape(-1, 20, 22)
    assert np.allclose(
        res.std.raw_data, flat.std(axis=0), rtol=1e-3, atol=1e-4
    )


def test_pick_analysis(lt_ctx, ds, data):
    res = lt_ctx.run(
        lt_ctx.create_pick_analysis(dataset=ds, x=3, y=5)
    )
    assert np.allclose(
        res.intensity.raw_data, data[5, 3], rtol=1e-5
    )


def test_com_analysis(lt_ctx, ds, data):
    res = lt_ctx.run(lt_ctx.create_com_analysis(dataset=ds))
    # reference layout: field raw_data is an (x, y) tuple
    assert np.asarray(res.field.raw_data).shape == (2, 8, 9)
    assert res.magnitude.raw_data.shape == (8, 9)
    assert np.isfinite(res.x.raw_data).all()
    # field visualized is RGB
    assert res.field.visualized.shape == (8, 9, 3)


def test_radial_fourier_analysis(lt_ctx, ds, data):
    analysis = lt_ctx.create_radial_fourier_analysis(
        dataset=ds, cx=11, cy=10, ri=0, ro=9, n_bins=2, max_order=3
    )
    res = lt_ctx.run(analysis)
    assert "dominant_0" in res.keys()
    assert "absolute_0_0" in res.keys()
    assert "phase_1_3" in res.keys()
    # order 0 of bin 0 is the mean intensity in the bin: positive
    assert (res.absolute_0_0.raw_data >= 0).all()


def test_fem_analysis(lt_ctx, ds):
    res = lt_ctx.run(
        lt_ctx.create_fem_analysis(dataset=ds, cx=11, cy=10,
                                   ri=3, ro=8)
    )
    assert res.intensity.raw_data.shape == (8, 9)


def test_fft_analyses(lt_ctx, ds, data):
    from libertem_tpu.analysis import (
        ApplyFFTMask, PickFFTFrameAnalysis, SumfftAnalysis,
    )
    res = lt_ctx.run(ApplyFFTMask(
        dataset=ds, parameters={"rad_in": 2, "rad_out": 8}
    ))
    flat = data.reshape(-1, 20, 22)
    spec = np.abs(np.fft.fft2(flat))
    h, w = 20, 22
    y, x = np.ogrid[0:h, 0:w]
    d = np.sqrt((y - h // 2) ** 2 + (x - w // 2) ** 2)
    # reference ring semantics: rad_in < d <= rad_out
    ring = np.fft.ifftshift((d > 2) & (d <= 8))
    expected = (spec * ring).sum(axis=(1, 2)).reshape(8, 9)
    assert np.allclose(
        res.intensity.raw_data, expected, rtol=1e-3
    )
    res2 = lt_ctx.run(PickFFTFrameAnalysis(
        dataset=ds, parameters={"x": 2, "y": 3}
    ))
    assert res2.intensity.raw_data.shape == (20, 22)
    res3 = lt_ctx.run(SumfftAnalysis(dataset=ds, parameters={}))
    assert res3.intensity.raw_data.shape == (20, 22)


def test_cluster_analysis(lt_ctx, ds):
    from libertem_tpu.analysis import ClusterAnalysis
    analysis = ClusterAnalysis(
        dataset=ds, parameters={"n_clust": 3, "n_peaks": 10}
    )
    res = analysis.run_clustering(lt_ctx)
    labels = res.intensity.raw_data
    assert labels.shape == (8, 9)
    assert len(np.unique(labels)) <= 3


def test_masks_analysis_registry():
    from libertem_tpu.analysis import Analysis
    for id_ in ("SUM_FRAMES", "SD_FRAMES", "SUM_SIG", "PICK_FRAME",
                "APPLY_DISK_MASK", "APPLY_RING_MASK",
                "APPLY_POINT_SELECTOR", "MASKS", "CENTER_OF_MASS",
                "RADIAL_FOURIER", "FEM", "CLUST", "APPLY_FFT_MASK",
                "PICK_FFT_FRAME", "FFTSUM_FRAMES"):
        assert Analysis.get_analysis_by_type(id_) is not None


def test_radial_fourier_numeric(lt_ctx, ds, data):
    """Radial Fourier coefficients vs a brute-force numpy oracle."""
    from libertem_tpu.analysis.radialfourier import (
        radial_fourier_masks,
    )
    from libertem_tpu.masks import polar_map, radial_bins
    analysis = lt_ctx.create_radial_fourier_analysis(
        dataset=ds, cx=11, cy=10, ri=0, ro=9, n_bins=2, max_order=2
    )
    res = lt_ctx.run(analysis)
    flat = data.reshape(-1, 20, 22).astype(np.float64)
    # reference semantics: unnormalized antialiased rings * exp(i*o*phi)
    bins = radial_bins(11, 10, 22, 20, radius=9, radius_inner=0,
                       n_bins=2)
    _, phi = polar_map(11, 10, 22, 20)
    for b in range(2):
        mask = bins[b].astype(np.float64)
        for o in range(3):
            coeff = (
                flat * (mask * np.exp(1j * o * phi))
            ).sum(axis=(1, 2)).reshape(8, 9)
            got = res[f"absolute_{b}_{o}"].raw_data
            assert np.allclose(
                got, np.abs(coeff), rtol=1e-3, atol=1e-3
            ), (b, o)


def test_com_plus_radial_fourier_live(lt_ctx, ds, data):
    """BASELINE config #3: CoM + radial Fourier in ONE pass with
    live partial merges."""
    from libertem_tpu.analysis.radialfourier import (
        RadialFourierAnalysis,
    )
    from libertem_tpu.analysis.com import COMAnalysis
    com_a = COMAnalysis(dataset=ds, parameters={})
    rf_a = RadialFourierAnalysis(
        dataset=ds,
        parameters={"cx": 11, "cy": 10, "ri": 0, "ro": 9,
                    "n_bins": 2, "max_order": 2},
    )
    udfs = [com_a.get_udf(), rf_a.get_udf()]
    partials = list(lt_ctx.run_udf_iter(ds, udfs))
    assert len(partials) == 2  # one per partition
    mid = partials[0]
    assert not mid.damage.data.all()
    final = partials[-1]
    assert final.damage.data.all()
    # post-process both analyses from the shared final pass
    from libertem_tpu.udf.base import SingleUDFResults
    com_res = com_a.get_udf_results(
        SingleUDFResults(final.buffers[0], final.damage),
        None, final.damage,
    )
    rf_res = rf_a.get_udf_results(
        SingleUDFResults(final.buffers[1], final.damage),
        None, final.damage,
    )
    assert com_res.magnitude.raw_data.shape == (8, 9)
    assert rf_res["absolute_0_0"].raw_data.shape == (8, 9)


def test_com_guess_flip_conjugates_rotation(lt_ctx, monkeypatch):
    """Absolute-parameter composition in the CoM guess RPC: with
    T(th, f) = rotate(th) . flip(f), a guessed flip conjugates the
    existing rotation — T(g, True) . T(o, fo) = R(g - o) F(!fo) —
    while a no-flip guess adds rotations."""
    import asyncio
    import libertem_tpu.analysis.com as com_mod
    from libertem_tpu.analysis.com import GuessParametersProc
    from libertem_tpu.analysis.base import Analysis
    from libertem_tpu.io.dataset.memory import MemoryDataSet

    data = _mk_random((4, 4, 8, 8), dtype="float32")
    ds = MemoryDataSet(data=data, sig_dims=2, num_partitions=1)
    ds.initialize()
    cls = Analysis.get_analysis_by_type("CENTER_OF_MASS")

    class FakeResult(dict):
        pass

    def run_with_guess(rel_guess, old_params):
        # fake following the web RPCContext protocol (web/rpc.py)
        from libertem_tpu.web.state import AnalysisResultInfo

        class R:
            raw_data = np.zeros((4, 4))

        class Ctx:
            def get_compound_analysis(self):
                return {"details": {"analyses": ["a-1"],
                                    "mainType": "CENTER_OF_MASS"}}

            def get_analysis_details(self, analysis_id):
                return {
                    "analysis": analysis_id,
                    "details": {
                        "analysisType": "CENTER_OF_MASS",
                        "parameters": old_params,
                    },
                }

            def have_analysis_results(self, analysis_id):
                return True

            def get_analysis_results(self, analysis_id):
                return AnalysisResultInfo(
                    details={
                        "analysisType": "CENTER_OF_MASS",
                        "parameters": old_params,
                    },
                    results={"y": R(), "x": R()},
                    job_id="job-1", udf_results=None,
                )

            async def run_sync(self, fn, *args, **kwargs):
                return fn(*args, **kwargs)

        monkeypatch.setattr(
            com_mod, "guess_corrections",
            lambda y, x: dict(rel_guess),
        )
        proc = GuessParametersProc()
        return asyncio.run(proc(Ctx()))["guess"]

    base = {"cx": 4, "cy": 4, "r": 3}
    rel = {"scan_rotation": 30.0, "flip_y": False, "cy": 0.0,
           "cx": 0.0}
    g = run_with_guess(
        rel, {**base, "scan_rotation": 45.0, "flip_y": False}
    )
    assert g["scan_rotation"] == pytest.approx(75.0)  # 30 + 45
    assert g["flip_y"] is False

    rel_flip = {**rel, "flip_y": True}
    g = run_with_guess(
        rel_flip, {**base, "scan_rotation": 45.0, "flip_y": False}
    )
    assert g["scan_rotation"] == pytest.approx(-15.0)  # 30 - 45
    assert g["flip_y"] is True


def test_get_roi_1d_and_3d_nav():
    from libertem_tpu.analysis.getroi import get_roi

    # 1D nav: rect selects along the single axis; disk doesn't crash
    roi = get_roi(
        {"roi": {"shape": "rect", "x": 2, "y": 0,
                 "width": 3, "height": 1}},
        (10,),
    )
    assert roi.shape == (10,)
    assert list(np.flatnonzero(roi)) == [2, 3, 4]
    roi_d = get_roi(
        {"roi": {"shape": "disk", "cx": 5, "cy": 0, "r": 1}},
        (10,),
    )
    assert roi_d.shape == (10,)
    assert roi_d[5]

    # 3D nav: selection applies to the last two dims, broadcast over
    # the leading one
    roi3 = get_roi(
        {"roi": {"shape": "rect", "x": 1, "y": 1,
                 "width": 2, "height": 2}},
        (3, 4, 5),
    )
    assert roi3.shape == (3, 4, 5)
    for z in range(3):
        assert roi3[z, 1:3, 1:3].all()
        assert roi3[z].sum() == 4


def test_radial_fourier_roi_dominant(lt_ctx, ds, data):
    """Under an ROI the NaN fill must not poison the dominant-order
    threshold: selected positions get real order indices, unselected
    ones NaN."""
    from libertem_tpu.analysis.base import Analysis

    cls = Analysis.get_analysis_by_type("RADIAL_FOURIER")
    analysis = cls(dataset=ds, parameters={
        "cx": 4, "cy": 4, "ri": 0, "ro": 4,
        "n_bins": 1, "max_order": 3,
    })
    nav = tuple(ds.shape.nav)
    roi = np.zeros(nav, dtype=bool)
    roi[0, 0] = roi[2, 3] = True
    res = lt_ctx.run(analysis, roi=roi)
    dom = res["dominant_0"].raw_data
    assert dom.shape == nav
    sel = dom[roi]
    assert not np.isnan(sel).any()
    assert (sel >= 0).all() and (sel <= 3).all()
    assert np.isnan(dom[~roi]).all()


def test_analysis_null_parameters(lt_ctx, ds):
    """The GUI sends explicit nulls for untouched fields — analyses
    must apply defaults instead of crashing on None."""
    from libertem_tpu.analysis.base import Analysis

    com_cls = Analysis.get_analysis_by_type("CENTER_OF_MASS")
    an = com_cls(dataset=ds, parameters={
        "cx": None, "cy": None, "scan_rotation": None,
        "flip_y": None, "r": 3,
    })
    p = an.parameters
    assert p["cx"] is not None and p["cy"] is not None
    assert p["scan_rotation"] == 0.0 and p["flip_y"] is False
    res = lt_ctx.run(an)
    assert res["magnitude"].raw_data.shape == tuple(ds.shape.nav)

    clust_cls = Analysis.get_analysis_by_type("CLUST")
    an = clust_cls(dataset=ds, parameters={
        "n_clust": None, "n_peaks": None, "min_dist": None,
        "rad": None, "cy": None, "cx": None, "ri": None,
        "ro": None,
    })
    p = an.parameters
    assert p["n_clust"] == 8 and p["n_peaks"] == 42
    assert p["min_dist"] == 1 and p["rad"] == 2


def test_analyses_honor_gui_roi(lt_ctx, ds, data):
    """Every nav-producing analysis honors the GUI roi parameter —
    point/FEM/sumsig used to silently drop it."""
    from libertem_tpu.analysis.base import Analysis

    roi_params = {"roi": {"shape": "rect", "x": 1, "y": 1,
                          "width": 2, "height": 2}}
    nav = tuple(ds.shape.nav)
    for id_, extra in [
        ("APPLY_POINT_SELECTOR", {"cx": 4, "cy": 4}),
        ("FEM", {"cx": 4, "cy": 4, "ri": 1, "ro": 4}),
        ("SUM_SIG", {}),
        ("APPLY_DISK_MASK", {"cx": 4, "cy": 4, "r": 3}),
        ("RADIAL_FOURIER",
         {"cx": 4, "cy": 4, "ri": 0, "ro": 4, "n_bins": 1,
          "max_order": 2}),
    ]:
        cls = Analysis.get_analysis_by_type(id_)
        an = cls(dataset=ds, parameters={**extra, **roi_params})
        roi = an.get_roi()
        assert roi is not None, id_
        assert roi.shape == nav
        assert roi.sum() == 4
        res = lt_ctx.run(an)
        key = (
            "dominant_0" if id_ == "RADIAL_FOURIER" else "intensity"
        )
        out = res[key].raw_data
        sel = np.isfinite(np.asarray(out, dtype=np.float64))
        assert sel.reshape(nav + (-1,)).any(-1).sum() == 4, id_


def test_live_plot_sig_channel(lt_ctx, ds):
    """Live plots of sig-kind buffers must not crash on the nav
    damage mask (a named channel's damage is its buffer's validity
    mask ∩ finiteness — fully valid after a complete run)."""
    from libertem_tpu.udf import SumUDF
    from libertem_tpu.viz.base import Dummy2DPlot

    pl = Dummy2DPlot(dataset=ds, udf=SumUDF(), channel="intensity")
    lt_ctx.run_udf(ds, SumUDF(), plots=[pl])
    assert pl.data.shape == tuple(ds.shape.sig)
    assert np.asarray(pl.damage).shape == tuple(ds.shape.sig)
    assert np.all(pl.damage)


def test_analysis_channel_key_parity(lt_ctx, ds):
    """Result-channel KEYS match the reference's per analysis —
    drop-in clients select channels by these names (reference
    analysis/{sum,sd,raw,masks}.py)."""
    sum_res = lt_ctx.run(lt_ctx.create_sum_analysis(dataset=ds))
    assert set(sum_res.keys()) == {"intensity", "intensity_lin"}

    sd_res = lt_ctx.run(lt_ctx.create_sd_analysis(dataset=ds))
    assert {"intensity", "intensity_lin"} <= set(sd_res.keys())
    # reference intensity = STD, not variance
    assert np.allclose(
        sd_res.intensity.raw_data, sd_res.std.raw_data
    )

    pick = lt_ctx.run(
        lt_ctx.create_pick_analysis(dataset=ds, x=1, y=1)
    )
    assert set(pick.keys()) >= {"intensity", "intensity_lin"}

    from libertem_tpu import masks as m
    multi = lt_ctx.run(lt_ctx.create_mask_analysis(
        dataset=ds, factories=[
            lambda: m.circular(11, 10, 22, 20, 5),
            lambda: m.ring(11, 10, 22, 20, 9, 6),
        ],
    ))
    assert set(multi.keys()) == {"mask_0", "mask_1"}

    disk = lt_ctx.run(
        lt_ctx.create_disk_analysis(dataset=ds, cx=11, cy=10, r=5)
    )
    assert {"intensity", "intensity_log"} <= set(disk.keys())


def test_sum_analysis_complex_channels(lt_ctx):
    """Complex datasets produce the reference's six complex channels
    with the log view owning the bare key (sum.py:105
    default_lin=False)."""
    rng = np.random.default_rng(0)
    cdata = (
        rng.random((4, 4, 8, 8)) + 1j * rng.random((4, 4, 8, 8))
    ).astype(np.complex64)
    cds = MemoryDataSet(
        data=cdata, sig_dims=2, num_partitions=2
    ).initialize()
    res = lt_ctx.run(lt_ctx.create_sum_analysis(dataset=cds))
    assert set(res.keys()) == {
        "intensity", "intensity_lin", "intensity_real",
        "intensity_imag", "intensity_angle", "intensity_complex",
    }
    csum = cdata.reshape(-1, 8, 8).sum(axis=0)
    assert np.allclose(
        res["intensity_real"].raw_data, csum.real, rtol=1e-4
    )
    assert np.allclose(
        res["intensity_lin"].raw_data, np.abs(csum), rtol=1e-4
    )
    assert res["intensity_complex"].raw_data.dtype.kind == "c"
    # the complex channel renders on the 2D-vector color wheel
    assert res["intensity_complex"].visualized.shape == (8, 8, 3)


def test_com_analysis_complex(lt_ctx):
    """Complex datasets: CoM centers are COMPLEX (complex-weighted
    division) and the analysis emits the reference's split channels
    (com.py:213)."""
    rng = np.random.default_rng(1)
    cdata = (
        rng.random((4, 4, 8, 8)) + 0.5
        + 1j * rng.random((4, 4, 8, 8))
    ).astype(np.complex64)
    cds = MemoryDataSet(
        data=cdata, sig_dims=2, num_partitions=2
    ).initialize()
    res = lt_ctx.run(
        lt_ctx.create_com_analysis(dataset=cds, cx=3.5, cy=3.5)
    )
    assert set(res.keys()) == {
        "x_real", "y_real", "x_imag", "y_imag",
    }
    # oracle: complex-weighted center of mass
    flat = cdata.reshape(-1, 8, 8).astype(np.complex128)
    yy, xx = np.mgrid[0:8, 0:8].astype(np.float64)
    s = flat.sum(axis=(1, 2))
    cx = (flat * xx).sum(axis=(1, 2)) / s - 3.5
    cy = (flat * yy).sum(axis=(1, 2)) / s - 3.5
    assert np.allclose(
        res["x_real"].raw_data.reshape(-1), cx.real,
        rtol=1e-3, atol=1e-5,
    )
    assert np.allclose(
        res["x_imag"].raw_data.reshape(-1), cx.imag,
        rtol=1e-3, atol=1e-5,
    )
    assert np.allclose(
        res["y_real"].raw_data.reshape(-1), cy.real,
        rtol=1e-3, atol=1e-5,
    )
