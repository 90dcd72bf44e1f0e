"""GUI overlay/drag geometry: the client's formula table
(web/client/index.html ``GEOM_FORMULAS``) is drift-guarded against
its Python twin (libertem_tpu/web/client_geometry.py), and synthetic
drag sequences are driven through the twin — so a sign or scale
change in the overlay math fails here even though no JS runtime
exists in this environment."""
import json
import re

import numpy as np
import pytest

from libertem_tpu.web import client_geometry as geom


def _client_src():
    import os
    import libertem_tpu.web as web
    path = os.path.join(
        os.path.dirname(os.path.abspath(web.__file__)),
        "client", "index.html",
    )
    with open(path) as f:
        return f.read()


def _extract_js_formulas():
    src = _client_src()
    m = re.search(
        r"const GEOM_FORMULAS = \{(.*?)\n\};", src, re.DOTALL
    )
    assert m, "client GEOM_FORMULAS table not found"
    entries = re.findall(
        r'^\s*([a-z_0-9]+):\s*"([^"]*)",?\s*$',
        m.group(1), re.MULTILINE,
    )
    return dict(entries)


def _tokens(expr):
    # whitespace-insensitive comparison of the expression streams
    return re.findall(r"[A-Za-z_][A-Za-z_0-9]*|\d+\.\d+|\d+|\S",
                      expr)


class TestDriftGuard:
    def test_formula_tables_identical(self):
        js = _extract_js_formulas()
        py = geom.FORMULAS
        assert set(js) == set(py), set(js) ^ set(py)
        for name in py:
            assert _tokens(js[name]) == _tokens(py[name]), name

    def test_client_uses_the_table(self):
        """The handle callbacks must go through geomEval — raw
        Math.* geometry outside the evaluator would escape the
        drift guard."""
        src = _client_src()
        overlay = src[src.index("GEOM_FORMULAS"):]
        # parameter math markers must not appear outside the
        # evaluator binding (display sizing may use Math.min/max/abs)
        raw_math = re.findall(
            r"Math\.(hypot|round|SQRT1_2)", overlay
        )
        # the evaluator binds Math.hypot once; the comment above it
        # names Math.round once
        assert raw_math.count("hypot") == 1, raw_math
        assert raw_math.count("SQRT1_2") == 0, raw_math
        for name in geom.FORMULAS:
            assert re.search(
                rf'geomEval\("{name}"', overlay
            ), f"formula {name} unused by the client"


class TestDragMath:
    def test_event_to_data_scaling(self):
        # a 256-px-wide <img> rendering a 128-px image at 2x zoom,
        # offset by (10, 20) on the page
        x, y = geom.event_to_data(
            client_x=10 + 64, client_y=20 + 128,
            rect=(10, 20, 256, 256),
            natural_w=128, natural_h=128,
        )
        assert (x, y) == (32.0, 64.0)

    def test_radius_drag_sets_distance(self):
        params = {"cx": 8.0, "cy": 8.0, "r": 2.0}
        out = geom.drag_radius(params, "r", 8.0 + 3.0, 8.0 + 4.0)
        assert out["r"] == 5.0
        # dragging OUTWARD must INCREASE the radius (sign check)
        further = geom.drag_radius(params, "r", 8.0 + 6.0, 8.0 + 8.0)
        assert further["r"] > out["r"]

    def test_radius_handle_roundtrip_invariance(self):
        """Grabbing the radius handle and releasing it in place must
        not change the radius (the handle sits ON the circle)."""
        cx, cy, r = 8.0, 6.0, 5.0
        hx, hy = geom.radius_handle_pos(cx, cy, r)
        out = geom.drag_radius({"cx": cx, "cy": cy, "r": r},
                               "r", hx, hy)
        assert out["r"] == pytest.approx(r, abs=0.06)

    def test_center_drag(self):
        out = geom.drag_center({"cx": 1.0, "cy": 1.0}, 9.24, 3.56)
        assert out == {"cx": 9.2, "cy": 3.6}

    def test_rect_roi_any_direction(self):
        expected = {"shape": "rect", "x": 2.0, "y": 3.0,
                    "width": 3.0, "height": 4.0}
        # all four drag directions give the same rect
        assert geom.draw_rect_roi(2, 3, 5, 7) == expected
        assert geom.draw_rect_roi(5, 7, 2, 3) == expected
        assert geom.draw_rect_roi(5, 3, 2, 7) == expected
        assert geom.draw_rect_roi(2, 7, 5, 3) == expected

    def test_rect_resize_handle_floor(self):
        roi = {"shape": "rect", "x": 2.0, "y": 3.0,
               "width": 3.0, "height": 4.0}
        out = geom.resize_rect_roi(roi, 10.0, 5.0)
        assert out["width"] == 8.0 and out["height"] == 2.0
        # dragging past the origin clamps to 1 (never negative)
        out = geom.resize_rect_roi(roi, 0.0, 0.0)
        assert out["width"] == 1.0 and out["height"] == 1.0

    def test_disk_roi_draw(self):
        out = geom.draw_disk_roi(4.0, 4.0, 7.0, 8.0)
        assert out == {"shape": "disk", "cx": 4.0, "cy": 4.0,
                       "r": 5.0}

    def test_pick_nav_snaps(self):
        assert geom.pick_nav(3.4, 5.6) == {"x": 3.0, "y": 6.0}
        # halves round AWAY from zero-ward consistently on both
        # sides (floor(v + 0.5))
        assert geom.pick_nav(2.5, 2.5) == {"x": 3.0, "y": 3.0}


class TestDragToServer:
    """End-to-end: a synthetic drag's parameters, computed by the
    shared formulas, posted as a real analysis — the server selects
    exactly the dragged region."""

    def test_dragged_disk_roi_selects_pixels(self, lt_ctx):
        from libertem_tpu.analysis.getroi import get_roi

        nav = (8, 8)
        # drag on the nav image from (2, 2) out to (4.4, 2) — the
        # shared formulas say r = 2.4
        roi_params = geom.draw_disk_roi(2.0, 2.0, 4.4, 2.0)
        assert roi_params["r"] == 2.4
        roi = get_roi({"roi": roi_params}, nav)
        yy, xx = np.mgrid[0:nav[0], 0:nav[1]]
        inside = (yy - 2.0) ** 2 + (xx - 2.0) ** 2 <= 2.4 ** 2
        assert np.array_equal(roi, inside)

    def test_dragged_params_run_analysis(self, lt_ctx):
        from libertem_tpu.io.dataset.memory import MemoryDataSet
        from libertem_tpu.analysis.base import Analysis

        rng = np.random.default_rng(1)
        data = rng.poisson(
            6.0, (6, 6, 16, 16)
        ).astype(np.float32)
        ds = MemoryDataSet(
            data=data, sig_dims=2, num_partitions=1
        ).initialize()
        # drag a disk selector on the 16x16 detector image: grab the
        # radius handle of an r=4 disk at (8, 8) and pull it to
        # (11, 12) -> r = 5
        params = {"cx": 8.0, "cy": 8.0, "r": 4.0}
        params = geom.drag_radius(params, "r", 11.0, 12.0)
        assert params["r"] == 5.0
        cls = Analysis.get_analysis_by_type("APPLY_DISK_MASK")
        res = lt_ctx.run(cls(dataset=ds, parameters=params))
        from libertem_tpu import masks as mask_lib
        mask = mask_lib.circular(
            params["cx"], params["cy"], 16, 16, params["r"],
            antialiased=True,
        )
        expected = (
            data.reshape(-1, 16, 16) * mask
        ).sum(axis=(1, 2)).reshape(6, 6)
        assert np.allclose(
            res.intensity.raw_data, expected, rtol=1e-3
        )
