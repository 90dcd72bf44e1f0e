"""CoMUDF: center of mass / first-moment analysis.

Counterpart of the reference's ``libertem/udf/com.py`` (CoMUDF:298,
CoMParams:30, com_masks_factory:47, center_shifts:100,
apply_correction:110, divergence/curl:130–143, regression:600).

Device side: one 3-column mask matmul per tile (sum, y·sum, x·sum) —
shares the MXU path with ApplyMasksUDF.  All derived fields (shifts,
rotation/flip correction, magnitude, divergence, curl, regression
deskew) are computed in ``get_results`` post-processing on the host,
matching the reference's split.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..masks import circular, gradient_x, gradient_y
from .base import UDF


class RegressionOptions:
    NO_REGRESSION = -1
    SUBTRACT_MEAN = 0
    SUBTRACT_LINEAR = 1


@dataclass
class CoMParams:
    cy: Optional[float] = None
    cx: Optional[float] = None
    r: Optional[float] = None      # outer mask radius (None = whole frame)
    ri: Optional[float] = None     # inner radius (annular CoM)
    scan_rotation: float = 0.0
    flip_y: bool = False
    regression: int = RegressionOptions.NO_REGRESSION


def apply_com_correction(sy, sx, scan_rotation, flip_y):
    """Flip-then-rotate shift correction matching the reference
    (apply_correction com.py:110 + corrections/coordinates.py:11):
    flip_y negates the y component first, then the (y, x) vector is
    rotated with R = [[cos, sin], [-sin, cos]]."""
    theta = np.deg2rad(scan_rotation)
    if flip_y:
        sy = -sy
    y_corr = sy * np.cos(theta) + sx * np.sin(theta)
    x_corr = -sy * np.sin(theta) + sx * np.cos(theta)
    return y_corr, x_corr


def com_masks(sig_shape, cy, cx, r=None, ri=None) -> np.ndarray:
    """(3, *sig) stack: [total, y-weighted, x-weighted]
    (reference com_masks_factory com.py:47)."""
    h, w = sig_shape
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    if r is not None:
        d2 = (y - cy) ** 2 + (x - cx) ** 2
        base = (d2 <= r ** 2).astype(np.float32)
        if ri is not None and ri > 0:
            # reference annulus: disk(r) minus disk(ri) keeps
            # d > ri (com_masks_generic with masks.ring)
            base *= (d2 > ri ** 2).astype(np.float32)
    else:
        base = np.ones((h, w), dtype=np.float32)
        if ri is not None and ri > 0:
            d2 = (y - cy) ** 2 + (x - cx) ** 2
            base *= (d2 > ri ** 2).astype(np.float32)
    return np.stack([base, y * base, x * base], axis=0)


class CoMUDF(UDF):
    def __init__(self, com_params: Optional[CoMParams] = None):
        if com_params is None:
            com_params = CoMParams()
        super().__init__(com_params=com_params)
        self._container = None

    def on_params_updated(self):
        self._container = None

    @classmethod
    def with_params(
        cls, cy=None, cx=None, r=None, ri=None,
        scan_rotation=0.0, flip_y=False,
        regression=RegressionOptions.NO_REGRESSION,
    ) -> "CoMUDF":
        if r is not None and ri is not None and ri >= r:
            raise ValueError(
                "inner radius must be less than the outer radius "
                "for annular CoM (reference com.py:464)"
            )
        return cls(CoMParams(
            cy=cy, cx=cx, r=r, ri=ri,
            scan_rotation=scan_rotation, flip_y=flip_y,
            regression=regression,
        ))

    def _regression_requested(self) -> bool:
        """Whether a regression applies — an array parameter always
        does, the int -1 means none; unknown ints raise like the
        reference (com.py:625)."""
        mode = self.params.com_params.regression
        if not isinstance(mode, (int, np.integer)):
            return True
        if mode not in (
            RegressionOptions.NO_REGRESSION,
            RegressionOptions.SUBTRACT_MEAN,
            RegressionOptions.SUBTRACT_LINEAR,
        ):
            raise ValueError(
                f"unrecognized regression option {mode!r}"
            )
        return mode != RegressionOptions.NO_REGRESSION

    def get_result_buffers(self):
        # reference validations (com.py:538): 2D nav + 2D sig only,
        # and an unrecognized regression option fails at prepare time
        if self.meta.dataset_shape.sig.dims != 2:
            raise ValueError("CoMUDF only works with 2D sig shape.")
        if self.meta.dataset_shape.nav.dims != 2:
            raise ValueError("CoMUDF only works with 2D nav shape.")
        self._regression_requested()
        # complex input data produces COMPLEX centers/shifts
        # (reference com.py:477 np.result_type(input_dtype, f32));
        # complex128 clamps to complex64 like the rest of the engine
        dtype = np.result_type(self.meta.input_dtype, np.float32)
        if dtype.kind == "c":
            dtype = np.dtype(np.complex64)
        else:
            dtype = np.dtype(np.float32)
        return {
            "raw_mask_result": self.buffer(
                kind="nav", extra_shape=(3,), dtype=dtype,
                use="private",
            ),
            "raw_com": self.buffer(
                kind="nav", extra_shape=(2,), dtype=dtype,
                use="result_only",
            ),
            "raw_shifts": self.buffer(
                kind="nav", extra_shape=(2,), dtype=dtype,
                use="result_only",
            ),
            "field": self.buffer(
                kind="nav", extra_shape=(2,), dtype=dtype,
                use="result_only",
            ),
            "field_y": self.buffer(
                kind="nav", dtype=dtype, use="result_only",
            ),
            "field_x": self.buffer(
                kind="nav", dtype=dtype, use="result_only",
            ),
            "magnitude": self.buffer(
                kind="nav", dtype=dtype, use="result_only",
            ),
            "divergence": self.buffer(
                kind="nav", dtype=dtype, use="result_only",
            ),
            "curl": self.buffer(
                kind="nav", dtype=dtype, use="result_only",
            ),
            "regression": self.buffer(
                kind="single", extra_shape=(3, 2), dtype="float32",
                use="result_only",
            ),
        }

    def _center(self):
        p: CoMParams = self.params.com_params
        h, w = self.meta.sig_shape
        # reference default center is the INTEGER h//2 (com.py:513
        # get_params), not the pixel-center (h-1)/2
        cy = p.cy if p.cy is not None else h // 2
        cx = p.cx if p.cx is not None else w // 2
        return cy, cx

    def _operand(self):
        # MaskContainer handles the tracer-safe per-sig-slice numpy
        # caching (one shared implementation with ApplyMasksUDF)
        if self._container is None:
            from .masks import MaskContainer
            p: CoMParams = self.params.com_params
            sig = self.meta.sig_shape
            cy, cx = self._center()
            self._container = MaskContainer(
                lambda: com_masks(sig, cy, cx, p.r, p.ri),
                dtype=np.float32, count=3,
            )
        return self._container.get_for_sig_slice(
            self.meta.sig_slice, self.meta.sig_shape, np.float32,
        )

    def process_tile(self, tile):
        masks = self._operand()
        flat = tile.reshape(tile.shape[0], -1)
        if jnp.iscomplexobj(flat):
            # complex data: complex projections (reference keeps
            # result_type(input, f32) throughout, com.py:477)
            flat = flat.astype(jnp.complex64)
            self.results.raw_mask_result += jnp.matmul(
                flat, masks.astype(jnp.complex64),
            )
        else:
            flat = flat.astype(jnp.float32)
            self.results.raw_mask_result += jnp.matmul(
                flat, masks, preferred_element_type=jnp.float32
            )

    # -- post-processing -----------------------------------------------

    def get_results(self):
        p: CoMParams = self.params.com_params
        cy, cx = self._center()
        raw = np.asarray(self.results.raw_mask_result)
        # complex data yields complex centers/shifts (reference
        # com.py:477 result dtype follows the input)
        is_c = raw.dtype.kind == "c"
        work_dt = np.complex128 if is_c else np.float64
        out_dt = np.complex64 if is_c else np.float32
        raw = raw.astype(work_dt)
        # center_shifts semantics (reference com.py:100): zero-sum
        # frames (incl. not-yet-processed rows in partial results)
        # report the reference center, i.e. zero shift — not NaN
        nz = raw[:, 0] != 0
        com_y = np.full(raw.shape[0], cy, dtype=work_dt)
        com_x = np.full(raw.shape[0], cx, dtype=work_dt)
        np.divide(raw[:, 1], raw[:, 0], out=com_y, where=nz)
        np.divide(raw[:, 2], raw[:, 0], out=com_x, where=nz)
        raw_com = np.stack([com_y, com_x], axis=-1).astype(out_dt)
        raw_shifts = np.stack(
            [com_y - cy, com_x - cx], axis=-1
        ).astype(out_dt)
        # derive from the STORED (out_dt-rounded) shifts so every
        # downstream field is a pure function of the raw_shifts
        # buffer — the analysis layer recomputes from that buffer and
        # must match bit-for-bit (reference-suite gate, udf/test_com)
        shifts_y = raw_shifts[..., 0].astype(work_dt)
        shifts_x = raw_shifts[..., 1].astype(work_dt)

        # rotation / flip correction (reference apply_correction com.py:110)
        y_corr, x_corr = apply_com_correction(
            shifts_y, shifts_x, p.scan_rotation, p.flip_y
        )

        # regression deskew on the 2D nav grid (com.py:600) — not
        # defined for complex fields (a least-squares plane through
        # complex shifts has no physical meaning here); the buffer's
        # validity mask marks it invalid in that case
        regression = np.zeros((3, 2), dtype=np.float32)
        want_regression = self._regression_requested()
        if want_regression and not is_c:
            y2d, x2d, regression = self._regress(y_corr, x_corr,
                                                 p.regression)
            y_corr, x_corr = y2d, x2d

        field = np.stack([y_corr, x_corr], axis=-1).astype(out_dt)
        magnitude = np.sqrt(y_corr ** 2 + x_corr ** 2).astype(out_dt)
        div, curl = self._div_curl(y_corr, x_corr)
        return {
            "raw_com": raw_com,
            "raw_shifts": raw_shifts,
            "field": field,
            "field_y": y_corr.astype(out_dt),
            "field_x": x_corr.astype(out_dt),
            "magnitude": magnitude,
            "divergence": div,
            "curl": curl,
            # regression coefficients are only meaningful when a
            # regression was requested (reference marks validity via
            # with_mask, udf/base.py:1611)
            "regression": self.with_mask(
                regression,
                mask=want_regression and not is_c,
            ),
        }

    def _embed_nav2d(self, flat):
        """roi-compressed flat nav → full 2D nav grid with nan gaps."""
        nav_shape = tuple(self.meta.dataset_shape.nav)
        if len(nav_shape) != 2:
            return None
        dt = (
            np.complex128 if np.asarray(flat).dtype.kind == "c"
            else np.float64
        )
        full = np.full(int(np.prod(nav_shape)), np.nan, dtype=dt)
        if self.meta.roi is not None:
            roi_flat = np.asarray(self.meta.roi, bool).reshape(-1)
            full[roi_flat] = flat
        else:
            full[:] = flat
        return full.reshape(nav_shape)

    def _compress_nav2d(self, grid):
        flat = grid.reshape(-1)
        if self.meta.roi is not None:
            return flat[np.asarray(self.meta.roi, bool).reshape(-1)]
        return flat

    def _div_curl(self, y_corr, x_corr):
        out_dt = (
            np.complex64 if np.asarray(y_corr).dtype.kind == "c"
            else np.float32
        )
        y2d = self._embed_nav2d(y_corr)
        x2d = self._embed_nav2d(x_corr)
        n = y_corr.shape[0]
        if y2d is None or min(y2d.shape) < 2:
            nanbuf = np.full(n, np.nan, dtype=out_dt)
            return nanbuf, nanbuf.copy()
        dy_dy, dy_dx = np.gradient(y2d)
        dx_dy, dx_dx = np.gradient(x2d)
        div = (dy_dy + dx_dx).astype(out_dt)
        # curl_2d = dFy/dx - dFx/dy (reference com.py:134)
        curl = (dy_dx - dx_dy).astype(out_dt)
        return (
            self._compress_nav2d(div).astype(out_dt),
            self._compress_nav2d(curl).astype(out_dt),
        )

    def _valid_nav2d(self):
        """Full-nav 2D validity: positions both processed (damage)
        and inside the roi (reference com.py:683 fits the regression
        on get_valid_nav_mask(full_nav=True))."""
        nav_shape = tuple(self.meta.dataset_shape.nav)
        vm = self.meta.get_valid_nav_mask(full_nav=True)
        if vm is None:
            vm = np.zeros(int(np.prod(nav_shape)), dtype=bool)
            if self.meta.roi is not None:
                vm[np.asarray(self.meta.roi, bool).reshape(-1)] = True
            else:
                vm[:] = True
        return vm.reshape(nav_shape)

    def _regress(self, y_corr, x_corr, mode):
        """Fit a constant or linear plane per component on the VALID
        nav positions and subtract it there — invalid (unprocessed /
        outside-roi) positions are neither fit nor modified
        (reference com.py:600 get_regression + apply_*_regression).
        Returns corrected components and the (3, 2) coefficient
        matrix, rows = (intercept, d/drow, d/dcol), cols = (y, x)."""
        nav_shape = tuple(self.meta.dataset_shape.nav)
        regression = np.zeros((3, 2), dtype=np.float32)
        if len(nav_shape) != 2:
            return y_corr, x_corr, regression
        y2d = self._embed_nav2d(y_corr)
        x2d = self._embed_nav2d(x_corr)
        rows, cols = np.mgrid[0:nav_shape[0], 0:nav_shape[1]]
        valid = (
            self._valid_nav2d()
            & np.isfinite(y2d) & np.isfinite(x2d)
        )
        given = None
        if not isinstance(mode, (int, np.integer)):
            given = np.asarray(mode, dtype=np.float64)
            if given.shape != (3, 2):
                raise ValueError(
                    f"regression parameter {mode!r} doesn't have "
                    "the required shape (3, 2)"
                )
            regression[:] = given
        elif valid.sum() < 3:
            return y_corr, x_corr, regression
        for ci, comp2d in enumerate((y2d, x2d)):
            if given is not None:
                coef = given[:, ci]
            elif mode == RegressionOptions.SUBTRACT_MEAN:
                coef = np.array([comp2d[valid].mean()])
            else:  # SUBTRACT_LINEAR
                A = np.stack(
                    [np.ones(valid.sum()), rows[valid],
                     cols[valid]],
                    axis=-1,
                )
                coef, *_ = np.linalg.lstsq(
                    A, comp2d[valid], rcond=None
                )
            if given is None:
                regression[:len(coef), ci] = coef
            if len(coef) > 1 and not np.allclose(coef[1:], 0):
                fit = coef[0] + coef[1] * rows + coef[2] * cols
            else:
                fit = np.full(nav_shape, coef[0])
            comp2d[valid] -= fit[valid]
        return (
            self._compress_nav2d(y2d),
            self._compress_nav2d(x2d),
            regression,
        )

    def fused_moments_spec(self):
        """Join the cross-UDF fused moments pass with the 3-column
        (total, y·, x·) CoM mask stack."""
        p: CoMParams = self.params.com_params
        cy, cx = self._center()
        stack = com_masks(self.meta.sig_shape, cy, cx, p.r, p.ri)
        return {
            "mode": "masks",
            "operand": stack.reshape(3, -1).astype(np.float32),
            "name": "raw_mask_result",
        }


def guess_corrections(y_centers, x_centers, roi=None):
    """Guess scan_rotation / flip_y / center from CoM fields
    (reference guess_corrections com.py:207 + coordinate_check):
    sweep rotation 0..359 for both flip states, pick the combination
    minimizing the RMS curl, then resolve the 180-degree ambiguity via
    the divergence-histogram polarity (beam deflects toward nuclei, so
    divergence skews negative).  Returns dict(scan_rotation, flip_y,
    cy, cx).
    """
    y2d = np.asarray(y_centers, dtype=np.float64)
    x2d = np.asarray(x_centers, dtype=np.float64)
    if roi is None:
        # the last row/column of a scan usually carry flyback artifacts
        roi = (slice(0, -1), slice(0, -1))
    cy = np.nanmean(y2d[roi])
    cx = np.nanmean(x2d[roi])
    sy = y2d - cy
    sx = x2d - cx

    def _rms_curl(ry, rx):
        curl = np.gradient(ry, axis=1) - np.gradient(rx, axis=0)
        return np.sqrt(np.nanmean(curl[roi] ** 2))

    best = None
    for flip in (False, True):
        for rot in range(360):
            ry, rx = apply_com_correction(sy, sx, rot, flip)
            score = _rms_curl(ry, rx)
            if best is None or score < best[0]:
                best = (score, rot, flip)
    _, rot, flip = best
    ry, rx = apply_com_correction(sy, sx, rot, flip)
    div = (np.gradient(ry, axis=0) + np.gradient(rx, axis=1))[roi]
    div = div[np.isfinite(div)]
    if div.size:
        rng = max(-div.min(), div.max())
        hist, _ = np.histogram(div, range=(-rng, rng), bins=5)
        if hist[0] < hist[-1]:  # polarity off: rotate by 180
            rot += 180
    if rot > 180:
        rot -= 360
    return GuessResult(
        scan_rotation=float(rot),
        flip_y=bool(flip),
        cy=float(cy),
        cx=float(cx),
    )

# -- reference-named public helper API ---------------------------------
# (reference com.py:47-205; kept callable under the same names so
# notebooks and scripts written against the reference port directly)

class GuessResult(NamedTuple):
    """CoM parameter guess (reference com.py:192 NamedTuple, same
    field order — unpacks positionally).  String indexing and
    keys()/get() are added so mapping-style consumers (the web RPC)
    keep working: ``guess["cy"]``, ``dict(guess)``."""

    scan_rotation: float
    flip_y: bool
    cy: float
    cx: float

    def __getitem__(self, k):
        if isinstance(k, str):
            return getattr(self, k)
        return tuple.__getitem__(self, k)

    def keys(self):
        return self._fields

    def get(self, k, default=None):
        return getattr(self, k, default)

    def __contains__(self, k):
        # mapping-style membership (field names), matching the
        # dict-compatible accessors above
        return k in self._fields


def com_masks_generic(detector_y, detector_x, base_mask_factory):
    """CoM mask-factory triple [base, y*base, x*base] from a generic
    selection-mask factory (reference com.py:69)."""
    return [
        base_mask_factory,
        lambda: gradient_y(
            imageSizeX=detector_x, imageSizeY=detector_y
        ) * base_mask_factory(),
        lambda: gradient_x(
            imageSizeX=detector_x, imageSizeY=detector_y
        ) * base_mask_factory(),
    ]


def com_masks_factory(detector_y, detector_x, cy, cx, r):
    """CoM mask-factory triple for a circular selection
    (reference com.py:47)."""
    return com_masks_generic(
        detector_y, detector_x,
        lambda: circular(
            centerX=cx, centerY=cy,
            imageSizeX=detector_x, imageSizeY=detector_y, radius=r,
        ),
    )


def center_shifts(img_sum, img_y, img_x, ref_y, ref_x):
    """(y, x) center-of-mass shift fields from the three mask
    projections, relative to the reference center; zero-intensity
    positions report zero shift (reference com.py:100)."""
    img_sum = np.asarray(img_sum)
    nz = img_sum != 0
    y_centers = np.divide(img_y, img_sum, where=nz)
    x_centers = np.divide(img_x, img_sum, where=nz)
    y_centers[~nz] = ref_y
    x_centers[~nz] = ref_x
    return (y_centers - ref_y, x_centers - ref_x)


def apply_correction(y_centers, x_centers, scan_rotation, flip_y,
                     forward=True):
    """Rotation/flip shift correction; ``forward=False`` applies the
    inverse transform (reference com.py:110)."""
    if forward:
        return apply_com_correction(
            y_centers, x_centers, scan_rotation, flip_y
        )
    # inverse of rotate(theta) @ flip: rotate back first, then unflip
    theta = np.deg2rad(scan_rotation)
    y_r = y_centers * np.cos(theta) - x_centers * np.sin(theta)
    x_r = y_centers * np.sin(theta) + x_centers * np.cos(theta)
    if flip_y:
        y_r = -y_r
    return y_r, x_r


def divergence(y_centers, x_centers):
    """dFy/dy + dFx/dx of the shift field (reference com.py:130)."""
    return (
        np.gradient(y_centers, axis=0) + np.gradient(x_centers, axis=1)
    )


def curl_2d(y_centers, x_centers):
    """dFy/dx - dFx/dy of the shift field (reference com.py:134)."""
    return (
        np.gradient(y_centers, axis=1) - np.gradient(x_centers, axis=0)
    )


def magnitude(y_centers, x_centers):
    """Length of the shift vector per scan position
    (reference com.py:141)."""
    return np.sqrt(y_centers ** 2 + x_centers ** 2)


def coordinate_check(y_centers, x_centers, roi=None):
    """RMS curl over scan_rotation 0..359 for both flip states —
    minima identify the physically consistent descan parameters
    (reference com.py:145).  Returns (straight, flipped) arrays."""
    if roi is None:
        # last row/column carry flyback artifacts
        roi = (slice(0, -1), slice(0, -1))
    straight = np.zeros(360)
    flipped = np.zeros(360)
    for angle in range(360):
        for flip in (False, True):
            ry, rx = apply_com_correction(
                y_centers, x_centers, angle, flip
            )
            val = float(np.sqrt(np.mean(curl_2d(ry, rx)[roi] ** 2)))
            if flip:
                flipped[angle] = val
            else:
                straight[angle] = val
    return (straight, flipped)
