"""Coordinate/vector math helpers
(reference: libertem/utils/__init__.py — polar/cartesian conversions
+ rotation/frame transforms used by CoM and blobfinder workflows).

Conventions: vectors are (y, x) tuples in pixel coordinates (y down,
x right); polar vectors are (r, phi) with phi measured from the +x
axis towards +y.
"""
from __future__ import annotations

import numpy as np


def make_cartesian(polar: np.ndarray) -> np.ndarray:
    """(..., (r, phi)) -> (..., (y, x))."""
    polar = np.asarray(polar)
    y = np.sin(polar[..., 1]) * polar[..., 0]
    x = np.cos(polar[..., 1]) * polar[..., 0]
    return np.stack((y, x), axis=-1)


def make_polar(cartesian: np.ndarray) -> np.ndarray:
    """(..., (y, x)) -> (..., (r, phi))."""
    cartesian = np.asarray(cartesian)
    r = np.linalg.norm(cartesian, axis=-1)
    phi = np.arctan2(cartesian[..., 0], cartesian[..., 1])
    return np.stack((r, phi), axis=-1)


def rotate_precalc(y, x, cos_angle, sin_angle):
    """Rotate with precomputed rotation-matrix entries (reference
    utils/__init__.py:47) — the loop-hoisted form rotate_deg/_rad
    delegate to."""
    return (
        sin_angle * x + cos_angle * y,
        cos_angle * x - sin_angle * y,
    )


def rotate_rad(y, x, radians):
    """Rotate (y, x) clockwise in pixel coordinates (y down, x right)
    by ``radians`` (reference utils/__init__.py:107)."""
    return rotate_precalc(
        y, x, cos_angle=np.cos(radians), sin_angle=np.sin(radians)
    )


def rotate_deg(y, x, degrees: float):
    """Rotate (y, x) clockwise in pixel coordinates (y down, x right)
    by ``degrees``: +x rotates towards +y."""
    return rotate_rad(y, x, np.deg2rad(degrees))


def frame_peaks_polar(zero, a, b, indices):
    """Lattice points zero + i*a + j*b as polar vectors relative to
    zero — convenience for strain/lattice analysis."""
    idx = np.asarray(indices).reshape(2, -1).T
    zero = np.asarray(zero, dtype=np.float64)
    pts = (
        zero
        + idx[:, 0:1] * np.asarray(a, dtype=np.float64)
        + idx[:, 1:2] * np.asarray(b, dtype=np.float64)
    )
    return make_polar(pts - zero)
