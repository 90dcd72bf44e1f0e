"""Mask factory library for virtual detectors.

Counterpart of the reference's ``libertem/masks.py`` (circular:108,
ring:130, radial_gradient:162, polar_map:222, radial_bins:290,
background_subtraction:356, rectangular:370, gradient_x/y:415,
_make_circular_mask:18 antialiasing via oversampling).

All factories return dense numpy arrays of shape (imageSizeY,
imageSizeX); sparse radial-bin stacks return a (n_bins, Y, X) dense
stack plus are cheap to keep dense on TPU (they get packed into the
mask-stack matmul operand anyway).
"""
from __future__ import annotations

import numpy as np

# the reference re-exports the sparse helpers from its masks module
# (masks.py:12) — consumers import them from either place
from .common.sparse import is_sparse, to_dense, to_sparse  # noqa: F401


class _DenseStack(np.ndarray):
    """Dense stand-in for the reference's sparse.COO mask stacks
    (the pydata ``sparse`` package is not installed here, and the TPU
    path packs mask stacks densely anyway): exposes the small part
    of the COO API mask consumers call.  Indexing and reductions
    preserve the type, so ``bins.sum(axis=0).todense()`` and
    ``stack[i].todense()`` both work."""

    def todense(self):
        return np.asarray(self)

    @property
    def density(self) -> float:
        return float(np.count_nonzero(self)) / max(1, self.size)


def _disk_aa(
    centerX, centerY, imageSizeX, imageSizeY, radius,
    antialiased=True,
):
    """Antialiased disk via 4x oversampling of the boundary ring
    (same idea as reference _make_circular_mask:18)."""
    y, x = np.ogrid[0:imageSizeY, 0:imageSizeX]
    d2 = (y - centerY) ** 2 + (x - centerX) ** 2
    if not antialiased:
        # reference returns a BOOL mask here (masks.py:50) — rois
        # index with it directly
        return d2 <= radius ** 2
    # oversample ONLY the boundary band (pixels whose square can
    # straddle the edge, half-diagonal ~0.71) — a full-frame 4x4
    # float64 oversample costs GBs on K2IS-sized detectors
    d = np.sqrt(d2)
    out = (d <= radius).astype(np.float64)
    by, bx = np.nonzero(np.abs(d - radius) <= 0.75)
    if by.size:
        os = 4
        offs = (np.arange(os) + 0.5) / os - 0.5
        sy = by[:, None, None] + offs[None, :, None] - centerY
        sx = bx[:, None, None] + offs[None, None, :] - centerX
        hit = (sy ** 2 + sx ** 2) <= radius ** 2
        out[by, bx] = hit.mean(axis=(1, 2))
    return out


def circular(centerX, centerY, imageSizeX, imageSizeY, radius,
             antialiased=False):
    return _disk_aa(
        centerX, centerY, imageSizeX, imageSizeY, radius,
        antialiased=antialiased,
    )


def ring(centerX, centerY, imageSizeX, imageSizeY, radius,
         radius_inner, antialiased=False):
    outer = _disk_aa(
        centerX, centerY, imageSizeX, imageSizeY, radius,
        antialiased=antialiased,
    )
    inner = _disk_aa(
        centerX, centerY, imageSizeX, imageSizeY, radius_inner,
        antialiased=antialiased,
    )
    if not antialiased:
        # bool like the reference's mask difference
        return outer & ~inner
    return (outer - inner).astype(np.float64)


def rectangular(X, Y, Width, Height, imageSizeX, imageSizeY):
    """Rectangle from corner (X, Y) extending Width/Height (either
    sign); the far corner is INCLUSIVE and zero-area rectangles
    select nothing (reference masks.py:370-411 exactly)."""
    mask = np.zeros((imageSizeY, imageSizeX), dtype=bool)
    if Height == 0 or Width == 0:
        return mask
    y0, y1 = sorted((int(Y), int(Y + Height)))
    x0, x1 = sorted((int(X), int(X + Width)))
    mask[
        max(0, y0):min(y1 + 1, imageSizeY),
        max(0, x0):min(x1 + 1, imageSizeX),
    ] = True
    return mask


def radial_gradient(centerX, centerY, imageSizeX, imageSizeY, radius,
                    antialiased=False):
    y, x = np.ogrid[0:imageSizeY, 0:imageSizeX]
    r = np.sqrt((y - centerY) ** 2 + (x - centerX) ** 2)
    disk = _disk_aa(
        centerX, centerY, imageSizeX, imageSizeY, radius,
        antialiased=antialiased,
    ).astype(np.float64)
    return r * disk / radius


def polar_map(centerX, centerY, imageSizeX, imageSizeY,
              stretchY=1.0, angle=0.0):
    """(r, phi) maps for each detector pixel, with optional elliptical
    stretch/rotation (reference masks.py:222)."""
    y, x = np.mgrid[0:imageSizeY, 0:imageSizeX].astype(np.float64)
    dy, dx = y - centerY, x - centerX
    if angle != 0.0 or stretchY != 1.0:
        # stretch in the rotated frame, measure (r, phi) there — the
        # reference does NOT rotate back (masks.py:248-254)
        c, s = np.cos(angle), np.sin(angle)
        dy, dx = (
            (dy * c - dx * s) / stretchY,
            dx * c + dy * s,
        )
    r = np.sqrt(dy ** 2 + dx ** 2)
    # reference convention: arctan2(dy, dx) in [-pi, pi]
    phi = np.arctan2(dy, dx)
    return r, phi


def bounding_radius(centerX, centerY, imageSizeX, imageSizeY):
    """Radius around the center covering the whole frame
    (reference masks.py:282)."""
    dy = max(centerY, imageSizeY - centerY)
    dx = max(centerX, imageSizeX - centerX)
    return int(np.ceil(np.sqrt(dy ** 2 + dx ** 2))) + 1


def radial_bins(
    centerX, centerY, imageSizeX, imageSizeY,
    radius=None, radius_inner=0, n_bins=None,
    normalize=False, use_sparse=None, dtype=None,
):
    """Antialiased stack of concentric ring masks
    (reference masks.py:290): each ring has a trapezoid radial profile
    ``clip(width/2 + 0.5 - |r - r0|, 0, 1)`` so adjacent bins overlap
    and sum to exactly 1, with the center-pixel singularity patched.

    Returns a dense (n_bins, Y, X) stack (``use_sparse`` accepted for
    API compatibility; the TPU path densifies mask stacks anyway).
    """
    if radius is None:
        radius = bounding_radius(
            centerX, centerY, imageSizeX, imageSizeY
        )
    if n_bins is None:
        n_bins = int(np.round(radius - radius_inner))
    n_bins = max(1, int(n_bins))
    r, _ = polar_map(centerX, centerY, imageSizeX, imageSizeY)
    width = (radius - radius_inner) / n_bins
    centers = np.linspace(
        radius_inner, radius - width, n_bins
    ) + width / 2
    stack = np.empty(
        (n_bins, imageSizeY, imageSizeX),
        dtype=np.float64 if dtype is None else dtype,
    )
    for b, r0 in enumerate(centers):
        diff = np.abs(r - r0)
        # the 0.5 makes bins overlap and sum to exactly 1
        vals = np.maximum(0, np.minimum(1, width / 2 + 0.5 - diff))
        if b == 0 and radius_inner < 0.5:
            # patch the r=0 singularity into bin 0 BEFORE
            # normalization, so normalize=True keeps summing to 1
            yy = int(np.round(centerY))
            xx = int(np.round(centerX))
            if 0 <= yy < imageSizeY and 0 <= xx < imageSizeX:
                vals[yy, xx] = 1 - radius_inner
        if normalize:
            s = vals.sum()
            if not np.isclose(s, 0):
                vals = vals / s
        stack[b] = vals
    width_frac = np.pi * (
        radius ** 2 - (radius - width) ** 2
    ) / (imageSizeX * imageSizeY)
    if use_sparse or (use_sparse is None and width_frac < 0.1):
        # the reference returns a sparse.COO stack here — the dense
        # stand-in keeps its consumer API (.todense()) working
        return stack.view(_DenseStack)
    return stack


def background_subtraction(
    centerX, centerY, imageSizeX, imageSizeY,
    radius, radius_inner, antialiased=False,
):
    """Disk minus normalized surrounding ring, zero total weight
    (reference masks.py:356)."""
    disk = _disk_aa(
        centerX, centerY, imageSizeX, imageSizeY, radius_inner,
        antialiased=antialiased,
    )
    outer = ring(
        centerX, centerY, imageSizeX, imageSizeY,
        radius, radius_inner, antialiased=antialiased,
    )
    disk = disk.astype(np.float64)
    outer = outer.astype(np.float64)
    s_outer = outer.sum()
    if s_outer > 0:
        outer = outer * (disk.sum() / s_outer)
    return disk - outer


def radial_gradient_background_subtraction(
    r, r0, r_outer, delta=1.0,
):
    """Linear radial gradient 0..1 inside ``r0 - delta/2``, linear
    antialiasing transition on ``[r0 - delta/2, r0 + delta/2)``, and
    -1 on ``[r0 + delta/2, r_outer]`` — matching the reference
    (masks.py:177) including the ``delta`` smoothing semantics;
    ``r`` is a radius map (possibly distorted via polar_map)."""
    r = np.asarray(r)
    result = np.zeros_like(r, dtype=np.float64)
    within = r < r0 - delta / 2
    result[within] = r[within] / max(r0, 1e-12)
    transition = (r >= r0 - delta / 2) & (r < r0 + delta / 2)
    result[transition] = (r0 - r[transition]) / max(
        delta / 2, 1e-12
    )
    without = (r >= r0 + delta / 2) & (r <= r_outer)
    result[without] = -1.0
    return result


def gradient_x(imageSizeX, imageSizeY, dtype=np.float32):
    return np.broadcast_to(
        np.arange(imageSizeX, dtype=dtype), (imageSizeY, imageSizeX)
    ).copy()


def gradient_y(imageSizeX, imageSizeY, dtype=np.float32):
    return np.broadcast_to(
        np.arange(imageSizeY, dtype=dtype)[:, None],
        (imageSizeY, imageSizeX),
    ).copy()


def sparse_template_multi_stack(
    mask_index, offsetX, offsetY, template, imageSizeX, imageSizeY,
):
    """Stamp a small template at per-mask offsets into a stack
    (reference masks.py:55); dense output."""
    n_masks = int(np.max(mask_index)) + 1
    stack = np.zeros((n_masks, imageSizeY, imageSizeX), dtype=np.float64)
    th, tw = template.shape
    for i, m in enumerate(np.atleast_1d(mask_index)):
        ox = int(np.atleast_1d(offsetX)[i])
        oy = int(np.atleast_1d(offsetY)[i])
        y0, x0 = max(0, oy), max(0, ox)
        y1, x1 = min(imageSizeY, oy + th), min(imageSizeX, ox + tw)
        if y1 <= y0 or x1 <= x0:
            continue
        stack[m, y0:y1, x0:x1] += template[
            y0 - oy:y1 - oy, x0 - ox:x1 - ox
        ]
    # reference returns sparse matrices (masks.py:55); see _DenseStack
    return stack.view(_DenseStack)

def sparse_circular_multi_stack(
    mask_index, centerX, centerY, imageSizeX, imageSizeY, radius,
):
    """Stamp one circular template at per-mask centers (reference
    masks.py:88): builds the disk once in a tight bounding box and
    delegates to :func:`sparse_template_multi_stack`."""
    bbox = int(2 * np.ceil(radius) + 1)
    bc = (bbox - 1) // 2
    template = circular(
        centerX=bc, centerY=bc,
        imageSizeX=bbox, imageSizeY=bbox, radius=radius,
    )
    return sparse_template_multi_stack(
        mask_index=mask_index,
        offsetX=np.asarray(centerX, dtype=int) - bc,
        offsetY=np.asarray(centerY, dtype=int) - bc,
        template=template,
        imageSizeX=imageSizeX,
        imageSizeY=imageSizeY,
    )


def balance(template):
    """Scale the negative part of a mixed-sign template so the total
    sum is zero (reference masks.py:266) — such masks null out a
    uniform background or linear gradient."""
    # promote to float: integer templates are the natural input, and
    # the negative-part scale is fractional
    result = np.array(
        template, copy=True,
        dtype=np.result_type(np.asarray(template).dtype, np.float32),
    )
    pos = result > 0
    neg = result < 0
    neg_sum = result[neg].sum()
    if neg_sum != 0:
        result[neg] *= -result[pos].sum() / neg_sum
    return result


# reference-private alias used by analysis code/tests
_make_circular_mask = circular
