"""Result-buffer declarations and containers.

TPU-native counterpart of the reference's ``libertem/common/buffers.py``
(BufferWrapper:326, AuxBufferWrapper:995, PlaceholderBufferWrapper:949,
valid_mask:554, masked_data:616).

Design difference vs the reference: the reference allocates numpy arrays
up front and hands out mutable *views* per partition/tile/frame; here the
actual accumulation state lives on the TPU as a pytree of ``jnp`` arrays
threaded functionally through a jit-compiled tile loop
(:mod:`libertem_tpu.udf.base`).  ``BufferWrapper`` is therefore two
things:

1. a *declaration* (kind / extra_shape / dtype / use) consumed by the
   runner to build the device state, and
2. after a run, a *container* for the final host-side result with the
   same access surface as the reference (``.data`` embeds roi-compressed
   results into the full nav shape, ``.raw_data``, ``.valid_mask``,
   ``.masked_data``).

Buffer kinds:
  * ``'nav'``    one entry per navigation position (scan pixel)
  * ``'sig'``    one entry per signal position (detector pixel)
  * ``'single'`` a single entry (plus ``extra_shape``)

``use``:
  * ``None``          regular input/output buffer
  * ``'private'``     worker-side only, not part of the final results
  * ``'result_only'`` produced only by ``UDF.get_results`` post-processing
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .math import prod
from .shape import Shape

KINDS = ("nav", "sig", "single")
USES = (None, "private", "result_only")


class BufferWrapper:
    def __init__(
        self,
        kind: str,
        extra_shape: Sequence[int] = (),
        dtype="float32",
        where: Optional[str] = None,
        use: Optional[str] = None,
    ):
        if kind not in KINDS:
            raise ValueError(f"unknown buffer kind {kind!r}")
        if use not in USES:
            raise ValueError(f"unknown buffer use {use!r}")
        self._kind = kind
        self._extra_shape = tuple(int(s) for s in extra_shape)
        self._dtype = np.dtype(dtype)
        self._where = where
        self._use = use
        # filled in by set_shape_ds:
        self._ds_shape: Optional[Shape] = None
        self._roi: Optional[np.ndarray] = None
        self._roi_count: Optional[int] = None
        # filled in after a run:
        self._data: Optional[np.ndarray] = None
        self._valid_nav_mask: Optional[np.ndarray] = None

    # -- declaration accessors ------------------------------------------
    @property
    def kind(self) -> str:
        return self._kind

    @property
    def extra_shape(self) -> tuple[int, ...]:
        return self._extra_shape

    @property
    def dtype(self) -> np.dtype:
        return self._dtype

    @property
    def where(self) -> Optional[str]:
        return self._where

    @property
    def use(self) -> Optional[str]:
        return self._use

    def replace_dtype(self, dtype) -> None:
        self._dtype = np.dtype(dtype)

    # -- shape binding ---------------------------------------------------
    def set_shape_ds(
        self, ds_shape: Shape, roi: Optional[np.ndarray] = None
    ) -> None:
        """Bind to a dataset shape (and roi) so ``.shape`` is known."""
        self._ds_shape = ds_shape
        if roi is not None:
            roi = np.asarray(roi).reshape(-1).astype(bool)
            self._roi_count = int(np.count_nonzero(roi))
        self._roi = roi

    @property
    def roi(self) -> Optional[np.ndarray]:
        return self._roi

    @property
    def shape(self) -> tuple[int, ...]:
        """The *storage* shape (roi-compressed flat nav for 'nav')."""
        if self._ds_shape is None:
            raise RuntimeError("buffer not bound to a dataset shape yet")
        if self._kind == "nav":
            n = (
                self._roi_count
                if self._roi is not None
                else self._ds_shape.nav.size
            )
            return (n,) + self._extra_shape
        elif self._kind == "sig":
            return tuple(self._ds_shape.sig) + self._extra_shape
        else:
            # reference semantics (common/buffers.py:462): a 'single'
            # buffer with no extra_shape is (1,), never 0-d — UDFs
            # index it as results.x[0]
            return self._extra_shape if self._extra_shape else (1,)

    @property
    def size(self) -> int:
        return prod(self.shape)

    # -- result access (after a run) --------------------------------------
    def set_result(
        self,
        data: np.ndarray,
        valid_nav_mask: Optional[np.ndarray] = None,
        custom_mask: Optional[np.ndarray] = None,
        full_data: Optional[np.ndarray] = None,
    ) -> None:
        """Install the final (host) result array.

        ``valid_nav_mask`` is the roi-compressed flat-nav damage mask
        (True where data has been merged).  ``custom_mask`` (from
        ``UDF.with_mask``, reference udf/base.py:1611) overrides the
        default validity computation for this buffer.  ``full_data``
        (nav buffers only) keeps a user-provided FULL-nav-shaped
        array verbatim for ``.data`` instead of nan-filling the roi
        gaps (get_results self-embedded results).
        """
        self._data = np.asarray(data)
        self._valid_nav_mask = valid_nav_mask
        self._custom_mask = custom_mask
        self._full_data = (
            None if full_data is None else np.asarray(full_data)
        )

    @property
    def raw_data(self) -> Optional[np.ndarray]:
        """The result in storage layout (roi-compressed flat nav)."""
        return self._data

    @property
    def data(self) -> Optional[np.ndarray]:
        """The result with full nav shape; roi gaps filled with nan/0."""
        if getattr(self, "_full_data", None) is not None:
            return self._full_data
        if self._data is None:
            return None
        if self._kind != "nav":
            return self._data
        nav_shape = tuple(self._ds_shape.nav)
        if self._roi is None:
            return self._data.reshape(nav_shape + self._extra_shape)
        # keep the stored dtype, not the declared one: get_results
        # may have derived a wider dtype (f64/complex), and the roi
        # path must not silently downcast what the no-roi path keeps
        out_dtype = np.result_type(self._data.dtype, self._dtype)
        full = np.full(
            (self._ds_shape.nav.size,) + self._extra_shape,
            self._fill_value(out_dtype),
            dtype=out_dtype,
        )
        full[self._roi] = self._data
        return full.reshape(nav_shape + self._extra_shape)

    def _fill_value(self, dtype=None):
        k = (self._dtype if dtype is None else dtype).kind
        if k == "f":
            return np.nan
        if k == "c":
            return complex(np.nan, np.nan)
        if k == "b":
            return False
        if k == "O":
            # roi gaps in object buffers are None (reference
            # common/buffers.py object fill; ValidationUDF relies
            # on it to distinguish never-processed frames)
            return None
        return 0

    @property
    def valid_mask(self) -> Optional[np.ndarray]:
        """Boolean mask over ``.data``: which entries hold merged results."""
        if self._data is None:
            return None
        custom = getattr(self, "_custom_mask", None)
        if custom is not None:
            return np.broadcast_to(
                np.asarray(custom, dtype=bool), self.data.shape
            )
        if self._kind == "nav":
            nav_shape = tuple(self._ds_shape.nav)
            full = np.zeros(self._ds_shape.nav.size, dtype=bool)
            vm = (
                self._valid_nav_mask
                if self._valid_nav_mask is not None
                else np.ones(self.shape[0], dtype=bool)
            )
            if self._roi is None:
                full[:] = vm
            else:
                full[self._roi] = vm
            full = full.reshape(nav_shape)
            return np.broadcast_to(
                full.reshape(nav_shape + (1,) * len(self._extra_shape)),
                nav_shape + self._extra_shape,
            )
        else:
            # sig/single buffers become valid once anything merged
            any_valid = (
                bool(self._valid_nav_mask.any())
                if self._valid_nav_mask is not None
                else True
            )
            return np.full(self.data.shape, any_valid, dtype=bool)

    @property
    def masked_data(self) -> Optional[np.ma.MaskedArray]:
        if self._data is None:
            return None
        return np.ma.MaskedArray(self.data, mask=~self.valid_mask)

    def __array__(self, dtype=None, copy=None):
        """BufferWrapper is array_like (reference common/buffers.py:
        338): ``np.allclose(x, buf)`` etc. see ``.data``."""
        arr = self.data
        if dtype is not None:
            arr = np.asarray(arr, dtype=dtype)
        return np.array(arr, copy=True) if copy else np.asarray(arr)

    @property
    def _valid_mask(self) -> Optional[np.ndarray]:
        """Raw-storage-shaped validity mask (the reference keeps this
        as a private attribute, common/buffers.py:562, and its tests
        index ``raw_data[buf._valid_mask]``)."""
        m = self.raw_masked_data
        return None if m is None else ~np.asarray(m.mask)

    @property
    def raw_masked_data(self) -> Optional[np.ma.MaskedArray]:
        """``raw_data`` masked to the valid entries — the
        roi-compressed flat mask, not the nav-expanded one
        (reference common/buffers.py:625)."""
        if self._data is None:
            return None
        custom = getattr(self, "_custom_mask", None)
        if custom is not None:
            full = np.broadcast_to(
                np.asarray(custom, dtype=bool), self.data.shape
            )
            if self._kind == "nav":
                flat = full.reshape(
                    (self._ds_shape.nav.size,) + self._extra_shape
                )
                mask = (
                    flat[self._roi] if self._roi is not None else flat
                )
            else:
                mask = full
        elif self._kind == "nav":
            vm = (
                self._valid_nav_mask
                if self._valid_nav_mask is not None
                else np.ones(self.shape[0], dtype=bool)
            )
            mask = np.broadcast_to(
                np.asarray(vm, dtype=bool).reshape(
                    (-1,) + (1,) * len(self._extra_shape)
                ),
                self._data.shape,
            )
        else:
            any_valid = (
                bool(self._valid_nav_mask.any())
                if self._valid_nav_mask is not None
                else True
            )
            mask = np.full(self._data.shape, any_valid, dtype=bool)
        return np.ma.MaskedArray(self._data, mask=~mask)

    def make_default_mask(
        self,
        valid_nav_mask: np.ndarray,
        dataset_shape: Shape,
        roi: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Default raw-storage-shaped validity mask for this buffer
        kind given the upstream flat-nav mask (reference
        common/buffers.py:524): nav broadcasts the nav mask over
        extra_shape; sig/single are all-valid."""
        valid_nav_mask = np.asarray(valid_nav_mask, dtype=bool)
        if self._kind == "nav":
            n = (
                int(np.count_nonzero(roi)) if roi is not None
                else dataset_shape.nav.size
            )
            mask = np.zeros(
                (n,) + self._extra_shape, dtype=bool
            )
            mask[:] = valid_nav_mask.reshape(
                valid_nav_mask.shape + (1,) * len(self._extra_shape)
            )
            return mask
        if self._kind == "sig":
            return np.ones(
                tuple(dataset_shape.sig) + self._extra_shape,
                dtype=bool,
            )
        return np.ones(self._extra_shape, dtype=bool)

    @property
    def valid_slice_bounding(self) -> tuple:
        """Smallest slice tuple bounding ALL valid elements of
        ``data`` — may still contain invalid holes; use
        :meth:`get_valid_slice_inner` for a hole-free cut
        (reference common/buffers.py:586)."""
        vm = self.valid_mask
        out = []
        for ax in range(vm.ndim):
            other = tuple(i for i in range(vm.ndim) if i != ax)
            nz = np.flatnonzero(vm.any(axis=other))
            if len(nz) == 0:
                out.append(slice(0, 0))
            else:
                out.append(slice(int(nz[0]), int(nz[-1]) + 1))
        return tuple(out)

    def get_valid_slice_inner(self, axis: int = 0) -> tuple:
        """First contiguous run along ``axis`` where EVERY element on
        the other axes is valid (reference common/buffers.py:597)."""
        vm = self.valid_mask
        other = tuple(i for i in range(vm.ndim) if i != axis)
        rows = vm.all(axis=other)
        nz = np.flatnonzero(rows)
        if len(nz) == 0:
            lo = hi = 0
        else:
            lo = int(nz[0])
            breaks = np.flatnonzero(np.diff(nz) != 1)
            hi = int(nz[breaks[0]] if len(breaks) else nz[-1]) + 1
        return tuple(
            slice(lo, hi) if d == axis else slice(None)
            for d in range(vm.ndim)
        )

    def __repr__(self) -> str:
        return (
            f"<BufferWrapper kind={self._kind} extra_shape="
            f"{self._extra_shape} dtype={self._dtype} use={self._use}>"
        )


class InvalidMaskError(Exception):
    """The mask is not compatible with the array (wrong shape or
    dtype) — reference common/buffers.py:187."""


def get_bbox_slice(arr: np.ndarray) -> tuple:
    """Smallest slice tuple bounding all truthy entries of ``arr``
    (reference common/buffers.py:315)."""
    arr = np.asarray(arr)
    out = []
    for ax in range(arr.ndim):
        other = tuple(i for i in range(arr.ndim) if i != ax)
        nz = np.flatnonzero(arr.any(axis=other))
        if len(nz) == 0:
            out.append(slice(0, 0))
        else:
            out.append(slice(int(nz[0]), int(nz[-1]) + 1))
    return tuple(out)


def get_bbox(arr: np.ndarray) -> tuple:
    """(min0, max0, min1, max1, ...) inclusive bounds of the truthy
    region (reference common/buffers.py:298)."""
    out = []
    for sl in get_bbox_slice(arr):
        out.extend((sl.start, max(sl.start, sl.stop - 1)))
    return tuple(out)


def get_inner_slice(arr: np.ndarray, axis: int = 0) -> tuple:
    """First contiguous run along ``axis`` where every element on the
    other axes is truthy (reference common/buffers.py:235)."""
    arr = np.asarray(arr)
    other = tuple(i for i in range(arr.ndim) if i != axis)
    rows = (arr != 0).all(axis=other)
    nz = np.flatnonzero(rows)
    if len(nz) == 0:
        lo = hi = 0
    else:
        lo = int(nz[0])
        breaks = np.flatnonzero(np.diff(nz) != 1)
        hi = int(nz[breaks[0]] if len(breaks) else nz[-1]) + 1
    return tuple(
        slice(lo, hi) if d == axis else slice(None)
        for d in range(arr.ndim)
    )


class ArrayWithMask:
    """A result array bundled with an explicit validity mask
    (reference: common/buffers.py:195) — returned from
    ``UDF.get_results`` via ``UDF.with_mask``."""

    def __init__(self, arr, mask):
        if isinstance(mask, bool):
            mask = np.array([mask])
        mask = np.asarray(mask)
        if mask.dtype != np.dtype(bool):
            raise InvalidMaskError(
                f"mask should have dtype=bool (have {mask.dtype})"
            )
        try:
            np.broadcast_to(mask, np.asarray(arr).shape)
        except ValueError:
            raise InvalidMaskError(
                "arr and mask must have compatible shapes "
                f"(arr.shape={np.asarray(arr).shape} vs "
                f"mask.shape={mask.shape})"
            ) from None
        self._init(arr, mask)

    def _init(self, arr, mask):
        self.arr = np.asarray(arr)
        self.mask = np.broadcast_to(
            np.asarray(mask, dtype=bool), self.arr.shape
        )

    def __array__(self, dtype=None):
        a = self.arr
        return a.astype(dtype) if dtype is not None else a


class AuxBufferWrapper(BufferWrapper):
    """Per-frame auxiliary *input* data, sliced alongside the nav axis.

    Counterpart of the reference's AuxBufferWrapper
    (common/buffers.py:995): declared via :meth:`UDF.aux_data`, the
    runner gathers the rows matching each tile's frames and exposes them
    on ``self.params.<name>`` inside process functions.
    """

    def __init__(self, kind, extra_shape=(), dtype="float32", data=None):
        super().__init__(kind, extra_shape, dtype)
        self._aux_data: Optional[np.ndarray] = None
        self._data_coords_global = True
        if data is not None:
            self.set_buffer(data)

    def set_buffer(self, data) -> None:
        data = np.ascontiguousarray(data, dtype=self._dtype)
        flat = data.reshape((-1,) + self._extra_shape)
        self._aux_data = flat
        # reference semantics (common/buffers.py:1010): a freshly-set
        # buffer holds the FULL dataset's rows in global coordinates;
        # new_for_partition() derives partition-local views
        self._data = flat
        self._data_coords_global = True

    @property
    def aux_data(self) -> Optional[np.ndarray]:
        return self._aux_data

    @property
    def raw_data(self) -> Optional[np.ndarray]:
        """The aux input in storage layout (flat nav + extra_shape),
        roi-compressed when bound with a roi — reference aux buffers
        answer .raw_data/.data like result buffers do."""
        if self._aux_data is None:
            return None
        if getattr(self, "_roi", None) is not None:
            return self._aux_data[self._roi]
        return self._aux_data

    @property
    def data(self) -> Optional[np.ndarray]:
        if self._aux_data is None:
            return None
        if self._ds_shape is None:
            return self._aux_data
        # delegate to the result-accessor logic (nav-shaped, roi
        # gaps filled) by viewing the aux array as the stored data
        prev = self._data
        self._data = self.raw_data
        try:
            return super().data
        finally:
            self._data = prev

    def new_for_partition(self, partition, roi=None):
        """Partition-local view of the aux rows: sliced to the
        partition's nav window, roi-compressed (reference
        common/buffers.py:1022)."""
        new = AuxBufferWrapper(
            self._kind, self._extra_shape, self._dtype
        )
        ps = partition.slice.get(nav_only=True)
        data = self._aux_data[ps]
        if roi is not None:
            data = data[np.asarray(roi).reshape(-1)[ps]]
        new._aux_data = new._data = data
        new._data_coords_global = False
        return new


class PlaceholderBufferWrapper(BufferWrapper):
    """A buffer that only exists as a `get_results` output
    (``use='result_only'``); no device state is allocated for it."""

    def __init__(self, kind, extra_shape=(), dtype="float32"):
        super().__init__(kind, extra_shape, dtype, use="result_only")

    def __array__(self, *a, **kw):
        if self._data is None:
            raise ValueError(
                "this BufferWrapper has no array associated with it "
                "(use='result_only' placeholders are filled by "
                "get_results)"
            )
        return np.asarray(self._data)


def reshaped_view(a: np.ndarray, shape) -> np.ndarray:
    """A reshaped VIEW of ``a`` — raises AttributeError when a copy
    would be required (reference common/buffers.py:53), unlike
    ``np.reshape`` which silently copies."""
    v = a.view()
    v.shape = shape
    return v


# ---- aligned allocation utilities --------------------------------
# Page-aligned host buffers for O_DIRECT reads and copy-free
# handoffs (reference common/buffers.py:39-225).  The engine's own
# read path allocates through RangeReader; these are the public
# utility surface user IO code builds on.


def _alloc_aligned(size: int, blocksize: int = 4096):
    import mmap as _mmap

    blocks = -(-max(1, int(size)) // blocksize)
    return _mmap.mmap(-1, blocksize * blocks)


def bytes_aligned(size: int) -> memoryview:
    """A page-aligned writable buffer of exactly ``size`` bytes."""
    return memoryview(_alloc_aligned(size))[:size]


def empty_aligned(size, dtype) -> np.ndarray:
    """Like ``np.empty`` but page-aligned (for O_DIRECT)."""
    dtype = np.dtype(dtype)
    n = prod(size)
    buf = _alloc_aligned(dtype.itemsize * n)
    return np.frombuffer(buf, dtype=dtype)[:n].reshape(size)


def zeros_aligned(size, dtype) -> np.ndarray:
    """Like ``np.zeros`` but page-aligned (for O_DIRECT)."""
    if np.dtype(dtype) == object or prod(size) == 0:
        return np.zeros(size, dtype=dtype)
    res = empty_aligned(size, dtype)
    res[:] = 0
    return res


def to_numpy(a) -> np.ndarray:
    """Return ``a`` as a host ndarray.  numpy passes through; device
    arrays (jax) fetch D2H; anything else is a TypeError (the
    reference converts cupy here — no CUDA on this target)."""
    if isinstance(a, np.ndarray):
        return a
    if hasattr(a, "__array__") and type(a).__module__.split(".")[0] in (
        "jax", "jaxlib"
    ):
        return np.asarray(a)
    raise TypeError(f"I don't know how to convert {type(a)} here.")


def disjoint(sl, slices) -> bool:
    """True when ``sl`` intersects none of ``slices`` (reference
    common/buffers.py:122)."""
    return all(
        sl.intersection_with(s2).is_null() for s2 in slices
    )


def get_bbox_2d(arr, eps: float = 1e-8) -> tuple:
    """(ymin, ymax, xmin, xmax) bounding box of entries with
    ``|value| >= eps`` — vectorized, where the reference loops per
    pixel (common/buffers.py:272)."""
    arr = np.asarray(arr)
    ys, xs = np.nonzero(np.abs(arr) >= eps)
    if ys.size == 0:
        # same out-of-range sentinel layout as the reference's
        # never-updated loop variables
        return arr.shape[0], 0, arr.shape[1], 0
    return (
        int(ys.min()), int(ys.max()), int(xs.min()), int(xs.max())
    )


class BufferPool:
    """Free-list pool for re-using aligned allocations, keyed by
    (size, alignment) (reference common/buffers.py:126)."""

    def __init__(self):
        import collections

        self._buffers = collections.defaultdict(list)

    def checkout_bytes(self, size, alignment):
        free = self._buffers[(size, alignment)]
        return free.pop() if free else _alloc_aligned(size, alignment)

    def checkin_bytes(self, size, alignment, buf):
        self._buffers[(size, alignment)].append(buf)

    from contextlib import contextmanager as _cm

    @_cm
    def bytes(self, size, alignment=4096):
        buf = self.checkout_bytes(size, alignment)
        try:
            yield buf
        finally:
            self.checkin_bytes(size, alignment, buf)

    @_cm
    def empty(self, size, dtype, alignment=4096):
        dtype = np.dtype(dtype)
        n = prod(size)
        with self.bytes(dtype.itemsize * n, alignment) as buf:
            yield np.frombuffer(buf, dtype=dtype)[:n].reshape(size)

    @_cm
    def zeros(self, size, dtype, alignment=4096):
        if np.dtype(dtype) == object or prod(size) == 0:
            yield np.zeros(size, dtype=dtype)
            return
        with self.empty(size, dtype, alignment) as res:
            res[:] = 0
            yield res

    del _cm


class ManagedBuffer:
    """``size`` bytes checked out of ``pool``, returned on GC
    (reference common/buffers.py:170)."""

    def __init__(self, pool, size, alignment):
        self.pool = pool
        self.buf = pool.checkout_bytes(size, alignment)
        self.size = size
        self.alignment = alignment

    def __del__(self):
        self.pool.checkin_bytes(self.size, self.alignment, self.buf)


class PreallocBufferWrapper(BufferWrapper):
    """A BufferWrapper carrying externally-allocated backing data
    (reference common/buffers.py:989)."""

    def __init__(self, data, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._data = data


