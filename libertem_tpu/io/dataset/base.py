"""DataSet / Partition base machinery.

TPU-native counterpart of the reference's ``libertem/io/dataset/base/``
(dataset.py:31 DataSet, partition.py:31/191 Partition/BasePartition,
meta.py:14 DataSetMeta).

Design: a dataset is split along the flattened navigation axis into
contiguous-frame :class:`Partition` s (the unit of scheduling, live
partial results, and multi-chip sharding).  Each partition streams its
frames as fixed-shape :class:`Block` s — ``(depth, *sig)`` host numpy
arrays in the raw on-disk dtype, zero-padded at the tail — which the UDF
runner device-puts and feeds to a jit-compiled tile step.  dtype
conversion and corrections happen **on device** (cheaper PCIe traffic
for narrow integer detector data than the reference's host-side numba
decode, backend_mmap.py:23).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np

from ...common.math import prod
from ...common.shape import Shape
from ...common.slice import Slice
from ..tiling import Negotiator, TilingScheme  # noqa: F401  (re-export: reference io/dataset/base surface)

MAX_PARTITION_SIZE = 512 * 1024 * 1024  # bytes, like reference dataset.py:33


class DataSetException(Exception):
    pass


@dataclass
class DataSetMeta:
    shape: Shape
    raw_dtype: np.dtype
    sync_offset: int = 0
    # frames actually present in the data; None (the default) means
    # "all of nav".  A genuine 0 (header-only file from an
    # in-progress acquisition) is preserved so missing frames
    # zero-fill instead of short-read-erroring.
    image_count: Optional[int] = None

    @property
    def native_dtype(self) -> np.dtype:
        """``raw_dtype`` in native byte order — what frames actually
        carry after the read boundary's byteswap (jax rejects
        non-native dtypes)."""
        return np.dtype(self.raw_dtype.newbyteorder("="))

    def __post_init__(self):
        self.raw_dtype = np.dtype(self.raw_dtype)
        if self.image_count is None:
            self.image_count = self.shape.nav.size
        # reference parity (io/dataset/base/dataset.py:74): an offset
        # at or past the frame count would select nothing but zeros —
        # a configuration error, not a valid sync.  image_count == 0
        # (header-only in-progress acquisition) stays permissive.
        if self.image_count and not (
            -self.image_count < self.sync_offset < self.image_count
        ):
            raise DataSetException(
                f"sync_offset should be in ({-self.image_count}, "
                f"{self.image_count}), which is "
                "(-image_count, image_count)"
            )


def resolve_sig_override(sig_shape, native) -> tuple:
    """Reference ``sig_shape`` semantics: ``None`` keeps the file's
    native frame shape; any other factorization of the SAME pixel
    count re-interprets the frame row-major (free view — the readers
    stay native, Partition._to_sig reshapes); a product mismatch is
    the reference's exact error (e.g. reference blo.py:174
    'sig_shape must be of size: N')."""
    native = tuple(int(s) for s in native)
    if sig_shape is None:
        return native
    sig = tuple(int(s) for s in sig_shape)
    if sig == native:
        return native
    if int(np.prod(sig)) != int(np.prod(native)):
        raise DataSetException(
            f"sig_shape must be of size: {int(np.prod(native))}"
        )
    return sig


def _roi_to_nd_indices(roi, part_slice):
    """ND nav coordinates of roi-selected frames within a
    partition's nav range, in flat-nav order (reference
    io/dataset/base/__init__ _roi_to_nd_indices)."""
    roi = np.asarray(roi)
    nav_dims = roi.ndim
    nav_origin = tuple(part_slice.origin[:nav_dims])
    nav_shape = tuple(part_slice.shape[:nav_dims])
    sel = np.argwhere(roi)
    for coord in sel:
        if all(
            o <= c < o + n
            for c, o, n in zip(coord, nav_origin, nav_shape)
        ):
            yield tuple(int(c) for c in coord)


class DataTile:
    """Slice-tagged tile carrier (reference io/dataset/base/tiling.py
    :274).  The engine itself streams :class:`Block` s; DataTile is the
    public API type handed to MaskContainer.get() and compat callers
    that address data by a :class:`Slice`."""

    def __init__(self, data, tile_slice: Slice, scheme_idx: int):
        if isinstance(data, DataTile):
            data = data.data
        flat2d = (
            tile_slice.shape.nav.size, tile_slice.shape.sig.size,
        )
        # 2D array formats (scipy.sparse) carry sig FLATTENED — the
        # reference's D2 backend contract (sparseconverter
        # D2_BACKENDS); the slice keeps the logical nD shape
        if tuple(data.shape) != tuple(tile_slice.shape) and \
                tuple(data.shape) != flat2d:
            raise ValueError(
                f"shape mismatch: data {tuple(data.shape)} vs "
                f"tile_slice {tuple(tile_slice.shape)}"
            )
        self._data = data
        self.tile_slice = tile_slice
        self.scheme_idx = scheme_idx

    @property
    def data(self):
        return self._data

    @property
    def flat_data(self) -> np.ndarray:
        """(n_frames, n_sig_pixels) view of the tile."""
        shape = self.tile_slice.shape
        return self._data.reshape(
            (shape.nav.size, shape.sig.size)
        )

    @property
    def dtype(self):
        return self._data.dtype

    @property
    def shape(self):
        return tuple(self.tile_slice.shape)

    @property
    def size(self):
        return self.tile_slice.shape.size

    def __repr__(self):
        return f"<DataTile {self.tile_slice!r} scheme_idx={self.scheme_idx}>"


@dataclass
class Block:
    """One fixed-shape chunk of frames headed for the device.

    data:          (depth, *sig) raw-dtype numpy array, zero-padded
                   (densified lazily when the block is sparse)
    sparse:        optional (vals, rows i32, cols i32) CSR-COO triple,
                   zero-padded to a static nnz budget — shipped to the
                   device instead of the dense block so H2D volume
                   scales with nnz (reference raw_csr.py:349 yields
                   sparse tiles for the same reason)
    local_offset:  first-frame position within the partition's
                   (roi-compressed) local frame ordering
    global_offset: first-frame position within the dataset's
                   (roi-compressed) flat nav ordering
    coords:        (depth, nav_dims) int32 original nav coordinates
    valid:         number of non-padding frames (<= depth)
    """

    local_offset: int
    global_offset: int
    coords: np.ndarray
    valid: int
    sparse: Optional[tuple] = None
    block_shape: Optional[tuple] = None
    _data: Optional[np.ndarray] = None

    @property
    def data(self) -> np.ndarray:
        if self._data is None:
            vals, rows, cols = self.sparse
            depth = self.block_shape[0]
            sig = tuple(self.block_shape[1:])
            n_pix = int(np.prod(sig))
            out = np.zeros((depth, n_pix), dtype=vals.dtype)
            np.add.at(out, (rows, cols), vals)
            self._data = out.reshape((depth,) + sig)
        return self._data


class Partition:
    """A contiguous flat-nav frame range of a dataset."""

    def __init__(
        self,
        meta: DataSetMeta,
        start_frame: int,
        num_frames: int,
        idx: int = 0,
        io_backend: "IOBackend" = None,
    ):
        self.meta = meta
        self.start_frame = int(start_frame)
        self.num_frames = int(num_frames)
        self.idx = int(idx)
        # the dataset's chosen read strategy; formats creating their
        # RangeReaders lazily pass this through
        self.io_backend = io_backend

    @property
    def slice(self) -> Slice:
        """Flat-nav slice of the dataset this partition covers."""
        sig = tuple(self.meta.shape.sig)
        return Slice(
            (self.start_frame,) + (0,) * len(sig),
            Shape(
                (self.num_frames,) + sig,
                sig_dims=self.meta.shape.sig.dims,
            ),
        )

    @property
    def shape(self) -> Shape:
        """(n_frames, *sig) — the partition's flat-nav shape
        (reference io/dataset/base/partition.py)."""
        return self.slice.shape

    @property
    def _start_frame(self) -> int:
        """DATA-space index of the partition's first frame: dataset
        index + sync_offset (reference partition.py keeps partitions
        in data space; here ``start_frame`` is ds-space and the
        offset applies at read time, read_dataset_frames below —
        tests/io/datasets/test_mem.py asserts this mapping)."""
        return self.start_frame + self.meta.sync_offset

    @property
    def _num_frames(self) -> int:
        """Reference-internal alias (BasePartition._num_frames)."""
        return self.num_frames

    @classmethod
    def make_slices(cls, shape, num_partitions, sync_offset=0):
        """Balanced flat-nav partition slices + DATA-space start/stop
        frames (reference partition.py:67 — same contract incl. the
        empty-partition clamp warning)."""
        import warnings
        num_frames = shape.nav.size
        if num_partitions > num_frames:
            warnings.warn(
                "dataset contains fewer frames than specified "
                f"partitions, setting num_partitions == num_frames "
                f"== {num_frames} to avoid creating empty partitions",
                RuntimeWarning,
            )
            num_partitions = num_frames
        bounds = np.linspace(
            0, num_frames, num=max(2, num_partitions + 1),
            endpoint=True, dtype=int,
        )
        for start, stop in zip(bounds[:-1], bounds[1:]):
            start, stop = int(start), int(stop)
            yield (
                Slice(
                    (start,) + (0,) * shape.sig.dims,
                    Shape(
                        (stop - start,) + tuple(shape.sig),
                        sig_dims=shape.sig.dims,
                    ),
                ),
                start + sync_offset,
                stop + sync_offset,
            )

    def get_macrotile(self, dest_dtype=None, roi=None):
        """The whole partition as ONE flat-nav tile (reference
        partition.py:156 get_macrotile) — the simple consumer API for
        code that wants partition granularity without negotiating a
        tiling scheme."""
        if roi is not None:
            data = self._read_selected_with_offset(
                self.local_frame_ids(roi)
            )
            origin = self.roi_offset(roi)
        else:
            data = self.read_dataset_frames(
                self.start_frame, self.start_frame + self.num_frames
            )
            origin = self.start_frame
        if dest_dtype is not None:
            data = data.astype(dest_dtype, copy=False)
        sig_dims = self.meta.shape.sig.dims
        tile_slice = Slice(
            (origin,) + (0,) * sig_dims,
            Shape(data.shape, sig_dims=sig_dims),
        )
        return DataTile(data, tile_slice=tile_slice, scheme_idx=0)

    def get_ident(self) -> str:
        """Stable identity for progress/comm messages (reference
        partition.py:181)."""
        return f"part-{self.idx}"

    def __repr__(self):
        return (
            f"<{type(self).__name__} #{self.idx} "
            f"[{self.start_frame}:{self.start_frame + self.num_frames})>"
        )

    # -- reading -----------------------------------------------------------

    def _read_raw_frames(self, start: int, stop: int) -> np.ndarray:
        """Read *data-space* frames [start, stop) as (n, *sig) raw dtype.

        Implemented by subclasses; indices are guaranteed within
        [0, image_count).
        """
        raise NotImplementedError()

    def _to_sig(self, arr: np.ndarray) -> np.ndarray:
        """Frames leave ``_read_raw_frames`` in the file's NATIVE sig
        shape; a user ``sig_shape`` override re-factorizes the same
        pixels (row-major, product-checked by the loader — a free
        view, reference semantics e.g. blo.py:174 'sig_shape must be
        of size').  Non-native byte order (e.g. a big-endian raw
        file) is swapped to native here — the device feed and jax
        require native buffers (the reference's Decoder byteswap
        case, io/dataset/base/decode.py:8; C++ kernel
        native/decode.cpp byteswap16/32)."""
        from ...native import byteswap
        arr = byteswap(arr)
        sig = tuple(self.meta.shape.sig)
        if arr.shape[1:] != sig:
            arr = arr.reshape((arr.shape[0],) + sig)
        return arr

    def read_dataset_frames(self, start: int, stop: int) -> np.ndarray:
        """Read *dataset-space* frames [start, stop), honoring
        sync_offset (reference: dataset.py:70): data index = ds index +
        sync_offset; out-of-range frames are zero-filled.
        """
        n = stop - start
        sig = tuple(self.meta.shape.sig)
        so = self.meta.sync_offset
        d0, d1 = start + so, stop + so
        c0 = max(0, min(self.meta.image_count, d0))
        c1 = max(0, min(self.meta.image_count, d1))
        if c0 == d0 and c1 == d1:
            return self._to_sig(self._read_raw_frames(d0, d1))
        out = np.zeros((n,) + sig, dtype=self.meta.native_dtype)
        if c1 > c0:
            out[c0 - d0:c1 - d0] = self._to_sig(
                self._read_raw_frames(c0, c1)
            )
        return out

    def read_selected_frames(self, ids: np.ndarray) -> np.ndarray:
        """Sparse-roi reader: read the *data-space* frame ids (sorted,
        in-range) as ``(len(ids), *sig)``.

        Default implementation groups ids into contiguous runs and
        reads each run via :meth:`_read_raw_frames`, so every format
        gets a sparse-roi fast path that touches only the selected
        frames (the reference builds the same thing per-format, e.g.
        H5Partition's roi path, hdf5.py:875).  Formats with a cheaper
        native selected-read (e.g. h5py fancy indexing) override this.
        """
        ids = np.asarray(ids, dtype=np.int64)
        sig = tuple(self.meta.shape.sig)
        out = np.empty((len(ids),) + sig, dtype=self.meta.native_dtype)
        if not len(ids):
            return out
        breaks = np.flatnonzero(np.diff(ids) != 1) + 1
        starts = np.concatenate(([0], breaks))
        stops = np.concatenate((breaks, [len(ids)]))
        for a, b in zip(starts, stops):
            out[a:b] = self._to_sig(self._read_raw_frames(
                int(ids[a]), int(ids[b - 1]) + 1
            ))
        return out

    def _read_selected_with_offset(self, ids: np.ndarray) -> np.ndarray:
        """Apply sync_offset + out-of-range zero-fill around a
        partition's ``read_selected_frames(stored_ids)`` fast path —
        the same mapping read_dataset_frames performs for spans."""
        sig = tuple(self.meta.shape.sig)
        so = self.meta.sync_offset
        stored = np.asarray(ids, dtype=np.int64) + so
        ok = (stored >= 0) & (stored < self.meta.image_count)
        if ok.all():
            return self.read_selected_frames(stored)
        out = np.zeros((len(ids),) + sig, dtype=self.meta.native_dtype)
        if ok.any():
            out[ok] = self.read_selected_frames(stored[ok])
        return out

    def local_frame_ids(self, roi: Optional[np.ndarray]) -> np.ndarray:
        """Dataset-space flat-nav ids of the frames this partition
        contributes (roi-filtered), in order."""
        if roi is None:
            return np.arange(
                self.start_frame,
                self.start_frame + self.num_frames,
                dtype=np.int64,
            )
        roi = np.asarray(roi).reshape(-1)
        sel = np.flatnonzero(
            roi[self.start_frame:self.start_frame + self.num_frames]
        )
        return (sel + self.start_frame).astype(np.int64)

    def roi_offset(self, roi: Optional[np.ndarray]) -> int:
        """Position of this partition's first selected frame in the
        roi-compressed global ordering."""
        if roi is None:
            return self.start_frame
        roi = np.asarray(roi).reshape(-1)
        return int(np.count_nonzero(roi[:self.start_frame]))

    def gen_blocks(
        self,
        scheme: TilingScheme,
        roi: Optional[np.ndarray] = None,
    ) -> Iterator[Block]:
        """Stream this partition as zero-padded fixed-shape blocks."""
        ids = self.local_frame_ids(roi)
        n = len(ids)
        if n == 0:
            return
        depth = scheme.depth
        goff = self.roi_offset(roi)
        nav_shape = tuple(self.meta.shape.nav)
        sig = tuple(self.meta.shape.sig)
        contiguous = roi is None
        for off in range(0, n, depth):
            chunk = ids[off:off + depth]
            valid = len(chunk)
            if contiguous:
                data = self.read_dataset_frames(
                    int(chunk[0]), int(chunk[-1]) + 1
                )
            else:
                lo, hi = int(chunk[0]), int(chunk[-1]) + 1
                # NOTE: keep this policy in sync with the sharded
                # loop's read_device_chunk (udf/base.py), which applies
                # the same selective-vs-covering-span heuristic
                # sparse roi fast path: when the selected frames cover
                # less than half the span, read them individually if
                # the partition supports it (reference: H5Partition's
                # roi fast path, hdf5.py:875)
                if valid * 2 < hi - lo:
                    data = self._read_selected_with_offset(chunk)
                else:
                    cover = self.read_dataset_frames(lo, hi)
                    data = cover[chunk - lo]
            if valid < depth:
                pad = np.zeros(
                    (depth - valid,) + sig, dtype=data.dtype
                )
                data = np.concatenate([data, pad], axis=0)
            elif not data.flags.c_contiguous:
                data = np.ascontiguousarray(data)
            coords = np.zeros((depth, len(nav_shape)), dtype=np.int32)
            if len(nav_shape):
                unr = np.unravel_index(chunk, nav_shape)
                for d, u in enumerate(unr):
                    coords[:valid, d] = u
            yield Block(
                _data=data,
                local_offset=off,
                global_offset=goff + off,
                coords=coords,
                valid=valid,
            )

    def frames_in_roi(self, roi: Optional[np.ndarray]) -> int:
        if roi is None:
            return self.num_frames
        return len(self.local_frame_ids(roi))

    def _get_read_ranges(self, tiling_scheme, roi=None):
        """Compat plan view of the read layout: ds-space
        (start, stop) frame spans of the depth-blocks the engine
        will read (the reference's read ranges are byte-level
        file/tile tables, io/dataset/base/tiling.py — this engine
        plans whole-frame spans in gen_blocks instead)."""
        ids = self.local_frame_ids(roi)
        depth = max(1, min(int(tiling_scheme.depth),
                           self.num_frames))
        return [
            (int(ids[i]), int(ids[min(i + depth, len(ids)) - 1]) + 1)
            for i in range(0, len(ids), depth)
        ]

    def get_tiles(
        self,
        tiling_scheme: TilingScheme,
        roi: Optional[np.ndarray] = None,
        dest_dtype=None,
        array_backend=None,
    ) -> Iterator[DataTile]:
        """Public tile stream (reference Partition.get_tiles,
        io/dataset/base/partition.py): depth-chunks of (roi-selected)
        frames split into the scheme's sig slices, yielded as
        :class:`DataTile` s whose ``tile_slice`` origins are
        flat-nav (roi-COMPRESSED when a roi is given, reference
        semantics).  The engine itself consumes :meth:`gen_blocks`;
        this adapter serves compat consumers that want slice-tagged
        tiles."""
        sig_dims = self.meta.shape.sig.dims
        # ds-index range backed by actual file data under
        # sync_offset: i + so in [0, image_count).  The reference's
        # read-range tiles cover ONLY stored frames (inserted blanks
        # are absent from the tile stream — reference
        # test_npy.py test_negative_sync_offset asserts the first
        # tile origin); the ENGINE's gen_blocks path zero-fills
        # instead (damage handles validity there).
        so = self.meta.sync_offset
        ic = self.meta.image_count
        v0, v1 = -so, (ic or 0) - so
        # clip applies under a sync offset OR when nav claims more
        # frames than the file holds (test_raw.py test_missing_frames)
        # — but NOT for in-progress acquisitions (image_count == 0,
        # permissive by contract, DataSetMeta above)
        clip = bool(ic) and (
            so != 0 or ic < self.meta.shape.nav.size
        )
        for block in self.gen_blocks(tiling_scheme, roi=roi):
            data = block.data[:block.valid]
            goff = block.global_offset
            if roi is None and clip:
                lo = max(goff, v0)
                hi = min(goff + len(data), v1)
                if hi <= lo:
                    continue
                data = data[lo - goff:hi - goff]
                goff = lo
            if dest_dtype is not None:
                data = data.astype(dest_dtype, copy=False)
            for idx, sig_slice in tiling_scheme.slices:
                sub = data[(slice(None),) + sig_slice.get()]
                if len(tiling_scheme) > 1:
                    # reference tiles are assembled contiguous
                    # (consumers rely on reshaped_view working)
                    sub = np.ascontiguousarray(sub)
                if array_backend is not None and \
                        array_backend != "numpy":
                    from ...common.sparse import to_backend
                    sub = to_backend(sub, array_backend)
                tile_slice = Slice(
                    (goff,) + tuple(sig_slice.origin),
                    Shape(
                        (len(data),) + tuple(sig_slice.shape),
                        sig_dims=sig_dims,
                    ),
                )
                yield DataTile(sub, tile_slice=tile_slice,
                               scheme_idx=idx)


class RoiHelper:
    """``ds.roi[...]`` — index nav space to build a boolean roi
    (reference dataset.py:21)."""

    def __init__(self, ds):
        self._ds = ds

    def __getitem__(self, k) -> np.ndarray:
        roi = np.zeros(tuple(self._ds.shape.nav), dtype=bool)
        roi[k] = True
        return roi


class DataSet:
    """Base class for all dataset formats.

    Subclasses implement :meth:`initialize` (fill ``self._meta``) and a
    Partition subclass with ``_read_raw_frames``.
    """

    # registry hook (io/dataset/__init__.py:15 in the reference)
    _format_id: Optional[str] = None

    # default partition size cap in bytes (reference dataset.py:33)
    MAX_PARTITION_SIZE = MAX_PARTITION_SIZE

    # whether reads at arbitrary offsets may run concurrently from
    # several threads (the sharded loop's per-device reader pool).
    # Stream-ordered sources (LiveDataSet's bounded ring) set this
    # False and are refused by the sharded executor.
    supports_concurrent_reads: bool = True

    def __init__(self, io_backend=None, num_partitions: Optional[int] = None):
        self._meta: Optional[DataSetMeta] = None
        self._cores = 1
        self._num_partitions = num_partitions
        self._io_backend = io_backend

    def initialize(self, executor=None) -> "DataSet":
        raise NotImplementedError()

    def get_task_comm_handler(self):
        """Streaming comm handler for this dataset (reference
        io/dataset/base/dataset.py get_task_comm_handler): file-backed
        datasets stream nothing — live/acquisition datasets override
        this to push data and receive fine-grained progress."""
        from ...executor.base import NoopCommHandler
        return NoopCommHandler()

    def set_num_cores(self, cores: int) -> None:
        self._cores = max(1, int(cores))

    @property
    def meta(self) -> DataSetMeta:
        assert self._meta is not None, "dataset not initialized"
        return self._meta

    @property
    def shape(self) -> Shape:
        return self.meta.shape

    @property
    def dtype(self) -> np.dtype:
        return self.meta.raw_dtype

    @property
    def raw_dtype(self) -> np.dtype:
        return self.meta.raw_dtype

    def check_valid(self) -> bool:
        return True

    @property
    def diagnostics(self):
        """Format diagnostics + the rows common to every DataSet
        (reference base/dataset.py:177 — partition layout and
        sync-offset alignment)."""
        try:
            p = next(self.get_partitions())
            p_shape = str(p.shape)
            n_part = str(self.get_num_partitions())
        except Exception:
            p_shape, n_part = "n/a", "n/a"
        so_info = self.get_sync_offset_info()
        return self.get_diagnostics() + [
            {"name": "Partition shape", "value": p_shape},
            {"name": "Number of partitions", "value": n_part},
            {"name": "Number of frames skipped at the beginning",
             "value": so_info["frames_skipped_start"]},
            {"name": "Number of frames ignored at the end",
             "value": so_info["frames_ignored_end"]},
            {"name":
             "Number of blank frames inserted at the beginning",
             "value": so_info["frames_inserted_start"]},
            {"name": "Number of blank frames inserted at the end",
             "value": so_info["frames_inserted_end"]},
        ]

    def get_diagnostics(self) -> list:
        """Format-specific diagnostics for display, as a list of
        ``{"name": ..., "value": ...}`` dicts (reference
        dataset.py:198; surfaced by the web dataset-info panel)."""
        return []

    def get_sync_offset_info(self) -> dict:
        """Frames skipped/ignored by the configured ``sync_offset``
        (reference dataset.py:70).  Bounds are validated at load time
        by the loaders; this reports the resulting alignment."""
        so = self.meta.sync_offset
        image_count = self.meta.image_count or 0
        nav_product = self.meta.shape.nav.size
        return {
            "frames_skipped_start": max(0, so),
            "frames_ignored_end": max(
                0, image_count - nav_product - so
            ),
            "frames_inserted_start": max(0, -so),
            "frames_inserted_end": max(
                0, nav_product - image_count + so
            ),
        }

    def supports_correction(self) -> bool:
        """Whether corrections can be applied to this dataset
        (reference dataset.py:292; consulted by the web open flow).
        True for every format here — including raw CSR, where the
        reference refuses (raw_csr.py:263): sparse blocks densify
        on-device BEFORE the fused correction step, so dark/gain/
        excluded-pixel repair are well-defined."""
        return True

    @property
    def roi(self) -> "RoiHelper":
        """Build boolean rois by indexing into nav space:
        ``ds.roi[0:10]`` (reference dataset.py:21 RoiHelper)."""
        return RoiHelper(self)

    def get_num_partitions(self) -> int:
        """Default partitioning: at least one per core, each at most
        MAX_PARTITION_SIZE bytes (reference dataset.py:90)."""
        if self._num_partitions is not None:
            return max(1, self._num_partitions)
        total_bytes = self.meta.shape.size * self.meta.raw_dtype.itemsize
        by_size = max(1, int(np.ceil(total_bytes / MAX_PARTITION_SIZE)))
        n = max(self._cores, by_size)
        return min(n, max(1, self.meta.shape.nav.size))

    def get_partition_ranges(self) -> list[tuple[int, int]]:
        n_frames = self.meta.shape.nav.size
        n_part = self.get_num_partitions()
        if n_part > n_frames:
            # reference contract (partition.py:74): warn, then clamp
            # so no empty partitions exist
            import warnings
            warnings.warn(
                "dataset contains fewer frames than specified "
                f"partitions, setting num_partitions == num_frames "
                f"== {n_frames} to avoid creating empty partitions",
                RuntimeWarning,
            )
        n_part = min(n_part, n_frames)
        bounds = np.linspace(0, n_frames, n_part + 1).astype(np.int64)
        return [
            (int(bounds[i]), int(bounds[i + 1]))
            for i in range(n_part)
            if bounds[i + 1] > bounds[i]
        ]

    def get_partitions(self) -> Iterator[Partition]:
        raise NotImplementedError()

    def get_slices(self) -> list[Slice]:
        return [p.slice for p in self.get_partitions()]

    def get_correction_data(self):
        """Dataset-intrinsic corrections (dark/gain from sidecar files)."""
        from ..corrections import CorrectionSet
        return CorrectionSet()

    def get_max_io_size(self) -> Optional[int]:
        return None

    def adjust_tileshape(self, tileshape, roi):
        return tileshape

    @classmethod
    def detect_params(cls, path: str, executor=None):
        return False

    @classmethod
    def get_msg_converter(cls):
        """The GUI parameter schema class for this format
        (reference: per-format MessageConverter)."""
        from .converters import CLASS_CONVERTERS
        return CLASS_CONVERTERS.get(cls.__name__)

    @classmethod
    def get_supported_io_backends(cls) -> list:
        """IO backend ids usable with this format (reference
        DataSet.get_supported_io_backends) — file-backed formats go
        through the RangeReader, which supports all registered
        backends; in-memory formats return []."""
        return list(IOBackend.registry.keys())

    @classmethod
    def get_default_io_backend(cls) -> str:
        """Default IO backend id (reference returns the backend
        class; the web config wants its ``id_``)."""
        return MMapBackend.id_

    @classmethod
    def get_supported_extensions(cls) -> set:
        return set()

    def __repr__(self):
        if self._meta is None:
            return f"<{type(self).__name__} (uninitialized)>"
        return f"<{type(self).__name__} shape={self.shape}>"


# -- io backends ---------------------------------------------------------
#
# Pluggable read strategies (reference: io/dataset/base/backend.py:12
# IOBackend registry, backend_mmap.py:68, backend_buffered.py:208,
# backend_direct.py:7).  Formats read through :class:`RangeReader`,
# which dispatches on the chosen backend: buffered explicit preadv
# (default — see RangeReader for measurements), mmap (page-cache
# views, opt-in), or O_DIRECT aligned preadv (bypass the page cache
# entirely).

class IOBackend:
    registry: dict = {}
    id_: str = "base"

    def __init_subclass__(cls, id_=None, **kw):
        super().__init_subclass__(**kw)
        if id_ is not None:
            cls.id_ = id_
            IOBackend.registry[id_] = cls

    @classmethod
    def from_json(cls, data: dict) -> "IOBackend":
        kind = data.get("id", "buffered")
        kwargs = {k: v for k, v in data.items() if k != "id"}
        return cls.registry[kind](**kwargs)

    @classmethod
    def get_supported(cls) -> list:
        """Registered backend ids, in registration order (reference
        backend.py get_supported; 'direct' is Linux-only there —
        this framework targets Linux hosts, so all built-ins
        qualify)."""
        return list(cls.registry)


class MMapBackend(IOBackend, id_="mmap"):
    def __init__(self, enable_readahead_hints: bool = False):
        self.enable_readahead_hints = enable_readahead_hints


class BufferedBackend(IOBackend, id_="buffered"):
    def __init__(self, max_buffer_size: int = 16 * 1024 * 1024):
        self.max_buffer_size = max_buffer_size


class DirectBackend(IOBackend, id_="direct"):
    def __init__(self, max_buffer_size: int = 16 * 1024 * 1024):
        self.max_buffer_size = max_buffer_size


class RangeReader:
    """Backend-dispatching byte-range reader for one file.

    buffered (default): explicit aligned ``preadv`` into a fresh
    buffer (reference backend_buffered.py:208).  Measured on the
    target hosts, ``preadv`` beats mmap fault-copies by 20-100x in
    ALL cache states (virtualized page-fault handling costs ~1.5 ms
    per faulting region; scattered cold mmap reads of a 34 GB file
    ran at 2.7 MB/s vs 250 MB/s for pread) — so unlike the
    reference (which defaults to mmap for the warm page-cache case,
    backend_mmap.py:186), the copying read is the default here.
    mmap: zero-copy views out of the page cache, opt-in via
    ``MMapBackend`` for bare-metal re-read workloads.
    direct: O_DIRECT requires 4096-aligned offset/length/buffer, so
    the covering aligned range is read and sliced
    (reference backend_direct.py:7).

    ``strategy`` records which path is active so tests can assert the
    requested backend was actually exercised.
    """

    ALIGN = 4096

    def __init__(self, path: str, io_backend: IOBackend = None):
        import threading

        self._path = path
        self._mmap = None
        self._fd = None
        self._size = None
        # the sharded reader pool may hit one partition's reader from
        # several threads when a partition spans multiple device
        # shards — guard the lazy fd/mmap init
        self._init_lock = threading.Lock()
        # honor backend tuning: per-syscall chunk for buffered/direct
        # (aligned down), readahead hints for mmap
        self._max_read_bytes = 1 << 62
        self._readahead = False
        if isinstance(io_backend, DirectBackend):
            self.strategy = "direct"
        elif isinstance(io_backend, MMapBackend):
            self.strategy = "mmap"
            self._readahead = bool(
                getattr(io_backend, "enable_readahead_hints", False)
            )
        else:
            if io_backend is not None and not isinstance(
                io_backend, BufferedBackend
            ):
                # a custom/unknown IOBackend has no reader
                # implementation here; silently reading through the
                # default would bypass the user's explicit request
                # (contract pinned by the reference's FakeBackend,
                # tests/io/datasets/test_backend.py)
                raise RuntimeError(
                    f"io_backend {type(io_backend).__name__!r} has "
                    "no reader implementation in this framework"
                )
            self.strategy = "buffered"
        if isinstance(io_backend, (BufferedBackend, DirectBackend)):
            mbs = int(getattr(
                io_backend, "max_buffer_size", 0
            ) or 0)
            if mbs >= self.ALIGN:
                self._max_read_bytes = mbs // self.ALIGN * self.ALIGN

    def read(self, start_byte: int, nbytes: int) -> np.ndarray:
        """uint8 array of ``nbytes`` starting at ``start_byte``; a
        view for mmap, a fresh buffer for buffered/direct."""
        if self.strategy == "mmap":
            if self._mmap is None:
                with self._init_lock:
                    if self._mmap is None:
                        self._mmap = np.memmap(
                            self._path, dtype=np.uint8, mode="r"
                        )
                        if self._readahead and hasattr(
                            self._mmap, "madvise"
                        ):
                            import mmap as mmap_mod
                            try:
                                self._mmap.madvise(
                                    mmap_mod.MADV_WILLNEED
                                )
                            except Exception:
                                pass
            out = self._mmap[start_byte:start_byte + nbytes]
            if len(out) < nbytes:
                # slicing past EOF clamps silently — raise the same
                # diagnostic error as the buffered path
                raise IOError(
                    f"short read: {len(out)} bytes at offset "
                    f"{start_byte}, needed {nbytes} ({self._path})"
                )
            return out
        if self._fd is None:
            with self._init_lock:
                if self._fd is None:
                    flags = os.O_RDONLY
                    fd = None
                    if (
                        self.strategy == "direct"
                        and hasattr(os, "O_DIRECT")
                    ):
                        try:
                            fd = os.open(
                                self._path, flags | os.O_DIRECT
                            )
                        except OSError:
                            fd = None
                    if fd is None:
                        fd = os.open(self._path, flags)
                    self._fd = fd
        end_byte = start_byte + nbytes
        a0 = start_byte // self.ALIGN * self.ALIGN
        a1 = -(-end_byte // self.ALIGN) * self.ALIGN
        if self._size is None:
            self._size = os.fstat(self._fd).st_size
        if end_byte > self._size:
            # the file may have grown since st_size was cached (an
            # acquisition still appending to a .seq/.tvips series):
            # refresh before clamping, so only genuinely missing
            # bytes turn into a short-read error.  Off the hot path —
            # in-bounds reads never re-fstat.
            self._size = os.fstat(self._fd).st_size
        a1 = min(a1, -(-self._size // self.ALIGN) * self.ALIGN)
        raw = np.empty(a1 - a0 + self.ALIGN, dtype=np.uint8)
        shift = (-raw.ctypes.data) % self.ALIGN
        view = raw[shift:shift + (a1 - a0)]
        # loop: a single preadv is capped at ~2 GiB by the kernel and
        # may return partially on interruption (EINTR-resumed slow
        # NFS) — neither is a short read.  Chunk at the backend's
        # max_buffer_size when configured (aligned down).
        chunk = self._max_read_bytes
        got = 0
        need = a1 - a0
        while got < need:
            want = min(need - got, chunk)
            n = os.preadv(self._fd, [view[got:got + want]], a0 + got)
            if n <= 0:
                break  # true EOF
            got += n
        if got < end_byte - a0:
            raise IOError(
                f"short read: {got} bytes at aligned offset {a0}, "
                f"needed {end_byte - a0} ({self._path})"
            )
        return view[start_byte - a0:end_byte - a0]

    def close(self):
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None
        self._mmap = None

    def __del__(self):
        # partitions are created fresh per run (each with its own
        # readers), so without this every lazily opened fd would leak
        # for the life of the process — EMFILE after enough runs
        try:
            self.close()
        except Exception:
            pass
