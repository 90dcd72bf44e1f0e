"""HDF5 dataset
(reference: libertem/io/dataset/hdf5.py:224 H5DataSet, H5Partition:617).

Reads via h5py with chunk-aligned access where possible; nD nav is
flattened.  Unlike the reference (which builds its own chunk-aligned
tiling scheme, hdf5.py:919), frame blocks here are fixed-shape; h5py's
chunk cache absorbs the alignment mismatch, and `get_max_io_size` caps
block depth for heavily chunked files.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional, Sequence

import numpy as np

# module-level clock hook: the dataset-discovery walk is bounded by
# wall time (a pathological tree on slow network storage must not
# hang detection; reference hdf5.py current_time — its tests mock
# THIS symbol)
current_time = time.time

# seconds allowed for the ds_path discovery / diagnostics walk
_SCAN_TIMEOUT_S = 10.0


class _ScanTimeout(Exception):
    pass

from ...common.math import prod
from ...common.shape import Shape
from .base import (
    DataSet,
    DataSetException,
    DataSetMeta,
    Partition,
)


def _open_h5(path):
    import h5py
    return h5py.File(path, "r")


class H5Reader:
    """Handle-per-use reader (reference hdf5.py:44 H5Reader):
    ``get_h5ds()`` yields the h5py Dataset for the duration of the
    block — consumers never hold a file handle across pickling
    boundaries."""

    def __init__(self, path, ds_path):
        self._path = path
        self._ds_path = ds_path

    @contextlib.contextmanager
    def get_h5ds(self):
        with _open_h5(self._path) as f:
            yield f[self._ds_path]


class H5Partition(Partition):
    def __init__(self, path, ds_path, sig_dims, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._path = path
        self._ds_path = ds_path
        self._sig_dims = sig_dims
        self._file = None
        # the sharded reader pool may hit one partition from several
        # threads when it spans shard boundaries (same race
        # RangeReader._init_lock guards, base.py)
        import threading
        self._open_lock = threading.Lock()

    def _get_ds(self):
        if self._file is None:
            with self._open_lock:
                if self._file is None:
                    self._file = _open_h5(self._path)
        return self._file[self._ds_path]

    def _read_raw_frames(self, start: int, stop: int) -> np.ndarray:
        ds = self._get_ds()
        sig_shape = ds.shape[len(ds.shape) - self._sig_dims:]
        nav_shape = ds.shape[:len(ds.shape) - self._sig_dims]
        n = stop - start
        out = np.empty((n,) + tuple(sig_shape), dtype=ds.dtype)
        if len(nav_shape) == 1:
            ds.read_direct(
                out, source_sel=np.s_[start:stop]
            )
        else:
            # flatten nD nav: read row-contiguous spans
            coords_start = np.unravel_index(start, nav_shape)
            i = start
            while i < stop:
                c = np.unravel_index(i, nav_shape)
                # contiguous run within the last nav axis
                run = min(stop - i, nav_shape[-1] - c[-1])
                sel = tuple(
                    slice(int(cc), int(cc) + 1) for cc in c[:-1]
                ) + (slice(int(c[-1]), int(c[-1]) + run),)
                out[i - start:i - start + run] = ds[sel].reshape(
                    (run,) + tuple(sig_shape)
                )
                i += run
        return out

    def read_selected_frames(self, ids) -> np.ndarray:
        """Sparse-roi fast path (reference hdf5.py:875): read only the
        selected STORED frames (sync_offset/zero-fill applied by the
        base wrapper) instead of the covering span — for chunked/
        compressed files the cover read decompresses every chunk in
        range, which dominates at low roi density."""
        ds = self._get_ds()
        sig_dims = self._sig_dims
        sig_shape = tuple(ds.shape[len(ds.shape) - sig_dims:])
        nav_shape = tuple(ds.shape[:len(ds.shape) - sig_dims])
        out = np.empty((len(ids),) + sig_shape, dtype=ds.dtype)
        for i, fid in enumerate(ids):
            c = np.unravel_index(int(fid), nav_shape)
            out[i] = ds[tuple(int(cc) for cc in c)]
        # same byteswap/sig-override boundary the dense path goes
        # through (base read_dataset_frames -> _to_sig): big-endian
        # H5 dtypes must not reach the device feed
        return self._to_sig(out)

    def get_tiles(self, tiling_scheme, roi=None, dest_dtype=None,
                  array_backend=None):
        """Compat tile stream with the reference's h5-specific depth
        override (hdf5.py:529/test_scheme_too_large): tiles never
        span rows of the file's LAST nav axis, so h5py reads stay
        row-contiguous (and chunk-cache friendly) instead of
        straddling raster rows."""
        nav = tuple(self.meta.shape.nav)
        row = int(nav[-1]) if nav else 1
        if tiling_scheme.depth > row:
            from ..tiling import TilingScheme
            tiling_scheme = TilingScheme(
                row, tiling_scheme.sig_slices,
                tiling_scheme.dataset_shape, tiling_scheme.intent,
            )
        yield from super().get_tiles(
            tiling_scheme, roi=roi, dest_dtype=dest_dtype,
            array_backend=array_backend,
        )

    def __del__(self):
        if self._file is not None:
            try:
                self._file.close()
            except Exception:
                pass


class H5DataSet(DataSet):
    def __init__(
        self,
        path: str,
        ds_path: Optional[str] = None,
        sig_dims: int = 2,
        nav_shape: Optional[Sequence[int]] = None,
        sig_shape: Optional[Sequence[int]] = None,
        sync_offset: int = 0,
        target_size: Optional[int] = None,
        min_num_partitions: Optional[int] = None,
        **kwargs,
    ):
        if kwargs.get("io_backend") is not None:
            # HDF5 reads through h5py — an alternative byte-level
            # IOBackend cannot be honored and must not be silently
            # ignored (reference hdf5.py:307 raises the same)
            raise ValueError(
                "H5DataSet does not support alternative I/O backends"
            )
        super().__init__(**kwargs)
        self._path = path
        self._ds_path = ds_path
        self._sig_dims = sig_dims
        self._nav_shape = tuple(nav_shape) if nav_shape else None
        self._sig_shape = tuple(sig_shape) if sig_shape else None
        self._sync_offset = int(sync_offset)
        # reference hdf5.py:298: target partition size in bytes;
        # min_num_partitions is accepted for signature parity (the
        # reference never uses it either, hdf5.py:313)
        self._target_size = target_size
        self._min_num_partitions = min_num_partitions
        self._chunks = None
        # None until initialize() (reference hdf5.py pickling
        # contract, test_cloudpickle)
        self._dtype = None
        self._shape = None

    @property
    def path(self) -> str:
        # reference hdf5.py:472
        return self._path

    @property
    def ds_path(self) -> str:
        # reference hdf5.py:476
        return self._ds_path

    def get_num_partitions(self) -> int:
        # precedence: explicit num_partitions= > target_size= (bytes
        # PER partition, both directions — reference hdf5.py:556) >
        # the core-count heuristic; min_num_partitions floors the
        # result either way
        if self._num_partitions is not None or not self._target_size:
            n = super().get_num_partitions()
        else:
            total = self.meta.shape.size * self.meta.raw_dtype.itemsize
            n = max(1, int(np.ceil(total / self._target_size)))
        if self._min_num_partitions:
            n = max(n, int(self._min_num_partitions))
        return min(n, max(1, self.meta.shape.nav.size))

    @classmethod
    def _find_datasets(cls, f, min_dims=3, timeout=_SCAN_TIMEOUT_S):
        """All ndim>=min_dims datasets, largest first (the
        reference's interactive ds_path discovery) — wall-time
        bounded; raises _ScanTimeout when the tree walk exceeds the
        budget (reference hdf5.py _get_datasets timeout; its tests
        mock TimeoutError out of visititems AND the current_time
        clock)."""
        found = []
        t0 = current_time()

        def visit(name, obj):
            import h5py
            if current_time() - t0 > timeout:
                raise _ScanTimeout()
            if isinstance(obj, h5py.Dataset) and obj.ndim >= min_dims:
                found.append((name, obj.size))

        try:
            f.visititems(visit)
        except TimeoutError:
            raise _ScanTimeout()
        found.sort(key=lambda t: -t[1])
        return [name for name, _ in found]

    def initialize(self, executor=None) -> "H5DataSet":
        with _open_h5(self._path) as f:
            if self._ds_path is None:
                cands = self._find_datasets(f)
                if not cands:
                    raise DataSetException(
                        f"no >=3D dataset found in {self._path}"
                    )
                self._ds_path = cands[0]
            ds = f[self._ds_path]
            shape = ds.shape
            dtype = ds.dtype
            self._chunks = ds.chunks
        if len(shape) < 3:
            # reference hdf5.py: nav cannot be derived from a bare
            # image (test_hdf5_with_2d_shape pins the message)
            raise DataSetException(
                "2D HDF5 files are currently not supported"
            )
        self._dtype = np.dtype(dtype)
        sig_shape = self._sig_shape or shape[
            len(shape) - self._sig_dims:
        ]
        # a user-supplied sig_shape must match the file's trailing
        # dims — the partition reads frames in the file's own sig
        # shape, so a mismatch would surface as an opaque shape error
        # deep inside the run (other formats validate the same way)
        file_sig = tuple(shape[len(shape) - len(sig_shape):])
        if tuple(sig_shape) != file_sig:
            raise DataSetException(
                f"sig_shape {tuple(sig_shape)} does not match the "
                f"dataset's frame shape {file_sig} "
                f"({self._path}:{self._ds_path})"
            )
        file_nav = shape[:len(shape) - len(sig_shape)]
        nav_shape = self._nav_shape or file_nav
        image_count = prod(file_nav) if file_nav else 1
        self._meta = DataSetMeta(
            shape=Shape(
                tuple(nav_shape) + tuple(sig_shape),
                sig_dims=len(sig_shape),
            ),
            raw_dtype=dtype,
            sync_offset=self._sync_offset,
            image_count=image_count,
        )
        self._shape = self._meta.shape
        return self

    def get_max_io_size(self) -> Optional[int]:
        if self._chunks is not None:
            # cap block size near the chunk row so h5 chunk cache works
            return 16 * prod(self._chunks) * self.meta.raw_dtype.itemsize
        return None

    @property
    def diagnostics(self):
        diags = [
            {"name": "ds_path", "value": str(self._ds_path)},
            {"name": "chunks", "value": str(self._chunks)},
        ]
        # sibling-dataset listing, wall-time bounded like detection
        try:
            with _open_h5(self._path) as f:
                names = self._find_datasets(f)
            diags.append({
                "name": "datasets", "value": ", ".join(names),
            })
        except (_ScanTimeout, Exception):
            diags.append({
                "name": "datasets",
                "value": "(listing timed out or failed)",
            })
        return diags

    def get_diagnostics(self) -> list:
        return self.diagnostics

    def get_reader(self):
        return H5Reader(self._path, self._ds_path)

    def get_cache_key(self) -> dict:
        return {
            "path": self._path,
            "ds_path": str(self._ds_path),
            "shape": tuple(self.shape),
            "sync_offset": int(self._sync_offset),
        }

    def get_base_shape(self, roi):
        """Smallest efficient tile shape (reference hdf5.py:521):
        sig chunk extents for chunked files, one sig row otherwise;
        rois force whole frames."""
        sig = tuple(self.shape.sig)
        if roi is not None:
            return (1,) + sig
        if self._chunks is not None:
            return (1,) + tuple(self._chunks[-len(sig):])
        return (1, 1) + (int(self.shape[-1]),)

    def adjust_tileshape(self, tileshape, roi):
        """Chunk-aware tile adjustment (reference hdf5.py:529):
        when the file's sig chunking is FINER than the requested
        tile, reading tiles would decompress each chunk many times —
        switch to full frames at equivalent total size instead."""
        chunks = self._chunks
        sig = tuple(self.shape.sig)
        if roi is not None or chunks is None:
            return tileshape
        sig_chunks = tuple(chunks[-len(sig):])
        if sig_chunks == sig:
            return tileshape
        sig_ts = tuple(tileshape)[-len(sig):]
        if any(t > c for t, c in zip(sig_ts, sig_chunks)):
            size = int(np.prod(tuple(tileshape)))
            depth = max(1, size // int(np.prod(sig)))
            return (depth,) + sig
        return tileshape

    def get_partitions(self) -> Iterator[H5Partition]:
        for idx, (start, stop) in enumerate(self.get_partition_ranges()):
            yield H5Partition(
                self._path, self._ds_path, self.meta.shape.sig.dims,
                self.meta, start, stop - start, idx=idx,
            )

    @classmethod
    def detect_params(cls, path: str, executor=None):
        """Reference return contract (hdf5.py:405): a 'parameters'
        block; a timed-out or dataset-less (but valid) HDF5 file
        still detects with the path alone."""
        ext = str(path).split(".")[-1].lower()
        if ext not in ("h5", "hdf5", "hspy", "nxs", "emd"):
            return False
        try:
            try:
                with _open_h5(path) as f:
                    cands = cls._find_datasets(f)
            except _ScanTimeout:
                # tree walk exceeded its wall-time budget: the file
                # IS hdf5; let the user pick ds_path interactively
                # (reference hdf5.py timeout contract,
                # test_hdf5.py test_timeout_1/2)
                return {"parameters": {"path": path}}
            if not cands:
                return {"parameters": {"path": path}}
            with _open_h5(path) as f:
                shape = tuple(f[cands[0]].shape)
            # GUI-facing nav collapsed to 2d, sig implicitly the two
            # trailing dims (reference hdf5.py:423,431)
            nav = shape[:-2]
            if len(nav) == 0:
                nav2d = (1, 1)
            elif len(nav) == 1:
                nav2d = (1, nav[0])
            else:
                import math
                nav2d = (math.prod(nav[:-1]), nav[-1])
            return {
                "parameters": {
                    "path": path,
                    "ds_path": cands[0],
                    "nav_shape": nav2d,
                    "sig_shape": shape[-2:],
                },
                "info": {"datasets": list(cands)},
            }
        except Exception:
            return False

    @classmethod
    def get_supported_extensions(cls) -> set:
        return {"h5", "hdf5", "hspy", "nxs", "emd"}
