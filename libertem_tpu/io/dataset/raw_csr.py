"""RAW CSR dataset: sparse frames in compressed-sparse-row layout on
disk, described by a TOML file
(reference: libertem/io/dataset/raw_csr.py:105 — [params]
filetype/nav_shape/sig_shape + [raw_csr] indptr_file/indptr_dtype/
indices_file/indices_dtype/data_file/data_dtype; both axes flattened).

TPU-native handling: blocks ship to the device as the raw CSR triple
(vals, rows, cols) zero-padded to a bucketed static nnz budget —
H2D volume scales with nnz like the reference's sparse tiles
(raw_csr.py:349) — and densify on-device via scatter-add before the
dense MXU/VPU compute path.  Host-side consumers (host UDFs,
read_dataset_frames, the sharded feeding path) densify lazily.
"""
from __future__ import annotations

import os
import tomllib
from typing import Iterator, NamedTuple, Optional, Sequence

import numpy as np

from ...common.math import prod
from ...common.shape import Shape
from ...common.slice import Slice
from .base import (
    DataTile,
    DataSet,
    DataSetException,
    DataSetMeta,
    Partition,
)


def load_toml(path: str) -> dict:
    """Parse the sidecar TOML (split out so detection-time guards
    can be tested; reference raw_csr.py load_toml)."""
    with open(path, "rb") as f:
        return tomllib.load(f)


# detection refuses to parse huge files as TOML (a multi-GB binary
# that happens to end in .toml must not be slurped; reference
# raw_csr.py detect_params size guard)
_DETECT_MAX_TOML_BYTES = 1024 * 1024


class CSRTriple(NamedTuple):
    """The three CSR arrays (reference raw_csr.py:47)."""
    indptr: np.ndarray
    indices: np.ndarray
    data: np.ndarray


def _csr_for_span(triple: CSRTriple, a: int, b: int, n_sig: int,
                  dest_dtype=None):
    """scipy CSR holding rows [a, b) of the triple."""
    import scipy.sparse as sp
    indptr = np.asarray(triple.indptr[a:b + 1])
    lo, hi = int(indptr[0]), int(indptr[-1])
    mat = sp.csr_matrix(
        (
            np.asarray(triple.data[lo:hi]),
            np.asarray(triple.indices[lo:hi]),
            indptr - lo,
        ),
        shape=(b - a, n_sig),
    )
    if dest_dtype is not None and mat.dtype != np.dtype(dest_dtype):
        mat = mat.astype(dest_dtype)
    return mat


def read_tiles_straight(triple: CSRTriple, partition_slice,
                        tiling_scheme, dest_dtype=None,
                        sync_offset: int = 0):
    """Depth-chunked scipy-CSR tiles over a partition's frame span
    (reference raw_csr.py read_tiles_straight — whole-sig tiles;
    CSR cannot sig-split without re-indexing).  ``sync_offset``
    follows the engine convention: data row = ds index + offset,
    out-of-data rows skipped."""
    n_frames = int(partition_slice.shape[0])
    origin = int(partition_slice.origin[0])
    sig_dims = partition_slice.shape.sig.dims
    n_sig = partition_slice.shape.sig.size
    depth = max(1, int(tiling_scheme.depth))
    n_rows = len(triple.indptr) - 1
    for off in range(0, n_frames, depth):
        a_ds = origin + off
        b_ds = min(origin + n_frames, a_ds + depth)
        a = max(0, a_ds + sync_offset)
        b = min(n_rows, b_ds + sync_offset)
        if b <= a:
            continue
        mat = _csr_for_span(triple, a, b, n_sig, dest_dtype)
        tile_slice = Slice(
            (a - sync_offset,) + (0,) * sig_dims,
            Shape(
                (b - a,) + tuple(partition_slice.shape.sig),
                sig_dims=sig_dims,
            ),
        )
        yield DataTile(mat, tile_slice=tile_slice, scheme_idx=0)


def read_tiles_with_roi(triple: CSRTriple, partition_slice,
                        tiling_scheme, roi, dest_dtype=None,
                        sync_offset: int = 0):
    """Roi-compressed variant of :func:`read_tiles_straight`
    (reference raw_csr.py read_tiles_with_roi): only selected frames
    appear; tile origins are roi-COMPRESSED flat-nav positions."""
    import scipy.sparse as sp  # noqa: F401  (hard dep of this path)
    roi = np.asarray(roi).reshape(-1)
    origin = int(partition_slice.origin[0])
    n_frames = int(partition_slice.shape[0])
    sig_dims = partition_slice.shape.sig.dims
    n_sig = partition_slice.shape.sig.size
    depth = max(1, int(tiling_scheme.depth))
    n_rows = len(triple.indptr) - 1
    sel = np.flatnonzero(roi[origin:origin + n_frames]) + origin
    stored = sel + sync_offset
    ok = (stored >= 0) & (stored < n_rows)
    sel, stored = sel[ok], stored[ok]
    goff0 = int(np.count_nonzero(roi[:origin]))
    part = None
    if len(stored):
        lo, hi = int(stored[0]), int(stored[-1]) + 1
        part = _csr_for_span(triple, lo, hi, n_sig, dest_dtype)
        part = part[stored - lo]
    for off in range(0, len(stored), depth):
        chunk = part[off:off + depth]
        tile_slice = Slice(
            (goff0 + off,) + (0,) * sig_dims,
            Shape(
                (chunk.shape[0],) + tuple(partition_slice.shape.sig),
                sig_dims=sig_dims,
            ),
        )
        yield DataTile(chunk, tile_slice=tile_slice, scheme_idx=0)


def load_descriptor(path: str) -> dict:
    raw = load_toml(path)
    params = raw.get("params", {})
    csr = raw.get("raw_csr", {})
    base = os.path.dirname(os.path.abspath(path))
    if params.get("filetype", "raw_csr").lower() != "raw_csr":
        raise DataSetException("not a raw_csr descriptor")
    out = {
        "nav_shape": tuple(params.get("nav_shape", ())),
        "sig_shape": tuple(params.get("sig_shape", ())),
    }
    for key in ("indptr", "indices", "data"):
        out[f"{key}_file"] = os.path.join(
            base, csr[f"{key}_file"]
        )
        out[f"{key}_dtype"] = np.dtype(csr[f"{key}_dtype"])
    return out


class _RangeArray:
    """Minimal 1-D array-like over a RangeReader: ``a[lo:hi]`` preads
    the element range and returns a numpy array."""

    def __init__(self, reader, dtype):
        self._reader = reader
        self._dtype = np.dtype(dtype)

    def __getitem__(self, key):
        if not isinstance(key, slice):
            raise TypeError("only contiguous slices are supported")
        lo, hi = int(key.start or 0), int(key.stop)
        item = self._dtype.itemsize
        if hi <= lo:
            return np.empty(0, dtype=self._dtype)
        return np.frombuffer(
            self._reader.read(lo * item, (hi - lo) * item),
            dtype=self._dtype,
        )


class RawCSRPartition(Partition):
    def __init__(self, desc, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._desc = desc
        self._maps = None

    def _get_maps(self):
        if self._maps is None:
            from .base import RangeReader
            d = self._desc
            # indptr is tiny ((n_frames+1) x itemsize) and accessed
            # randomly: load it whole.  indices/data are read as
            # contiguous ranges via pread (see RangeReader on why
            # not mmap).
            indptr = np.fromfile(
                d["indptr_file"], dtype=d["indptr_dtype"]
            )
            self._maps = (
                indptr,
                _RangeArray(
                    RangeReader(d["indices_file"], self.io_backend),
                    d["indices_dtype"],
                ),
                _RangeArray(
                    RangeReader(d["data_file"], self.io_backend), d["data_dtype"]
                ),
            )
        return self._maps

    def _read_raw_frames(self, start: int, stop: int) -> np.ndarray:
        indptr, indices, data = self._get_maps()
        sig = tuple(self.meta.shape.sig)
        n_pix = prod(sig)
        n = stop - start
        lo = int(indptr[start])
        hi = int(indptr[stop])
        cols = np.asarray(indices[lo:hi], dtype=np.int64)
        vals = np.asarray(data[lo:hi])
        rows = np.repeat(
            np.arange(n, dtype=np.int64),
            np.diff(np.asarray(indptr[start:stop + 1],
                               dtype=np.int64)),
        )
        out = np.zeros((n, n_pix), dtype=self.meta.raw_dtype)
        # add (not assign): non-canonical CSR with duplicate entries
        # sums them, matching scipy and the device scatter-add path
        np.add.at(out, (rows, cols), vals)
        return out.reshape((n,) + sig)

    def _read_sparse_chunk(self, frame_ids, depth, nnz_pad):
        """(vals, rows, cols) zero-padded to nnz_pad for the given
        (roi-selected, dataset-space) frame ids — sync_offset mapping
        and out-of-range zero-fill applied like read_dataset_frames."""
        indptr, indices, data = self._get_maps()
        so = self.meta.sync_offset
        n_stored = len(indptr) - 1
        # native_dtype, not raw_dtype: the sparse triple feeds
        # jax.device_put directly (no _to_sig boundary), and a
        # big-endian data_dtype must be swapped here — the slice
        # assignment below converts byte order for free
        vals = np.zeros(nnz_pad, dtype=self.meta.native_dtype)
        rows = np.zeros(nnz_pad, dtype=np.int32)
        cols = np.zeros(nnz_pad, dtype=np.int32)
        # coalesce contiguous stored-frame runs into ONE ranged read
        # per array (dense rois would otherwise cost two preads per
        # frame on the hot feed path)
        pos = 0
        r = 0
        nf = len(frame_ids)
        while r < nf:
            sid = int(frame_ids[r]) + so
            if sid < 0 or sid >= n_stored:
                r += 1
                continue  # zero-filled frame
            r2 = r + 1
            while (
                r2 < nf
                and int(frame_ids[r2]) + so
                == int(frame_ids[r2 - 1]) + so + 1
                and int(frame_ids[r2]) + so < n_stored
            ):
                r2 += 1
            s1 = int(frame_ids[r2 - 1]) + so + 1
            lo = int(indptr[sid])
            hi = int(indptr[s1])
            k = hi - lo
            vals[pos:pos + k] = data[lo:hi]
            cols[pos:pos + k] = indices[lo:hi]
            counts = np.diff(np.asarray(
                indptr[sid:s1 + 1], dtype=np.int64
            ))
            rows[pos:pos + k] = np.repeat(
                np.arange(r, r2, dtype=np.int32), counts
            )
            pos += k
            r = r2
        return vals, rows, cols

    def gen_blocks(self, scheme, roi=None):
        """Sparse blocks: ship the CSR triple to the device instead of
        densified frames — H2D volume scales with nnz (the reference's
        RawCSRPartition yields sparse tiles for the same reason,
        raw_csr.py:349); densification happens on-device via
        scatter-add.  nnz budgets are bucketed to powers of two so the
        densify program compiles a bounded number of times."""
        ids = self.local_frame_ids(roi)
        n = len(ids)
        if n == 0:
            return
        indptr, _, _ = self._get_maps()
        depth = scheme.depth
        goff = self.roi_offset(roi)
        nav_shape = tuple(self.meta.shape.nav)
        sig = tuple(self.meta.shape.sig)
        so = self.meta.sync_offset
        n_stored = len(indptr) - 1
        counts = np.diff(np.asarray(indptr, dtype=np.int64))
        for off in range(0, n, depth):
            chunk = ids[off:off + depth]
            valid = len(chunk)
            stored = chunk + so
            in_range = stored[(stored >= 0) & (stored < n_stored)]
            nnz = int(counts[in_range].sum())
            nnz_pad = max(16, 1 << int(np.ceil(np.log2(max(nnz, 1)))))
            vals, rows, cols = self._read_sparse_chunk(
                chunk, depth, nnz_pad
            )
            coords = np.zeros((depth, len(nav_shape)), dtype=np.int32)
            if len(nav_shape):
                unr = np.unravel_index(chunk, nav_shape)
                for d, u in enumerate(unr):
                    coords[:valid, d] = u
            from .base import Block
            yield Block(
                sparse=(vals, rows, cols),
                block_shape=(depth,) + sig,
                local_offset=off,
                global_offset=goff + off,
                coords=coords,
                valid=valid,
            )


class RawCSRDataSet(DataSet):
    def __init__(
        self,
        path: str,
        nav_shape: Optional[Sequence[int]] = None,
        sig_shape: Optional[Sequence[int]] = None,
        sync_offset: int = 0,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self._path = path
        self._nav_shape = tuple(nav_shape) if nav_shape else None
        self._sig_shape = tuple(sig_shape) if sig_shape else None
        self._sync_offset = int(sync_offset)

    def initialize(self, executor=None) -> "RawCSRDataSet":
        desc = load_descriptor(self._path)
        nav_shape = self._nav_shape or desc["nav_shape"]
        sig_shape = self._sig_shape or desc["sig_shape"]
        if not nav_shape or not sig_shape:
            raise DataSetException(
                "nav_shape and sig_shape required (TOML or kwargs)"
            )
        image_count = (
            os.path.getsize(desc["indptr_file"])
            // np.dtype(desc["indptr_dtype"]).itemsize
        ) - 1
        self._desc = desc
        self._meta = DataSetMeta(
            shape=Shape(
                tuple(nav_shape) + tuple(sig_shape),
                sig_dims=len(sig_shape),
            ),
            raw_dtype=desc["data_dtype"],
            sync_offset=self._sync_offset,
            image_count=image_count,
        )
        return self

    def get_partitions(self) -> Iterator[RawCSRPartition]:
        for idx, (start, stop) in enumerate(self.get_partition_ranges()):
            yield RawCSRPartition(
                self._desc, self.meta, start, stop - start, idx=idx,
                io_backend=self._io_backend,
            )

    @property
    def diagnostics(self) -> list:
        d = self._desc
        return [
            {"name": "data dtype",
             "value": str(np.dtype(d["data_dtype"]))},
            {"name": "indptr dtype",
             "value": str(np.dtype(d["indptr_dtype"]))},
            {"name": "indices dtype",
             "value": str(np.dtype(d["indices_dtype"]))},
        ]

    def get_diagnostics(self) -> list:
        return self.diagnostics

    @classmethod
    def detect_params(cls, path: str, executor=None):
        try:
            if not str(path).lower().endswith(".toml"):
                return False
            # never slurp a large binary as TOML (reference size
            # guard; tests monkeypatch load_toml to assert it is not
            # reached for big files)
            if os.path.getsize(path) > _DETECT_MAX_TOML_BYTES:
                return False
            load_descriptor(path)
        except Exception:
            return False
        return {"path": path}

    @classmethod
    def get_supported_extensions(cls) -> set:
        return {"toml"}
