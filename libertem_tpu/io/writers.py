"""Dataset export + result download formats.

Counterpart of the reference's ``libertem/io/writers/``: WriteHandle
(tile-wise raw writing, writers/base.py:8) and the result formats
(HDF5/NPZ/TIFF/RAW, writers/results/formats.py:8–113) used by
Context.export_dataset (api.py:1706) and the web download API.
"""
from __future__ import annotations

import os
import tempfile
from typing import Optional

import numpy as np


def write_dataset_npy(ctx, dataset, path: str, progress=False) -> None:
    """Stream a dataset to a .npy file via the RecordUDF-equivalent
    (reference: udf/record.py, contrib/convert_transposed.py).

    Runs on the caller's executor: RecordUDF is a host-backend UDF
    writing disjoint memmap slices by global frame offset, so the
    sharded loop's per-device chunks land in their correct positions
    regardless of processing order (parity with the reference, which
    records from any executor, udf/record.py:9).  On a MULTI-HOST
    mesh the host block feed is split across processes (host UDFs
    refuse there) — fall back to single-device recording on this
    process's main device, which still sees the whole dataset."""
    import jax

    from ..udf.record import RecordUDF
    udf = RecordUDF(filename=path)
    if jax.process_count() > 1:
        from ..api import Context
        from ..executor.inline import InlineJobExecutor
        ctx = Context(executor=InlineJobExecutor(
            device=ctx.executor.main_device
        ))
    ctx.run_udf(dataset, udf, progress=progress)


class WriteHandle:
    """Tile-wise writing of a partition's worth of frames to a RAW
    file, atomically: tiles land in a tempfile-backed memmap in
    partition-local coordinates; success renames into place, an
    exception or :meth:`abort` unlinks the tempfile (reference
    writers/base.py:8 — same constructor, ``write_tile``/
    ``write_tiles``/``abort`` API and ``_dest``/``_tmp_file``
    internals, which the reference's own tests assert on)."""

    def __init__(self, path: str, tmp_base_path: str, part_slice,
                 dtype):
        self._path = path
        self._tmp_base_path = tmp_base_path
        self._slice = part_slice
        self._dtype = np.dtype(dtype)
        self._dest = None
        self._tmp_file = None
        self._aborted = False

    def __enter__(self):
        assert self._tmp_file is None
        self._tmp_file = tempfile.NamedTemporaryFile(
            prefix=os.path.basename(".tmp-%s" % self._path),
            dir=self._tmp_base_path, delete=False,
        )
        self._dest = np.memmap(
            self._tmp_file.name, dtype=self._dtype, mode="write",
            shape=tuple(self._slice.shape),
        )
        return self

    def write_tile(self, tile):
        """Write one DataTile into its partition-local slot."""
        assert self._tmp_file is not None
        dest_slice = tile.tile_slice.shift(self._slice)
        self._dest[dest_slice.get()] = tile.data

    def write_tiles(self, tiles):
        """Write all tiles, re-yielding each for further use."""
        for tile in tiles:
            self.write_tile(tile)
            yield tile

    def write_frames(self, offset: int, frames: np.ndarray):
        """Frame-offset convenience over the tile API (this
        engine's block feed is frame-granular)."""
        self._dest[offset:offset + frames.shape[0]] = frames

    def abort(self):
        self._cleanup()
        self._aborted = True

    def _cleanup(self):
        self._dest = None
        if self._tmp_file is not None:
            self._tmp_file.close()
            os.unlink(self._tmp_file.name)
            self._tmp_file = None

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None or self._aborted:
            self._cleanup()
            return False
        self._dest.flush()
        self._tmp_file.close()
        os.replace(self._tmp_file.name, self._path)
        # tmp files are created 0600 — honor the umask like a
        # normally created file would
        umask = os.umask(0)
        os.umask(umask)
        os.chmod(self._path, 0o666 & ~umask)
        self._dest = None
        self._tmp_file = None
        return False


# -- result download formats (web API) ---------------------------------

class ResultFormat:
    registry: dict = {}

    def __init_subclass__(cls, id_=None, **kw):
        super().__init_subclass__(**kw)
        if id_ is not None:
            cls.id_ = id_
            ResultFormat.registry[id_] = cls

    @classmethod
    def get_available_formats(cls):
        return {
            id_: f.description for id_, f in cls.registry.items()
        }

    @classmethod
    def get_format_by_id(cls, id_: str):
        """(reference io/writers/results/base.py
        ResultFormatRegistry.get_format_by_id)"""
        return cls.registry[id_]

    def serialize_to_buffer(self, fileobj):
        """Reference API name (base.py ResultFormat
        .serialize_to_buffer)."""
        return self.serialize_to(fileobj)

    def get_content_type(self) -> str:
        return "application/octet-stream"

    def get_filename(self) -> str:
        return f"result.{self.extension}"

    def __init__(self, result_set):
        self._result_set = result_set

    def _iter_arrays(self):
        for k in self._result_set.keys():
            buf = self._result_set[k]
            # reference parity: channels flagged
            # include_in_download=False (e.g. the CoM field tuple)
            # stay out of exported files
            if not getattr(buf, "include_in_download", True):
                continue
            data = getattr(buf, "data", buf)
            if data is not None:
                yield k, np.asarray(data)


class NpzFormat(ResultFormat, id_="NPZ"):
    description = "numpy .npz"
    extension = "npz"

    def serialize_to(self, fileobj, compressed=False):
        arrays = dict(self._iter_arrays())
        if compressed:
            np.savez_compressed(fileobj, **arrays)
        else:
            np.savez(fileobj, **arrays)


class NpzCompressedFormat(NpzFormat, id_="NPZ_COMPRESSED"):
    description = "numpy .npz (compressed)"

    def serialize_to(self, fileobj):
        super().serialize_to(fileobj, compressed=True)


class Hdf5Format(ResultFormat, id_="HDF5"):
    description = "HDF5"
    extension = "h5"

    def serialize_to(self, fileobj):
        import h5py
        with h5py.File(fileobj, "w") as f:
            for k, arr in self._iter_arrays():
                f.create_dataset(k, data=arr)


class RawFormat(ResultFormat, id_="RAW"):
    description = "raw binary (one file per channel, concatenated)"
    extension = "bin"

    def serialize_to(self, fileobj):
        for _, arr in self._iter_arrays():
            fileobj.write(np.ascontiguousarray(arr).tobytes())


class TiffFormat(ResultFormat, id_="TIFF"):
    description = "TIFF stack (float32)"
    extension = "tif"

    def serialize_to(self, fileobj):
        from PIL import Image
        images = []
        for _, arr in self._iter_arrays():
            arr = np.asarray(arr)
            if np.iscomplexobj(arr):
                arr = np.abs(arr)
            arr2d = arr.reshape(
                (-1,) + arr.shape[-2:]
            ) if arr.ndim >= 2 else arr.reshape(1, 1, -1)
            for plane in arr2d:
                images.append(
                    Image.fromarray(plane.astype(np.float32))
                )
        if images:
            images[0].save(
                fileobj, format="TIFF", save_all=True,
                append_images=images[1:],
            )


class ResultFormatRegistry:
    """Reference-layout alias (io/writers/results/base.py
    ResultFormatRegistry) — the registry lives on ResultFormat."""

    @classmethod
    def get_available_formats(cls):
        return ResultFormat.get_available_formats()

    @classmethod
    def get_format_by_id(cls, id_: str):
        return ResultFormat.get_format_by_id(id_)
