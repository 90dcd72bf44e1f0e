"""RAW binary dataset: plain uncompressed frames on disk
(reference: libertem/io/dataset/raw.py:62 RawFileDataSet).

Host-side reads go through RangeReader (buffered preadv by default —
see its docstring for why mmap, the reference's default
backend_mmap.py:68, loses on virtualized hosts); dtype conversion
happens on-device after the H2D copy, which moves fewer bytes for
narrow integer data than the reference's host decode.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional, Sequence

import numpy as np

from ...common.math import prod
from .converters import (  # noqa: F401  (re-export, reference name)
    RawDatasetParams, RawDatasetParams as RAWDatasetParams,
)
from ...common.shape import Shape
from .base import (
    DataSet,
    DataSetException,
    DataSetMeta,
    Partition,
)


class RawPartition(Partition):
    def __init__(self, path, dtype, sig_shape,
                 io_backend=None, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._path = path
        self._dtype = np.dtype(dtype)
        self._sig_shape = tuple(sig_shape)
        from .base import RangeReader
        self._reader = RangeReader(path, io_backend)

    def _read_raw_frames(self, start: int, stop: int) -> np.ndarray:
        frame_bytes = prod(self._sig_shape) * self._dtype.itemsize
        buf = self._reader.read(
            start * frame_bytes, (stop - start) * frame_bytes
        )
        out = np.frombuffer(buf, dtype=self._dtype)
        return out.reshape((stop - start,) + self._sig_shape)


class RawFileDataSet(DataSet):
    def __init__(
        self,
        path: str,
        dtype,
        nav_shape: Optional[Sequence[int]] = None,
        sig_shape: Optional[Sequence[int]] = None,
        sync_offset: int = 0,
        # reference-compat aliases:
        scan_size=None,
        detector_size=None,
        tileshape=None,
        enable_direct: bool = False,
        detector_size_raw=None,
        crop_detector_to=None,
        **kwargs,
    ):
        import warnings
        if scan_size is not None:
            # reference raw.py deprecation: scan_size -> nav_shape
            warnings.warn(
                "scan_size is deprecated, use nav_shape instead",
                FutureWarning,
            )
        if detector_size is not None:
            warnings.warn(
                "detector_size is deprecated, use sig_shape instead",
                FutureWarning,
            )
        if tileshape is not None:
            warnings.warn(
                "tileshape is ignored (tiling is negotiated per "
                "run)", FutureWarning,
            )
        if enable_direct:
            # reference raw.py:121: deprecated spelling of the
            # direct io backend
            warnings.warn(
                "enable_direct is deprecated; pass "
                "io_backend=DirectBackend() instead", FutureWarning,
            )
            if kwargs.get("io_backend") is not None:
                raise ValueError(
                    "can't specify io_backend and enable_direct at "
                    "the same time"
                )
            from .base import IOBackend
            kwargs["io_backend"] = IOBackend.from_json(
                {"id": "direct"}
            )
        if detector_size_raw is not None:
            warnings.warn(
                "detector_size_raw is deprecated, specify sig_shape "
                "instead", FutureWarning,
            )
        if crop_detector_to is not None:
            # reference raw.py:141: cropping was removed; only the
            # no-op spelling survives
            warnings.warn(
                "crop_detector_to and detector_size_raw are "
                "deprecated, specify sig_shape instead",
                FutureWarning,
            )
            if detector_size is not None:
                raise ValueError(
                    "cannot specify both detector_size and "
                    "crop_detector_to"
                )
            if (
                detector_size_raw is not None
                and tuple(detector_size_raw) != tuple(crop_detector_to)
            ):
                raise ValueError(
                    "cropping the detector is not supported; use the "
                    "EMPAD DataSet"
                )
            detector_size = crop_detector_to
        super().__init__(**kwargs)
        self._path = path
        self._dtype = np.dtype(dtype)
        self._nav_shape = tuple(nav_shape or scan_size or ())
        self._sig_shape = tuple(sig_shape or detector_size or ())
        if not self._sig_shape:
            # reference raw.py raises at construction with the
            # standard-missing-argument wording (test_raw.py
            # test_missing_sig_shape pins the message)
            raise TypeError(
                "__init__() missing 1 required argument: 'sig_shape'"
            )
        self._sync_offset = int(sync_offset)

    def get_diagnostics(self) -> list:
        # (reference raw.py:206)
        return [
            {"name": "dtype", "value": str(self.meta.raw_dtype)},
        ]

    def get_cache_key(self) -> dict:
        return {
            "path": self._path,
            "shape": tuple(self.shape),
            "dtype": str(self._dtype),
            "sync_offset": int(self._sync_offset),
        }

    def initialize(self, executor=None) -> "RawFileDataSet":
        filesize = os.path.getsize(self._path)
        total_items = filesize // self._dtype.itemsize
        if total_items and prod(self._sig_shape) > total_items:
            # reference raw.py wording (test_too_large_sig_shape);
            # an EMPTY file stays permissive — the in-progress-
            # acquisition zero-fill contract (image_count == 0,
            # tests/test_formats2.py test_header_only_file_zero_fills)
            raise DataSetException(
                f"sig_shape must be less than size: {total_items}"
            )
        frame_bytes = prod(self._sig_shape) * self._dtype.itemsize
        # extra bytes at the end of the file are cut off (reference
        # raw.py image_count, test_raw.py test_extra_data_at_the_end)
        image_count = filesize // frame_bytes
        if not self._nav_shape:
            self._nav_shape = (image_count,)
        shape = Shape(
            self._nav_shape + self._sig_shape,
            sig_dims=len(self._sig_shape),
        )
        self._meta = DataSetMeta(
            shape=shape,
            raw_dtype=self._dtype,
            sync_offset=self._sync_offset,
            image_count=image_count,
        )
        return self

    def check_valid(self) -> bool:
        nav_size = prod(self._nav_shape)
        if self.meta.image_count < nav_size + self._sync_offset:
            pass  # partial data is allowed; missing frames zero-filled
        return True

    def get_partitions(self) -> Iterator[RawPartition]:
        for idx, (start, stop) in enumerate(self.get_partition_ranges()):
            yield RawPartition(
                self._path,
                self._dtype,
                self._sig_shape,
                self._io_backend,
                self.meta, start, stop - start, idx=idx,
            )

    @classmethod
    def get_supported_extensions(cls) -> set:
        return {"raw", "bin"}
