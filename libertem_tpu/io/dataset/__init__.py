"""Dataset format registry + load()/detect()
(reference: libertem/io/dataset/__init__.py:15 filetypes, :106 load,
:223 detect).
"""
from __future__ import annotations

import importlib
from typing import Optional

from .base import DataSet, DataSetException

# format id -> "module:ClassName"; modules imported lazily
filetypes = {
    "memory": "libertem_tpu.io.dataset.memory:MemoryDataSet",
    "raw": "libertem_tpu.io.dataset.raw:RawFileDataSet",
    "npy": "libertem_tpu.io.dataset.npy:NPYDataSet",
    "hdf5": "libertem_tpu.io.dataset.hdf5:H5DataSet",
    "mib": "libertem_tpu.io.dataset.mib:MIBDataSet",
    "empad": "libertem_tpu.io.dataset.empad:EMPADDataSet",
    "blo": "libertem_tpu.io.dataset.blo:BloDataSet",
    "mrc": "libertem_tpu.io.dataset.mrc:MRCDataSet",
    "seq": "libertem_tpu.io.dataset.seq:SEQDataSet",
    "tvips": "libertem_tpu.io.dataset.tvips:TVIPSDataSet",
    "raw_csr": "libertem_tpu.io.dataset.raw_csr:RawCSRDataSet",
    "dm": "libertem_tpu.io.dataset.dm:DMDataSet",
    "frms6": "libertem_tpu.io.dataset.frms6:FRMS6DataSet",
    "k2is": "libertem_tpu.io.dataset.k2is:K2ISDataSet",
    "ser": "libertem_tpu.io.dataset.ser:SERDataSet",
    "dask": "libertem_tpu.io.dataset.dask:DaskDataSet",
}


def register_dataset_cls(filetype: str, cls) -> None:
    """Register a custom DataSet implementation under ``filetype``
    (reference io/dataset/__init__.py:160): ``cls`` may be the class
    itself, a ``module:ClassName`` spec, or the reference's dotted
    ``module.ClassName`` path.  It participates in ``load()`` and
    ``detect()`` like the built-ins."""
    filetypes[filetype.lower()] = cls


def unregister_dataset_cls(filetype: str) -> None:
    """Remove a registered filetype (reference
    io/dataset/__init__.py:164)."""
    del filetypes[filetype.lower()]


def get_dataset_cls(filetype: str) -> type:
    if not isinstance(filetype, str):
        # reference :169 — a class passes through
        return filetype
    try:
        spec = filetypes[filetype.lower()]
    except KeyError:
        raise DataSetException(
            f"unknown filetype {filetype!r}; known: "
            f"{sorted(filetypes)}"
        ) from None
    if not isinstance(spec, str):
        return spec
    if ":" in spec:
        module_name, cls_name = spec.split(":")
    else:
        # reference-style dotted path
        module_name, _, cls_name = spec.rpartition(".")
    try:
        module = importlib.import_module(module_name)
    except ImportError as e:
        raise DataSetException(
            f"could not load dataset: {e}"
        ) from None
    return getattr(module, cls_name)


def build_extension_map() -> dict:
    """extension -> [filetype keys], in registration order
    (reference io/dataset/__init__.py:36)."""
    ext_map: dict = {}
    for ft in filetypes:
        try:
            cls = get_dataset_cls(ft)
        except Exception:
            continue
        for ext in cls.get_supported_extensions():
            ext_map.setdefault(ext.lower(), []).append(ft)
    return ext_map


def get_search_order(path) -> list:
    """filetype keys in detection order: formats registered for the
    path's extension float to the top, 'memory' sinks to the bottom
    (reference io/dataset/__init__.py:188)."""
    import pathlib

    search_order = list(filetypes)
    try:
        ext = pathlib.Path(path).suffix.strip().lstrip(".").lower()
        for ft in reversed(build_extension_map().get(ext, ())):
            search_order.remove(ft)
            search_order.insert(0, ft)
    except (TypeError, ValueError):
        pass
    if "memory" in search_order:
        search_order.remove("memory")
        search_order.append("memory")
    return search_order


def load(filetype: str, *args, executor=None, **kwargs) -> DataSet:
    if filetype == "auto":
        return detect_and_load(*args, executor=executor, **kwargs)
    cls = get_dataset_cls(filetype)
    ds = cls(*args, **kwargs)
    return ds.initialize(executor)


# format id -> extensions; static so detect() does not import every
# dataset module (h5py, dask, ...) just to rank the probe order
_STATIC_EXTENSIONS = {
    "raw": {"raw", "bin"},
    "npy": {"npy"},
    "hdf5": {"h5", "hdf5", "hspy", "nxs", "emd"},
    "mib": {"mib", "hdr"},
    "empad": {"xml", "raw"},
    "blo": {"blo"},
    "mrc": {"mrc", "mrcs", "rec", "ali", "st"},
    "seq": {"seq"},
    "tvips": {"tvips"},
    "raw_csr": {"toml"},
    "dm": {"dm3", "dm4"},
    "frms6": {"frms6", "hdr"},
    "k2is": {"gtg", "bin"},
    "ser": {"ser"},
}


def detect(path: str, executor=None) -> Optional[dict]:
    """Try each format's detect_params in extension-priority order
    (reference io/dataset/__init__.py:188–239)."""
    import os
    ext = os.path.splitext(path)[1].lstrip(".").lower()
    order = sorted(
        filetypes,
        key=lambda ft: (
            0 if ext and ext in _STATIC_EXTENSIONS.get(ft, ())
            else 1
        ),
    )
    for ft in order:
        if ft == "memory":
            continue
        try:
            cls = get_dataset_cls(ft)
        except Exception:
            continue
        try:
            params = cls.detect_params(path, executor)
        except Exception:
            params = False
        if params:
            if isinstance(params, dict) and "parameters" in params:
                # reference-shaped return: {"parameters", "info"}
                # (e.g. npy.py:205) — lift alongside "type"
                return {"type": ft, **params}
            return {"type": ft, "parameters": params}
    return None


def get_extensions() -> set:
    """All supported file extensions, lowercased (reference
    io/dataset/__init__.py:242)."""
    exts: set = set()
    for ft in filetypes:
        try:
            cls = get_dataset_cls(ft)
        except Exception:
            continue
        exts |= {
            e.lower() for e in cls.get_supported_extensions()
        }
    return exts


def detect_and_load(path: str, executor=None, **kwargs) -> DataSet:
    detected = detect(path, executor)
    if detected is None:
        # reference wording (io/dataset/__init__.py load('auto')):
        raise DataSetException(
            f"could not determine DataSet type for file {path!r}"
        )
    params = dict(detected["parameters"])
    params.update(kwargs)
    cls = get_dataset_cls(detected["type"])
    return cls(**params).initialize(executor)
