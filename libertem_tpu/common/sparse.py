"""Sparse/dense conversion helpers
(reference: libertem/common/sparse.py — to_dense:12, to_sparse:20,
is_sparse:41; scipy.sparse based, sparse.pydata is not a dependency
here).
"""
from __future__ import annotations

import numpy as np


def is_sparse(arr) -> bool:
    return hasattr(arr, "todense") or hasattr(arr, "toarray")


def to_dense(arr) -> np.ndarray:
    if hasattr(arr, "todense"):
        return np.asarray(arr.todense())
    if hasattr(arr, "toarray"):
        return np.asarray(arr.toarray())
    return np.asarray(arr)


def to_sparse(arr):
    import scipy.sparse as sp
    if is_sparse(arr):
        return arr
    arr = np.asarray(arr)
    return sp.csr_matrix(arr.reshape(arr.shape[0], -1) if
                         arr.ndim > 2 else arr)


def sparse_to_coo(arr):
    import scipy.sparse as sp
    if arr is None or isinstance(arr, np.ndarray):
        return arr
    return sp.coo_matrix(arr)


def to_backend(arr: np.ndarray, backend):
    """Convert a dense ``(depth, *sig)`` array to the named array
    backend (the reference's sparseconverter.for_backend spellings,
    common/udf.py:43-57).  2D formats (scipy.sparse) carry the sig
    axes FLATTENED to one, matching the reference's D2 backend
    contract.  cupy spellings raise — no CUDA exists on this target.
    """
    if backend is None or backend == "numpy":
        return np.asarray(arr)
    if backend == "jax":
        import jax.numpy as jnp
        return jnp.asarray(arr)
    if str(backend).startswith("cupy") or backend == "cuda":
        raise RuntimeError(
            f"array backend {backend!r} needs CUDA, which this "
            "TPU-native build does not target"
        )
    if str(backend).startswith("sparse."):
        import sparse as sparse_pkg
        cls = getattr(sparse_pkg, str(backend).split(".", 1)[1])
        return cls.from_numpy(np.asarray(arr))
    if str(backend).startswith("scipy.sparse."):
        import scipy.sparse as sp
        ctor = getattr(sp, str(backend).rsplit(".", 1)[1])
        flat = np.asarray(arr)
        return ctor(flat.reshape(flat.shape[0], -1))
    raise ValueError(f"unknown array backend: {backend!r}")
