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
