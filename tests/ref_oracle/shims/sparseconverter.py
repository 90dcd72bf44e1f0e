"""Minimal sparseconverter stand-in for running the reference on CPU.

Supports numpy, scipy.sparse (matrix + array), and the shim pydata
``sparse`` backends; no cupy.  Backend identifiers match the real
package's public strings.
"""
import numpy as np
import scipy.sparse as sp

import sparse as sparse_shim

ArrayBackend = str
ArrayT = object

NUMPY = "numpy"
NUMPY_MATRIX = "numpy.matrix"
CUDA = "cuda"
CUPY = "cupy"
SPARSE_COO = "sparse.COO"
SPARSE_GCXS = "sparse.GCXS"
SPARSE_DOK = "sparse.DOK"
SCIPY_COO = "scipy.sparse.coo_matrix"
SCIPY_CSR = "scipy.sparse.csr_matrix"
SCIPY_CSC = "scipy.sparse.csc_matrix"
SCIPY_COO_ARRAY = "scipy.sparse.coo_array"
SCIPY_CSR_ARRAY = "scipy.sparse.csr_array"
SCIPY_CSC_ARRAY = "scipy.sparse.csc_array"
CUPY_SCIPY_COO = "cupyx.scipy.sparse.coo_matrix"
CUPY_SCIPY_CSR = "cupyx.scipy.sparse.csr_matrix"
CUPY_SCIPY_CSC = "cupyx.scipy.sparse.csc_matrix"

CPU_BACKENDS = frozenset({
    NUMPY, NUMPY_MATRIX, SPARSE_COO, SPARSE_GCXS, SPARSE_DOK,
    SCIPY_COO, SCIPY_CSR, SCIPY_CSC,
    SCIPY_COO_ARRAY, SCIPY_CSR_ARRAY, SCIPY_CSC_ARRAY,
})
CUPY_BACKENDS = frozenset({
    CUPY, CUPY_SCIPY_COO, CUPY_SCIPY_CSR, CUPY_SCIPY_CSC,
})
CUDA_BACKENDS = frozenset(CUPY_BACKENDS.union({CUDA}))
BACKENDS = frozenset(CPU_BACKENDS.union(CUDA_BACKENDS))
SPARSE_BACKENDS = frozenset({
    SPARSE_COO, SPARSE_GCXS, SPARSE_DOK,
    SCIPY_COO, SCIPY_CSR, SCIPY_CSC,
    SCIPY_COO_ARRAY, SCIPY_CSR_ARRAY, SCIPY_CSC_ARRAY,
    CUPY_SCIPY_COO, CUPY_SCIPY_CSR, CUPY_SCIPY_CSC,
})
DENSE_BACKENDS = frozenset(BACKENDS - SPARSE_BACKENDS)
D2_BACKENDS = frozenset({
    NUMPY, NUMPY_MATRIX, CUDA, CUPY,
    SCIPY_COO, SCIPY_CSR, SCIPY_CSC,
    SCIPY_COO_ARRAY, SCIPY_CSR_ARRAY, SCIPY_CSC_ARRAY,
    SPARSE_COO, SPARSE_GCXS, SPARSE_DOK,
    CUPY_SCIPY_COO, CUPY_SCIPY_CSR, CUPY_SCIPY_CSC,
})
ND_BACKENDS = frozenset({NUMPY, CUDA, CUPY, SPARSE_COO, SPARSE_GCXS,
                         SPARSE_DOK})


def get_backend(arr):
    if isinstance(arr, sparse_shim.COO):
        return SPARSE_COO
    if isinstance(arr, sparse_shim.GCXS):
        return SPARSE_GCXS
    if isinstance(arr, sparse_shim.DOK):
        return SPARSE_DOK
    if isinstance(arr, np.matrix):
        return NUMPY_MATRIX
    if isinstance(arr, np.ndarray):
        return NUMPY
    if sp.issparse(arr):
        fmt = arr.format
        is_array = isinstance(
            arr, getattr(sp, "sparray", ())
        )
        return {
            ("coo", False): SCIPY_COO, ("csr", False): SCIPY_CSR,
            ("csc", False): SCIPY_CSC, ("coo", True): SCIPY_COO_ARRAY,
            ("csr", True): SCIPY_CSR_ARRAY,
            ("csc", True): SCIPY_CSC_ARRAY,
        }.get((fmt, is_array))
    return None


def _to_dense(arr):
    if isinstance(arr, sparse_shim.SparseArray):
        return arr.todense()
    if sp.issparse(arr):
        return np.asarray(arr.todense())
    return np.asarray(arr)


def for_backend(arr, backend, strict=True):
    src = get_backend(arr)
    if src == backend:
        return arr
    if backend == NUMPY:
        return _to_dense(arr)
    if backend == NUMPY_MATRIX:
        return np.matrix(_to_dense(arr))
    if backend == SPARSE_COO:
        if isinstance(arr, sparse_shim.COO):
            return arr
        if sp.issparse(arr):
            return sparse_shim.COO(arr)
        return sparse_shim.COO.from_numpy(_to_dense(arr))
    if backend == SPARSE_GCXS:
        return sparse_shim.GCXS(arr)
    if backend == SPARSE_DOK:
        return sparse_shim.DOK(arr)
    if backend in (SCIPY_COO, SCIPY_CSR, SCIPY_CSC, SCIPY_COO_ARRAY,
                   SCIPY_CSR_ARRAY, SCIPY_CSC_ARRAY):
        if isinstance(arr, sparse_shim.COO) and arr.ndim == 2:
            m = arr.tocsr()
        elif sp.issparse(arr):
            m = arr
        else:
            d = _to_dense(arr)
            if d.ndim != 2:
                d = d.reshape(d.shape[0], -1)
            m = sp.csr_matrix(d)
        if backend in (SCIPY_COO, SCIPY_COO_ARRAY):
            m = m.tocoo()
        elif backend in (SCIPY_CSC, SCIPY_CSC_ARRAY):
            m = m.tocsc()
        else:
            m = m.tocsr()
        if backend in (SCIPY_COO_ARRAY, SCIPY_CSR_ARRAY,
                       SCIPY_CSC_ARRAY):
            ctor = {
                SCIPY_COO_ARRAY: sp.coo_array,
                SCIPY_CSR_ARRAY: sp.csr_array,
                SCIPY_CSC_ARRAY: sp.csc_array,
            }[backend]
            m = ctor(m)
        return m
    raise ValueError(f"cannot convert {src} -> {backend}")


def conversion_cost(source, target):
    if source == target:
        return 0
    dense = {NUMPY, NUMPY_MATRIX, CUDA, CUPY}
    if source in dense and target in dense:
        return 1
    return 2


def cheapest_pair(sources, targets):
    best = None
    for s in sources:
        for t in targets:
            c = conversion_cost(s, t)
            if best is None or c < best[0]:
                best = (c, s, t)
    if best is None:
        raise ValueError("no conversion pair")
    return best[1], best[2]


def check_shape(arr, shape):
    shape = tuple(int(s) for s in shape)
    if tuple(arr.shape) == shape:
        return
    # 2D backends hold flattened-nav data
    if (
        len(arr.shape) == 2
        and arr.shape[0] == shape[0]
        and int(np.prod(shape[1:])) == arr.shape[1]
    ):
        return
    raise ValueError(f"shape mismatch: {arr.shape} vs {shape}")


def result_type(*args):
    dtypes = []
    for a in args:
        if isinstance(a, str) and a in BACKENDS:
            continue  # our backends impose no dtype restriction here
        try:
            dtypes.append(np.dtype(a))
        except TypeError:
            dtypes.append(np.dtype(a.dtype))
    return np.result_type(*dtypes) if dtypes else np.dtype(np.float64)


def make_like(arr, target, strict=True):
    backend = get_backend(target)
    if backend is None:
        backend = NUMPY
    res = for_backend(arr, backend, strict=strict)
    if (
        backend in ND_BACKENDS
        and hasattr(target, "shape")
        and tuple(res.shape) != tuple(target.shape)
        and int(np.prod(res.shape)) == int(np.prod(target.shape))
    ):
        res = res.reshape(target.shape)
    return res


def get_device_class(backend):
    if backend in CUDA_BACKENDS:
        return "cuda"
    return "cpu"
