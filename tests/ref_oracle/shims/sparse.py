"""Minimal pydata-sparse stand-in (COO with real coords/data storage).

Only the API surface the reference exercises on the recorded code
paths is implemented (masks.radial_bins / sparse_template_multi_stack,
MaskContainer, radial Fourier's coords-level product, roi handling).
"""
import numpy as np
import scipy.sparse as sp


class SparseArray:
    pass


class COO(SparseArray):
    def __init__(self, coords, data=None, shape=None, fill_value=0):
        if isinstance(coords, COO):
            self.coords = coords.coords
            self.data = coords.data
            self.shape = coords.shape
            self.fill_value = coords.fill_value
            return
        if isinstance(coords, np.ndarray) and data is None:
            dense = coords
            idx = np.nonzero(dense)
            self.coords = np.stack(
                [i.astype(np.int64) for i in idx], axis=0
            )
            self.data = dense[idx]
            self.shape = dense.shape
            self.fill_value = dense.dtype.type(fill_value)
            return
        if sp.issparse(coords) and data is None:
            m = coords.tocoo()
            self.coords = np.stack(
                [m.row.astype(np.int64), m.col.astype(np.int64)],
                axis=0,
            )
            self.data = m.data
            self.shape = m.shape
            self.fill_value = m.data.dtype.type(fill_value)
            return
        coords = np.asarray(coords)
        if coords.ndim == 1:
            coords = coords[None, :]
        self.coords = coords.astype(np.int64)
        self.data = np.asarray(data)
        if isinstance(shape, (int, np.integer)):
            shape = (int(shape),)
        if shape is None:
            shape = tuple(int(c.max()) + 1 for c in self.coords)
        self.shape = tuple(int(s) for s in shape)
        self.fill_value = self.data.dtype.type(fill_value)

    # -- construction helpers -------------------------------------
    @classmethod
    def from_numpy(cls, arr, fill_value=0):
        return cls(np.asarray(arr), fill_value=fill_value)

    @classmethod
    def from_iter(cls, it, shape=None, fill_value=None, dtype=None):
        coords = []
        data = []
        for entry in it:
            idx, val = entry
            coords.append(
                (idx,) if isinstance(idx, (int, np.integer)) else
                tuple(idx)
            )
            data.append(val)
        coords = np.asarray(coords, dtype=np.int64).T
        data = np.asarray(data, dtype=dtype)
        out = cls(coords, data=data, shape=shape)
        if fill_value is not None:
            out.fill_value = data.dtype.type(fill_value)
        return out

    @classmethod
    def from_scipy_sparse(cls, m):
        return cls(m)

    # -- properties ------------------------------------------------
    @property
    def ndim(self):
        return len(self.shape)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def size(self):
        return int(np.prod(self.shape))

    @property
    def nnz(self):
        return int(self.data.shape[0])

    @property
    def density(self):
        return self.nnz / max(self.size, 1)

    @property
    def T(self):
        return self.transpose()

    # -- conversions -----------------------------------------------
    def todense(self):
        out = np.full(self.shape, self.fill_value,
                      dtype=self.data.dtype)
        out[tuple(self.coords)] = self.data
        return out

    def tocsr(self):
        assert self.ndim == 2
        return sp.csr_matrix(
            (self.data, (self.coords[0], self.coords[1])),
            shape=self.shape,
        )

    def to_scipy_sparse(self):
        return self.tocsr().tocoo()

    def astype(self, dtype):
        out = COO(self.coords.copy(), self.data.astype(dtype),
                  shape=self.shape)
        out.fill_value = np.dtype(dtype).type(self.fill_value)
        return out

    def copy(self):
        out = COO(self.coords.copy(), self.data.copy(),
                  shape=self.shape)
        out.fill_value = self.fill_value
        return out

    # -- shape ops ---------------------------------------------------
    def reshape(self, shape):
        if isinstance(shape, (int, np.integer)):
            shape = (int(shape),)
        shape = tuple(int(s) for s in shape)
        if -1 in shape:
            known = int(np.prod([s for s in shape if s != -1]))
            shape = tuple(
                self.size // known if s == -1 else s for s in shape
            )
        flat = np.ravel_multi_index(tuple(self.coords), self.shape)
        new_coords = np.stack(np.unravel_index(flat, shape), axis=0)
        out = COO(new_coords, self.data, shape=shape)
        out.fill_value = self.fill_value
        return out

    def transpose(self, axes=None):
        if axes is None:
            axes = tuple(range(self.ndim))[::-1]
        out = COO(
            self.coords[list(axes)], self.data,
            shape=tuple(self.shape[a] for a in axes),
        )
        out.fill_value = self.fill_value
        return out

    # -- arithmetic (dense fallbacks are fine at golden sizes) -------
    def __mul__(self, other):
        if np.isscalar(other):
            out = COO(self.coords, self.data * other,
                      shape=self.shape)
            out.fill_value = self.fill_value
            return out
        return COO.from_numpy(
            self.todense() * _dense(other)
        )

    __rmul__ = __mul__

    def __add__(self, other):
        return COO.from_numpy(self.todense() + _dense(other))

    __radd__ = __add__

    def __sub__(self, other):
        return COO.from_numpy(self.todense() - _dense(other))

    def __neg__(self):
        out = COO(self.coords, -self.data, shape=self.shape)
        return out

    def __matmul__(self, other):
        assert self.ndim == 2
        res = self.tocsr() @ _dense_or_sp(other)
        if sp.issparse(res):
            return COO(res)
        return np.asarray(res)

    def __rmatmul__(self, other):
        assert self.ndim == 2
        res = _dense_or_sp(other) @ self.tocsr()
        if sp.issparse(res):
            return COO(res)
        return np.asarray(res)

    def __rsub__(self, other):
        return COO.from_numpy(_dense(other) - self.todense())

    def __getitem__(self, key):
        res = self.todense()[key]
        if np.ndim(res) == 0:
            return res
        return COO.from_numpy(res)

    def __array__(self, dtype=None):
        d = self.todense()
        return d.astype(dtype) if dtype is not None else d

    def sum(self, axis=None, **kw):
        return self.todense().sum(axis=axis, **kw)

    def max(self, axis=None, **kw):
        return self.todense().max(axis=axis, **kw)

    def __len__(self):
        return self.shape[0]


class GCXS(SparseArray):
    """Dense-backed stand-in; only conversion entry points needed."""

    def __init__(self, arr):
        if isinstance(arr, (COO, GCXS)):
            self._dense = arr.todense()
        elif sp.issparse(arr):
            self._dense = arr.toarray()
        else:
            self._dense = np.asarray(arr)

    @classmethod
    def from_numpy(cls, arr):
        return cls(arr)

    @property
    def shape(self):
        return self._dense.shape

    @property
    def ndim(self):
        return self._dense.ndim

    @property
    def dtype(self):
        return self._dense.dtype

    def todense(self):
        return self._dense

    def astype(self, dtype):
        return GCXS(self._dense.astype(dtype))

    def reshape(self, shape):
        return GCXS(self._dense.reshape(shape))

    def __matmul__(self, other):
        return np.asarray(self._dense @ _dense(other))

    def __rmatmul__(self, other):
        return np.asarray(_dense(other) @ self._dense)

    def __array__(self, dtype=None):
        d = self._dense
        return d.astype(dtype) if dtype is not None else d

    def __len__(self):
        return self.shape[0]


class DOK(SparseArray):
    def __init__(self, arr):
        self._coo = COO.from_numpy(_dense(arr))

    def todense(self):
        return self._coo.todense()


def _dense(x):
    if isinstance(x, SparseArray):
        return x.todense()
    if sp.issparse(x):
        return x.toarray()
    return np.asarray(x)


def _dense_or_sp(x):
    if isinstance(x, COO):
        return x.tocsr()
    if isinstance(x, SparseArray):
        return x.todense()
    return x


def concatenate(arrays, axis=0):
    dense = np.concatenate([_dense(a) for a in arrays], axis=axis)
    return COO.from_numpy(dense)


def stack(arrays, axis=0):
    dense = np.stack([_dense(a) for a in arrays], axis=axis)
    return COO.from_numpy(dense)


def zeros(shape, dtype=float):
    return COO(
        np.zeros((len(shape) if not isinstance(shape, int) else 1, 0),
                 dtype=np.int64),
        np.zeros(0, dtype=dtype),
        shape=shape,
    )
