"""Minimal numba stand-in: runs @njit kernels as pure Python.

Used only by the golden-recording script (tests/ref_oracle) to execute
the reference implementation in an environment without numba.  The
reference's numba usage is decorator-only on the code paths we record
(InlineJobExecutor + MemoryDataSet), so plain-Python execution gives
identical numerics, just slower.
"""
__version__ = "0.0-shim"

from . import typed  # noqa: F401


def njit(*args, **kwargs):
    if args and callable(args[0]):
        return args[0]

    def wrapper(fn):
        return fn

    return wrapper


jit = njit
prange = range
_num_threads = 1


def get_num_threads():
    return _num_threads


def set_num_threads(n):
    global _num_threads
    _num_threads = int(n)
