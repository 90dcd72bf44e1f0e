"""numba.cuda stand-in: reports no CUDA devices."""


class _GPUList(list):
    pass


gpus = _GPUList()


def is_available():
    return False


def list_devices():
    return []


class cudadrv:
    class error:
        class CudaSupportError(Exception):
            pass


class CudaSupportError(Exception):
    pass
