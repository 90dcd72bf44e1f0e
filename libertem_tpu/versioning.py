"""Version info (reference: libertem/versioning.py)."""
from . import __version__


def get_version() -> str:
    return __version__


def get_backend_versions() -> dict:
    import jax
    import jaxlib
    import numpy
    return {
        "libertem_tpu": __version__,
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "numpy": numpy.__version__,
    }
