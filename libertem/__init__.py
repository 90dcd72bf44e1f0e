"""Import-compat namespace: ``import libertem...`` resolves to the
TPU-native implementation (``libertem_tpu``), so scripts and
notebooks written against the reference run WITHOUT an import swap
(see docs/migration.md for the few genuine behavior differences).

A meta-path finder maps every ``libertem.<submodule>`` to the
matching ``libertem_tpu`` module via a thin DELEGATING wrapper
(PEP 562 module ``__getattr__``) — never by handing the real module
to the import machinery, which would rename it and re-execute its
relative imports under the alias namespace.  The table below carries
the handful of paths whose layout differs.
"""
import importlib
import importlib.abc
import importlib.util
import sys

from libertem_tpu import __version__  # noqa: F401

# reference module path -> libertem_tpu module path, where the
# layouts differ; everything else maps 1:1
_EXPLICIT = {
    # corrections live under io/ here
    "libertem.corrections": "libertem_tpu.io.corrections",
    "libertem.corrections.corrset": "libertem_tpu.io.corrections",
    "libertem.corrections.detector": "libertem_tpu.io.corrections",
    "libertem.corrections.coordinates":
        "libertem_tpu.common.coordinates",
    # reference io/corrections is a package; ours is one module
    "libertem.io.corrections": "libertem_tpu.io.corrections",
    "libertem.io.corrections.corrset": "libertem_tpu.io.corrections",
    "libertem.io.corrections.detector":
        "libertem_tpu.io.corrections",
    # the executor interfaces live in executor/, not common/
    "libertem.common.executor": "libertem_tpu.executor.base",
    # MaskContainer lives with the masks UDF
    "libertem.common.container": "libertem_tpu.udf.masks",
    # reference udf-method constants live on UDF itself here
    "libertem.common.udf": "libertem_tpu.udf.base",
    # single-file DM loader is part of dm.py here
    "libertem.io.dataset.dm_single": "libertem_tpu.io.dataset.dm",
    # reference executor module names that collapsed (docs in
    # executor/compat.py)
    "libertem.executor.dask": "libertem_tpu.executor.compat",
    "libertem.executor.pipelined": "libertem_tpu.executor.compat",
    "libertem.executor.concurrent": "libertem_tpu.executor.compat",
    "libertem.executor.integration": "libertem_tpu.executor.compat",
}

# aliased to a plain MODULE on our side but a PACKAGE in the
# reference (children resolved via _EXPLICIT)
_FORCE_PACKAGE = {"libertem.corrections", "libertem.io.corrections"}


class _CompatFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    def find_spec(self, fullname, path=None, target=None):
        if not fullname.startswith("libertem."):
            return None
        target_name = _EXPLICIT.get(
            fullname, "libertem_tpu." + fullname[len("libertem."):]
        )
        try:
            real = importlib.import_module(target_name)
        except ImportError:
            return None
        spec = importlib.util.spec_from_loader(
            fullname, self, origin=getattr(real, "__file__", None),
            is_package=(
                hasattr(real, "__path__")
                or fullname in _FORCE_PACKAGE
            ),
        )
        spec._compat_real = real
        return spec

    def create_module(self, spec):
        return None  # default fresh module object

    def exec_module(self, module):
        real = module.__spec__._compat_real
        module.__doc__ = real.__doc__
        # PEP 562: attribute access falls through to the real module
        module.__dict__["__getattr__"] = (
            lambda name, _real=real: getattr(_real, name)
        )
        if hasattr(real, "__all__"):
            module.__dict__["__all__"] = real.__all__


sys.meta_path.append(_CompatFinder())

# the common top-level conveniences
from libertem_tpu import Context, masks  # noqa: E402,F401
