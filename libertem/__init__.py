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
import types

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
    # encode_image lives with the viz backends here
    "libertem.common.viz": "libertem_tpu.viz.base",
    # notebook-template helper (reference analysis/helper.py)
    "libertem.analysis.helper":
        "libertem_tpu.web.notebook_generator",
    # MaskContainer lives with the masks UDF
    "libertem.common.container": "libertem_tpu.udf.masks",
    # reference udf-method constants live on UDF itself here
    "libertem.common.udf": "libertem_tpu.udf.base",
    # single-file DM loader is part of dm.py here
    "libertem.io.dataset.dm_single": "libertem_tpu.io.dataset.dm",
    # reference io/dataset/base is a package; ours is one module,
    # with the decode protocol in a sibling
    "libertem.io.dataset.base.decode":
        "libertem_tpu.io.dataset.decode",
    "libertem.io.dataset.base.utils":
        "libertem_tpu.io.dataset.utils",
    "libertem.io.dataset.base.exceptions":
        "libertem_tpu.io.dataset.base",
    "libertem.io.dataset.base.tiling_scheme":
        "libertem_tpu.io.tiling",
    "libertem.io.dataset.base.backend":
        "libertem_tpu.io.dataset.base",
    # reference executor module names that collapsed (docs in
    # executor/compat.py)
    "libertem.executor.dask": "libertem_tpu.executor.compat",
    "libertem.executor.pipelined": "libertem_tpu.executor.compat",
    "libertem.executor.concurrent": "libertem_tpu.executor.compat",
    "libertem.executor.integration": "libertem_tpu.executor.compat",
    # reference io/writers/results is a package; ours is one module
    "libertem.io.writers.base": "libertem_tpu.io.writers",
    "libertem.io.writers.results": "libertem_tpu.io.writers",
    "libertem.io.writers.results.base": "libertem_tpu.io.writers",
    "libertem.io.writers.results.formats":
        "libertem_tpu.io.writers",
    # reference web/notebook_generator is a package
    "libertem.web.notebook_generator":
        "libertem_tpu.web.notebook_generator",
    "libertem.web.notebook_generator.notebook_generator":
        "libertem_tpu.web.notebook_generator",
    "libertem.web.notebook_generator.copy":
        "libertem_tpu.web.notebook_generator",
    # reference web/events.py names
    "libertem.web.events": "libertem_tpu.web.server",
    "libertem.web.connect": "libertem_tpu.web.server",
    "libertem.web.config": "libertem_tpu.web.server",
    "libertem.web.jobs": "libertem_tpu.web.server",
    "libertem.web.dataset": "libertem_tpu.web.server",
    "libertem.web.analysis": "libertem_tpu.web.server",
    "libertem.web.browse": "libertem_tpu.web.server",
    "libertem.web.shutdown": "libertem_tpu.web.server",
    "libertem.web.generator": "libertem_tpu.web.server",
}

# aliased to a plain MODULE on our side but a PACKAGE in the
# reference (children resolved via _EXPLICIT)
_FORCE_PACKAGE = {
    "libertem.corrections", "libertem.io.corrections",
    "libertem.io.dataset.base",
    "libertem.io.writers", "libertem.io.writers.results",
    "libertem.web.notebook_generator",
}


class _DelegatingModule(types.ModuleType):
    """Alias module forwarding attribute access — AND assignment — to
    the real module, so ``monkeypatch.setattr('libertem.x.y', ...)``
    patches the implementation the engine actually runs.  Dunder
    attributes (``__name__``, ``__spec__``, ...) stay local so the
    import machinery doesn't rename the real module."""

    def __init__(self, name, real):
        super().__init__(name, real.__doc__)
        object.__setattr__(self, "_compat_real", real)

    def __getattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            # never forward dunders: importlib must see the alias's
            # OWN (empty) __path__ etc. — forwarding the real
            # package's __path__ would let the file-system finder
            # re-execute submodules under the alias name
            raise AttributeError(name)
        return getattr(
            object.__getattribute__(self, "_compat_real"), name
        )

    def __setattr__(self, name, value):
        if name.startswith("__") and name.endswith("__"):
            object.__setattr__(self, name, value)
        else:
            setattr(
                object.__getattribute__(self, "_compat_real"),
                name, value,
            )

    def __delattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            object.__delattr__(self, name)
        else:
            delattr(
                object.__getattribute__(self, "_compat_real"), name
            )


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
        return _DelegatingModule(spec.name, spec._compat_real)

    def exec_module(self, module):
        real = module.__spec__._compat_real
        if hasattr(real, "__all__"):
            module.__dict__["__all__"] = real.__all__

    def get_code(self, fullname):
        """Support ``python -m libertem.<mod>`` (runpy asks the
        loader for code): compile the REAL module's source so its
        ``if __name__ == "__main__"`` block runs; relative imports
        resolve back through this finder via ``__package__``."""
        target_name = _EXPLICIT.get(
            fullname, "libertem_tpu." + fullname[len("libertem."):]
        )
        real = importlib.import_module(target_name)
        path = getattr(real, "__file__", None)
        if path is None:
            raise ImportError(f"no source for {fullname}")
        with open(path) as f:
            return compile(f.read(), path, "exec")


sys.meta_path.append(_CompatFinder())

# the common top-level conveniences
from libertem_tpu import Context, masks  # noqa: E402,F401
