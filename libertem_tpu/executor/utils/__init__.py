"""Executor-side structural utilities
(reference: libertem/executor/utils/ — delayed_unpack flattens
nested result structures for graph schedulers)."""
from . import delayed_unpack  # noqa: F401
