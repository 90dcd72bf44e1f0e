"""Warning categories (reference: libertem/warnings.py)."""
import warnings


class UseDiscouragedWarning(FutureWarning):
    """Functionality that works but should be avoided."""


def emit_use_discouraged(msg: str):
    warnings.warn(msg, UseDiscouragedWarning, stacklevel=3)
