from . import dm, mrc  # noqa: F401
