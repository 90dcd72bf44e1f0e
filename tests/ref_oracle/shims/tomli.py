"""tomli shim over the stdlib tomllib (Python >= 3.11)."""
from tomllib import TOMLDecodeError, load, loads  # noqa: F401
