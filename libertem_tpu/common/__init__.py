"""Common core: geometry, buffers, scheduling, tracing.

Re-exports the reference's ``libertem.common`` top-level names
(reference common/__init__.py: Shape, Slice)."""
from .shape import Shape
from .slice import Slice, SliceUsageError

__all__ = ["Shape", "Slice", "SliceUsageError"]
