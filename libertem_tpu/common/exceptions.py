"""Common exception types
(reference: libertem/common/exceptions.py, common/executor.py:45).
"""


class UDFException(Exception):
    """Raised when a UDF is malformed or misused."""


class UDFRunCancelled(Exception):
    """A running UDF job was cancelled
    (reference: udf/base.py:2720)."""


class JobCancelledError(Exception):
    """The executor cancelled a job
    (reference: common/executor.py:45)."""


class ExecutorSpecException(Exception):
    """Invalid executor specification."""
