"""Tracing hooks (reference: libertem/common/tracing.py —
maybe_setup_tracing:17, setup_tracing:32 OTLP export,
attach_to_parent:85).

OpenTelemetry is optional; without it every API degrades to a no-op
so instrumented code paths carry zero overhead.
"""
from __future__ import annotations

import contextlib
import logging
import os

log = logging.getLogger(__name__)

_TRACER = None
_TRACING_ACTIVE = False


class _NoopSpan:
    def set_attribute(self, *a, **kw):
        pass

    def add_event(self, *a, **kw):
        pass

    def record_exception(self, *a, **kw):
        pass


class _NoopTracer:
    @contextlib.contextmanager
    def start_as_current_span(self, name, **kwargs):
        yield _NoopSpan()


def get_tracer(name: str = "libertem_tpu"):
    global _TRACER
    if _TRACER is not None:
        return _TRACER
    try:
        from opentelemetry import trace
        _TRACER = trace.get_tracer(name)
    except ImportError:
        _TRACER = _NoopTracer()
    return _TRACER


def maybe_setup_tracing(
    service_name: str, otlp_url: str | None = None
) -> bool:
    """Enable OTLP export when configured via
    LIBERTEM_TPU_TRACING_URL / argument and the opentelemetry SDK is
    installed; returns True when tracing is active."""
    url = otlp_url or os.environ.get("LIBERTEM_TPU_TRACING_URL")
    if not url:
        return False
    global _TRACING_ACTIVE
    if _TRACING_ACTIVE:
        # idempotent: every Context construction calls this
        return True
    try:
        from opentelemetry import trace
        from opentelemetry.exporter.otlp.proto.grpc.trace_exporter \
            import OTLPSpanExporter
        from opentelemetry.sdk.resources import Resource
        from opentelemetry.sdk.trace import TracerProvider
        from opentelemetry.sdk.trace.export import (
            BatchSpanProcessor,
        )
    except ImportError:
        log.warning(
            "tracing requested but opentelemetry is not installed"
        )
        return False
    provider = TracerProvider(resource=Resource.create({
        "service.name": service_name,
    }))
    provider.add_span_processor(
        BatchSpanProcessor(OTLPSpanExporter(endpoint=url))
    )
    trace.set_tracer_provider(provider)
    global _TRACER
    _TRACER = trace.get_tracer("libertem_tpu")
    _TRACING_ACTIVE = True
    return True
