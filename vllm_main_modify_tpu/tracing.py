"""OpenTelemetry request tracing.

Reference: vllm/tracing.py (:17-60) + per-request span emission in
output_processor.py:482. Spans carry queue/prefill/decode timing
attributes; created only when an OTLP endpoint is configured.
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger(__name__)

# Span attribute names (reference: vllm/tracing.py SpanAttributes)
ATTR_MODEL = "gen_ai.request.model"
ATTR_REQUEST_ID = "gen_ai.request.id"
ATTR_TEMPERATURE = "gen_ai.request.temperature"
ATTR_TOP_P = "gen_ai.request.top_p"
ATTR_MAX_TOKENS = "gen_ai.request.max_tokens"
ATTR_PROMPT_TOKENS = "gen_ai.usage.prompt_tokens"
ATTR_COMPLETION_TOKENS = "gen_ai.usage.completion_tokens"
ATTR_TIME_IN_QUEUE = "gen_ai.latency.time_in_queue"
ATTR_TTFT = "gen_ai.latency.time_to_first_token"
ATTR_E2E = "gen_ai.latency.e2e"

TRACE_HEADERS = ["traceparent", "tracestate"]


def is_otel_available() -> bool:
    try:
        import opentelemetry  # noqa: F401

        return True
    except ImportError:
        return False


def init_tracer(service_name: str,
                otlp_endpoint: Optional[str]):
    """Tracer for per-request spans, or None when disabled."""
    if not otlp_endpoint or not is_otel_available():
        return None
    try:
        from opentelemetry import trace
        from opentelemetry.exporter.otlp.proto.grpc.trace_exporter \
            import OTLPSpanExporter
        from opentelemetry.sdk.resources import Resource
        from opentelemetry.sdk.trace import TracerProvider
        from opentelemetry.sdk.trace.export import BatchSpanProcessor

        provider = TracerProvider(
            resource=Resource.create({"service.name": service_name}))
        provider.add_span_processor(
            BatchSpanProcessor(OTLPSpanExporter(
                endpoint=otlp_endpoint)))
        return provider.get_tracer("vllm_main_modify_tpu")
    except Exception:  # noqa: BLE001
        logger.exception("failed to initialize OTLP tracer")
        return None


def extract_trace_context(headers: Optional[dict]):
    """Propagate inbound HTTP trace headers (reference:
    vllm/tracing.py extract_trace_context)."""
    if not headers or not is_otel_available():
        return None
    try:
        from opentelemetry.trace.propagation.tracecontext import \
            TraceContextTextMapPropagator

        return TraceContextTextMapPropagator().extract(headers)
    except Exception:  # noqa: BLE001
        return None


def emit_request_span(tracer, model: str, request_id: str, metrics,
                      params=None,
                      trace_headers: Optional[dict] = None) -> None:
    """One span per finished request with timing attributes
    (reference: output_processor.py do_tracing :482)."""
    if tracer is None or metrics is None:
        return
    try:
        ctx = extract_trace_context(trace_headers)
        arrival_ns = int(metrics.arrival_time * 1e9)
        with tracer.start_as_current_span(
                "llm_request", context=ctx,
                start_time=arrival_ns) as span:
            span.set_attribute(ATTR_MODEL, model)
            span.set_attribute(ATTR_REQUEST_ID, request_id)
            span.set_attribute(ATTR_PROMPT_TOKENS,
                               metrics.num_prompt_tokens)
            span.set_attribute(ATTR_COMPLETION_TOKENS,
                               metrics.num_generation_tokens)
            if params is not None:
                span.set_attribute(ATTR_TEMPERATURE, params.temperature)
                span.set_attribute(ATTR_TOP_P, params.top_p)
                if params.max_tokens:
                    span.set_attribute(ATTR_MAX_TOKENS,
                                       params.max_tokens)
            if metrics.first_scheduled_time:
                span.set_attribute(
                    ATTR_TIME_IN_QUEUE,
                    metrics.first_scheduled_time - metrics.arrival_time)
            if metrics.ttft is not None:
                span.set_attribute(ATTR_TTFT, metrics.ttft)
            if metrics.e2e_latency is not None:
                span.set_attribute(ATTR_E2E, metrics.e2e_latency)
    except Exception:  # noqa: BLE001
        logger.exception("span emission failed")
