"""Prometheus metrics exposition.

Reference: vllm/v1/metrics/prometheus.py + loggers.py
``PrometheusStatLogger`` (:153) — gauges/counters/histograms labelled
by model, rendered at /metrics. The engine-core thread updates
``last_stats``; rendering samples it on scrape.
"""

from __future__ import annotations

from typing import Optional

from prometheus_client import (CollectorRegistry, Counter, Gauge,
                               Histogram, generate_latest)


class PrometheusMetrics:

    def __init__(self, engine) -> None:
        self.engine = engine
        self.registry = CollectorRegistry()
        model = engine.config.model_config.model
        labels = {"model_name": model}
        self._labels = labels

        def gauge(name, doc):
            return Gauge(name, doc, list(labels), registry=self.registry)

        def counter(name, doc):
            return Counter(name, doc, list(labels),
                           registry=self.registry)

        self.num_running = gauge("vllm:num_requests_running",
                                 "Running requests")
        self.num_waiting = gauge("vllm:num_requests_waiting",
                                 "Waiting requests")
        self.kv_usage = gauge("vllm:gpu_cache_usage_perc",
                              "KV-cache usage fraction")
        self.prefix_hits = gauge("vllm:prefix_cache_hits_total",
                                 "Prefix cache hit tokens")
        self.prefix_queries = gauge("vllm:prefix_cache_queries_total",
                                    "Prefix cache queried tokens")
        self.preemptions = gauge("vllm:num_preemptions_total",
                                 "Cumulative preemptions")
        self.spec_drafts = gauge("vllm:spec_decode_num_draft_tokens",
                                 "Cumulative draft tokens")
        self.spec_accepted = gauge(
            "vllm:spec_decode_num_accepted_tokens",
            "Cumulative accepted draft tokens")
        self.generation_tokens = counter(
            "vllm:generation_tokens_total", "Generated tokens")
        self.ttft = Histogram(
            "vllm:time_to_first_token_seconds", "TTFT",
            list(labels), registry=self.registry,
            buckets=[0.01, 0.05, 0.1, 0.25, 0.5, 1, 2.5, 5, 10, 30])
        self.e2e = Histogram(
            "vllm:e2e_request_latency_seconds", "E2E latency",
            list(labels), registry=self.registry,
            buckets=[0.1, 0.5, 1, 2.5, 5, 10, 30, 60, 120])

    def observe_finished(self, metrics) -> None:
        """Record a finished request's timings (called by the serving
        layer with outputs.RequestMetrics)."""
        if metrics is None:
            return
        if metrics.ttft is not None:
            self.ttft.labels(**self._labels).observe(metrics.ttft)
        if metrics.e2e_latency is not None:
            self.e2e.labels(**self._labels).observe(metrics.e2e_latency)
        self.generation_tokens.labels(**self._labels).inc(
            metrics.num_generation_tokens)

    def render(self) -> bytes:
        stats = self.engine.last_stats
        if stats is not None:
            lb = self._labels
            self.num_running.labels(**lb).set(stats.num_running_reqs)
            self.num_waiting.labels(**lb).set(stats.num_waiting_reqs)
            self.kv_usage.labels(**lb).set(stats.kv_cache_usage)
            self.prefix_hits.labels(**lb).set(stats.prefix_cache_hits)
            self.prefix_queries.labels(**lb).set(
                stats.prefix_cache_queries)
            self.preemptions.labels(**lb).set(stats.num_preempted_reqs)
            self.spec_drafts.labels(**lb).set(
                stats.spec_num_draft_tokens)
            self.spec_accepted.labels(**lb).set(
                stats.spec_num_accepted_tokens)
        return generate_latest(self.registry)
