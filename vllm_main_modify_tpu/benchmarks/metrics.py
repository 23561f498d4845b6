"""Serving-metric computation: TTFT / TPOT / ITL / E2EL.

Reference: vllm/benchmarks/serve.py:84-95 ``BenchmarkMetrics`` — mean,
median, std and configurable percentiles for each latency family,
plus request/token throughput.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class RequestRecord:
    prompt_tokens: int = 0
    output_tokens: int = 0
    start: float = 0.0
    first_token: Optional[float] = None
    end: Optional[float] = None
    # inter-token arrival times
    itls: list[float] = field(default_factory=list)


def _pct(values, percentiles):
    arr = np.asarray(values, dtype=np.float64)
    if arr.size == 0:
        return {}
    out = {
        "mean": float(arr.mean()),
        "median": float(np.median(arr)),
        "std": float(arr.std()),
    }
    for p in percentiles:
        out[f"p{p}"] = float(np.percentile(arr, p))
    return out


def compute_metrics(records: list[RequestRecord], duration: float,
                    percentiles=(50, 90, 99)) -> dict:
    done = [r for r in records if r.end is not None]
    ttfts = [
        r.first_token - r.start for r in done
        if r.first_token is not None
    ]
    e2els = [r.end - r.start for r in done]
    tpots = [(r.end - r.first_token) / max(r.output_tokens - 1, 1)
             for r in done if r.first_token is not None]
    itls = [itl for r in done for itl in r.itls]
    total_out = sum(r.output_tokens for r in done)
    total_in = sum(r.prompt_tokens for r in done)
    return {
        "completed": len(done),
        "duration_s": duration,
        "request_throughput": len(done) / duration if duration else 0,
        "output_token_throughput": total_out / duration
        if duration else 0,
        "total_token_throughput": (total_in + total_out) / duration
        if duration else 0,
        "ttft": _pct(ttfts, percentiles),
        "tpot": _pct(tpots, percentiles),
        "itl": _pct(itls, percentiles),
        "e2el": _pct(e2els, percentiles),
    }
