"""User-facing request outputs.

Reference: vllm/outputs.py (RequestOutput/CompletionOutput) and
vllm/v1/outputs.py (engine-internal ModelRunnerOutput and friends —
those live in worker/outputs.py here).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class Logprob:
    logprob: float
    rank: Optional[int] = None
    decoded_token: Optional[str] = None


# token position -> {token_id: Logprob}
LogprobsDict = list[dict[int, Logprob]]


@dataclass
class CompletionOutput:
    """One sampled completion (reference: vllm/outputs.py:24)."""

    index: int
    text: str
    token_ids: list[int]
    cumulative_logprob: Optional[float] = None
    logprobs: Optional[LogprobsDict] = None
    finish_reason: Optional[str] = None  # stop | length | abort
    stop_reason: Optional[object] = None  # stop string or token id

    @property
    def finished(self) -> bool:
        return self.finish_reason is not None


@dataclass
class RequestOutput:
    """Aggregated output for one request (reference: vllm/outputs.py:84)."""

    request_id: str
    prompt: Optional[str]
    prompt_token_ids: list[int]
    outputs: list[CompletionOutput]
    finished: bool = False
    prompt_logprobs: Optional[LogprobsDict] = None
    num_cached_tokens: int = 0
    metrics: Optional["RequestMetrics"] = None

    def add(self, other: "RequestOutput", aggregate: bool = True) -> None:
        """Merge a later chunk into this one (delta streaming)."""
        self.finished |= other.finished
        for co in other.outputs:
            mine = next((c for c in self.outputs if c.index == co.index),
                        None)
            if mine is None:
                self.outputs.append(co)
            elif aggregate:
                mine.text += co.text
                mine.token_ids.extend(co.token_ids)
                mine.finish_reason = co.finish_reason
                mine.stop_reason = co.stop_reason
                if co.logprobs is not None:
                    if mine.logprobs is None:
                        mine.logprobs = []
                    mine.logprobs.extend(co.logprobs)
            else:
                self.outputs[self.outputs.index(mine)] = co


@dataclass
class RequestMetrics:
    """Per-request timing (reference: vllm/v1/metrics/stats.py)."""

    arrival_time: float = 0.0
    first_scheduled_time: Optional[float] = None
    first_token_time: Optional[float] = None
    finished_time: Optional[float] = None
    num_prompt_tokens: int = 0
    num_generation_tokens: int = 0
    num_cached_tokens: int = 0

    @property
    def ttft(self) -> Optional[float]:
        if self.first_token_time is None:
            return None
        return self.first_token_time - self.arrival_time

    @property
    def e2e_latency(self) -> Optional[float]:
        if self.finished_time is None:
            return None
        return self.finished_time - self.arrival_time


@dataclass
class PoolingRequestOutput:
    """Output of an embedding/pooling request
    (reference: vllm/outputs.py PoolingRequestOutput)."""

    request_id: str
    data: object  # numpy array
    prompt_token_ids: list[int] = field(default_factory=list)
    finished: bool = True
