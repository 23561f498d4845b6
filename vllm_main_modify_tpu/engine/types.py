"""Engine-core wire types.

Reference: vllm/v1/engine/__init__.py — ``EngineCoreRequest``,
``EngineCoreOutput``, ``EngineCoreOutputs``, ``FinishReason``. These are
the boundary between the scheduler-side engine core and the
tokenize/detokenize frontend.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional

from vllm_main_modify_tpu.outputs import LogprobsDict
from vllm_main_modify_tpu.sampling_params import (PoolingParams,
                                                  SamplingParams)


class FinishReason(enum.IntEnum):
    STOP = 0
    LENGTH = 1
    ABORT = 2

    def __str__(self) -> str:
        return ("stop", "length", "abort")[self.value]


@dataclass
class EngineCoreRequest:
    request_id: str
    prompt_token_ids: list[int]
    sampling_params: Optional[SamplingParams]
    pooling_params: Optional[PoolingParams] = None
    eos_token_id: Optional[int] = None
    arrival_time: float = 0.0
    priority: int = 0
    cache_salt: Optional[str] = None
    client_index: int = 0
    lora_name: Optional[str] = None
    lora_path: Optional[str] = None
    prompt: Optional[str] = None  # original text, kept for outputs
    trace_headers: Optional[dict[str, str]] = None
    # multimodal: [{"pixel_values": np [3,S,S] f32, "offset": int,
    #               "num_tokens": int}] per image, offsets into the
    # (already placeholder-expanded) prompt_token_ids
    mm_inputs: Optional[list] = None


@dataclass
class EngineCoreOutput:
    request_id: str
    new_token_ids: list[int]
    finish_reason: Optional[FinishReason] = None
    stop_reason: Optional[object] = None
    new_logprobs: Optional[LogprobsDict] = None
    new_prompt_logprobs: Optional[LogprobsDict] = None
    num_cached_tokens: int = 0
    pooling_output: Optional[object] = None
    events: list[tuple[str, float]] = field(default_factory=list)

    @property
    def finished(self) -> bool:
        return self.finish_reason is not None


@dataclass
class SchedulerStats:
    """Per-step engine stats (reference: vllm/v1/metrics/stats.py:36)."""

    num_running_reqs: int = 0
    num_waiting_reqs: int = 0
    kv_cache_usage: float = 0.0
    prefix_cache_queries: int = 0
    prefix_cache_hits: int = 0
    num_preempted_reqs: int = 0
    num_corrupted_reqs: int = 0
    spec_num_draft_tokens: int = 0
    spec_num_accepted_tokens: int = 0


@dataclass
class EngineCoreOutputs:
    outputs: list[EngineCoreOutput] = field(default_factory=list)
    scheduler_stats: Optional[SchedulerStats] = None
    timestamp: float = 0.0
