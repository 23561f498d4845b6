"""Scheduler→runner wire format.

Reference: vllm/v1/core/sched/output.py — ``NewRequestData``,
``CachedRequestData``, ``SchedulerOutput`` (:166 area). In the TPU build
this stays in-process (single-controller engine), but the types remain a
clean serialization boundary for the multi-host fan-out path
(SURVEY.md §7 step 10).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class NewRequestData:
    """Full state for a request the runner has never seen."""

    req_id: str
    prompt_token_ids: list[int]
    sampling_params: object  # SamplingParams
    block_ids: list[int]
    num_computed_tokens: int
    lora_name: Optional[str] = None
    lora_path: Optional[str] = None
    pooling_params: Optional[object] = None
    mm_inputs: Optional[list] = None

    @classmethod
    def from_request(cls, request, block_ids: list[int]) -> \
            "NewRequestData":
        return cls(
            req_id=request.request_id,
            prompt_token_ids=request.prompt_token_ids,
            sampling_params=request.sampling_params,
            block_ids=block_ids,
            num_computed_tokens=request.num_computed_tokens,
            mm_inputs=getattr(request, "mm_inputs", None),
            lora_name=request.lora_name,
            lora_path=getattr(request, "lora_path", None),
            pooling_params=request.pooling_params,
        )


@dataclass
class CachedRequestData:
    """Delta updates for requests already resident in the runner's
    persistent batch (struct-of-lists, one entry per request)."""

    req_ids: list[str] = field(default_factory=list)
    # resumed from preemption: runner must re-init, not delta-update
    resumed_from_preemption: list[bool] = field(default_factory=list)
    # token ids the scheduler appended that the runner hasn't seen
    # (non-empty only on resume or after spec-decode correction)
    new_token_ids: list[list[int]] = field(default_factory=list)
    # newly allocated block ids (appended to the runner's table)
    new_block_ids: list[Optional[list[int]]] = field(default_factory=list)
    num_computed_tokens: list[int] = field(default_factory=list)

    @property
    def num_reqs(self) -> int:
        return len(self.req_ids)


@dataclass
class SchedulerOutput:
    scheduled_new_reqs: list[NewRequestData] = field(default_factory=list)
    scheduled_cached_reqs: CachedRequestData = field(
        default_factory=CachedRequestData)
    # req_id -> tokens to compute this step
    num_scheduled_tokens: dict[str, int] = field(default_factory=dict)
    total_num_scheduled_tokens: int = 0
    # req_id -> spec token ids scheduled for verification this step
    scheduled_spec_decode_tokens: dict[str, list[int]] = field(
        default_factory=dict)
    # cascade attention: pages shared by every scheduled request
    num_common_prefix_pages: int = 0
    # requests finished/aborted since last step (runner must evict)
    finished_req_ids: set[str] = field(default_factory=set)
    # structured output: row-packed bitmask over the vocab + row map
    grammar_bitmask: Optional[np.ndarray] = None
    structured_output_request_ids: dict[str, int] = field(
        default_factory=dict)
    # host-RAM KV offload ops (kv_offload/manager.py):
    # save = snapshot these device blocks to host before the step;
    # load = restore host data into these freshly allocated blocks
    kv_save_blocks: list = field(default_factory=list)  # (hash, id)
    kv_load_blocks: list = field(default_factory=list)  # (hash, id)
    # multi-step decode: >1 means every scheduled request is in steady
    # decode and was scheduled exactly this many tokens, to be produced
    # by one K-iteration device dispatch (scan with on-device token
    # chaining). num_scheduled_tokens[rid] == num_decode_steps for all.
    num_decode_steps: int = 1

    @property
    def num_scheduled_reqs(self) -> int:
        return len(self.num_scheduled_tokens)
