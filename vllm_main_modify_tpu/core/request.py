"""Engine-internal per-request state.

Reference: vllm/v1/request.py — ``Request`` (:26), incremental
``block_hashes`` (:121), ``append_output_token_ids`` (:154),
``RequestStatus`` state machine (:209).
"""

from __future__ import annotations

import enum
import time
from typing import Any, Callable, Optional

from vllm_main_modify_tpu.core.kv_cache_utils import BlockHash
from vllm_main_modify_tpu.sampling_params import (PoolingParams,
                                                  SamplingParams)


class RequestStatus(enum.IntEnum):
    WAITING = 0
    WAITING_FOR_FSM = 1  # structured-output grammar still compiling
    WAITING_FOR_REMOTE_KVS = 2  # KV-connector async load in flight
    RUNNING = 3
    PREEMPTED = 4
    # anything >= FINISHED_STOPPED is terminal
    FINISHED_STOPPED = 5
    FINISHED_LENGTH_CAPPED = 6
    FINISHED_ABORTED = 7
    FINISHED_IGNORED = 8

    @staticmethod
    def is_finished(status: "RequestStatus") -> bool:
        return status >= RequestStatus.FINISHED_STOPPED

    @staticmethod
    def get_finished_reason(status: "RequestStatus") -> Optional[str]:
        return _FINISHED_REASONS.get(status)


_FINISHED_REASONS = {
    RequestStatus.FINISHED_STOPPED: "stop",
    RequestStatus.FINISHED_LENGTH_CAPPED: "length",
    RequestStatus.FINISHED_ABORTED: "abort",
    RequestStatus.FINISHED_IGNORED: "length",
}


class Request:

    def __init__(
        self,
        request_id: str,
        prompt_token_ids: list[int],
        sampling_params: Optional[SamplingParams],
        eos_token_id: Optional[int] = None,
        arrival_time: Optional[float] = None,
        block_hasher: Optional[Callable[["Request"],
                                        list[BlockHash]]] = None,
        pooling_params: Optional[PoolingParams] = None,
        cache_salt: Optional[str] = None,
        priority: int = 0,
        client_index: int = 0,
        prompt: Optional[str] = None,
        lora_name: Optional[str] = None,
        lora_path: Optional[str] = None,
        trace_headers: Optional[dict[str, str]] = None,
        mm_inputs: Optional[list] = None,
    ) -> None:
        self.request_id = request_id
        self.prompt = prompt
        self.prompt_token_ids = list(prompt_token_ids)
        self.num_prompt_tokens = len(self.prompt_token_ids)
        self.sampling_params = sampling_params
        self.pooling_params = pooling_params
        self.eos_token_id = eos_token_id
        self.arrival_time = arrival_time if arrival_time is not None \
            else time.monotonic()
        self.priority = priority
        self.client_index = client_index
        self.cache_salt = cache_salt
        self.lora_name = lora_name
        self.lora_path = lora_path
        self.trace_headers = trace_headers
        self.mm_inputs = mm_inputs

        self.status = RequestStatus.WAITING
        self.stop_reason: Optional[object] = None
        self.events: list[tuple[str, float]] = []

        if sampling_params is not None:
            self.max_tokens = sampling_params.max_tokens or 1
            if sampling_params.structured_outputs is not None:
                self.status = RequestStatus.WAITING_FOR_FSM
        else:
            self.max_tokens = 1  # pooling: single forward

        # all_token_ids = prompt + output, the canonical token view
        self._output_token_ids: list[int] = []
        self.all_token_ids: list[int] = list(self.prompt_token_ids)
        self.spec_token_ids: list[int] = []

        # scheduling progress
        self.num_computed_tokens = 0
        self.num_cached_tokens = -1  # prefix-cache hits, set on schedule
        self.num_preemptions = 0
        # async scheduling: sampled-but-not-yet-appended slots
        self.num_output_placeholders = 0
        # spec decode accounting
        self.num_accepted_spec_tokens = 0
        self.num_proposed_spec_tokens = 0

        # prefix-cache hash chain over full blocks
        self.block_hashes: list[BlockHash] = []
        self._block_hasher = block_hasher
        if block_hasher is not None:
            self.block_hashes.extend(block_hasher(self))

        # structured output FSM handle (set by StructuredOutputManager)
        self.structured_output_request: Optional[Any] = None

        self.first_scheduled_time: Optional[float] = None
        self.first_token_time: Optional[float] = None

    # --- token views -------------------------------------------------

    @property
    def output_token_ids(self) -> list[int]:
        return self._output_token_ids

    @property
    def num_tokens(self) -> int:
        return len(self.all_token_ids)

    @property
    def num_tokens_with_spec(self) -> int:
        return len(self.all_token_ids) + len(self.spec_token_ids)

    @property
    def num_output_tokens(self) -> int:
        return len(self._output_token_ids)

    def append_output_token_ids(self, token_ids) -> None:
        if isinstance(token_ids, int):
            token_ids = [token_ids]
        self._output_token_ids.extend(token_ids)
        self.all_token_ids.extend(token_ids)
        if self._block_hasher is not None:
            self.block_hashes.extend(self._block_hasher(self))

    # --- status ------------------------------------------------------

    @property
    def is_finished(self) -> bool:
        return RequestStatus.is_finished(self.status)

    def get_finished_reason(self) -> Optional[str]:
        return RequestStatus.get_finished_reason(self.status)

    @property
    def use_structured_output(self) -> bool:
        return (self.sampling_params is not None
                and self.sampling_params.structured_outputs is not None)

    def record_event(self, name: str) -> None:
        self.events.append((name, time.monotonic()))

    def __repr__(self) -> str:  # pragma: no cover
        return (f"Request(id={self.request_id}, status={self.status.name}, "
                f"computed={self.num_computed_tokens}/{self.num_tokens})")
