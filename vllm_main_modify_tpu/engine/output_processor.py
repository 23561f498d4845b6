"""Frontend output processing: EngineCoreOutputs → RequestOutputs.

Reference: vllm/v1/engine/output_processor.py — ``OutputProcessor``
(:301) holds per-request frontend state (``RequestState`` :80):
incremental detokenization, stop-string truncation (the engine core
checks stop *tokens*; stop *strings* are text-level and live here),
logprob decoration, and RequestOutput assembly for streaming or final
delivery.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

from vllm_main_modify_tpu.engine.detokenizer import make_detokenizer
from vllm_main_modify_tpu.engine.types import (EngineCoreOutput,
                                               EngineCoreRequest,
                                               FinishReason)
from vllm_main_modify_tpu.outputs import (CompletionOutput,
                                          PoolingRequestOutput,
                                          RequestMetrics, RequestOutput)
from vllm_main_modify_tpu.sampling_params import (RequestOutputKind,
                                                  SamplingParams)


class ParentState:
    """Aggregation of an n>1 fan-out (reference:
    vllm/v1/engine/parallel_sampling.py ``ParentRequest``)."""

    def __init__(self, parent_id: str, n: int) -> None:
        self.parent_id = parent_id
        self.n = n
        self.finished: dict[int, CompletionOutput] = {}
        self.prompt = None
        self.prompt_token_ids: list[int] = []


class RequestState:

    def __init__(self, request: EngineCoreRequest, tokenizer) -> None:
        self.request_id = request.request_id
        self.prompt = request.prompt
        self.prompt_token_ids = request.prompt_token_ids
        params = request.sampling_params or SamplingParams()
        self.params = params
        self.output_kind = params.output_kind
        self.detokenizer = (make_detokenizer(tokenizer, params)
                            if tokenizer is not None else None)
        self.logprobs: list = []  # accumulated LogprobsDict
        self.prompt_logprobs: Optional[list] = None
        self.num_tokens_sent = 0  # for DELTA streaming
        self.text_sent = 0
        self.all_token_ids: list[int] = []
        self.metrics = RequestMetrics(
            arrival_time=request.arrival_time,
            num_prompt_tokens=len(request.prompt_token_ids))
        # n>1 fan-out bookkeeping
        self.parent_id: Optional[str] = None
        self.index = 0


@dataclass
class OutputProcessorResult:
    request_outputs: list[RequestOutput] = field(default_factory=list)
    reqs_to_abort: list[str] = field(default_factory=list)


class OutputProcessor:

    def __init__(self, tokenizer) -> None:
        self.tokenizer = tokenizer
        self.states: dict[str, RequestState] = {}
        self.parents: dict[str, ParentState] = {}

    def add_request(self, request: EngineCoreRequest,
                    parent_id: Optional[str] = None, index: int = 0,
                    parent_n: int = 1) -> None:
        state = RequestState(request, self.tokenizer)
        if parent_id is not None:
            state.parent_id = parent_id
            state.index = index
            parent = self.parents.get(parent_id)
            if parent is None:
                parent = ParentState(parent_id, parent_n)
                parent.prompt = request.prompt
                parent.prompt_token_ids = request.prompt_token_ids
                self.parents[parent_id] = parent
        self.states[request.request_id] = state

    def abort_requests(self, request_ids) -> None:
        for rid in request_ids:
            self.states.pop(rid, None)

    def process_outputs(
            self,
            outputs: list[EngineCoreOutput]) -> OutputProcessorResult:
        result = OutputProcessorResult()
        now = time.monotonic()
        for out in outputs:
            state = self.states.get(out.request_id)
            if state is None:
                continue  # aborted
            if out.pooling_output is not None:
                # embedding request: single terminal output
                result.request_outputs.append(
                    PoolingRequestOutput(
                        request_id=out.request_id,
                        data=out.pooling_output,
                        prompt_token_ids=state.prompt_token_ids))
                self.states.pop(out.request_id, None)
                continue
            if state.metrics.first_token_time is None and \
                    out.new_token_ids:
                state.metrics.first_token_time = now

            stop_str = None
            new_token_ids = out.new_token_ids
            state.all_token_ids.extend(new_token_ids)
            state.metrics.num_generation_tokens += len(new_token_ids)
            if state.detokenizer is not None:
                stop_str = state.detokenizer.update(new_token_ids)

            finish_reason = out.finish_reason
            stop_reason = out.stop_reason
            if stop_str is not None:
                # stop string hit: finish even if core didn't stop it
                finish_reason = finish_reason or FinishReason.STOP
                stop_reason = stop_str
                if not out.finished:
                    result.reqs_to_abort.append(out.request_id)

            if out.new_logprobs:
                self._decorate_logprobs(out.new_logprobs, state)
                state.logprobs.extend(out.new_logprobs)
            if out.new_prompt_logprobs:
                # arrives once, on the step that finishes the prompt
                # (reference: prompt_logprobs in RequestOutput; first
                # entry is None — no logprob for position 0)
                self._decorate_logprobs(
                    [d for d in out.new_prompt_logprobs if d], state)
                state.prompt_logprobs = list(out.new_prompt_logprobs)

            finished = finish_reason is not None
            if finished:
                state.metrics.finished_time = now
                state.metrics.num_cached_tokens = out.num_cached_tokens
            ro = self._make_request_output(state, finish_reason,
                                           stop_reason, finished,
                                           out.num_cached_tokens)
            if ro is not None:
                if state.parent_id is not None:
                    ro = self._fold_into_parent(state, ro, finished)
                if ro is not None:
                    result.request_outputs.append(ro)
            if finished:
                self.states.pop(out.request_id, None)
        return result

    def _fold_into_parent(self, state: RequestState,
                          ro: RequestOutput, finished: bool):
        """Re-tag child outputs under the parent id; emit the combined
        final output once every child finished."""
        parent = self.parents[state.parent_id]
        ro.request_id = parent.parent_id
        for co in ro.outputs:
            co.index = state.index
        if not finished:
            return ro  # streaming partials pass through, re-tagged
        parent.finished[state.index] = ro.outputs[0]
        if len(parent.finished) < parent.n:
            return None
        self.parents.pop(parent.parent_id, None)
        return RequestOutput(
            request_id=parent.parent_id,
            prompt=parent.prompt,
            prompt_token_ids=parent.prompt_token_ids,
            outputs=[
                parent.finished[i] for i in range(parent.n)
            ],
            finished=True,
            metrics=ro.metrics,
        )

    def _decorate_logprobs(self, logprobs_dicts, state) -> None:
        if self.tokenizer is None:
            return
        for d in logprobs_dicts:
            for tid, lp in d.items():
                if lp.decoded_token is None:
                    lp.decoded_token = self.tokenizer.decode([tid])

    def _make_request_output(self, state: RequestState, finish_reason,
                             stop_reason, finished: bool,
                             num_cached_tokens: int):
        kind = state.output_kind
        if kind == RequestOutputKind.FINAL_ONLY and not finished:
            return None

        if state.detokenizer is not None:
            full_text = state.detokenizer.output_text
        else:
            full_text = ""

        delta = kind == RequestOutputKind.DELTA
        if delta:
            text = full_text[state.text_sent:]
            token_ids = state.all_token_ids[state.num_tokens_sent:]
            logprobs = state.logprobs[state.num_tokens_sent:] \
                if state.logprobs else None
            state.text_sent = len(full_text)
            state.num_tokens_sent = len(state.all_token_ids)
        else:
            text = full_text
            token_ids = list(state.all_token_ids)
            logprobs = list(state.logprobs) if state.logprobs else None

        co = CompletionOutput(
            index=0,
            text=text,
            token_ids=token_ids,
            logprobs=logprobs,
            finish_reason=str(finish_reason) if finished else None,
            stop_reason=stop_reason,
        )
        return RequestOutput(
            request_id=state.request_id,
            prompt=state.prompt,
            prompt_token_ids=state.prompt_token_ids,
            prompt_logprobs=state.prompt_logprobs,
            outputs=[co],
            finished=finished,
            num_cached_tokens=num_cached_tokens,
            metrics=state.metrics,
        )
