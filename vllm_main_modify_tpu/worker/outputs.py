"""Runner→scheduler result types.

Reference: vllm/v1/outputs.py — ``ModelRunnerOutput`` (:74-147),
``LogprobsLists``, ``DraftTokenIds``. Everything here is host-side
(Python lists / numpy), produced after device→host transfer of sampled
ids; the runner keeps the transfer async so the scheduler never blocks
on the device.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class LogprobsLists:
    """Per-token top logprobs, token ids and the sampled token's rank."""

    # per request, per EMITTED token (spec decode may emit several
    # per step): [num_reqs][num_new][K+1], sampled/emitted token first
    logprob_token_ids: list[list[list[int]]]
    logprobs: list[list[list[float]]]
    sampled_token_ranks: list[list[int]]

    def slice_rows(self, start: int, end: int) -> "LogprobsLists":
        return LogprobsLists(self.logprob_token_ids[start:end],
                             self.logprobs[start:end],
                             self.sampled_token_ranks[start:end])


@dataclass
class ModelRunnerOutput:
    # request ids in batch order
    req_ids: list[str]
    # req_id -> row index in the lists below
    req_id_to_index: dict[str, int]
    # per request: the token ids sampled this step (>=1 with spec decode,
    # may be [] for partial-prefill chunks)
    sampled_token_ids: list[list[int]]
    logprobs: Optional[LogprobsLists] = None
    # req_id -> prompt logprobs arrays (token_ids, logprobs), or None
    prompt_logprobs_dict: dict[str, Optional[tuple]] = field(
        default_factory=dict)
    # spec decode: draft tokens proposed for the NEXT step, per request
    draft_token_ids: Optional[list[list[int]]] = None
    num_nans_in_logits: Optional[dict[str, int]] = None
    # pooling outputs (embedding models): req_id -> np.ndarray
    pooler_output: Optional[dict[str, np.ndarray]] = None


EMPTY_MODEL_RUNNER_OUTPUT = ModelRunnerOutput(req_ids=[],
                                              req_id_to_index={},
                                              sampled_token_ids=[])


@dataclass
class DraftTokenIds:
    """Async draft handoff (reference: vllm/v1/outputs.py DraftTokenIds)."""

    req_ids: list[str]
    draft_token_ids: list[list[int]]
