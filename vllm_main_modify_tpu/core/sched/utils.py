"""Scheduler helpers (reference: vllm/v1/core/sched/utils.py)."""

from __future__ import annotations

import contextlib
from typing import Optional

from vllm_main_modify_tpu.core.request import Request, RequestStatus


def remove_all(lst: list, items_to_remove: set) -> list:
    if not items_to_remove:
        return lst
    if len(items_to_remove) == 1:
        item = next(iter(items_to_remove))
        with contextlib.suppress(ValueError):
            lst.remove(item)
        return lst
    return [item for item in lst if item not in items_to_remove]


def check_stop(request: Request,
               max_model_len: int,
               pooler_output=None) -> bool:
    """Token-level stop conditions (stop *strings* are the output
    processor's job, they need detokenized text)."""
    if (request.num_tokens >= max_model_len
            or request.num_output_tokens >= request.max_tokens):
        request.status = RequestStatus.FINISHED_LENGTH_CAPPED
        return True

    if request.pooling_params is not None:
        if pooler_output is not None:
            request.status = RequestStatus.FINISHED_STOPPED
            return True
        return False

    sp = request.sampling_params
    assert sp is not None
    # min_tokens: suppress EOS/stop-token stops until satisfied
    # (reference: min-tokens logits processor + stop check)
    if request.num_output_tokens < sp.min_tokens:
        return False
    last = request.output_token_ids[-1]
    if not sp.ignore_eos and last == request.eos_token_id:
        request.status = RequestStatus.FINISHED_STOPPED
        return True
    if last in (sp.stop_token_ids or ()):
        request.status = RequestStatus.FINISHED_STOPPED
        request.stop_reason = last
        return True
    return False
