"""Persistent batch state on the host (struct-of-arrays).

Reference: vllm/v1/worker/gpu_input_batch.py ``InputBatch`` — request
state lives in preallocated numpy arrays updated in place from
``SchedulerOutput`` deltas; per-step device inputs are vectorized slices
of these arrays. Rows are assigned to the lowest free index and
``condense()`` keeps occupied rows contiguous so padded device batches
are minimal.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from vllm_main_modify_tpu.core.sched.output import NewRequestData
from vllm_main_modify_tpu.sampling_params import SamplingParams


class CachedRequestState:
    """Host mirror of one request (reference: gpu_input_batch.py
    ``CachedRequestState``)."""

    __slots__ = ("req_id", "prompt_token_ids", "sampling_params",
                 "pooling_params", "block_ids", "num_computed_tokens",
                 "output_token_ids", "lora_name", "mm_inputs",
                 "mm_encoded")

    def __init__(self, new_req: NewRequestData) -> None:
        self.req_id = new_req.req_id
        self.prompt_token_ids = list(new_req.prompt_token_ids)
        self.sampling_params = new_req.sampling_params
        self.pooling_params = new_req.pooling_params
        bids = new_req.block_ids
        # hybrid KV groups ship a tuple of per-group id lists
        self.block_ids = (tuple(list(g) for g in bids)
                          if isinstance(bids, tuple) else list(bids))
        self.num_computed_tokens = new_req.num_computed_tokens
        self.output_token_ids: list[int] = []
        self.lora_name = new_req.lora_name
        self.mm_inputs = getattr(new_req, "mm_inputs", None)
        self.mm_encoded: set = set()  # indices already encoded

    @property
    def num_tokens(self) -> int:
        return len(self.prompt_token_ids) + len(self.output_token_ids)


class InputBatch:

    def __init__(self, max_num_reqs: int, max_model_len: int,
                 max_blocks_per_req: int,
                 num_kv_groups: int = 1) -> None:
        self.max_num_reqs = max_num_reqs
        self.max_model_len = max_model_len
        self.max_blocks_per_req = max_blocks_per_req
        # hybrid-attention models: groups 1..N-1 keep their own block
        # tables; scheduler block ids arrive as a tuple of per-group
        # lists (core/kv_cache_coordinator.py)
        self.num_kv_groups = num_kv_groups
        self.extra_block_tables = [
            np.zeros((max_num_reqs, max_blocks_per_req), dtype=np.int32)
            for _ in range(num_kv_groups - 1)
        ]
        self.extra_num_blocks = [
            np.zeros(max_num_reqs, dtype=np.int32)
            for _ in range(num_kv_groups - 1)
        ]

        # row assignment
        self.req_ids: list[Optional[str]] = [None] * max_num_reqs
        self.req_id_to_index: dict[str, int] = {}

        # token state: prompt + generated, one row per request
        self.token_ids = np.zeros((max_num_reqs, max_model_len),
                                  dtype=np.int32)
        self.num_tokens = np.zeros(max_num_reqs, dtype=np.int32)
        self.num_prompt_tokens = np.zeros(max_num_reqs, dtype=np.int32)
        self.num_computed_tokens = np.zeros(max_num_reqs, dtype=np.int32)

        # paged-KV block table
        self.block_table = np.zeros((max_num_reqs, max_blocks_per_req),
                                    dtype=np.int32)
        self.num_blocks = np.zeros(max_num_reqs, dtype=np.int32)

        # sampling knobs
        self.temperature = np.zeros(max_num_reqs, dtype=np.float32)
        self.top_k = np.zeros(max_num_reqs, dtype=np.int32)
        self.top_p = np.ones(max_num_reqs, dtype=np.float32)
        self.min_p = np.zeros(max_num_reqs, dtype=np.float32)
        self.seeds = np.zeros(max_num_reqs, dtype=np.uint32)
        self.num_logprobs = np.zeros(max_num_reqs, dtype=np.int32)
        self.num_prompt_logprobs = np.zeros(max_num_reqs,
                                            dtype=np.int32)
        # multi-LoRA: adapter slot per request (0 = none)
        self.lora_slots = np.zeros(max_num_reqs, dtype=np.int32)
        # penalties (reference: vllm/v1/sample/ops/penalties.py)
        self.presence_penalties = np.zeros(max_num_reqs,
                                           dtype=np.float32)
        self.frequency_penalties = np.zeros(max_num_reqs,
                                            dtype=np.float32)
        self.repetition_penalties = np.ones(max_num_reqs,
                                            dtype=np.float32)
        # sparse extras, host objects per row
        self.logit_bias: list = [None] * max_num_reqs
        self.allowed_token_ids: list = [None] * max_num_reqs
        self.bad_words_ids: list = [None] * max_num_reqs

        self.greedy_reqs: set[str] = set()
        self.random_reqs: set[str] = set()
        self.top_k_reqs: set[str] = set()
        self.top_p_reqs: set[str] = set()
        self.min_p_reqs: set[str] = set()
        self.penalty_reqs: set[str] = set()
        self.logit_bias_reqs: set[str] = set()
        self.word_mask_reqs: set[str] = set()  # allowed/bad words

    # ------------------------------------------------------------------

    @property
    def num_reqs(self) -> int:
        return len(self.req_id_to_index)

    def add_request(self, state: CachedRequestState,
                    row: Optional[int] = None) -> int:
        if row is None:
            row = self.num_reqs  # rows are kept condensed
        assert row < self.max_num_reqs
        req_id = state.req_id
        self.req_ids[row] = req_id
        self.req_id_to_index[req_id] = row

        n_prompt = len(state.prompt_token_ids)
        n = state.num_tokens
        self.token_ids[row, :n_prompt] = state.prompt_token_ids
        if state.output_token_ids:
            self.token_ids[row, n_prompt:n] = state.output_token_ids
        self.num_tokens[row] = n
        self.num_prompt_tokens[row] = n_prompt
        self.num_computed_tokens[row] = state.num_computed_tokens

        ids = state.block_ids
        if self.num_kv_groups > 1:
            assert isinstance(ids, tuple)
            for g in range(1, self.num_kv_groups):
                gids = ids[g]
                tbl = self.extra_block_tables[g - 1]
                tbl[row, :len(gids)] = gids
                tbl[row, len(gids):] = 0
                self.extra_num_blocks[g - 1][row] = len(gids)
            ids = ids[0]
        nb = len(ids)
        self.block_table[row, :nb] = ids
        self.block_table[row, nb:] = 0
        self.num_blocks[row] = nb

        sp: SamplingParams = state.sampling_params
        if sp is None:
            sp = SamplingParams(max_tokens=1, temperature=0.0)
        if sp.temperature is None or sp.temperature <= 0.0:
            self.temperature[row] = -1.0
            self.greedy_reqs.add(req_id)
            self.random_reqs.discard(req_id)
        else:
            self.temperature[row] = sp.temperature
            self.random_reqs.add(req_id)
            self.greedy_reqs.discard(req_id)
        top_k = sp.top_k if sp.top_k is not None and sp.top_k > 0 else 0
        self.top_k[row] = top_k
        if top_k > 0:
            self.top_k_reqs.add(req_id)
        else:
            self.top_k_reqs.discard(req_id)
        self.top_p[row] = sp.top_p if sp.top_p is not None else 1.0
        if self.top_p[row] < 1.0:
            self.top_p_reqs.add(req_id)
        else:
            self.top_p_reqs.discard(req_id)
        self.min_p[row] = sp.min_p or 0.0
        if self.min_p[row] > 0.0:
            self.min_p_reqs.add(req_id)
        else:
            self.min_p_reqs.discard(req_id)
        self.seeds[row] = np.uint32((sp.seed if sp.seed is not None else
                                     hash(req_id)) & 0xFFFFFFFF)
        self.num_logprobs[row] = sp.logprobs or 0
        self.num_prompt_logprobs[row] = sp.prompt_logprobs or 0
        self.lora_slots[row] = 0  # runner sets the slot when enabled

        self.presence_penalties[row] = sp.presence_penalty or 0.0
        self.frequency_penalties[row] = sp.frequency_penalty or 0.0
        self.repetition_penalties[row] = sp.repetition_penalty or 1.0
        if (self.presence_penalties[row] != 0.0
                or self.frequency_penalties[row] != 0.0
                or self.repetition_penalties[row] != 1.0):
            self.penalty_reqs.add(req_id)
        else:
            self.penalty_reqs.discard(req_id)
        self.logit_bias[row] = sp.logit_bias or None
        if sp.logit_bias:
            self.logit_bias_reqs.add(req_id)
        else:
            self.logit_bias_reqs.discard(req_id)
        self.allowed_token_ids[row] = sp.allowed_token_ids or None
        bad = (sp.extra_args or {}).get("bad_words_token_ids")
        self.bad_words_ids[row] = bad or None
        if sp.allowed_token_ids or bad:
            self.word_mask_reqs.add(req_id)
        else:
            self.word_mask_reqs.discard(req_id)
        return row

    def remove_request(self, req_id: str) -> Optional[int]:
        row = self.req_id_to_index.pop(req_id, None)
        if row is None:
            return None
        self.req_ids[row] = None
        for s in (self.greedy_reqs, self.random_reqs, self.top_k_reqs,
                  self.top_p_reqs, self.min_p_reqs, self.penalty_reqs,
                  self.logit_bias_reqs, self.word_mask_reqs):
            s.discard(req_id)
        return row

    def condense(self) -> None:
        """Move highest-index occupied rows into freed low rows so rows
        [0, num_reqs) are exactly the live requests (reference:
        gpu_input_batch.py:580 ``condense``)."""
        n = self.num_reqs
        if n == 0:
            return
        # collect empty rows below n
        empty = [i for i in range(n) if self.req_ids[i] is None]
        last = self.max_num_reqs - 1
        for dst in empty:
            while last >= n and self.req_ids[last] is None:
                last -= 1
            if last < n:
                break
            src = last
            req_id = self.req_ids[src]
            self.req_ids[dst] = req_id
            self.req_ids[src] = None
            self.req_id_to_index[req_id] = dst
            for arr in (self.token_ids, self.block_table,
                        *self.extra_block_tables):
                arr[dst] = arr[src]
            for arr in self.extra_num_blocks:
                arr[dst] = arr[src]
            for arr in (self.num_tokens, self.num_prompt_tokens,
                        self.num_computed_tokens, self.num_blocks,
                        self.temperature, self.top_k, self.top_p,
                        self.min_p, self.seeds, self.num_logprobs,
                        self.num_prompt_logprobs,
                        self.lora_slots, self.presence_penalties,
                        self.frequency_penalties,
                        self.repetition_penalties):
                arr[dst] = arr[src]
            for lst in (self.logit_bias, self.allowed_token_ids,
                        self.bad_words_ids):
                lst[dst] = lst[src]
                lst[src] = None
            last -= 1

    def append_block_ids(self, row: int, new_block_ids,
                         replace: bool = False) -> None:
        if self.num_kv_groups > 1:
            assert isinstance(new_block_ids, tuple)
            for g in range(1, self.num_kv_groups):
                gids = new_block_ids[g]
                tbl = self.extra_block_tables[g - 1]
                cnt = self.extra_num_blocks[g - 1]
                if replace:
                    cnt[row] = 0
                    tbl[row, :] = 0
                tbl[row, cnt[row]:cnt[row] + len(gids)] = gids
                cnt[row] += len(gids)
            new_block_ids = new_block_ids[0]
        if replace:
            self.num_blocks[row] = 0
            self.block_table[row, :] = 0
        nb = self.num_blocks[row]
        self.block_table[row, nb:nb + len(new_block_ids)] = new_block_ids
        self.num_blocks[row] = nb + len(new_block_ids)

    def append_token_id(self, row: int, token_id: int) -> None:
        n = self.num_tokens[row]
        if n < self.max_model_len:
            self.token_ids[row, n] = token_id
            self.num_tokens[row] = n + 1
