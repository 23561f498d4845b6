"""Continuous-batching scheduler.

Behavioral parity with the reference V1 scheduler
(vllm/v1/core/sched/scheduler.py): a single unified token-budget loop
with **no prefill/decode phase distinction** — every scheduled request
simply catches its ``num_computed_tokens`` up toward
``num_tokens_with_spec`` (reference :180-189). Covers chunked prefill
(:431-439), prefix-cache hits (:384), preemption of the
last/lowest-priority running request (:266-295), speculative-token
trimming (:304-313), structured-output FSM-wait (:359-366), and
optimistic ``num_computed_tokens`` advancement after scheduling
(reference ``_update_after_schedule``) with spec-rejection rollback in
``update_from_output`` (:905-914).

TPU-specific notes: the scheduler is pure host Python and runs in the
same process as the runner (single-controller GSPMD design, SURVEY.md
§7); the runner pads its output to static shapes, so this class never
sees device arrays.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Optional

from vllm_main_modify_tpu.config import EngineConfig
from vllm_main_modify_tpu.core.kv_cache_manager import (KVCacheBlocks,
                                                        KVCacheManager)
from vllm_main_modify_tpu.core.request import Request, RequestStatus
from vllm_main_modify_tpu.core.sched.output import (CachedRequestData,
                                                    NewRequestData,
                                                    SchedulerOutput)
from vllm_main_modify_tpu.core.sched.request_queue import \
    create_request_queue
from vllm_main_modify_tpu.core.sched.utils import check_stop, remove_all
from vllm_main_modify_tpu.engine.types import (EngineCoreOutput,
                                               EngineCoreOutputs,
                                               SchedulerStats)
from vllm_main_modify_tpu.worker.outputs import ModelRunnerOutput


class Scheduler:

    def __init__(
        self,
        config: EngineConfig,
        num_kv_blocks: int,
        structured_output_manager=None,
        kv_event_callback=None,
        offload_index=None,
        kv_groups=None,
        num_blocks_per_group=None,
    ) -> None:
        sched_cfg = config.scheduler_config
        cache_cfg = config.cache_config
        self.config = config
        self.max_num_scheduled_tokens = sched_cfg.max_num_batched_tokens
        self.max_num_running_reqs = sched_cfg.max_num_seqs
        self.max_model_len = sched_cfg.max_model_len
        self.enable_chunked_prefill = sched_cfg.enable_chunked_prefill
        self.long_prefill_token_threshold = \
            sched_cfg.long_prefill_token_threshold
        # bidirectional mm spans (Gemma3): a prefill chunk must never
        # end INSIDE an image block — its tokens attend to each other,
        # so the whole block has to enter the KV in one step (set by
        # EngineCore from the model's bidir_mm_spans flag)
        self.mm_span_align = False
        # cascade attention hint (set by EngineCore when the runner
        # can consume it)
        self.enable_cascade = False
        # prefix-LM (PaliGemma): the WHOLE prompt is one bidirectional
        # span; _trim_to_mm_boundary refuses partial-prompt chunks
        self.prefix_lm = False
        self.max_encoder_tokens = \
            sched_cfg.max_num_encoder_input_tokens
        # distinct-adapter cap per batch: the runner has max_loras
        # device slots, so a step must never need more (reference:
        # scheduler.py:324-330 max_loras enforcement)
        lora_cfg = getattr(config, "lora_config", None)
        self.max_loras = (lora_cfg.max_loras if lora_cfg is not None
                          and lora_cfg.enable_lora else 0)
        self.num_lookahead_tokens = sched_cfg.num_lookahead_tokens
        self.policy = sched_cfg.policy
        self.block_size = cache_cfg.block_size
        # multi-step decode (see SchedulerConfig). The engine may
        # force this to 1 for model classes the runner's scan path
        # does not cover (enc-dec, multimodal, LoRA, spec decode).
        self.decode_steps_per_dispatch = max(
            sched_cfg.num_decode_steps_per_dispatch, 1)
        if self.num_lookahead_tokens > 0:
            self.decode_steps_per_dispatch = 1

        # host-RAM KV offload: evicted device blocks snapshot to host
        # and extend future prefix-cache hits (kv_offload/manager.py)
        self.offload_index = offload_index
        self._step_kv_saves: list = []
        self._ext_event_callback = kv_event_callback

        if kv_groups is not None and len(kv_groups) > 1:
            # hybrid-attention model: per-group managers behind the
            # same surface (core/kv_cache_coordinator.py). Prefix
            # caching + host offload are off in this mode.
            from vllm_main_modify_tpu.core.kv_cache_coordinator import \
                KVCacheCoordinator

            self.kv_cache_manager = KVCacheCoordinator(
                kv_groups, num_blocks_per_group,
                block_size=cache_cfg.block_size,
                max_model_len=sched_cfg.max_model_len)
            self.offload_index = None
        elif kv_groups is not None and kv_groups[0].num_layers == 0:
            # encoder-only models (BERT family): no KV at all
            from vllm_main_modify_tpu.core.kv_cache_coordinator import \
                NullGroupManager

            self.kv_cache_manager = NullGroupManager()
            self.offload_index = None
        else:
            self.kv_cache_manager = KVCacheManager(
                block_size=cache_cfg.block_size,
                num_blocks=num_kv_blocks,
                max_model_len=sched_cfg.max_model_len,
                enable_caching=cache_cfg.enable_prefix_caching,
                event_callback=self._on_kv_event,
            )
        self.structured_output_manager = structured_output_manager

        self.requests: dict[str, Request] = {}
        self.waiting = create_request_queue(self.policy)
        self.running: list[Request] = []
        # finished between steps; shipped to runner so it evicts batch rows
        self.finished_req_ids: set[str] = set()
        # cumulative counters
        self.num_preempted_reqs_total = 0
        self.spec_num_draft_tokens_total = 0
        self.spec_num_accepted_tokens_total = 0

    # ------------------------------------------------------------------
    # request lifecycle
    # ------------------------------------------------------------------

    def _on_kv_event(self, kind: str, block_id: int,
                     block_hash) -> None:
        if kind == "block_removed" and self.offload_index is not None:
            self.offload_index.add(block_hash)
            self._step_kv_saves.append((block_hash, block_id))
        if self._ext_event_callback is not None:
            self._ext_event_callback(kind, block_id, block_hash)

    def add_request(self, request: Request) -> None:
        self.requests[request.request_id] = request
        if request.status == RequestStatus.WAITING_FOR_FSM:
            # grammar may still be compiling; schedule loop will poll
            pass
        self.waiting.add_request(request)
        request.record_event("queued")

    def finish_requests(self, request_ids, status: RequestStatus) -> None:
        """External finish (abort). Reference: scheduler.py:1105."""
        if isinstance(request_ids, str):
            request_ids = (request_ids, )
        running_to_remove: set[Request] = set()
        waiting_to_remove: set[Request] = set()
        for rid in request_ids:
            request = self.requests.get(rid)
            if request is None or request.is_finished:
                continue
            if request.status == RequestStatus.RUNNING:
                running_to_remove.add(request)
            else:
                waiting_to_remove.add(request)
            request.status = status
            self._free_request(request)
        if running_to_remove:
            self.running = remove_all(self.running, running_to_remove)
        if waiting_to_remove:
            self.waiting.remove_requests(waiting_to_remove)

    def _free_request(self, request: Request) -> None:
        assert request.is_finished
        if self.structured_output_manager is not None:
            self.structured_output_manager.remove_request(request)
        self.kv_cache_manager.free(request)
        self.finished_req_ids.add(request.request_id)
        del self.requests[request.request_id]

    # ------------------------------------------------------------------
    # schedule
    # ------------------------------------------------------------------

    def _trim_to_mm_boundary(self, request, n: int,
                             base: Optional[int] = None) -> int:
        """Shrink a prefill chunk so it never ENDS inside a
        bidirectional image block (Gemma3): either stop right before
        the block or cover it whole. Returns 0 when the block cannot
        even start within this step's budget."""
        if n <= 0:
            return n
        start = request.num_computed_tokens if base is None else base
        end = start + n
        if self.prefix_lm:
            # PaliGemma-style prefix-LM: the ENTIRE prompt is one
            # bidirectional span — never schedule a partial prompt
            # (even via long_prefill_token_threshold).
            if start >= request.num_prompt_tokens or \
                    end >= request.num_prompt_tokens:
                return n  # decode, or chunk covers the prompt end
            if start == 0:
                return 0  # budget can't cover the prompt: wait
            # resuming mid-prompt (shouldn't happen once ingest
            # rejects oversize prompts); recover by finishing it
            return request.num_prompt_tokens - start
        if not self.mm_span_align or \
                not getattr(request, "mm_inputs", None):
            return n
        if end >= request.num_prompt_tokens:
            return n  # chunk reaches past the prompt: nothing split
        for mm in request.mm_inputs:
            lo = int(mm["offset"])
            hi = lo + int(mm["num_tokens"])
            if start <= lo < end < hi:
                return lo - start  # stop before the block (may be 0)
            if lo < start < hi:
                # resuming inside a block (shouldn't happen once
                # alignment is on; recover by finishing the block)
                return max(n, hi - start)
        return n

    def _trim_to_encoder_budget(self, request, base: int, n: int,
                                budget: int) -> tuple[int, int]:
        """Per-step encoder budget (reference: scheduler.py:711-831 +
        encoder_cache_manager budget): an image whose block STARTS
        inside this chunk is encoded this step; stop the chunk before
        the first image that exceeds the remaining budget. Returns
        (trimmed n, encoder tokens charged)."""
        mm = getattr(request, "mm_inputs", None)
        if not mm or n <= 0 or self.max_encoder_tokens <= 0:
            return n, 0
        used = 0
        for m in sorted(mm, key=lambda m: int(m.get("offset", -1))):
            lo = int(m.get("offset", -1))
            if lo < base or lo >= base + n:
                continue  # encoded earlier / not reached / audio(-1)
            cost = int(m["num_tokens"])
            if used + cost > budget:
                n = lo - base
                break
            used += cost
        return n, used

    def _eligible_decode_steps(self, token_budget: int) -> int:
        """How many decode iterations one dispatch may run (1 = the
        normal single-step path).

        Eligible only when every running request needs exactly one new
        token (steady decode) and uses no feature that requires host
        intervention between tokens (grammar FSM advance, logprobs,
        penalties, logit bias, token masks, pooling). Waiting requests
        must be blocked by the seq limit anyway, so admission is
        delayed by at most K steps.
        """
        k = self.decode_steps_per_dispatch
        if k <= 1 or not self.running:
            return 1
        if self.waiting and \
                len(self.running) < self.max_num_running_reqs:
            return 1
        if 0 < self.long_prefill_token_threshold < k:
            k = self.long_prefill_token_threshold
        k = min(k, token_budget // len(self.running))
        # clamp the chunk to the most any request can still produce
        # (max_tokens cap, counting in-flight placeholders) — without
        # this, the async pipeline schedules whole chunks past every
        # request's stop and the device burns K iterations per overrun
        max_remaining = 0
        for request in self.running:
            sp = request.sampling_params
            if sp is None or sp.max_tokens is None:
                max_remaining = k
                break
            max_remaining = max(
                max_remaining,
                sp.max_tokens - request.num_output_tokens -
                request.num_output_placeholders)
        k = min(k, max(max_remaining, 1))
        for request in self.running:
            num_new = (request.num_tokens_with_spec +
                       request.num_output_placeholders -
                       request.num_computed_tokens)
            if num_new != 1 or request.spec_token_ids:
                return 1
            if request.pooling_params is not None or \
                    request.use_structured_output:
                return 1
            sp = request.sampling_params
            if sp is None:
                return 1
            if (sp.logprobs is not None
                    or sp.prompt_logprobs is not None
                    or sp.logit_bias or sp.allowed_token_ids
                    or (sp.presence_penalty or 0.0) != 0.0
                    or (sp.frequency_penalty or 0.0) != 0.0
                    or (sp.repetition_penalty or 1.0) != 1.0
                    or (sp.extra_args or {}).get(
                        "bad_words_token_ids")):
                return 1
            # stay inside the model context for the whole chunk
            k = min(k, self.max_model_len - 1 -
                    request.num_computed_tokens)
        return max(k, 1)

    def schedule(self) -> SchedulerOutput:
        scheduled_new_reqs: list[Request] = []
        scheduled_resumed_reqs: list[Request] = []
        scheduled_running_reqs: list[Request] = []
        preempted_this_step: set[Request] = set()

        req_to_new_blocks: dict[str, KVCacheBlocks] = {}
        num_scheduled_tokens: dict[str, int] = {}
        spec_decode_tokens: dict[str, list[int]] = {}
        token_budget = self.max_num_scheduled_tokens
        # per-step encoder budget (reference: scheduler.py:711-831)
        encoder_budget = self.max_encoder_tokens or (1 << 62)

        # ---- multi-step decode eligibility (pre-pass) ----------------
        # When every running request is in steady single-token decode
        # (and no waiting request could be admitted anyway), schedule K
        # tokens per request to be produced by ONE K-iteration device
        # dispatch. Keeps exact stop semantics: tokens sampled past a
        # stop are discarded in update_from_output, same as spec decode.
        decode_steps = self._eligible_decode_steps(token_budget)

        # ---- pass 1: running requests --------------------------------
        req_index = 0
        while req_index < len(self.running) and token_budget > 0:
            request = self.running[req_index]
            num_new_tokens = (request.num_tokens_with_spec +
                              request.num_output_placeholders -
                              request.num_computed_tokens)
            if decode_steps > 1:
                num_new_tokens = decode_steps
            if (0 < self.long_prefill_token_threshold < num_new_tokens):
                num_new_tokens = self.long_prefill_token_threshold
            num_new_tokens = min(num_new_tokens, token_budget)
            # never run off the end of the model context
            num_new_tokens = min(
                num_new_tokens,
                self.max_model_len - 1 - request.num_computed_tokens)
            num_new_tokens = self._trim_to_mm_boundary(
                request, num_new_tokens)
            num_new_tokens, enc_used = self._trim_to_encoder_budget(
                request, request.num_computed_tokens, num_new_tokens,
                encoder_budget)
            if num_new_tokens <= 0:
                # async-scheduling placeholder already in flight, or
                # the next image block waits for encoder budget
                req_index += 1
                continue
            encoder_budget -= enc_used

            # allocate, preempting victims from the tail on pressure
            while True:
                new_blocks = self.kv_cache_manager.allocate_slots(
                    request,
                    num_new_tokens,
                    num_lookahead_tokens=self.num_lookahead_tokens)
                if new_blocks is not None:
                    break
                victim = self._choose_preemption_victim()
                self._preempt(victim)
                preempted_this_step.add(victim)
                if victim is request:
                    break
            if request in preempted_this_step:
                # the request itself was evicted; nothing more fits
                break

            scheduled_running_reqs.append(request)
            req_to_new_blocks[request.request_id] = new_blocks
            num_scheduled_tokens[request.request_id] = num_new_tokens
            token_budget -= num_new_tokens

            # speculative tokens scheduled for verification: trim any
            # that fell past the budget clamp (reference :304-313)
            if request.spec_token_ids:
                num_scheduled_spec = (num_new_tokens +
                                      request.num_computed_tokens -
                                      request.num_tokens)
                if num_scheduled_spec < len(request.spec_token_ids):
                    del request.spec_token_ids[max(num_scheduled_spec, 0):]
                if request.spec_token_ids:
                    spec_decode_tokens[request.request_id] = (
                        request.spec_token_ids)
            req_index += 1

        # ---- pass 2: waiting requests ---------------------------------
        self._step_kv_loads: list = []
        skipped: list[Request] = []
        if not preempted_this_step:
            while self.waiting and token_budget > 0:
                if len(self.running) >= self.max_num_running_reqs:
                    break
                request = self.waiting.peek_request()

                if request.status == RequestStatus.WAITING_FOR_FSM:
                    som = self.structured_output_manager
                    if som is not None and not som.grammar_ready(request):
                        self.waiting.pop_request()
                        skipped.append(request)
                        continue
                    request.status = RequestStatus.WAITING

                if self.max_loras and request.lora_name is not None:
                    # admitting this adapter must not exceed the
                    # runner's device slots for the running batch
                    active = {r.lora_name
                              for r in self.running
                              if r.lora_name is not None}
                    if request.lora_name not in active and \
                            len(active) >= self.max_loras:
                        self.waiting.pop_request()
                        skipped.append(request)
                        continue

                # prefix-cache lookup only on first-ever scheduling.
                # prompt_logprobs needs logits at EVERY prompt position,
                # so cached-prefix skipping is disabled for those
                # requests (reference: vllm/v1/core/sched/scheduler.py
                # prompt_logprobs prefix-cache carve-out)
                new_computed_blocks = KVCacheBlocks()
                num_new_local_computed = 0
                restore_hashes: list = []
                wants_prompt_lp = (
                    request.sampling_params is not None
                    and request.sampling_params.prompt_logprobs
                    is not None)
                if request.num_computed_tokens == 0 and \
                        not wants_prompt_lp:
                    new_computed_blocks, num_new_local_computed = (
                        self.kv_cache_manager.get_computed_blocks(request))
                    # extend the device hit with host-offloaded blocks
                    if self.offload_index is not None:
                        start = len(new_computed_blocks.blocks)
                        hashes = request.block_hashes
                        while (start + len(restore_hashes) <
                               len(hashes)
                               and (start + len(restore_hashes) + 1) *
                               self.block_size <
                               request.num_prompt_tokens
                               and self.offload_index.has(
                                   hashes[start + len(restore_hashes)])):
                            h = hashes[start + len(restore_hashes)]
                            self.offload_index.touch(h)
                            restore_hashes.append(h)
                num_restored_tokens = (len(restore_hashes) *
                                       self.block_size)
                num_computed_tokens = (request.num_computed_tokens +
                                       num_new_local_computed +
                                       num_restored_tokens)

                num_new_tokens = request.num_tokens - num_computed_tokens
                if (0 < self.long_prefill_token_threshold <
                        num_new_tokens):
                    num_new_tokens = self.long_prefill_token_threshold
                if num_new_tokens > token_budget:
                    if not self.enable_chunked_prefill:
                        break
                    num_new_tokens = token_budget
                num_new_tokens = self._trim_to_mm_boundary(
                    request, num_new_tokens,
                    base=num_computed_tokens)
                num_new_tokens, enc_used = \
                    self._trim_to_encoder_budget(
                        request, num_computed_tokens, num_new_tokens,
                        encoder_budget)
                if num_new_tokens <= 0:
                    break  # image block doesn't fit this step's budget
                encoder_budget -= enc_used

                new_blocks = self.kv_cache_manager.allocate_slots(
                    request,
                    num_new_tokens,
                    num_new_computed_tokens=(num_new_local_computed +
                                             num_restored_tokens),
                    new_computed_blocks=new_computed_blocks,
                    num_lookahead_tokens=self.num_lookahead_tokens)
                if new_blocks is None:
                    break  # out of pages
                if restore_hashes:
                    # the restored blocks are the first new allocations
                    ids = new_blocks.get_block_ids()
                    self._step_kv_loads.extend(
                        zip(restore_hashes,
                            ids[:len(restore_hashes)]))

                self.waiting.pop_request()
                if request.status == RequestStatus.PREEMPTED:
                    scheduled_resumed_reqs.append(request)
                else:
                    scheduled_new_reqs.append(request)
                    request.record_event("scheduled")
                    if request.first_scheduled_time is None:
                        request.first_scheduled_time = time.monotonic()
                request.status = RequestStatus.RUNNING
                request.num_computed_tokens = num_computed_tokens
                if request.num_cached_tokens < 0:
                    request.num_cached_tokens = num_computed_tokens
                self.running.append(request)
                req_to_new_blocks[request.request_id] = (
                    new_computed_blocks + new_blocks)
                num_scheduled_tokens[request.request_id] = num_new_tokens
                token_budget -= num_new_tokens
        # put FSM-skipped requests back in order
        for r in reversed(skipped):
            self.waiting.prepend_request(r)

        total = sum(num_scheduled_tokens.values())
        assert total <= self.max_num_scheduled_tokens
        assert token_budget >= 0

        # cascade-attention hint (reference: num_common_prefix_blocks,
        # gpu_model_runner.py:1293): pages shared at the front of
        # EVERY scheduled request's block table, capped so all query
        # positions lie strictly past them. The runner turns this
        # into a two-pass shared-prefix read (one gather of the
        # common pages for the whole batch + LSE merge).
        num_common_prefix_pages = 0
        if self.enable_cascade and len(num_scheduled_tokens) >= 2:
            sched = [self.requests[rid]
                     for rid in num_scheduled_tokens]
            n = self.kv_cache_manager.get_num_common_prefix_blocks(
                sched)
            min_computed = min(r.num_computed_tokens for r in sched)
            num_common_prefix_pages = min(
                n, min_computed // self.block_size)

        # grammar bitmask for structured-output requests
        grammar_bitmask = None
        structured_output_request_ids: dict[str, int] = {}
        if self.structured_output_manager is not None:
            structured_output_request_ids, grammar_bitmask = (
                self.structured_output_manager.grammar_bitmask(
                    self.requests, num_scheduled_tokens,
                    spec_decode_tokens))

        scheduler_output = SchedulerOutput(
            scheduled_new_reqs=[
                NewRequestData.from_request(
                    r, req_to_new_blocks[r.request_id].get_block_ids())
                for r in scheduled_new_reqs
            ],
            scheduled_cached_reqs=self._make_cached_request_data(
                scheduled_running_reqs, scheduled_resumed_reqs,
                num_scheduled_tokens, spec_decode_tokens,
                req_to_new_blocks),
            num_scheduled_tokens=num_scheduled_tokens,
            total_num_scheduled_tokens=total,
            scheduled_spec_decode_tokens=spec_decode_tokens,
            finished_req_ids=self.finished_req_ids,
            grammar_bitmask=grammar_bitmask,
            structured_output_request_ids=structured_output_request_ids,
            kv_save_blocks=self._step_kv_saves,
            kv_load_blocks=self._step_kv_loads,
            num_decode_steps=decode_steps,
            num_common_prefix_pages=num_common_prefix_pages,
        )
        self._step_kv_saves = []
        self._step_kv_loads = []
        self._update_after_schedule(scheduler_output)
        return scheduler_output

    def _update_after_schedule(self,
                               scheduler_output: SchedulerOutput) -> None:
        # Optimistically advance num_computed_tokens so the next schedule
        # call can keep chunk-prefilling; spec rejections roll it back in
        # update_from_output (reference _update_after_schedule).
        for req_id, n in scheduler_output.num_scheduled_tokens.items():
            self.requests[req_id].num_computed_tokens += n
        self.finished_req_ids = set()

    def _make_cached_request_data(
        self,
        running_reqs: list[Request],
        resumed_reqs: list[Request],
        num_scheduled_tokens: dict[str, int],
        spec_decode_tokens: dict[str, list[int]],
        req_to_new_blocks: dict[str, KVCacheBlocks],
    ) -> CachedRequestData:
        data = CachedRequestData()
        for is_resumed, reqs in ((False, running_reqs),
                                 (True, resumed_reqs)):
            for req in reqs:
                rid = req.request_id
                data.req_ids.append(rid)
                data.resumed_from_preemption.append(is_resumed)
                if is_resumed:
                    # runner must re-learn all tokens beyond the prompt
                    toks = req.all_token_ids[req.num_prompt_tokens:]
                else:
                    # tokens the runner hasn't cached yet (spec case) are
                    # delivered via sampled ids; nothing extra here
                    toks = []
                data.new_token_ids.append(toks)
                data.new_block_ids.append(
                    req_to_new_blocks[rid].get_block_ids() or None)
                data.num_computed_tokens.append(req.num_computed_tokens)
        return data

    def _choose_preemption_victim(self) -> Request:
        if self.policy == "priority":
            return max(self.running,
                       key=lambda r: (r.priority, r.arrival_time))
        return self.running[-1]

    def _preempt(self, request: Request) -> None:
        if self.policy == "priority":
            self.running.remove(request)
        else:
            assert self.running[-1] is request
            self.running.pop()
        self.kv_cache_manager.free(request)
        request.status = RequestStatus.PREEMPTED
        request.num_computed_tokens = 0
        request.num_preemptions += 1
        self.num_preempted_reqs_total += 1
        request.spec_token_ids.clear()
        # num_output_placeholders is intentionally NOT reset: under
        # async scheduling the preempted request's dispatched step(s)
        # are still in flight and WILL land their sampled tokens at
        # update_from_output (valid outputs — sampled from complete
        # pre-preemption KV state), decrementing the pending count.
        # Zeroing here drove the count negative on landing (found by
        # the 8B quantized serving bench under KV pressure).
        request.record_event("preempted")
        self.waiting.prepend_request(request)

    # ------------------------------------------------------------------
    # update from execution results
    # ------------------------------------------------------------------

    def update_from_output(
        self,
        scheduler_output: SchedulerOutput,
        model_runner_output: ModelRunnerOutput,
    ) -> EngineCoreOutputs:
        sampled = model_runner_output.sampled_token_ids
        logprobs = model_runner_output.logprobs
        outputs: list[EngineCoreOutput] = []
        stopped_running: set[Request] = set()
        stopped_preempted: set[Request] = set()
        spec_drafts = 0
        spec_accepted = 0

        for req_id, num_tokens_scheduled in \
                scheduler_output.num_scheduled_tokens.items():
            request = self.requests.get(req_id)
            if request is None:
                continue  # aborted mid-flight
            req_index = model_runner_output.req_id_to_index[req_id]
            generated = sampled[req_index] if sampled else []

            scheduled_spec = (
                scheduler_output.scheduled_spec_decode_tokens.get(req_id))
            if scheduled_spec:
                num_draft = len(scheduled_spec)
                num_accepted = len(generated) - 1
                num_rejected = num_draft - num_accepted
                request.num_computed_tokens -= num_rejected
                request.num_accepted_spec_tokens += num_accepted
                request.num_proposed_spec_tokens += num_draft
                spec_drafts += num_draft
                spec_accepted += num_accepted
            request.spec_token_ids.clear()

            stopped = False
            new_token_ids = generated
            status_before = request.status
            if new_token_ids:
                new_token_ids, stopped = self._append_and_check_stop(
                    request, new_token_ids)

            pooler_output = None
            if model_runner_output.pooler_output is not None:
                pooler_output = model_runner_output.pooler_output.get(
                    req_id)
                if pooler_output is not None:
                    stopped = check_stop(request, self.max_model_len,
                                         pooler_output)

            if stopped:
                if status_before == RequestStatus.RUNNING:
                    stopped_running.add(request)
                else:
                    stopped_preempted.add(request)
                self._free_request(request)

            new_logprobs = None
            if (request.sampling_params is not None
                    and request.sampling_params.logprobs is not None
                    and logprobs is not None and new_token_ids):
                new_logprobs = self._make_logprobs_dict(
                    logprobs, req_index, len(new_token_ids),
                    request.sampling_params.logprobs)

            if (new_token_ids and self.structured_output_manager is not None
                    and self.structured_output_manager.should_advance(
                        request)):
                request.structured_output_request.grammar.accept_tokens(
                    req_id, new_token_ids)

            # accept next step's draft tokens
            if model_runner_output.draft_token_ids is not None \
                    and not stopped:
                drafts = model_runner_output.draft_token_ids[req_index]
                if drafts:
                    request.spec_token_ids = list(drafts)

            prompt_lp = model_runner_output.prompt_logprobs_dict.get(
                req_id)
            if new_token_ids or pooler_output is not None:
                outputs.append(
                    EngineCoreOutput(
                        request_id=req_id,
                        new_token_ids=new_token_ids,
                        finish_reason=_to_finish_reason(request),
                        stop_reason=request.stop_reason,
                        new_logprobs=new_logprobs,
                        new_prompt_logprobs=prompt_lp,
                        pooling_output=pooler_output,
                        num_cached_tokens=max(request.num_cached_tokens,
                                              0),
                        events=list(request.events),
                    ))
                request.events.clear()

        if stopped_running:
            self.running = remove_all(self.running, stopped_running)
        if stopped_preempted:
            self.waiting.remove_requests(stopped_preempted)

        self.spec_num_draft_tokens_total += spec_drafts
        self.spec_num_accepted_tokens_total += spec_accepted
        stats = SchedulerStats(
            num_running_reqs=len(self.running),
            num_waiting_reqs=len(self.waiting),
            kv_cache_usage=self.kv_cache_manager.usage,
            prefix_cache_queries=self.kv_cache_manager.
            prefix_cache_queries,
            prefix_cache_hits=self.kv_cache_manager.prefix_cache_hits,
            num_preempted_reqs=self.num_preempted_reqs_total,
            spec_num_draft_tokens=spec_drafts,
            spec_num_accepted_tokens=spec_accepted,
        )
        return EngineCoreOutputs(outputs=outputs,
                                 scheduler_stats=stats,
                                 timestamp=time.monotonic())

    def _append_and_check_stop(
            self, request: Request,
            new_token_ids: list[int]) -> tuple[list[int], bool]:
        stopped = False
        for num_new, tok in enumerate(new_token_ids, 1):
            request.append_output_token_ids(tok)
            stopped = check_stop(request, self.max_model_len)
            if stopped:
                # discard tokens sampled after the stop token
                new_token_ids = new_token_ids[:num_new]
                break
        return new_token_ids, stopped

    @staticmethod
    def _make_logprobs_dict(logprobs, req_index: int, num_new: int,
                            num_top: int):
        from vllm_main_modify_tpu.outputs import Logprob

        out = []
        # one row per emitted token (spec decode may accept several
        # per step; the runner packed a row for each — reference:
        # one logprob entry per accepted token)
        rows_ids = logprobs.logprob_token_ids[req_index]
        rows_lps = logprobs.logprobs[req_index]
        ranks = logprobs.sampled_token_ranks[req_index]
        for i in range(min(num_new, len(rows_ids))):
            entry = {}
            for j, (tid, lp) in enumerate(zip(rows_ids[i],
                                              rows_lps[i])):
                entry[int(tid)] = Logprob(
                    logprob=float(lp),
                    rank=int(ranks[i]) if j == 0 else j)
            out.append(entry)
        return out

    # ------------------------------------------------------------------
    # misc
    # ------------------------------------------------------------------

    def update_draft_token_ids(self, draft_token_ids) -> None:
        """Async draft handoff (reference: scheduler.py:1071)."""
        for req_id, drafts in zip(draft_token_ids.req_ids,
                                  draft_token_ids.draft_token_ids):
            request = self.requests.get(req_id)
            if request is None or request.is_finished:
                continue
            request.spec_token_ids = list(drafts)

    def get_num_unfinished_requests(self) -> int:
        return len(self.waiting) + len(self.running)

    def has_unfinished_requests(self) -> bool:
        return self.get_num_unfinished_requests() > 0

    def has_finished_requests(self) -> bool:
        return len(self.finished_req_ids) > 0

    def reset_prefix_cache(self) -> bool:
        return self.kv_cache_manager.reset_prefix_cache()

    def make_stats(self) -> SchedulerStats:
        return SchedulerStats(
            num_running_reqs=len(self.running),
            num_waiting_reqs=len(self.waiting),
            kv_cache_usage=self.kv_cache_manager.usage,
            num_preempted_reqs=self.num_preempted_reqs_total,
            spec_num_draft_tokens=self.spec_num_draft_tokens_total,
            spec_num_accepted_tokens=(
                self.spec_num_accepted_tokens_total),
        )


def _to_finish_reason(request: Request):
    from vllm_main_modify_tpu.engine.types import FinishReason

    reason = request.get_finished_reason()
    return {
        "stop": FinishReason.STOP,
        "length": FinishReason.LENGTH,
        "abort": FinishReason.ABORT,
        None: None,
    }[reason]
