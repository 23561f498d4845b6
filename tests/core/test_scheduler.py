"""Scheduler unit tests with fabricated requests — the reference's
tests/v1/core/test_scheduler.py strategy: no model, assert on
SchedulerOutput and block bookkeeping."""

import pytest

from vllm_main_modify_tpu.config import (CacheConfig, EngineConfig,
                                         ModelConfig, SchedulerConfig)
from vllm_main_modify_tpu.core.kv_cache_utils import \
    get_request_block_hasher
from vllm_main_modify_tpu.core.request import Request, RequestStatus
from vllm_main_modify_tpu.core.sched.scheduler import Scheduler
from vllm_main_modify_tpu.sampling_params import SamplingParams
from vllm_main_modify_tpu.worker.outputs import ModelRunnerOutput

BLOCK = 4


def make_scheduler(num_blocks=100,
                   max_num_batched_tokens=64,
                   max_num_seqs=8,
                   max_model_len=128,
                   enable_prefix_caching=True,
                   num_lookahead_tokens=0):
    cfg = EngineConfig(
        model_config=ModelConfig(model="", max_model_len=max_model_len),
        cache_config=CacheConfig(block_size=BLOCK,
                                 enable_prefix_caching=enable_prefix_caching),
        scheduler_config=SchedulerConfig(
            max_num_batched_tokens=max_num_batched_tokens,
            max_num_seqs=max_num_seqs,
            max_model_len=max_model_len,
            num_lookahead_tokens=num_lookahead_tokens),
    )
    return Scheduler(cfg, num_kv_blocks=num_blocks)


_hasher = get_request_block_hasher(BLOCK)
_ctr = iter(range(10**9))


def make_request(num_prompt_tokens=10, max_tokens=16, prompt_offset=0,
                 **kw):
    rid = f"req-{next(_ctr)}"
    return Request(
        request_id=rid,
        prompt_token_ids=[prompt_offset + i for i in
                          range(num_prompt_tokens)],
        sampling_params=SamplingParams(max_tokens=max_tokens),
        eos_token_id=999999,
        block_hasher=_hasher,
        **kw,
    )


def run_step(sched, sampled_fn=lambda req: [100]):
    """schedule + fake execute + update."""
    out = sched.schedule()
    req_ids = list(out.num_scheduled_tokens)
    mro = ModelRunnerOutput(
        req_ids=req_ids,
        req_id_to_index={r: i for i, r in enumerate(req_ids)},
        sampled_token_ids=[
            sampled_fn(sched.requests[r]) if
            sched.requests[r].num_computed_tokens >=
            sched.requests[r].num_prompt_tokens else []
            for r in req_ids
        ],
    )
    eco = sched.update_from_output(out, mro)
    return out, eco


def test_basic_prefill_then_decode():
    sched = make_scheduler()
    req = make_request(num_prompt_tokens=10, max_tokens=3)
    sched.add_request(req)

    out, eco = run_step(sched)
    assert out.num_scheduled_tokens[req.request_id] == 10
    assert len(out.scheduled_new_reqs) == 1
    # prompt fully computed + 1 sampled token
    assert req.num_computed_tokens == 10
    assert req.num_output_tokens == 1

    out, eco = run_step(sched)
    assert out.num_scheduled_tokens[req.request_id] == 1
    assert out.scheduled_cached_reqs.num_reqs == 1
    assert req.num_output_tokens == 2

    out, eco = run_step(sched)
    assert req.is_finished  # max_tokens=3
    assert eco.outputs[0].finish_reason is not None
    assert sched.get_num_unfinished_requests() == 0
    # all blocks back
    assert sched.kv_cache_manager.block_pool.get_num_free_blocks() == 99


def test_chunked_prefill():
    sched = make_scheduler(max_num_batched_tokens=16)
    req = make_request(num_prompt_tokens=40)
    sched.add_request(req)

    out, _ = run_step(sched)
    assert out.num_scheduled_tokens[req.request_id] == 16
    assert req.num_output_tokens == 0  # partial prefill: no sample
    out, _ = run_step(sched)
    assert out.num_scheduled_tokens[req.request_id] == 16
    out, _ = run_step(sched)
    assert out.num_scheduled_tokens[req.request_id] == 8
    _, eco = run_step(sched)
    assert req.num_output_tokens >= 1


def test_token_budget_shared_across_requests():
    sched = make_scheduler(max_num_batched_tokens=16)
    r1 = make_request(num_prompt_tokens=10)
    r2 = make_request(num_prompt_tokens=10, prompt_offset=1000)
    sched.add_request(r1)
    sched.add_request(r2)
    out, _ = run_step(sched)
    assert out.num_scheduled_tokens[r1.request_id] == 10
    assert out.num_scheduled_tokens[r2.request_id] == 6  # chunked


def test_max_num_seqs_cap():
    sched = make_scheduler(max_num_seqs=2)
    reqs = [make_request(5, prompt_offset=i * 100) for i in range(4)]
    for r in reqs:
        sched.add_request(r)
    out, _ = run_step(sched)
    assert len(out.scheduled_new_reqs) == 2
    assert len(sched.waiting) == 2


def test_prefix_cache_hit():
    sched = make_scheduler()
    r1 = make_request(num_prompt_tokens=16, max_tokens=1)
    sched.add_request(r1)
    run_step(sched)
    assert r1.is_finished

    # identical prompt: blocks 0..2 hit (cap leaves last token to compute)
    r2 = make_request(num_prompt_tokens=16, max_tokens=1)
    sched.add_request(r2)
    out, _ = run_step(sched)
    assert r2.num_cached_tokens == 12
    assert out.num_scheduled_tokens[r2.request_id] == 4


def test_preemption_under_memory_pressure():
    # 10 usable blocks = 40 tokens of KV
    sched = make_scheduler(num_blocks=11, max_num_batched_tokens=64,
                           enable_prefix_caching=False)
    r1 = make_request(num_prompt_tokens=19, max_tokens=64)
    r2 = make_request(num_prompt_tokens=17, prompt_offset=100,
                      max_tokens=64)
    sched.add_request(r1)
    sched.add_request(r2)
    run_step(sched)  # both prefill: 5 + 5 blocks... r1:19→5 blocks, r2:17→5
    # decode until pool pressure forces preemption of r2 (the tail)
    for _ in range(8):
        run_step(sched)
        if r2.status == RequestStatus.PREEMPTED:
            break
    assert r2.status == RequestStatus.PREEMPTED
    assert r2.num_computed_tokens == 0
    assert r2 in list(sched.waiting)
    # r1 keeps decoding
    assert r1.status == RequestStatus.RUNNING


def test_preempted_request_resumes():
    sched = make_scheduler(num_blocks=11, enable_prefix_caching=False)
    r1 = make_request(num_prompt_tokens=19, max_tokens=6)
    r2 = make_request(num_prompt_tokens=17, prompt_offset=100,
                      max_tokens=4)
    sched.add_request(r1)
    sched.add_request(r2)
    for _ in range(30):
        run_step(sched)
        if not sched.has_unfinished_requests():
            break
    assert r1.is_finished and r2.is_finished
    assert r1.num_output_tokens == 6
    assert r2.num_output_tokens == 4
    assert sched.kv_cache_manager.block_pool.get_num_free_blocks() == 10


def test_stop_token():
    sched = make_scheduler()
    req = make_request(num_prompt_tokens=4, max_tokens=50)
    req.sampling_params.stop_token_ids = [777]
    sched.add_request(req)
    run_step(sched)  # prefill + first token (100)
    _, eco = run_step(sched, sampled_fn=lambda r: [777])
    assert req.is_finished
    assert req.stop_reason == 777
    assert eco.outputs[-1].finish_reason is not None


def test_eos_stop():
    sched = make_scheduler()
    req = make_request(num_prompt_tokens=4, max_tokens=50)
    sched.add_request(req)
    run_step(sched, sampled_fn=lambda r: [999999])  # eos immediately
    assert req.is_finished
    assert req.get_finished_reason() == "stop"


def test_ignore_eos():
    sched = make_scheduler()
    req = make_request(num_prompt_tokens=4, max_tokens=3)
    req.sampling_params.ignore_eos = True
    sched.add_request(req)
    for _ in range(5):
        run_step(sched, sampled_fn=lambda r: [999999])
        if req.is_finished:
            break
    assert req.num_output_tokens == 3
    assert req.get_finished_reason() == "length"


def test_abort():
    sched = make_scheduler()
    req = make_request(num_prompt_tokens=4)
    sched.add_request(req)
    run_step(sched)
    sched.finish_requests(req.request_id, RequestStatus.FINISHED_ABORTED)
    assert sched.get_num_unfinished_requests() == 0
    out = sched.schedule()
    assert req.request_id in out.finished_req_ids


def test_spec_decode_accounting():
    sched = make_scheduler(num_lookahead_tokens=2)
    req = make_request(num_prompt_tokens=8, max_tokens=32)
    sched.add_request(req)
    run_step(sched)  # prefill

    # propose 2 draft tokens
    req.spec_token_ids = [5, 6]
    out = sched.schedule()
    # 1 real + 2 spec tokens scheduled
    assert out.num_scheduled_tokens[req.request_id] == 3
    assert out.scheduled_spec_decode_tokens[req.request_id] == [5, 6]
    before = req.num_computed_tokens

    # runner accepts 1 of 2 drafts → returns 2 tokens (1 accepted + bonus)
    mro = ModelRunnerOutput(
        req_ids=[req.request_id],
        req_id_to_index={req.request_id: 0},
        sampled_token_ids=[[5, 42]],
    )
    sched.update_from_output(out, mro)
    # 1 rejected → computed rolled back by 1
    assert req.num_computed_tokens == before - 1
    assert req.num_output_tokens >= 2
    assert req.num_accepted_spec_tokens == 1


def test_scheduler_output_block_ids_consistent():
    sched = make_scheduler()
    req = make_request(num_prompt_tokens=10)
    sched.add_request(req)
    out = sched.schedule()
    nrd = out.scheduled_new_reqs[0]
    assert nrd.block_ids == sched.kv_cache_manager.get_block_ids(
        req.request_id)
    assert len(nrd.block_ids) >= 3  # ceil(10/4)


def test_priority_policy():
    cfg = EngineConfig(
        model_config=ModelConfig(model="", max_model_len=128),
        cache_config=CacheConfig(block_size=BLOCK),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=8,
                                         max_num_seqs=1,
                                         max_model_len=128,
                                         policy="priority"),
    )
    sched = Scheduler(cfg, num_kv_blocks=100)
    lo = make_request(num_prompt_tokens=4, priority=10)
    hi = make_request(num_prompt_tokens=4, prompt_offset=50, priority=0)
    sched.add_request(lo)
    sched.add_request(hi)
    out = sched.schedule()
    assert out.scheduled_new_reqs[0].req_id == hi.request_id
