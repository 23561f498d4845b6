"""Runner persistent-batch state transitions (reference test style:
tests/v1/worker/ — fabricated SchedulerOutputs, no model)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.core.sched.output import (CachedRequestData,
                                                    NewRequestData,
                                                    SchedulerOutput)
from vllm_main_modify_tpu.sampling_params import SamplingParams
from vllm_main_modify_tpu.worker.input_batch import (CachedRequestState,
                                                     InputBatch)


def new_req(rid: str, prompt=None, blocks=None) -> NewRequestData:
    return NewRequestData(
        req_id=rid,
        prompt_token_ids=prompt or [1, 2, 3],
        sampling_params=SamplingParams(max_tokens=8),
        block_ids=blocks or [1],
        num_computed_tokens=0,
    )


def test_condense_moves_tail_rows():
    batch = InputBatch(max_num_reqs=8, max_model_len=32,
                       max_blocks_per_req=4)
    for i in range(4):
        batch.add_request(CachedRequestState(new_req(f"r{i}")))
    batch.remove_request("r1")
    batch.condense()
    assert batch.num_reqs == 3
    rows = {batch.req_ids[i] for i in range(3)}
    assert rows == {"r0", "r2", "r3"}
    # indices map to rows < num_reqs
    for rid, row in batch.req_id_to_index.items():
        assert row < 3
        assert batch.req_ids[row] == rid


def test_add_after_remove_no_collision():
    """Regression: a new request added after a mid-batch removal must
    not overwrite a live row (bug found by the TPU bench run)."""
    batch = InputBatch(max_num_reqs=8, max_model_len=32,
                       max_blocks_per_req=4)
    for i in range(4):
        batch.add_request(CachedRequestState(
            new_req(f"r{i}", prompt=[10 + i])))
    batch.remove_request("r1")
    batch.condense()
    batch.add_request(CachedRequestState(new_req("r4", prompt=[99])))
    assert batch.num_reqs == 4
    for rid, row in batch.req_id_to_index.items():
        assert batch.req_ids[row] == rid
    row4 = batch.req_id_to_index["r4"]
    assert batch.token_ids[row4, 0] == 99
    # r3's data intact
    row3 = batch.req_id_to_index["r3"]
    assert batch.token_ids[row3, 0] == 13


def _mk_runner():
    """Runner without a model: exercises only _update_states."""
    from vllm_main_modify_tpu.worker.model_runner import TPUModelRunner

    runner = object.__new__(TPUModelRunner)
    runner.mm_ranges = {}
    runner._mm_free = []
    runner.mm_cache = {}
    runner.mm_idle = __import__("collections").OrderedDict()
    runner.mm_req_hashes = {}
    runner.cross_tables = {}
    runner.cross_lens = {}
    runner._cross_free = []
    runner.input_batch = InputBatch(max_num_reqs=8, max_model_len=64,
                                    max_blocks_per_req=8)
    runner.requests = {}
    runner._prompt_lp_acc = {}
    runner.enable_lora = False
    runner.lora_manager = None
    return runner


def sched_out(new=(), cached=None, finished=(), tokens=None):
    return SchedulerOutput(
        scheduled_new_reqs=list(new),
        scheduled_cached_reqs=cached or CachedRequestData(),
        num_scheduled_tokens=tokens or {},
        total_num_scheduled_tokens=sum((tokens or {}).values()),
        finished_req_ids=set(finished),
    )


def test_update_states_finish_and_admit_same_step():
    runner = _mk_runner()
    runner._update_states(
        sched_out(new=[new_req("a"), new_req("b"), new_req("c")],
                  tokens={"a": 3, "b": 3, "c": 3}))
    assert runner.input_batch.num_reqs == 3

    # b finishes; d admitted in the same step; a,c keep decoding
    cached = CachedRequestData(
        req_ids=["a", "c"], resumed_from_preemption=[False, False],
        new_token_ids=[[], []], new_block_ids=[None, None],
        num_computed_tokens=[3, 3])
    runner._update_states(
        sched_out(new=[new_req("d")], cached=cached, finished=["b"],
                  tokens={"a": 1, "c": 1, "d": 3}))
    batch = runner.input_batch
    assert batch.num_reqs == 3
    assert set(batch.req_id_to_index) == {"a", "c", "d"}
    for rid, row in batch.req_id_to_index.items():
        assert batch.req_ids[row] == rid


def test_update_states_preemption_eviction_and_resume():
    runner = _mk_runner()
    runner._update_states(
        sched_out(new=[new_req("a"), new_req("b")],
                  tokens={"a": 3, "b": 3}))
    # b preempted → not scheduled → evicted from batch, state kept
    cached = CachedRequestData(
        req_ids=["a"], resumed_from_preemption=[False],
        new_token_ids=[[]], new_block_ids=[None],
        num_computed_tokens=[3])
    runner._update_states(sched_out(cached=cached, tokens={"a": 1}))
    assert set(runner.input_batch.req_id_to_index) == {"a"}
    assert "b" in runner.requests

    # b resumes with new blocks and re-learned output tokens
    cached = CachedRequestData(
        req_ids=["a", "b"], resumed_from_preemption=[False, True],
        new_token_ids=[[], [7, 8]], new_block_ids=[None, [5, 6]],
        num_computed_tokens=[4, 0])
    runner._update_states(
        sched_out(cached=cached, tokens={"a": 1, "b": 5}))
    batch = runner.input_batch
    assert set(batch.req_id_to_index) == {"a", "b"}
    row_b = batch.req_id_to_index["b"]
    assert batch.num_tokens[row_b] == 5  # 3 prompt + 2 regenerated
    assert batch.block_table[row_b, :2].tolist() == [5, 6]
    assert batch.num_blocks[row_b] == 2
