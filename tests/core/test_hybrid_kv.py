"""Hybrid KV-cache groups: sliding-window layers allocate (and free)
window-sized page chains (reference: vllm/v1/core/kv_cache_coordinator.py
+ single_type_kv_cache_manager.py tests
tests/v1/core/test_single_type_kv_cache_manager.py)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.core.kv_cache_coordinator import (
    KVCacheCoordinator, MambaManager, SlidingWindowManager)
from vllm_main_modify_tpu.core.kv_cache_interface import KVCacheGroupSpec
from vllm_main_modify_tpu.core.request import Request


def make_request(rid="r1", prompt_len=8):
    return Request(request_id=rid,
                   prompt_token_ids=list(range(prompt_len)),
                   sampling_params=None,
                   pooling_params=None,
                   eos_token_id=None)


def test_sliding_window_frees_behind_window():
    mgr = SlidingWindowManager(block_size=4, num_blocks=64,
                               max_model_len=256, window=8)
    req = make_request(prompt_len=4)
    free0 = mgr.block_pool.get_num_free_blocks()
    # advance the request far past the window; blocks behind it must
    # return to the pool, replaced by null placeholders
    for computed in range(0, 64, 4):
        req.num_computed_tokens = computed
        out = mgr.allocate_slots(req, 4)
        assert out is not None
    req.num_computed_tokens = 64
    mgr._remove_skipped_blocks(req)
    blocks = mgr.req_to_blocks[req.request_id]
    # kv_idx_min = 64 - 8 + 1 = 57 -> blocks [0, 57//4=14) are dead
    assert all(b.is_null for b in blocks[:14])
    assert not any(b.is_null for b in blocks[14:])
    held = sum(1 for b in blocks if not b.is_null)
    assert free0 - mgr.block_pool.get_num_free_blocks() == held
    mgr.free(req)
    assert mgr.block_pool.get_num_free_blocks() == free0


def test_mamba_manager_single_slot():
    mgr = MambaManager(num_slots=4)
    r1, r2 = make_request("a"), make_request("b")
    out1 = mgr.allocate_slots(r1, 4)
    assert len(out1.blocks) == 1
    # second allocate on the same request adds nothing
    assert len(mgr.allocate_slots(r1, 4).blocks) == 0
    out2 = mgr.allocate_slots(r2, 4)
    assert out2.blocks[0].block_id != out1.blocks[0].block_id
    mgr.free(r1)
    r3 = make_request("c")
    assert mgr.allocate_slots(r3, 4) is not None


def make_coordinator(full_blocks=32, win_blocks=8, window=8):
    groups = [
        KVCacheGroupSpec(kind="full", layer_ids=(1, 3), kv_heads=2,
                         head_dim=16),
        KVCacheGroupSpec(kind="window", layer_ids=(0, 2), kv_heads=2,
                         head_dim=16, window=window),
    ]
    return KVCacheCoordinator(groups, [full_blocks, win_blocks],
                              block_size=4, max_model_len=256)


def test_coordinator_joint_allocation_and_rollback():
    coord = make_coordinator(full_blocks=32, win_blocks=3)
    req = make_request(prompt_len=8)
    out = coord.allocate_slots(req, 8)
    assert out is not None
    ids = out.get_block_ids()
    assert isinstance(ids, tuple) and len(ids) == 2
    assert len(ids[0]) == 2 and len(ids[1]) == 2
    # window pool has 2 usable blocks left... exhaust it with another
    # request: group-0 allocation must be rolled back on failure
    req2 = make_request("r2", prompt_len=64)
    free_full = coord.managers[0].block_pool.get_num_free_blocks()
    req2.num_computed_tokens = 0
    assert coord.allocate_slots(req2, 64) is None
    assert coord.managers[0].block_pool.get_num_free_blocks() == \
        free_full
    assert not coord.managers[1].req_to_blocks.get("r2")


def test_coordinator_free_and_reuse():
    coord = make_coordinator(win_blocks=16)
    reqs = [make_request(f"r{i}") for i in range(4)]
    for r in reqs:
        assert coord.allocate_slots(r, 8) is not None
    for r in reqs:
        coord.free(r)
    assert coord.managers[0].block_pool.get_num_free_blocks() == 31
    assert coord.managers[1].block_pool.get_num_free_blocks() == 15


# ---------------------------------------------------------------------------
# E2E: tiny Gemma-2 (alternating sliding/full layers) through the LLM
# engine — hybrid allocation must give bit-identical outputs to the
# single-pool fallback, with the window pool bounded.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_gemma2_dir(tmp_path_factory):
    import torch
    import transformers

    from tests.conftest import _save_tiny_tokenizer

    path = tmp_path_factory.mktemp("models") / "tiny-gemma2"
    cfg = transformers.Gemma2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=128,
        query_pre_attn_scalar=16, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, sliding_window=16)
    torch.manual_seed(0)
    model = transformers.Gemma2ForCausalLM(cfg).to(torch.float32)
    model.save_pretrained(path, safe_serialization=True)
    _save_tiny_tokenizer(path)
    return str(path)


def _generate(model_dir, disable_hybrid):
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256, disable_hybrid_kv=disable_hybrid,
              enable_prefix_caching=not disable_hybrid)
    p = SamplingParams(temperature=0.0, max_tokens=48, ignore_eos=True)
    out = llm.generate(
        ["hello world this is a test", "a test of the"], p)
    toks = [r.outputs[0].token_ids for r in out]
    sched = llm.engine.engine_core.scheduler
    return toks, sched


def test_gemma2_hybrid_e2e_parity(tiny_gemma2_dir):
    toks_h, sched_h = _generate(tiny_gemma2_dir, disable_hybrid=False)
    toks_f, _ = _generate(tiny_gemma2_dir, disable_hybrid=True)
    assert toks_h == toks_f
    # the engine really ran hybrid: coordinator with a bounded window
    # pool, and decode past the window recycled its early pages
    mgr = sched_h.kv_cache_manager
    assert isinstance(mgr, KVCacheCoordinator)
    win = mgr.managers[1]
    assert isinstance(win, SlidingWindowManager)
    # window=16, block 4: each finished request peaked at
    # <= cdiv(16,4)+2 = 6 live window pages despite 50+ token contexts
    assert win.block_pool.num_blocks < 256
