"""Prefix-caching scenarios (modeled on the reference's
tests/v1/core/test_prefix_caching.py)."""

from vllm_main_modify_tpu.core.kv_cache_manager import KVCacheManager
from vllm_main_modify_tpu.core.kv_cache_utils import (
    get_request_block_hasher, hash_block_tokens)
from vllm_main_modify_tpu.core.request import Request
from vllm_main_modify_tpu.sampling_params import SamplingParams

BLOCK = 4
_hasher = get_request_block_hasher(BLOCK)
_ctr = iter(range(10**9))


def make_request(tokens, salt=None):
    return Request(request_id=f"req-{next(_ctr)}",
                   prompt_token_ids=tokens,
                   sampling_params=SamplingParams(max_tokens=8),
                   eos_token_id=None,
                   block_hasher=_hasher,
                   cache_salt=salt)


def make_manager(num_blocks=20):
    return KVCacheManager(block_size=BLOCK,
                          num_blocks=num_blocks,
                          max_model_len=256,
                          enable_caching=True)


def test_hash_chain_changes_with_parent():
    h1 = hash_block_tokens(None, (1, 2, 3, 4))
    h2 = hash_block_tokens(h1, (5, 6, 7, 8))
    h3 = hash_block_tokens(None, (5, 6, 7, 8))
    assert h2 != h3
    assert h1 == hash_block_tokens(None, (1, 2, 3, 4))


def test_request_block_hashes_incremental():
    req = make_request(list(range(10)))  # 2 full blocks of 4
    assert len(req.block_hashes) == 2
    req.append_output_token_ids([100, 101])  # now 12 tokens → 3 blocks
    assert len(req.block_hashes) == 3


def test_cache_salt_separates_requests():
    r1 = make_request(list(range(8)))
    r2 = make_request(list(range(8)), salt="tenant-b")
    assert r1.block_hashes[0] != r2.block_hashes[0]


def test_full_lifecycle_hit():
    mgr = make_manager()
    r1 = make_request(list(range(12)))
    blocks, n = mgr.get_computed_blocks(r1)
    assert n == 0
    out = mgr.allocate_slots(r1, 12, 0, blocks)
    assert len(out) == 3
    r1.num_computed_tokens = 12
    mgr.free(r1)

    r2 = make_request(list(range(12)))
    blocks, n = mgr.get_computed_blocks(r2)
    # 3 full blocks cached but cap leaves the last prompt token: 2 blocks
    assert n == 8
    assert len(blocks) == 2


def test_partial_prefix_hit():
    mgr = make_manager()
    r1 = make_request(list(range(16)))
    blocks, n = mgr.get_computed_blocks(r1)
    mgr.allocate_slots(r1, 16, 0, blocks)
    r1.num_computed_tokens = 16
    mgr.free(r1)

    # shares only the first 8 tokens
    r2 = make_request(list(range(8)) + [99] * 8)
    blocks, n = mgr.get_computed_blocks(r2)
    assert n == 8


def test_shared_blocks_refcounted():
    mgr = make_manager()
    r1 = make_request(list(range(16)))
    blocks, n = mgr.get_computed_blocks(r1)
    mgr.allocate_slots(r1, 16, 0, blocks)
    r1.num_computed_tokens = 16

    r2 = make_request(list(range(16)))
    blocks2, n2 = mgr.get_computed_blocks(r2)
    assert n2 == 12
    mgr.allocate_slots(r2, 16 - n2, n2, blocks2)
    shared = mgr.req_to_blocks[r2.request_id][:3]
    assert all(b.ref_cnt == 2 for b in shared)
    mgr.free(r1)
    assert all(b.ref_cnt == 1 for b in shared)
    mgr.free(r2)
    assert all(b.ref_cnt == 0 for b in shared)


def test_free_order_is_lru_eviction_order():
    mgr = make_manager(num_blocks=6)
    r1 = make_request(list(range(12)))
    blocks, _ = mgr.get_computed_blocks(r1)
    mgr.allocate_slots(r1, 12, 0, blocks)
    ids = mgr.get_block_ids(r1.request_id)
    r1.num_computed_tokens = 12
    mgr.free(r1)
    # freed in reverse order and appended at the queue tail: the LAST
    # block of r1 is evicted first, the deepest-prefix block last
    free_ids = [
        b.block_id for b in
        mgr.block_pool.free_block_queue.get_all_free_blocks()
    ]
    assert free_ids[-3:] == list(reversed(ids))


def test_lookahead_tokens_allocate_extra():
    mgr = make_manager()
    r = make_request(list(range(8)))
    out = mgr.allocate_slots(r, 8, 0, None, num_lookahead_tokens=4)
    # 8 + 4 tokens → 3 blocks
    assert len(out) == 3


def test_allocate_returns_none_when_full():
    mgr = make_manager(num_blocks=3)  # 2 usable
    r = make_request(list(range(12)))
    assert mgr.allocate_slots(r, 12) is None
    # failed allocation must not leak partial state
    assert mgr.block_pool.get_num_free_blocks() == 2
