"""Unit tests for BlockPool + free-queue + prefix-cache map
(modeled on the reference's tests/v1/core/ suite strategy)."""

import pytest

from vllm_main_modify_tpu.core.block_pool import BlockPool
from vllm_main_modify_tpu.core.kv_cache_utils import (
    FreeKVCacheBlockQueue, KVCacheBlock, hash_block_tokens)


def test_free_queue_order():
    blocks = [KVCacheBlock(block_id=i) for i in range(5)]
    q = FreeKVCacheBlockQueue(blocks)
    assert q.num_free_blocks == 5
    b = q.popleft()
    assert b.block_id == 0
    q.append(b)
    assert [x.block_id for x in q.get_all_free_blocks()] == [1, 2, 3, 4, 0]
    q.remove(blocks[2])
    assert q.num_free_blocks == 4
    assert [x.block_id for x in q.get_all_free_blocks()] == [1, 3, 4, 0]
    with pytest.raises(AssertionError):
        q.remove(blocks[2])  # not in queue


def test_block_pool_alloc_free():
    pool = BlockPool(num_blocks=11)
    assert pool.get_num_free_blocks() == 10
    blocks = pool.get_new_blocks(4)
    assert pool.get_num_free_blocks() == 6
    assert all(b.ref_cnt == 1 for b in blocks)
    pool.free_blocks(reversed(blocks))
    assert pool.get_num_free_blocks() == 10
    # LRU: freed in reverse order, so last-freed is block[0]
    ids = [b.block_id for b in pool.free_block_queue.get_all_free_blocks()]
    assert ids[-4:] == [b.block_id for b in reversed(blocks)]


def test_block_pool_overflow():
    pool = BlockPool(num_blocks=3)
    pool.get_new_blocks(2)
    with pytest.raises(ValueError):
        pool.get_new_blocks(1)


def test_ref_counting_shared_blocks():
    pool = BlockPool(num_blocks=5)
    blocks = pool.get_new_blocks(2)
    pool.touch(blocks)  # second reader
    pool.free_blocks(blocks)
    assert pool.get_num_free_blocks() == 2  # still referenced
    pool.free_blocks(blocks)
    assert pool.get_num_free_blocks() == 4


class _FakeReq:
    def __init__(self, request_id, block_hashes):
        self.request_id = request_id
        self.block_hashes = block_hashes


def test_prefix_cache_map_and_eviction():
    pool = BlockPool(num_blocks=4)
    h0 = hash_block_tokens(None, (1, 2, 3, 4))
    h1 = hash_block_tokens(h0, (5, 6, 7, 8))
    blocks = pool.get_new_blocks(2)
    req = _FakeReq("r0", [h0, h1])
    pool.cache_full_blocks(req, blocks, 0, 2)
    assert pool.get_cached_block(h0) is blocks[0]
    assert pool.get_cached_block(h1) is blocks[1]

    # free both; they stay in the cache map until evicted
    pool.free_blocks(reversed(blocks))
    assert pool.get_cached_block(h0) is blocks[0]

    # allocating all free blocks evicts hashes from the LRU head
    pool.get_new_blocks(3)
    assert pool.get_cached_block(h0) is None
    assert pool.get_cached_block(h1) is None


def test_null_block_never_allocated():
    pool = BlockPool(num_blocks=3)
    blocks = pool.get_new_blocks(2)
    assert all(b.block_id != 0 for b in blocks)
    assert pool.null_block.is_null


def test_reset_prefix_cache():
    pool = BlockPool(num_blocks=4)
    blocks = pool.get_new_blocks(1)
    h0 = hash_block_tokens(None, (1, 2))
    pool.cache_full_blocks(_FakeReq("r", [h0]), blocks, 0, 1)
    assert not pool.reset_prefix_cache()  # blocks still held
    pool.free_blocks(blocks)
    assert pool.reset_prefix_cache()
    assert pool.get_cached_block(h0) is None
