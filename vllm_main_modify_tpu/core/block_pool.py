"""Block pool: fixed array of KV pages + prefix-cache map.

Reference semantics: vllm/v1/core/block_pool.py — ``BlockPool`` (:118),
hash->block cache map (:21), ``cache_full_blocks`` (:188),
``get_new_blocks`` (:257). Block id 0 is the null block used to pad
block tables (reference layout keeps the same convention so padded
table entries always point at a real, never-read page).
"""

from __future__ import annotations

from typing import Callable, Optional

from vllm_main_modify_tpu.core.kv_cache_utils import (BlockHash,
                                                      FreeKVCacheBlockQueue,
                                                      KVCacheBlock)


class BlockPool:

    def __init__(self,
                 num_blocks: int,
                 enable_caching: bool = True,
                 event_callback: Optional[Callable] = None) -> None:
        assert num_blocks > 1, "need at least the null block + 1"
        self.num_blocks = num_blocks
        self.enable_caching = enable_caching
        self.event_callback = event_callback

        self.blocks = [KVCacheBlock(block_id=i) for i in range(num_blocks)]
        self.null_block = self.blocks[0]
        self.null_block.is_null = True
        self.null_block.ref_cnt = 1  # never allocatable

        self.free_block_queue = FreeKVCacheBlockQueue(self.blocks[1:])
        # prefix cache: full-block hash -> block
        self.cached_block_hash_to_block: dict[BlockHash, KVCacheBlock] = {}

    # --- prefix cache -------------------------------------------------

    def get_cached_block(self, block_hash: BlockHash) -> \
            Optional[KVCacheBlock]:
        return self.cached_block_hash_to_block.get(block_hash)

    def cache_full_blocks(
        self,
        request,
        blocks: list[KVCacheBlock],
        num_cached_blocks: int,
        num_full_blocks: int,
    ) -> None:
        """Register hashes for blocks [num_cached, num_full) of a request.

        Reference: vllm/v1/core/block_pool.py:188.
        """
        if not self.enable_caching or num_full_blocks <= num_cached_blocks:
            return
        block_hashes = request.block_hashes
        assert len(block_hashes) >= num_full_blocks, (
            f"request {request.request_id} has {len(block_hashes)} hashes "
            f"but {num_full_blocks} full blocks")
        for i in range(num_cached_blocks, num_full_blocks):
            blk = blocks[i]
            if blk.block_hash is not None:
                continue  # already a cache hit
            bh = block_hashes[i]
            blk.block_hash = bh
            self.cached_block_hash_to_block[bh] = blk
            if self.event_callback is not None:
                self.event_callback("block_stored", blk.block_id, bh)

    def _maybe_evict_cached_block(self, block: KVCacheBlock) -> None:
        bh = block.block_hash
        if bh is None:
            return
        cur = self.cached_block_hash_to_block.get(bh)
        if cur is block:
            del self.cached_block_hash_to_block[bh]
            if self.event_callback is not None:
                self.event_callback("block_removed", block.block_id, bh)
        block.reset_hash()

    # --- allocation ----------------------------------------------------

    def get_num_free_blocks(self) -> int:
        return self.free_block_queue.num_free_blocks

    def get_new_blocks(self, num_blocks: int) -> list[KVCacheBlock]:
        if num_blocks > self.get_num_free_blocks():
            raise ValueError(
                f"Cannot allocate {num_blocks} blocks; "
                f"{self.get_num_free_blocks()} free")
        out = []
        for _ in range(num_blocks):
            blk = self.free_block_queue.popleft()
            # popping an LRU block evicts any prefix-cache entry on it
            self._maybe_evict_cached_block(blk)
            assert blk.ref_cnt == 0
            blk.ref_cnt = 1
            out.append(blk)
        return out

    def touch(self, blocks: list[KVCacheBlock]) -> None:
        """Increment ref counts; pull newly-referenced blocks out of the
        free queue (they were cache hits sitting there unevicted)."""
        for blk in blocks:
            if blk.ref_cnt == 0 and not blk.is_null:
                self.free_block_queue.remove(blk)
            blk.ref_cnt += 1

    def free_blocks(self, ordered_blocks) -> None:
        """Decrement refs; return 0-ref blocks to the free-queue tail in
        the given order (callers pass eviction order: reverse of use)."""
        to_append = []
        for blk in ordered_blocks:
            if blk.is_null:
                continue
            blk.ref_cnt -= 1
            assert blk.ref_cnt >= 0, f"double free of {blk}"
            if blk.ref_cnt == 0:
                to_append.append(blk)
        self.free_block_queue.append_n(to_append)

    def reset_prefix_cache(self) -> bool:
        """Drop all cached hashes (used on weight swaps).
        Only safe when no request holds blocks."""
        num_used = (self.num_blocks - 1) - self.get_num_free_blocks()
        if num_used > 0:
            return False
        self.cached_block_hash_to_block.clear()
        for blk in self.blocks:
            blk.reset_hash()
        return True

    def get_usage(self) -> float:
        usable = self.num_blocks - 1
        return 1.0 - self.get_num_free_blocks() / max(usable, 1)
