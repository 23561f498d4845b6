"""Per-request KV page allocation with prefix-cache reuse.

Reference semantics: vllm/v1/core/kv_cache_manager.py —
``get_computed_blocks`` (:154, longest cached prefix capped at
prompt_len-1 so the last token is always recomputed for logits),
``allocate_slots`` (:201, computed/new/lookahead block layout),
reverse-order frees for LRU (:314).

Round-1 scope: a single full-attention KV-cache group. The coordinator
seam for hybrid (sliding-window / local / SSM) groups is
``kv_cache_coordinator.py`` (to come); this manager keeps the same
public surface so the scheduler won't change.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from vllm_main_modify_tpu.core.block_pool import BlockPool
from vllm_main_modify_tpu.core.kv_cache_utils import KVCacheBlock
from vllm_main_modify_tpu.core.request import Request
from vllm_main_modify_tpu.utils import cdiv


@dataclass
class KVCacheBlocks:
    """Opaque handle returned to the scheduler
    (reference: kv_cache_manager.py:18).

    ``blocks`` is group 0; hybrid models (KVCacheCoordinator) carry
    groups 1..N-1 in ``extra_groups``. ``get_block_ids()`` keeps the
    flat single-group wire format unless extra groups exist."""

    blocks: list[KVCacheBlock] = field(default_factory=list)
    extra_groups: tuple = ()

    def get_block_ids(self):
        if not self.extra_groups:
            return [b.block_id for b in self.blocks]
        return tuple([b.block_id for b in g]
                     for g in (self.blocks, *self.extra_groups))

    def __add__(self, other: "KVCacheBlocks") -> "KVCacheBlocks":
        assert len(self.extra_groups) == len(other.extra_groups)
        return KVCacheBlocks(
            self.blocks + other.blocks,
            tuple(a + b for a, b in zip(self.extra_groups,
                                        other.extra_groups)))

    def __len__(self) -> int:
        return len(self.blocks)


class KVCacheManager:

    def __init__(
        self,
        block_size: int,
        num_blocks: int,
        max_model_len: int,
        enable_caching: bool = True,
        event_callback=None,
    ) -> None:
        self.block_size = block_size
        self.max_model_len = max_model_len
        self.enable_caching = enable_caching
        self.block_pool = BlockPool(num_blocks,
                                    enable_caching,
                                    event_callback=event_callback)
        # request_id -> blocks held (in order)
        self.req_to_blocks: dict[str, list[KVCacheBlock]] = {}
        # request_id -> number of blocks whose hash has been registered
        self.num_cached_blocks: dict[str, int] = {}

        # prefix-cache stats
        self.prefix_cache_queries = 0
        self.prefix_cache_hits = 0

    @property
    def usage(self) -> float:
        return self.block_pool.get_usage()

    def get_computed_blocks(self,
                            request: Request) -> tuple[KVCacheBlocks, int]:
        """Longest prefix-cache hit for a new request."""
        if (not self.enable_caching or request.cache_salt is None
                and not request.block_hashes):
            if not self.enable_caching:
                return KVCacheBlocks(), 0
        computed: list[KVCacheBlock] = []
        max_hit_blocks = cdiv(request.num_prompt_tokens, self.block_size)
        for i, bh in enumerate(request.block_hashes):
            if i >= max_hit_blocks:
                break
            blk = self.block_pool.get_cached_block(bh)
            if blk is None:
                break
            computed.append(blk)
        # Cap: the last prompt token must be recomputed to produce logits
        # (reference: kv_cache_manager.py:154-199).
        while computed and \
                len(computed) * self.block_size >= request.num_prompt_tokens:
            computed.pop()
        self.prefix_cache_queries += request.num_prompt_tokens
        self.prefix_cache_hits += len(computed) * self.block_size
        return KVCacheBlocks(computed), len(computed) * self.block_size

    def allocate_slots(
        self,
        request: Request,
        num_new_tokens: int,
        num_new_computed_tokens: int = 0,
        new_computed_blocks: Optional[KVCacheBlocks] = None,
        num_lookahead_tokens: int = 0,
        delay_cache_blocks: bool = False,
    ) -> Optional[KVCacheBlocks]:
        """Allocate pages so the request can advance by ``num_new_tokens``
        (+ speculative lookahead). Returns None if out of pages.

        Layout (reference diagram at kv_cache_manager.py:201-312):
        [ already-allocated | new-computed (cache hits) | new tokens |
          lookahead ]
        """
        assert num_new_tokens > 0
        new_computed = (new_computed_blocks.blocks
                        if new_computed_blocks else [])

        req_blocks = self.req_to_blocks.setdefault(request.request_id, [])
        num_computed_tokens = (request.num_computed_tokens +
                               num_new_computed_tokens)
        total_tokens = (num_computed_tokens + num_new_tokens +
                        num_lookahead_tokens)
        num_blocks_needed = cdiv(total_tokens, self.block_size)
        num_new_blocks = (num_blocks_needed - len(req_blocks) -
                          len(new_computed))

        # Free blocks usable for allocation exclude the cache-hit blocks
        # currently sitting ref_cnt==0 in the free queue: touching them
        # removes them from it.
        num_evictable_hits = sum(1 for b in new_computed if b.ref_cnt == 0)
        if (num_new_blocks >
                self.block_pool.get_num_free_blocks() - num_evictable_hits):
            return None

        # Commit: take refs on cache hits, then allocate the rest.
        if new_computed:
            self.block_pool.touch(new_computed)
            req_blocks.extend(new_computed)
        if num_new_blocks > 0:
            new_blocks = self.block_pool.get_new_blocks(num_new_blocks)
            req_blocks.extend(new_blocks)
        else:
            new_blocks = []

        if self.enable_caching and not delay_cache_blocks:
            # Register hashes for blocks that become full with this step
            # (lookahead/spec tokens are NOT cached: they may be rejected).
            num_full_after = (num_computed_tokens +
                              num_new_tokens) // self.block_size
            num_full_after = min(num_full_after,
                                 len(request.block_hashes))
            num_cached = self.num_cached_blocks.get(request.request_id, 0)
            if num_cached < num_full_after:
                self.block_pool.cache_full_blocks(request, req_blocks,
                                                  num_cached,
                                                  num_full_after)
                self.num_cached_blocks[request.request_id] = num_full_after
            elif request.request_id not in self.num_cached_blocks:
                self.num_cached_blocks[request.request_id] = 0

        # Return ONLY the newly allocated blocks: the scheduler composes
        # `new_computed_blocks + allocate_slots(...)` itself (returning
        # the hit blocks here too would alias them twice in the block
        # table and corrupt the KV of reused pages).
        return KVCacheBlocks(new_blocks)

    def free(self, request: Request) -> None:
        """Release all pages of a request, reverse order for LRU
        (reference: kv_cache_manager.py:314)."""
        blocks = self.req_to_blocks.pop(request.request_id, [])
        self.num_cached_blocks.pop(request.request_id, None)
        self.block_pool.free_blocks(reversed(blocks))

    def get_block_ids(self, request_id: str) -> list[int]:
        return [b.block_id for b in self.req_to_blocks.get(request_id, [])]

    def get_num_common_prefix_blocks(self, running_requests) -> int:
        """Blocks shared by every running request (cascade-attention
        detection; reference: kv_cache_manager.py get_num_common_prefix_
        blocks)."""
        it = iter(running_requests)
        first = next(it, None)
        if first is None:
            return 0
        common = self.req_to_blocks.get(first.request_id, [])
        n = len(common)
        for req in it:
            blocks = self.req_to_blocks.get(req.request_id, [])
            m = 0
            for a, b in zip(common, blocks):
                if a is not b:
                    break
                m += 1
            n = min(n, m)
            if n == 0:
                return 0
        return n

    def reset_prefix_cache(self) -> bool:
        ok = self.block_pool.reset_prefix_cache()
        if ok:
            self.prefix_cache_hits = 0
            self.prefix_cache_queries = 0
        return ok

    def make_prefix_cache_stats(self) -> dict:
        q, h = self.prefix_cache_queries, self.prefix_cache_hits
        return {
            "queries": q,
            "hits": h,
            "hit_rate": h / q if q else 0.0,
        }
