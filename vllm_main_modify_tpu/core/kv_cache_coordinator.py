"""Hybrid KV-cache coordination: one manager per layer group.

Reference semantics: vllm/v1/core/kv_cache_coordinator.py (per-group
single-type managers, joint allocate) +
single_type_kv_cache_manager.py (SlidingWindowManager
``remove_skipped_blocks``, MambaManager single-slot allocation).

Unlike the reference — where all groups carve pages out of ONE tensor
and must share a block pool — each TPU group owns a physically separate
device array, so each manager gets its own, independently sized
``BlockPool``. The coordinator presents the same public surface as
``KVCacheManager`` and the scheduler does not care which it holds.

Prefix caching and host offload are disabled in hybrid mode (the
window/mamba groups cannot revalidate partial prefixes); single-group
models keep the plain manager and lose nothing.
"""

from __future__ import annotations

from typing import Optional

from vllm_main_modify_tpu.core.kv_cache_interface import KVCacheGroupSpec
from vllm_main_modify_tpu.core.kv_cache_manager import (KVCacheBlocks,
                                                        KVCacheManager)
from vllm_main_modify_tpu.core.request import Request


class SlidingWindowManager(KVCacheManager):
    """Full-attention allocation plus eager reclamation of pages that
    fell behind the window (reference: single_type_kv_cache_manager.py
    SlidingWindowManager.remove_skipped_blocks). Freed positions are
    replaced by the null block so the block table stays positional."""

    def __init__(self, block_size: int, num_blocks: int,
                 max_model_len: int, window: int) -> None:
        super().__init__(block_size, num_blocks, max_model_len,
                         enable_caching=False)
        self.window = window

    def allocate_slots(self, request: Request, num_new_tokens: int,
                       num_new_computed_tokens: int = 0,
                       new_computed_blocks=None,
                       num_lookahead_tokens: int = 0,
                       delay_cache_blocks: bool = False):
        out = super().allocate_slots(
            request, num_new_tokens,
            num_new_computed_tokens=num_new_computed_tokens,
            new_computed_blocks=new_computed_blocks,
            num_lookahead_tokens=num_lookahead_tokens,
            delay_cache_blocks=True)
        if out is None:
            return None
        self._remove_skipped_blocks(request)
        return out

    def _remove_skipped_blocks(self, request: Request) -> None:
        """Free blocks whose every token is out of reach of all future
        queries (query at pos attends kv_idx in (pos - window, pos];
        future pos >= num_computed_tokens)."""
        kv_idx_min = request.num_computed_tokens - self.window + 1
        if kv_idx_min <= 0:
            return
        blocks = self.req_to_blocks.get(request.request_id)
        if not blocks:
            return
        null = self.block_pool.null_block
        first_useful = min(kv_idx_min // self.block_size, len(blocks))
        dead = []
        for i in range(first_useful):
            if blocks[i].is_null:
                continue
            dead.append(blocks[i])
            blocks[i] = null
        if dead:
            self.block_pool.free_blocks(reversed(dead))


class MambaManager(KVCacheManager):
    """One fixed state slot per request, allocated on first schedule
    (reference: single_type_kv_cache_manager.py MambaManager)."""

    def __init__(self, num_slots: int) -> None:
        # block_size=1 is irrelevant; each request holds exactly one
        # "block" = its state slot id
        super().__init__(block_size=1, num_blocks=num_slots,
                         max_model_len=1, enable_caching=False)

    def allocate_slots(self, request: Request, num_new_tokens: int,
                       num_new_computed_tokens: int = 0,
                       new_computed_blocks=None,
                       num_lookahead_tokens: int = 0,
                       delay_cache_blocks: bool = False):
        blocks = self.req_to_blocks.setdefault(request.request_id, [])
        if blocks:
            return KVCacheBlocks([])
        if self.block_pool.get_num_free_blocks() < 1:
            return None
        new = self.block_pool.get_new_blocks(1)
        blocks.extend(new)
        return KVCacheBlocks(new)


class NullGroupManager(KVCacheManager):
    """Zero-layer group (pure-SSM models keep an empty full-attention
    group 0 so paged metadata invariants hold): never allocates."""

    def __init__(self) -> None:
        super().__init__(block_size=1, num_blocks=2, max_model_len=1,
                         enable_caching=False)

    def allocate_slots(self, request: Request, num_new_tokens: int,
                       num_new_computed_tokens: int = 0,
                       new_computed_blocks=None,
                       num_lookahead_tokens: int = 0,
                       delay_cache_blocks: bool = False):
        self.req_to_blocks.setdefault(request.request_id, [])
        return KVCacheBlocks([])


def _make_group_manager(spec: KVCacheGroupSpec, block_size: int,
                        num_blocks: int, max_model_len: int):
    if spec.num_layers == 0:
        return NullGroupManager()
    if spec.kind == "window":
        return SlidingWindowManager(block_size, num_blocks,
                                    max_model_len, spec.window)
    if spec.kind == "mamba":
        return MambaManager(num_blocks)
    return KVCacheManager(block_size, num_blocks, max_model_len,
                          enable_caching=False)


class KVCacheCoordinator:
    """Drop-in replacement for ``KVCacheManager`` when a model has more
    than one KV group. All-or-nothing allocation across groups."""

    def __init__(self, groups: list[KVCacheGroupSpec],
                 num_blocks_per_group: list[int], block_size: int,
                 max_model_len: int) -> None:
        assert len(groups) == len(num_blocks_per_group) > 1
        self.groups = groups
        self.block_size = block_size
        self.managers = [
            _make_group_manager(spec, block_size, nb, max_model_len)
            for spec, nb in zip(groups, num_blocks_per_group)
        ]
        self.enable_caching = False
        # prefix-cache stats surface (always zero: caching off)
        self.prefix_cache_queries = 0
        self.prefix_cache_hits = 0

    @property
    def usage(self) -> float:
        return max(m.block_pool.get_usage() for m in self.managers)

    def get_computed_blocks(self,
                            request: Request) -> tuple[KVCacheBlocks, int]:
        return self._empty_blocks(), 0

    def _empty_blocks(self) -> KVCacheBlocks:
        return KVCacheBlocks([], extra_groups=tuple(
            [] for _ in self.managers[1:]))

    def allocate_slots(self, request: Request, num_new_tokens: int,
                       num_new_computed_tokens: int = 0,
                       new_computed_blocks=None,
                       num_lookahead_tokens: int = 0,
                       delay_cache_blocks: bool = False
                       ) -> Optional[KVCacheBlocks]:
        per_group: list[list] = []
        for gi, mgr in enumerate(self.managers):
            out = mgr.allocate_slots(
                request, num_new_tokens,
                num_new_computed_tokens=num_new_computed_tokens,
                num_lookahead_tokens=num_lookahead_tokens,
                delay_cache_blocks=True)
            if out is None:
                # roll back groups [0, gi): undo ONLY this call's
                # allocations, keeping earlier steps' blocks
                for gj in range(gi):
                    blocks = self.managers[gj].req_to_blocks.get(
                        request.request_id, [])
                    undo = per_group[gj]
                    if undo:
                        del blocks[len(blocks) - len(undo):]
                        self.managers[gj].block_pool.free_blocks(
                            reversed(undo))
                return None
            per_group.append(out.blocks)
        return KVCacheBlocks(per_group[0],
                             extra_groups=tuple(per_group[1:]))

    def free(self, request: Request) -> None:
        for mgr in self.managers:
            mgr.free(request)

    def get_block_ids(self, request_id: str):
        return tuple(
            mgr.get_block_ids(request_id) for mgr in self.managers)

    def get_num_common_prefix_blocks(self, running_requests) -> int:
        # cascade hints only make sense for the full-attention group 0
        if self.groups[0].kind != "full":
            return 0
        return self.managers[0].get_num_common_prefix_blocks(
            running_requests)

    def reset_prefix_cache(self) -> bool:
        return True

    def make_prefix_cache_stats(self) -> dict:
        return {"queries": 0, "hits": 0, "hit_rate": 0.0}
