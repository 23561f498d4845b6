"""KV-cache block bookkeeping primitives.

Reference semantics: vllm/v1/core/kv_cache_utils.py —
``hash_block_tokens`` (:547), ``get_request_block_hasher`` (:576),
``FreeKVCacheBlockQueue`` (:216). Re-implemented for the TPU engine:
pure host-side Python, no device code.

Prefix caching works by chaining block hashes: the hash of block i
covers (hash of block i-1, tokens of block i, extra keys). Two requests
that share a prompt prefix produce identical hash chains, so their full
blocks can be shared via the BlockPool's hash->block map.
"""

from __future__ import annotations

import hashlib
import pickle
from dataclasses import dataclass
from typing import Any, Callable, Optional

BlockHash = bytes

# Seed distinguishing our hash chain; NONE sentinel for the first block.
_NONE_HASH: BlockHash = b"\x00" * 8


def init_none_hash(seed: int = 0) -> BlockHash:
    return hashlib.sha256(f"none-{seed}".encode()).digest()[:8]


def hash_block_tokens(
    parent_hash: Optional[BlockHash],
    token_ids: tuple[int, ...],
    extra_keys: Optional[tuple[Any, ...]] = None,
) -> BlockHash:
    """Hash of one full block, chained to the parent block's hash.

    Reference: vllm/v1/core/kv_cache_utils.py:547.
    """
    h = hashlib.sha256()
    h.update(parent_hash if parent_hash is not None else _NONE_HASH)
    h.update(pickle.dumps(token_ids, protocol=pickle.HIGHEST_PROTOCOL))
    if extra_keys:
        h.update(pickle.dumps(extra_keys, protocol=pickle.HIGHEST_PROTOCOL))
    return h.digest()[:8]


def get_request_block_hasher(
    block_size: int,
    extra_keys_fn: Optional[Callable[[Any, int], Optional[tuple]]] = None,
) -> Callable[[Any], list[BlockHash]]:
    """Return an incremental hasher: given a request, extend its
    ``block_hashes`` list to cover all *full* blocks of its known tokens.

    Reference: vllm/v1/core/kv_cache_utils.py:576. ``extra_keys_fn`` maps
    (request, block_idx) -> tuple mixed into the hash (LoRA id,
    multimodal hashes, cache salt).
    """

    def hasher(request) -> list[BlockHash]:
        block_hashes: list[BlockHash] = request.block_hashes
        token_ids = request.all_token_ids
        num_full_blocks = len(token_ids) // block_size
        prev = block_hashes[-1] if block_hashes else None
        new_hashes = []
        for i in range(len(block_hashes), num_full_blocks):
            start = i * block_size
            block_tokens = tuple(token_ids[start:start + block_size])
            extra = extra_keys_fn(request, i) if extra_keys_fn else None
            if getattr(request, "cache_salt", None) is not None and i == 0:
                extra = (request.cache_salt, ) + (extra or ())
            prev = hash_block_tokens(prev, block_tokens, extra)
            new_hashes.append(prev)
        return new_hashes

    return hasher


@dataclass
class KVCacheBlock:
    """One page of KV cache (reference: kv_cache_utils.py KVCacheBlock)."""

    block_id: int
    ref_cnt: int = 0
    block_hash: Optional[BlockHash] = None
    # doubly-linked free-queue pointers
    prev_free_block: Optional["KVCacheBlock"] = None
    next_free_block: Optional["KVCacheBlock"] = None
    is_null: bool = False

    def reset_hash(self) -> None:
        self.block_hash = None

    def __repr__(self) -> str:  # pragma: no cover
        return (f"KVCacheBlock(id={self.block_id}, ref={self.ref_cnt}, "
                f"hashed={self.block_hash is not None})")


class FreeKVCacheBlockQueue:
    """O(1) doubly-linked LRU free queue.

    Blocks are popped from the head (least-recently freed = best eviction
    candidate) and appended at the tail. Freed blocks keep their hash so
    they stay prefix-cache hits until actually evicted.
    Reference: vllm/v1/core/kv_cache_utils.py:216.
    """

    def __init__(self, blocks: list[KVCacheBlock]) -> None:
        self.num_free_blocks = len(blocks)
        # sentinel head/tail simplify edge cases
        self._head = KVCacheBlock(block_id=-1)
        self._tail = KVCacheBlock(block_id=-2)
        self._head.next_free_block = self._tail
        self._tail.prev_free_block = self._head
        for b in blocks:
            self.append(b, _count=False)

    def popleft(self) -> KVCacheBlock:
        b = self._head.next_free_block
        if b is self._tail:
            raise ValueError("No free blocks available")
        self.remove(b)
        return b

    def popleft_n(self, n: int) -> list[KVCacheBlock]:
        return [self.popleft() for _ in range(n)]

    def remove(self, block: KVCacheBlock) -> None:
        p, nxt = block.prev_free_block, block.next_free_block
        assert p is not None and nxt is not None, \
            f"block {block.block_id} not in free queue"
        p.next_free_block = nxt
        nxt.prev_free_block = p
        block.prev_free_block = None
        block.next_free_block = None
        self.num_free_blocks -= 1

    def append(self, block: KVCacheBlock, _count: bool = True) -> None:
        last = self._tail.prev_free_block
        last.next_free_block = block
        block.prev_free_block = last
        block.next_free_block = self._tail
        self._tail.prev_free_block = block
        if _count:
            self.num_free_blocks += 1

    def append_n(self, blocks: list[KVCacheBlock]) -> None:
        for b in blocks:
            self.append(b)

    def get_all_free_blocks(self) -> list[KVCacheBlock]:
        out = []
        b = self._head.next_free_block
        while b is not self._tail:
            out.append(b)
            b = b.next_free_block
        return out
