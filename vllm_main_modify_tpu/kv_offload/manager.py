"""Host-RAM KV offload tier (prefix-cache extension).

Reference: vllm/v1/kv_offload/ (LRU offload manager lru_manager.py,
CPU backend backends/cpu.py, GPU↔CPU transfer worker) — activated by
``CacheConfig.swap_space_gb``. TPU-native split:

- the **scheduler** owns the INDEX (which block hashes are resident on
  host) and emits per-step save ops (device blocks just evicted from
  the device prefix cache) and load ops (offload hits extending a
  device prefix-cache hit) inside ``SchedulerOutput``;
- the **runner** owns the DATA: one host buffer [L, page, width] per
  block, written from batched device gathers before the step runs.

Both sides apply the same LRU policy over the same op stream, so the
index and the store stay consistent without a back-channel.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional

import numpy as np

BlockHash = bytes


class KVOffloadIndex:
    """Scheduler-side: hash membership + LRU accounting."""

    def __init__(self, capacity_blocks: int) -> None:
        self.capacity = capacity_blocks
        self._lru: "OrderedDict[BlockHash, None]" = OrderedDict()
        self.num_saves = 0
        self.num_hits = 0

    def has(self, h: BlockHash) -> bool:
        return h in self._lru

    def touch(self, h: BlockHash) -> None:
        if h in self._lru:
            self._lru.move_to_end(h)
            self.num_hits += 1

    def add(self, h: BlockHash) -> None:
        if self.capacity <= 0:
            return
        if h in self._lru:
            self._lru.move_to_end(h)
            return
        self._lru[h] = None
        self.num_saves += 1
        while len(self._lru) > self.capacity:
            self._lru.popitem(last=False)

    def __len__(self) -> int:
        return len(self._lru)


class KVOffloadStore:
    """Runner-side: hash → host page data, same LRU policy."""

    def __init__(self, capacity_blocks: int) -> None:
        self.capacity = capacity_blocks
        self._lru: "OrderedDict[BlockHash, np.ndarray]" = OrderedDict()

    def put(self, h: BlockHash, data: np.ndarray) -> None:
        if self.capacity <= 0:
            return
        if h in self._lru:
            self._lru.move_to_end(h)
            self._lru[h] = data
            return
        self._lru[h] = data
        while len(self._lru) > self.capacity:
            self._lru.popitem(last=False)

    def get(self, h: BlockHash) -> Optional[np.ndarray]:
        data = self._lru.get(h)
        if data is not None:
            self._lru.move_to_end(h)
        return data

    def __len__(self) -> int:
        return len(self._lru)
