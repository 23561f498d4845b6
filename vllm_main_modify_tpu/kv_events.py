"""KV-cache event publishing for external routers.

Reference: vllm/distributed/kv_events.py — a ZMQ PUB stream of
BlockStored / BlockRemoved / AllBlocksCleared batches (emitted from
block_pool.py:244-255,310-319) lets prefix-cache-aware routers track
which engine holds which block hashes. This build wires the
scheduler's block-pool event callback into a per-step batch publisher
with monotonic sequence numbers and an in-memory replay buffer
(subscribers that join late request missed batches over a REQ/REP
side channel, same contract as the reference's EventPublisher).
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class KVEventsConfig:
    """Reference: vllm/config/kv_events.py KVEventsConfig."""

    enable_kv_cache_events: bool = False
    publisher: str = "zmq"  # zmq | null
    endpoint: str = "tcp://*:5557"
    replay_endpoint: Optional[str] = None
    buffer_steps: int = 100
    topic: str = "kv-events"


class NullEventPublisher:

    def record(self, kind: str, block_id: int, block_hash) -> None:
        pass

    def flush(self) -> None:
        pass

    def close(self) -> None:
        pass


class ZmqEventPublisher:
    """PUB socket; one multipart message per step that had events:
    [topic, seq_be64, payload_json]."""

    def __init__(self, config: KVEventsConfig) -> None:
        import zmq

        self._ctx = zmq.Context.instance()
        self._pub = self._ctx.socket(zmq.PUB)
        self._pub.bind(config.endpoint)
        self._topic = config.topic.encode()
        self._seq = 0
        self._pending: list[dict] = []
        self._replay: deque = deque(maxlen=config.buffer_steps)
        self._lock = threading.Lock()
        self._rep = None
        self._stop = threading.Event()
        self._thread = None
        if config.replay_endpoint:
            self._rep = self._ctx.socket(zmq.REP)
            self._rep.bind(config.replay_endpoint)
            self._thread = threading.Thread(target=self._replay_loop,
                                            daemon=True)
            self._thread.start()

    def record(self, kind: str, block_id: int, block_hash) -> None:
        self._pending.append({
            "type": {"block_stored": "BlockStored",
                     "block_removed": "BlockRemoved"}.get(kind, kind),
            "block_id": block_id,
            "block_hash": (block_hash.hex() if isinstance(
                block_hash, bytes) else str(block_hash))
            if block_hash is not None else None,
        })

    def flush(self) -> None:
        if not self._pending:
            return
        with self._lock:
            batch = {"ts": time.time(), "events": self._pending}
            self._pending = []
            payload = json.dumps(batch).encode()
            seq = self._seq
            self._seq += 1
            self._replay.append((seq, payload))
            self._pub.send_multipart(
                [self._topic, seq.to_bytes(8, "big"), payload])

    def _replay_loop(self) -> None:
        """libzmq sockets are NOT thread-safe: this thread OWNS the
        REP socket for its whole life (poll with timeout, close here
        on stop) — closing it from another thread while recv() blocks
        is a use-after-free that segfaults the process much later."""
        import zmq

        poller = zmq.Poller()
        poller.register(self._rep, zmq.POLLIN)
        try:
            while not self._stop.is_set():
                if not poller.poll(timeout=100):
                    continue
                try:
                    start_seq = int.from_bytes(
                        self._rep.recv(zmq.NOBLOCK), "big")
                except Exception:  # noqa: BLE001
                    break
                with self._lock:
                    frames = [p for s, p in self._replay
                              if s >= start_seq]
                self._rep.send_multipart(frames or [b""])
        finally:
            self._rep.close(linger=0)

    def close(self) -> None:
        self._pub.close(linger=0)
        if self._thread is not None:
            self._stop.set()
            self._thread.join(timeout=2.0)

    def __del__(self):  # GC safety net — never reap the socket here
        try:
            self._stop.set()
        except Exception:  # noqa: BLE001
            pass


def create_kv_event_publisher(config: Optional[KVEventsConfig]):
    if config is None or not config.enable_kv_cache_events or \
            config.publisher in (None, "null"):
        return NullEventPublisher()
    if config.publisher == "zmq":
        return ZmqEventPublisher(config)
    raise ValueError(f"unknown kv events publisher {config.publisher!r}")
