"""KV connectors: prefill/decode disaggregation over a block stream.

Reference capability: vllm/distributed/kv_transfer/kv_connector/v1/
(base.py scheduler/worker hooks, nixl_connector.py / p2p connectors).
TPU-native design — the transfer rides the engine's existing
hash-addressed KV tiers instead of a bespoke side channel:

- the PRODUCER (prefill engine) watches for requests whose prompt just
  finished; it gathers their full KV pages off the device (one batched
  gather, same path as host offload) and ships
  ``(block_hash, page_data)`` pairs;
- the CONSUMER (decode engine) drains received pairs into its host
  offload store + scheduler offload index at each step start; when the
  forwarded request arrives (same prompt → same hash chain), the
  ordinary offload-restore path loads the pages into fresh device
  blocks and prefill is skipped (all but the final block, which must
  be recomputed to produce logits).

Because delivery lands in a cache TIER, arrival order doesn't matter:
a request that outruns its KV simply recomputes locally — correctness
never depends on the transfer (the reference makes the request WAIT;
here waiting is a policy choice the proxy makes by sequencing).

Transports: ZMQ PUSH/PULL over TCP/IPC for real deployments; an
in-process queue registry for single-process tests and colocated
engines.
"""

from __future__ import annotations

import struct
import threading
from collections import defaultdict
from dataclasses import dataclass
from typing import Optional

import logging

import numpy as np

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------
# wire format
#
# Block payloads cross a network boundary (the consumer's PULL socket
# is reachable by anything that can reach listen_addr), so the codec
# must be NON-EXECUTABLE: a length-prefixed struct header + raw array
# bytes, never pickle. Layout (little-endian):
#
#   b"KVX1" | u32 count | count x [ u16 hash_len | hash |
#       u8 dtype_len | dtype-name utf8 | u8 ndim | ndim x u32 dims |
#       u64 nbytes | raw bytes ]

_MAGIC = b"KVX1"


def _np_dtype(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes  # registered extension dtypes (bfloat16 &c)

        return np.dtype(getattr(ml_dtypes, name))


def encode_blocks(pairs: list) -> bytes:
    """Serialize ``[(hash_bytes, np_array), ...]`` (non-executable)."""
    out = [_MAGIC, struct.pack("<I", len(pairs))]
    for h, arr in pairs:
        arr = np.ascontiguousarray(arr)
        dt = str(arr.dtype).encode()
        out.append(struct.pack(f"<H{len(h)}sB{len(dt)}sB", len(h), h,
                               len(dt), dt, arr.ndim))
        out.append(struct.pack(f"<{arr.ndim}I", *arr.shape))
        raw = arr.tobytes()
        out.append(struct.pack("<Q", len(raw)))
        out.append(raw)
    return b"".join(out)


def decode_blocks(payload: bytes) -> list:
    """Inverse of :func:`encode_blocks`; raises ValueError on any
    malformed input instead of executing it."""
    if payload[:4] != _MAGIC:
        raise ValueError("bad kv-transfer magic")
    try:
        return _decode_body(payload)
    except (struct.error, UnicodeDecodeError, AttributeError) as e:
        raise ValueError(f"malformed kv-transfer payload: {e}") from e


def _decode_body(payload: bytes) -> list:
    pos = 4
    (count,) = struct.unpack_from("<I", payload, pos)
    pos += 4
    pairs = []
    for _ in range(count):
        (hlen,) = struct.unpack_from("<H", payload, pos)
        pos += 2
        h = payload[pos:pos + hlen]
        pos += hlen
        (dlen,) = struct.unpack_from("<B", payload, pos)
        pos += 1
        dtype = _np_dtype(payload[pos:pos + dlen].decode())
        pos += dlen
        (ndim,) = struct.unpack_from("<B", payload, pos)
        pos += 1
        shape = struct.unpack_from(f"<{ndim}I", payload, pos)
        pos += 4 * ndim
        (nbytes,) = struct.unpack_from("<Q", payload, pos)
        pos += 8
        if nbytes != int(np.prod(shape, dtype=np.int64)) * \
                dtype.itemsize or pos + nbytes > len(payload):
            raise ValueError("kv-transfer length mismatch")
        arr = np.frombuffer(payload, dtype=dtype, count=int(
            np.prod(shape, dtype=np.int64)), offset=pos).reshape(shape)
        pos += nbytes
        pairs.append((h, arr))
    return pairs


@dataclass
class KVTransferConfig:
    """Reference: vllm/config/kv_transfer.py KVTransferConfig."""

    kv_role: str = "kv_consumer"  # kv_producer | kv_consumer | kv_both
    transport: str = "zmq"  # zmq | inproc
    # zmq: producer connects peer_addr, consumer binds listen_addr
    peer_addr: str = ""
    listen_addr: str = ""
    # inproc: shared channel name
    channel: str = "default"

    @property
    def is_producer(self) -> bool:
        return self.kv_role in ("kv_producer", "kv_both")

    @property
    def is_consumer(self) -> bool:
        return self.kv_role in ("kv_consumer", "kv_both")


# ---------------------------------------------------------------------
# transports

_INPROC_CHANNELS: dict[str, list] = defaultdict(list)
_INPROC_LOCK = threading.Lock()


class InprocTransport:
    """Single-process queue registry (tests, colocated engines)."""

    def __init__(self, channel: str) -> None:
        self.channel = channel

    def send(self, payload: bytes) -> None:
        with _INPROC_LOCK:
            _INPROC_CHANNELS[self.channel].append(payload)

    def recv_all(self) -> list[bytes]:
        with _INPROC_LOCK:
            out = _INPROC_CHANNELS[self.channel]
            _INPROC_CHANNELS[self.channel] = []
        return out

    def close(self) -> None:
        pass


class ZmqTransport:
    """PUSH (producer) / PULL (consumer) over TCP or IPC."""

    def __init__(self, send_addr: str = "",
                 recv_addr: str = "") -> None:
        import zmq

        self.ctx = zmq.Context.instance()
        self.push = self.pull = None
        if send_addr:
            self.push = self.ctx.socket(zmq.PUSH)
            self.push.connect(send_addr)
        if recv_addr:
            self.pull = self.ctx.socket(zmq.PULL)
            self.pull.bind(recv_addr)

    def send(self, payload: bytes) -> None:
        self.push.send(payload)

    def recv_all(self) -> list[bytes]:
        import zmq

        out = []
        while True:
            try:
                out.append(self.pull.recv(flags=zmq.NOBLOCK))
            except zmq.Again:
                return out

    def close(self) -> None:
        for s in (self.push, self.pull):
            if s is not None:
                s.close(linger=0)


# ---------------------------------------------------------------------


class KVConnector:
    """Engine-side connector driving both roles.

    Scheduler/worker split mirrors the reference's
    ``KVConnectorBase_V1`` scheduler-side (which blocks are remote)
    vs worker-side (move bytes) roles, collapsed into the engine step
    since our offload tier already owns both indexes."""

    def __init__(self, config: KVTransferConfig) -> None:
        self.config = config
        if config.transport == "inproc":
            self.transport = InprocTransport(config.channel)
        else:
            self.transport = ZmqTransport(
                send_addr=config.peer_addr if config.is_producer
                else "",
                recv_addr=config.listen_addr if config.is_consumer
                else "")
        self._sent_reqs: set[str] = set()
        self.blocks_sent = 0
        self.blocks_received = 0

    # -------------------------------------------------- producer side

    def on_prefill_finished(self, request, block_ids: list,
                            extract_fn) -> None:
        """Ship the request's FULL blocks (hash-addressed).

        ``extract_fn(ids) -> np [L, n, page, W]`` gathers device
        pages (runner.extract_kv_blocks)."""
        if request.request_id in self._sent_reqs:
            return
        self._sent_reqs.add(request.request_id)
        hashes = list(request.block_hashes)
        n = min(len(hashes), len(block_ids))
        if n == 0:
            return
        data = extract_fn(block_ids[:n])  # [L, n, page, W]
        pairs = [(bytes(hashes[i]), np.asarray(data[:, i]))
                 for i in range(n)]
        self.transport.send(encode_blocks(pairs))
        self.blocks_sent += n
        logger.debug("kv_transfer: sent %d blocks for %s", n,
                     request.request_id)

    def drop_request(self, request_id: str) -> None:
        self._sent_reqs.discard(request_id)

    # -------------------------------------------------- consumer side

    def drain_into(self, offload_index, offload_store) -> int:
        """Move received blocks into the offload tier (step start)."""
        n = 0
        for payload in self.transport.recv_all():
            try:
                pairs = decode_blocks(payload)
            except (ValueError, struct.error, UnicodeDecodeError,
                    AttributeError) as e:
                logger.warning("kv_transfer: dropping malformed "
                               "payload (%s)", e)
                continue
            for h, arr in pairs:
                offload_store.put(h, arr)
                offload_index.add(h)
                n += 1
        self.blocks_received += n
        return n

    def close(self) -> None:
        self.transport.close()


def create_kv_connector(config: Optional[KVTransferConfig]
                        ) -> Optional[KVConnector]:
    if config is None:
        return None
    return KVConnector(config)
