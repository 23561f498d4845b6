"""Multi-host runtime: bootstrap, global mesh, scheduler fan-out.

Reference architecture being replaced (SURVEY.md §2.10, §5.8): the
reference runs one WorkerProc per rank with NCCL GroupCoordinators and
a shared-memory MessageQueue broadcast (multiproc_executor.py:82).
TPU-native design (single-controller GSPMD):

- every host runs THE SAME engine binary; ``jax.distributed`` makes
  all chips of the slice visible as one device set;
- the mesh is (data, model): ``model`` (TP) maps to intra-host ICI
  rings, ``data`` spans hosts over DCN — collectives on the hot path
  ride ICI only;
- the scheduler runs on host 0 only; each step's packed input buffer
  (worker/model_runner.py) is broadcast to all hosts over ZMQ
  pub/sub, and every host feeds the identical buffer into the same
  jitted step — GSPMD keeps array shards consistent without any
  explicit rank logic;
- sampled tokens are replicated, so only host 0 materializes outputs.

Single-host degenerates to no-op bootstrap and a loopback broadcaster
(exercised by tests); multi-host execution requires a pod slice, which
this environment does not provide — the fan-out protocol and the
degenerate path are tested, the DCN path is not.
"""

from __future__ import annotations

import logging
import pickle
from typing import Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: int = 1,
                         process_id: int = 0) -> None:
    """jax.distributed bootstrap (reference analogue:
    StatelessProcessGroup TCP-store init, vllm/distributed/utils.py)."""
    if num_processes <= 1:
        return
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    logger.info("jax.distributed up: process %d/%d", process_id,
                num_processes)


def build_global_mesh(tensor_parallel_size: int,
                      data_parallel_size: int = 0):
    """(data, model) mesh with TP packed onto intra-host ICI.

    jax.devices() orders devices host-major, so reshaping
    (num_hosts*local/tp, tp) keeps each TP group within one host when
    tp <= local_device_count (the DCN boundary only crosses the data
    axis)."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    tp = tensor_parallel_size
    local = jax.local_device_count()
    if tp > local and jax.process_count() > 1:
        logger.warning(
            "tensor_parallel_size %d exceeds local devices %d — TP "
            "collectives will cross DCN", tp, local)
    total = len(devices)
    if data_parallel_size <= 0:
        data_parallel_size = total // tp
    assert data_parallel_size * tp == total, (
        f"dp({data_parallel_size}) x tp({tp}) != devices({total})")
    arr = np.array(devices).reshape(data_parallel_size, tp)
    return Mesh(arr, ("data", "model"))


class StepBroadcaster:
    """Host-0 → all-hosts fan-out of per-step packed buffers.

    The TPU-native analogue of the reference's shared-memory
    MessageQueue broadcast (shm_broadcast.py): one PUB socket on the
    scheduler host, SUB sockets on workers; payloads are
    (step_id, statics-key, packed-bytes). Loopback mode (world=1)
    short-circuits through an in-process deque so the engine code path
    is identical with or without followers.
    """

    def __init__(self, is_leader: bool = True,
                 endpoint: str = "tcp://*:5555",
                 connect: str = "tcp://localhost:5555",
                 world_size: int = 1) -> None:
        self.is_leader = is_leader
        self.world_size = world_size
        self._loopback: list = []
        self._pub = None
        self._sub = None
        if world_size > 1:
            import zmq

            ctx = zmq.Context.instance()
            if is_leader:
                self._pub = ctx.socket(zmq.PUB)
                self._pub.bind(endpoint)
            else:
                self._sub = ctx.socket(zmq.SUB)
                self._sub.connect(connect)
                self._sub.setsockopt(zmq.SUBSCRIBE, b"")

    def publish(self, step_id: int, statics: tuple,
                packed: np.ndarray) -> None:
        assert self.is_leader
        payload = pickle.dumps(
            (step_id, statics, packed.tobytes(), packed.dtype.str,
             packed.shape), protocol=pickle.HIGHEST_PROTOCOL)
        if self._pub is not None:
            self._pub.send(payload)
        else:
            self._loopback.append(payload)

    def receive(self) -> tuple[int, tuple, np.ndarray]:
        if self._sub is not None:
            payload = self._sub.recv()
        else:
            payload = self._loopback.pop(0)
        step_id, statics, raw, dtype, shape = pickle.loads(payload)
        arr = np.frombuffer(raw, dtype=np.dtype(dtype)).reshape(shape)
        return step_id, statics, arr

    def publish_shutdown(self) -> None:
        self.publish(-1, (), np.zeros(0, dtype=np.int32))

    def close(self) -> None:
        for sock in (self._pub, self._sub):
            if sock is not None:
                sock.close(0)


def worker_loop(runner, broadcaster: StepBroadcaster) -> None:
    """Non-leader hosts: execute each broadcast dispatch against the
    global GSPMD arrays (the jitted program is identical on every
    host; per-host shards stay consistent by construction).

    Sampled tokens are replicated across hosts, so the async
    prev-token chain is maintained LOCALLY from this host's own step
    outputs — the leader never ships token values, only the packed
    int32 input buffer plus the statics key that selects the compiled
    executable. Messages mirror the leader's dispatch sites in
    worker/model_runner.py: ("step", <_get_step_fn args>) for the
    fused single step and ("chunk", <_get_decode_step_fn args>) for
    multi-step decode. (Reference analogue being replaced: per-rank
    WorkerProc busy loop, vllm/v1/executor/multiproc_executor.py:82.)
    """
    import jax.numpy as jnp

    prev = prev2 = None
    while True:
        step_id, statics, packed = broadcaster.receive()
        if step_id < 0:  # shutdown sentinel
            return
        packed_dev = jnp.asarray(packed, device=runner._replicated)
        if statics[0] == "chunk":
            (r_pad, num_steps, all_greedy, need_top_k, need_top_p,
             need_min_p, has_prev, has_prev2) = statics[1:]
            chunk_fn = runner._get_decode_step_fn(
                r_pad, num_steps, all_greedy, need_top_k, need_top_p,
                need_min_p, has_prev, has_prev2)
            runner.kv_caches, _steps, last = chunk_fn(
                runner.params, runner.kv_caches, packed_dev,
                prev if has_prev else None,
                prev2 if has_prev2 else None)
            prev2, prev = prev, last
        else:
            # statics[1:] is exactly the _get_step_fn signature:
            # (t_pad, r_pad, all_greedy, need_top_k, need_top_p,
            #  need_min_p, max_num_logprobs, apply_grammar, has_prev,
            #  return_hidden, has_prev2, has_penalties, has_bias,
            #  mm_pad)
            step_fn = runner._get_step_fn(*statics[1:])
            has_prev, has_prev2 = statics[9], statics[11]
            mm_pad = statics[14]
            runner.kv_caches, out, _, _ = step_fn(
                runner.params, runner.kv_caches, packed_dev,
                prev if has_prev else None,
                prev2 if has_prev2 else None,
                mm_buffer=runner.mm_buffer if mm_pad else None,
                cross_cache=(runner.cross_cache
                             if runner.is_enc_dec else None))
            prev2, prev = prev, out.sampled
