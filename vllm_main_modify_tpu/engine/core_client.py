"""Engine-core client variants: in-process, background-process (ZMQ),
and data-parallel load balancing.

Reference: vllm/v1/engine/core_client.py (EngineCoreClient.make_client
:61, MPClient :399, SyncMPClient :597, engine-death monitor :541) and
core.py EngineCoreProc (:454) / DPEngineCoreProc (:948). TPU-native
differences:

- the engine process is a SINGLE process per engine (GSPMD owns all
  chips of the engine's mesh), so there is no per-rank WorkerProc
  fan-out behind it — "multiprocess mode" is purely frontend/engine
  isolation;
- RPC is a pickled request/reply PAIR socket over ipc:// (msgspec is
  not in this environment; this is trusted same-host IPC);
- DP load balancing is client-side least-loaded dispatch over N
  engine processes, each with its own KV cache and scheduler — the
  reference's wave/coordinator protocol collapses because the TPU
  engines do not need lockstep dummy batches (no cross-engine
  collectives outside a step).
"""

from __future__ import annotations

import os
import pickle
import tempfile
import time
import uuid
from typing import Optional

from vllm_main_modify_tpu.config import EngineConfig
from vllm_main_modify_tpu.engine.types import EngineCoreOutputs


class EngineDeadError(RuntimeError):
    pass


# ----------------------------------------------------------------------
# child-process entry
# ----------------------------------------------------------------------

def run_engine_core(config: EngineConfig, addr: str) -> None:
    """Busy loop of the engine process (reference: EngineCoreProc
    run_busy_loop core.py:724 — here RPC request/reply; the sync
    client drives stepping)."""
    # honor a cpu request despite the axon TPU plugin override
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import zmq

    from vllm_main_modify_tpu.engine.core import EngineCore
    from vllm_main_modify_tpu.engine.llm_engine import get_tokenizer

    ctx = zmq.Context()
    sock = ctx.socket(zmq.PAIR)
    sock.bind(addr)

    structured_output_manager = None
    try:
        tokenizer = get_tokenizer(config.model_config)
        if tokenizer is not None:
            from vllm_main_modify_tpu.structured_output import \
                StructuredOutputManager

            structured_output_manager = StructuredOutputManager(
                tokenizer, config.model_config.vocab_size)
        core = EngineCore(
            config,
            structured_output_manager=structured_output_manager)
        sock.send(pickle.dumps(("ready", None)))
    except Exception as e:  # noqa: BLE001
        sock.send(pickle.dumps(("init_error", repr(e))))
        return

    while True:
        cmd, payload = pickle.loads(sock.recv())
        try:
            if cmd == "add_request":
                core.add_request(payload)
                result = None
            elif cmd == "step":
                result = core.step()
            elif cmd == "abort":
                core.abort_requests(payload)
                result = None
            elif cmd == "has_unfinished":
                result = core.has_unfinished_requests()
            elif cmd == "num_unfinished":
                result = core.scheduler.get_num_unfinished_requests()
            elif cmd == "reset_prefix_cache":
                result = core.reset_prefix_cache()
            elif cmd == "shutdown":
                sock.send(pickle.dumps(("ok", None)))
                break
            else:
                raise ValueError(f"unknown command {cmd!r}")
            sock.send(pickle.dumps(("ok", result)))
        except Exception as e:  # noqa: BLE001
            sock.send(pickle.dumps(("error", repr(e))))


# ----------------------------------------------------------------------
# clients
# ----------------------------------------------------------------------

class SyncMPClient:
    """Engine core in a background 'spawn' process; pickled RPC over a
    zmq PAIR socket; death detection via poll timeout + liveness
    (reference: SyncMPClient core_client.py:597 + monitor :541)."""

    def __init__(self, config: EngineConfig,
                 rpc_timeout_s: float = 600.0) -> None:
        import subprocess
        import sys

        import zmq

        self._addr = "ipc://" + os.path.join(
            tempfile.gettempdir(), f"vmt-engine-{uuid.uuid4().hex}")
        # launch as `python -m <this module>` rather than mp.spawn:
        # spawn re-imports the user's __main__ (requiring the
        # if __name__ == "__main__" guard footgun); a fresh
        # interpreter does not
        cfg_path = os.path.join(
            tempfile.gettempdir(), f"vmt-cfg-{uuid.uuid4().hex}.pkl")
        with open(cfg_path, "wb") as f:
            pickle.dump(config, f)
        self._proc = subprocess.Popen(
            [sys.executable, "-m",
             "vllm_main_modify_tpu.engine.core_client", self._addr,
             cfg_path])
        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.PAIR)
        self._sock.connect(self._addr)
        self._timeout_ms = int(rpc_timeout_s * 1000)
        status, detail = self._recv()
        if status != "ready":
            raise EngineDeadError(
                f"engine core failed to start: {detail}")

    def _recv(self):
        import zmq

        deadline = time.monotonic() + self._timeout_ms / 1000
        while True:
            if self._sock.poll(1000, zmq.POLLIN):
                return pickle.loads(self._sock.recv())
            if self._proc.poll() is not None:
                raise EngineDeadError(
                    "engine core process died "
                    f"(exitcode={self._proc.returncode})")
            if time.monotonic() > deadline:
                raise EngineDeadError("engine core RPC timeout")

    def _rpc(self, cmd: str, payload=None):
        self._sock.send(pickle.dumps((cmd, payload)))
        status, result = self._recv()
        if status == "error":
            raise ValueError(result)
        return result

    # EngineCore interface
    def add_request(self, request) -> None:
        self._rpc("add_request", request)

    def step(self) -> EngineCoreOutputs:
        return self._rpc("step")

    # split-phase step for concurrent fan-out (DPLBClient): send the
    # RPC to every engine first, collect replies after — dp=N wall
    # time becomes max(engine step) instead of sum
    def step_send(self) -> None:
        self._sock.send(pickle.dumps(("step", None)))

    def step_recv(self) -> EngineCoreOutputs:
        status, result = self._recv()
        if status == "error":
            raise ValueError(result)
        return result

    def abort_requests(self, request_ids) -> None:
        self._rpc("abort", list(request_ids))

    def has_unfinished_requests(self) -> bool:
        return bool(self._rpc("has_unfinished"))

    def get_num_unfinished_requests(self) -> int:
        return int(self._rpc("num_unfinished"))

    def reset_prefix_cache(self) -> bool:
        return bool(self._rpc("reset_prefix_cache"))

    def shutdown(self) -> None:
        try:
            self._rpc("shutdown")
        except Exception:  # noqa: BLE001
            pass
        try:
            self._proc.wait(timeout=5)
        except Exception:  # noqa: BLE001
            self._proc.kill()
        self._sock.close(linger=0)


class DPLBClient:
    """Data-parallel engines with client-side least-loaded dispatch
    (reference capability: DPEngineCoreProc + DPCoordinator +
    internal load balancing, core.py:948 / coordinator.py:22). Each
    engine owns its KV cache and scheduler; a request is pinned to
    one engine for its lifetime."""

    def __init__(self, config: EngineConfig, dp_size: int) -> None:
        import copy

        # each engine is a complete dp=1 instance; the DP axis lives
        # in THIS client, not in the child's mesh
        child_cfg = copy.deepcopy(config)
        child_cfg.parallel_config.data_parallel_size = 1
        child_cfg.parallel_config.engine_multiprocess = False
        self._child_cfg = child_cfg
        self.engines = [SyncMPClient(child_cfg)
                        for _ in range(dp_size)]
        self._req_engine: dict[str, int] = {}
        self._loads = [0] * dp_size
        self._draining: set[int] = set()

    def add_request(self, request) -> None:
        live = [j for j in range(len(self.engines))
                if j not in self._draining
                and self.engines[j] is not None]
        i = min(live, key=lambda j: self._loads[j])
        self._req_engine[request.request_id] = i
        self._loads[i] += 1
        self.engines[i].add_request(request)

    def step(self) -> EngineCoreOutputs:
        merged = EngineCoreOutputs()
        # fan out, then collect: the engines (separate processes) step
        # CONCURRENTLY, so dp=N wall time ~ max engine step, not the
        # sum (reference: per-rank DPEngineCoreProc busy loops run in
        # parallel, core.py:1040)
        active = [(i, eng) for i, eng in enumerate(self.engines)
                  if eng is not None and self._loads[i]]
        for _, eng in active:
            eng.step_send()
        for i, eng in active:
            out = eng.step_recv()
            for o in out.outputs:
                if o.finished:
                    self._loads[i] -= 1
                    self._req_engine.pop(o.request_id, None)
            merged.outputs.extend(out.outputs)
        self._reap_drained()
        return merged

    # -- elastic scale up/down (reference: elastic EP scaling,
    # v1/engine/utils.py:473 + /scale_elastic_ep) ---------------------

    @property
    def num_engines(self) -> int:
        return sum(1 for e in self.engines
                   if e is not None) - len(self._draining)

    def scale(self, new_size: int) -> int:
        """Grow by spawning fresh engine processes; shrink by marking
        victims DRAINING (no new routing) and reaping them once their
        in-flight requests finish. Returns the target size."""
        assert new_size >= 1
        current = self.num_engines
        if new_size > current:
            for _ in range(new_size - current):
                self.engines.append(SyncMPClient(self._child_cfg))
                self._loads.append(0)
        elif new_size < current:
            live = [j for j in range(len(self.engines))
                    if self.engines[j] is not None
                    and j not in self._draining]
            # drain the most lightly loaded engines first
            victims = sorted(live,
                             key=lambda j: self._loads[j]
                             )[:current - new_size]
            self._draining.update(victims)
            self._reap_drained()
        return new_size

    def _reap_drained(self) -> None:
        for i in list(self._draining):
            if self._loads[i] == 0:
                self.engines[i].shutdown()
                self.engines[i] = None
                self._draining.discard(i)

    def abort_requests(self, request_ids) -> None:
        by_engine: dict[int, list[str]] = {}
        for rid in request_ids:
            i = self._req_engine.pop(rid, None)
            if i is not None:
                by_engine.setdefault(i, []).append(rid)
                self._loads[i] -= 1
        for i, rids in by_engine.items():
            self.engines[i].abort_requests(rids)

    def has_unfinished_requests(self) -> bool:
        return any(self._loads)

    def get_num_unfinished_requests(self) -> int:
        return sum(self._loads)

    def reset_prefix_cache(self) -> bool:
        return all(e.reset_prefix_cache() for e in self.engines
                   if e is not None)

    def shutdown(self) -> None:
        for e in self.engines:
            if e is not None:
                e.shutdown()


def _child_main() -> None:
    import sys

    addr, cfg_path = sys.argv[1], sys.argv[2]
    with open(cfg_path, "rb") as f:
        config = pickle.load(f)
    os.unlink(cfg_path)
    run_engine_core(config, addr)


def make_engine_core_client(config: EngineConfig,
                            structured_output_manager=None,
                            mesh=None):
    """Reference: EngineCoreClient.make_client core_client.py:61."""
    pc = config.parallel_config
    dp = getattr(pc, "data_parallel_size", 1) or 1
    if dp > 1:
        return DPLBClient(config, dp)
    if getattr(pc, "engine_multiprocess", False):
        return SyncMPClient(config)
    from vllm_main_modify_tpu.engine.core import EngineCore

    return EngineCore(
        config, structured_output_manager=structured_output_manager,
        mesh=mesh)


if __name__ == "__main__":
    _child_main()


# ----------------------------------------------------------------------
# multi-API-server scale-out (reference: vllm serve
# --api-server-count N + headless engines, entrypoints/openai/
# api_server.py launcher — N frontend processes share ONE engine-core
# process; outputs route back by client identity)
# ----------------------------------------------------------------------


def run_engine_core_router(config: EngineConfig, addr: str) -> None:
    """Engine-core process serving MANY frontends over a ROUTER
    socket. Control messages answer inline; token outputs are PUSHED
    to the owning frontend after every step (the reference's
    EngineCoreProc output socket, expressed as routed pushes)."""
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import zmq

    from vllm_main_modify_tpu.engine.core import EngineCore
    from vllm_main_modify_tpu.engine.llm_engine import get_tokenizer

    ctx = zmq.Context()
    sock = ctx.socket(zmq.ROUTER)
    sock.bind(addr)

    structured_output_manager = None
    init_err = None
    core = None
    try:
        tokenizer = get_tokenizer(config.model_config)
        if tokenizer is not None:
            from vllm_main_modify_tpu.structured_output import \
                StructuredOutputManager

            structured_output_manager = StructuredOutputManager(
                tokenizer, config.model_config.vocab_size)
        core = EngineCore(
            config,
            structured_output_manager=structured_output_manager)
    except Exception as e:  # noqa: BLE001
        init_err = repr(e)

    owner: dict[str, bytes] = {}  # request_id -> client identity

    def drain(block_ms: int) -> bool:
        """Process pending client messages; returns False on
        shutdown."""
        while True:
            if not sock.poll(block_ms, zmq.POLLIN):
                return True
            block_ms = 0
            ident, raw = sock.recv_multipart()
            cmd, payload = pickle.loads(raw)
            try:
                if cmd == "hello":
                    reply = ("init_error", init_err) if init_err \
                        else ("ready", None)
                    sock.send_multipart(
                        [ident, pickle.dumps(reply)])
                    continue
                if cmd == "add_request":
                    owner[payload.request_id] = ident
                    core.add_request(payload)
                    continue  # no reply: adds are fire-and-forget
                if cmd == "abort":
                    core.abort_requests(payload)
                    continue
                if cmd == "shutdown":
                    sock.send_multipart(
                        [ident, pickle.dumps(("ok", None))])
                    return False
                if cmd == "reset_prefix_cache":
                    result = core.reset_prefix_cache()
                elif cmd == "num_unfinished":
                    result = \
                        core.scheduler.get_num_unfinished_requests()
                else:
                    raise ValueError(f"unknown command {cmd!r}")
                sock.send_multipart(
                    [ident, pickle.dumps(("ok", result))])
            except Exception as e:  # noqa: BLE001
                sock.send_multipart(
                    [ident, pickle.dumps(("error", repr(e)))])

    while True:
        if not drain(0 if (core is not None and
                           core.has_unfinished_requests()) else 100):
            break
        if core is None or not core.has_unfinished_requests():
            continue
        out = core.step()
        if not out.outputs:
            continue
        by_client: dict[bytes, list] = {}
        for o in out.outputs:
            ident = owner.get(o.request_id)
            if ident is None:
                continue
            by_client.setdefault(ident, []).append(o)
            if o.finished:
                owner.pop(o.request_id, None)
        for ident, outs in by_client.items():
            sock.send_multipart([ident, pickle.dumps(
                ("outputs",
                 EngineCoreOutputs(outputs=outs,
                                   scheduler_stats=
                                   out.scheduler_stats)))])
    if core is not None and hasattr(core, "shutdown"):
        core.shutdown()


class RouterClient:
    """Frontend-side client for ``run_engine_core_router``: a DEALER
    socket per API-server process. ``step()`` blocks (100 ms) on the
    next pushed output batch, so AsyncLLM's core loop works unchanged;
    unfinished-request tracking is local (adds minus finishes)."""

    def __init__(self, addr: str, connect_timeout_s: float = 300.0):
        import zmq

        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.DEALER)
        self._sock.connect(addr)
        self._inflight: set[str] = set()
        # Output batches the router pushed while we were waiting for
        # a control reply; step() drains these before reading the
        # socket so no token batch is ever dropped.
        self._pending_outputs: list = []
        self.scheduler = None  # marks this as a remote core
        self._send(("hello", None))
        status, payload = self._recv_reply(
            timeout_ms=int(connect_timeout_s * 1000))
        if status == "init_error":
            raise EngineDeadError(f"engine init failed: {payload}")
        assert status == "ready", status

    def _send(self, msg) -> None:
        self._sock.send(pickle.dumps(msg))

    def _recv_reply(self, timeout_ms: int = 60000):
        """Next CONTROL reply. The router pushes ('outputs', ...)
        batches to the same DEALER identity asynchronously, so any
        outputs read here are buffered for step(), not dropped."""
        import zmq

        while True:
            if not self._sock.poll(timeout_ms, zmq.POLLIN):
                raise EngineDeadError("engine core not responding")
            status, payload = pickle.loads(self._sock.recv())
            if status == "outputs":
                self._pending_outputs.append(payload)
                continue
            return status, payload

    # ---- EngineCore interface used by AsyncLLM -----------------------

    def add_request(self, request) -> None:
        self._inflight.add(request.request_id)
        self._send(("add_request", request))

    def abort_requests(self, request_ids) -> None:
        for rid in request_ids:
            self._inflight.discard(rid)
        self._send(("abort", list(request_ids)))

    def has_unfinished_requests(self) -> bool:
        return bool(self._inflight)

    def step(self) -> EngineCoreOutputs:
        import zmq

        if self._pending_outputs:
            payload = self._pending_outputs.pop(0)
        else:
            if not self._sock.poll(100, zmq.POLLIN):
                return EngineCoreOutputs()
            status, payload = pickle.loads(self._sock.recv())
            if status == "error":
                raise EngineDeadError(str(payload))
            if status != "outputs":
                return EngineCoreOutputs()
        for o in payload.outputs:
            if o.finished:
                self._inflight.discard(o.request_id)
        return payload

    def reset_prefix_cache(self) -> bool:
        self._send(("reset_prefix_cache", None))
        status, payload = self._recv_reply()
        return payload

    def shutdown(self) -> None:
        try:
            self._send(("shutdown", None))
        except Exception:  # noqa: BLE001
            pass
        self._sock.close(linger=0)
