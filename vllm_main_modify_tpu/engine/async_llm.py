"""Async serving engine.

Reference: vllm/v1/engine/async_llm.py ``AsyncLLM`` (:52) — an asyncio
frontend over a background engine core, with per-request output
streams. TPU-native structure: the engine core runs in a dedicated
*thread* of the same process (the GSPMD single-controller design needs
no process boundary; the step loop blocks on the device, releasing the
GIL during XLA execution, so the asyncio loop stays live). Outputs hop
threads via ``loop.call_soon_threadsafe`` onto per-request asyncio
queues — the analogue of the reference's ZMQ socket + output-handler
task (async_llm.py:422).
"""

from __future__ import annotations

import asyncio
import logging
import queue
import threading
import time
from typing import AsyncGenerator, Optional, Union

from vllm_main_modify_tpu.config import EngineConfig
from vllm_main_modify_tpu.engine.core import EngineCore
from vllm_main_modify_tpu.engine.llm_engine import get_tokenizer
from vllm_main_modify_tpu.engine.output_processor import OutputProcessor
from vllm_main_modify_tpu.engine.processor import Processor
from vllm_main_modify_tpu.outputs import RequestOutput
from vllm_main_modify_tpu.sampling_params import (PoolingParams,
                                                  SamplingParams)

logger = logging.getLogger(__name__)


class EngineDeadError(RuntimeError):
    """The engine-core thread died (reference: EngineDeadError,
    vllm/v1/engine/exceptions.py)."""


class AsyncLLM:

    def __init__(self, config: EngineConfig, tokenizer=None,
                 mesh=None, structured_output_manager=None,
                 engine_core=None) -> None:
        self.config = config
        if tokenizer is None and config.model_config.tokenizer:
            tokenizer = get_tokenizer(config.model_config)
        self.tokenizer = tokenizer
        if structured_output_manager is None and tokenizer is not None:
            from vllm_main_modify_tpu.structured_output import \
                StructuredOutputManager

            structured_output_manager = StructuredOutputManager(
                tokenizer, config.model_config.vocab_size)
        self.processor = Processor(config, tokenizer)
        self.output_processor = OutputProcessor(tokenizer)
        # engine_core override: multi-API-server frontends pass a
        # RouterClient to a SHARED remote core (core_client.py)
        self.engine_core = engine_core if engine_core is not None \
            else EngineCore(
                config,
                structured_output_manager=structured_output_manager,
                mesh=mesh)

        # request flow: asyncio side → input queue → core thread
        self._input_queue: "queue.Queue[tuple[str, object]]" = \
            queue.Queue()
        # req_id → (asyncio queue, loop) for output fan-out
        self._output_streams: dict[str, asyncio.Queue] = {}
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._dead: Optional[BaseException] = None
        self._shutdown = threading.Event()
        self._work_available = threading.Event()
        self._stats_lock = threading.Lock()
        self.last_stats = None

        from vllm_main_modify_tpu.tracing import init_tracer

        self._tracer = init_tracer(
            "vllm-main-modify-tpu",
            config.observability_config.otlp_traces_endpoint)

        self._core_thread = threading.Thread(target=self._core_loop,
                                             name="engine-core",
                                             daemon=True)
        self._core_thread.start()

    # ------------------------------------------------------------------
    # engine-core thread
    # ------------------------------------------------------------------

    def _core_loop(self) -> None:
        """Busy loop: drain inputs → step → publish outputs (reference:
        EngineCoreProc.run_busy_loop, core.py:724)."""
        try:
            while not self._shutdown.is_set():
                self._drain_input_queue()
                if not self.engine_core.has_unfinished_requests():
                    # idle: block until work arrives
                    self._work_available.wait(timeout=0.1)
                    self._work_available.clear()
                    continue
                core_outputs = self.engine_core.step()
                if core_outputs.scheduler_stats is not None:
                    with self._stats_lock:
                        self.last_stats = core_outputs.scheduler_stats
                result = self.output_processor.process_outputs(
                    core_outputs.outputs)
                if result.reqs_to_abort:
                    self.engine_core.abort_requests(result.reqs_to_abort)
                for ro in result.request_outputs:
                    if self._tracer is not None and ro.finished:
                        from vllm_main_modify_tpu.tracing import \
                            emit_request_span

                        emit_request_span(
                            self._tracer,
                            self.config.model_config.model,
                            ro.request_id,
                            getattr(ro, "metrics", None))
                    self._publish(ro)
        except BaseException as e:  # noqa: BLE001
            logger.exception("engine core died")
            self._dead = e
            self._dump_crash_state(e)
            # wake every waiter with the failure
            if self._loop is not None:
                for rid in list(self._output_streams):
                    self._publish_exception(rid, e)

    def _dump_crash_state(self, exc: BaseException) -> None:
        """Write a scheduler-state snapshot for postmortems
        (reference capability: dump_engine_exception,
        vllm/logging_utils/dump_input.py — engine state + request
        summary on crash)."""
        import json
        import time as _time
        import traceback

        try:
            sched = getattr(self.engine_core, "scheduler", None)
            if sched is None:  # remote (ZMQ) engine core
                return
            state = {
                "time": _time.time(),
                "error": repr(exc),
                "traceback": traceback.format_exc(),
                "model": self.config.model_config.model,
                "num_waiting": len(sched.waiting),
                "num_running": len(sched.running),
                "kv_usage": sched.kv_cache_manager.usage,
                "requests": [{
                    "request_id": r.request_id,
                    "status": str(r.status),
                    "num_prompt_tokens": r.num_prompt_tokens,
                    "num_computed_tokens": r.num_computed_tokens,
                    "num_tokens": r.num_tokens,
                } for r in list(sched.running) +
                    list(sched.waiting)[:64]],
            }
            path = f"/tmp/vllm_tpu_crash_{int(_time.time())}.json"
            with open(path, "w") as f:
                json.dump(state, f, indent=1, default=str)
            logger.error("scheduler state dumped to %s", path)
        except Exception:  # noqa: BLE001 — never mask the real error
            logger.exception("crash-state dump failed")

    def _drain_input_queue(self) -> None:
        while True:
            try:
                action, payload = self._input_queue.get_nowait()
            except queue.Empty:
                return
            if action == "add":
                request = payload
                self.output_processor.add_request(request)
                self.engine_core.add_request(request)
            elif action == "abort":
                self.output_processor.abort_requests([payload])
                self.engine_core.abort_requests([payload])

    def _publish(self, ro: RequestOutput) -> None:
        q = self._output_streams.get(ro.request_id)
        if q is None or self._loop is None:
            return
        self._loop.call_soon_threadsafe(q.put_nowait, ro)

    def _publish_exception(self, rid: str, e: BaseException) -> None:
        q = self._output_streams.get(rid)
        if q is not None and self._loop is not None:
            self._loop.call_soon_threadsafe(q.put_nowait,
                                            EngineDeadError(str(e)))

    # ------------------------------------------------------------------
    # asyncio API (reference: AsyncLLM.generate async_llm.py:323)
    # ------------------------------------------------------------------

    async def generate(
        self,
        prompt: Union[str, list[int], dict],
        sampling_params: SamplingParams,
        request_id: str,
        lora_request=None,
        priority: int = 0,
        trace_headers: Optional[dict[str, str]] = None,
    ) -> AsyncGenerator[RequestOutput, None]:
        if self._dead is not None:
            raise EngineDeadError(str(self._dead))
        self._loop = asyncio.get_running_loop()
        request = self.processor.process_inputs(
            request_id, prompt, sampling_params, priority=priority,
            lora_request=lora_request, trace_headers=trace_headers)
        q: asyncio.Queue = asyncio.Queue()
        self._output_streams[request_id] = q
        self._input_queue.put(("add", request))
        self._work_available.set()
        try:
            while True:
                item = await q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
                if item.finished:
                    return
        finally:
            self._output_streams.pop(request_id, None)
            if not self._dead:
                # client disconnected mid-stream → abort in core
                self._input_queue.put(("abort", request_id))
                self._work_available.set()

    async def abort(self, request_id: str) -> None:
        self._input_queue.put(("abort", request_id))
        self._work_available.set()

    def is_healthy(self) -> bool:
        return self._dead is None and self._core_thread.is_alive()

    def shutdown(self) -> None:
        self._shutdown.set()
        self._work_available.set()
        self._core_thread.join(timeout=5)
        if hasattr(self.engine_core, "shutdown"):
            self.engine_core.shutdown()
