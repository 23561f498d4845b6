"""Engine core: schedule → execute → update loop.

Reference: vllm/v1/engine/core.py ``EngineCore`` (:67) — owns the
Scheduler and the execution backend; ``step()`` (:273) runs one
iteration. TPU-native: no WorkerProc/Executor process tree — the model
runner is in-process (single-controller GSPMD, SURVEY.md §7 design
stance), so "executor" collapses to a direct call. KV-cache sizing
mirrors ``_initialize_kv_caches`` (:170): profile free HBM after weight
load, divide by page bytes.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from vllm_main_modify_tpu.config import EngineConfig
from vllm_main_modify_tpu.core.kv_cache_utils import (
    get_request_block_hasher, init_none_hash)
from vllm_main_modify_tpu.core.request import Request, RequestStatus
from vllm_main_modify_tpu.core.sched.async_scheduler import \
    create_scheduler
from vllm_main_modify_tpu.engine.types import (EngineCoreOutputs,
                                               EngineCoreRequest)
from vllm_main_modify_tpu.worker.model_runner import TPUModelRunner

logger = logging.getLogger(__name__)


def build_mesh(config: EngineConfig):
    """Device mesh from ParallelConfig: (data, model) axes."""
    import jax
    from jax.sharding import Mesh

    pc = config.parallel_config
    devices = jax.devices()
    world = pc.world_size
    if world > len(devices):
        raise ValueError(f"need {world} devices, have {len(devices)}")
    arr = np.array(devices[:world]).reshape(pc.mesh_shape)
    return Mesh(arr, pc.mesh_axes)


class EngineCore:

    def __init__(self, config: EngineConfig,
                 structured_output_manager=None,
                 mesh=None) -> None:
        self.config = config
        init_none_hash(config.model_config.seed)
        self.mesh = mesh if mesh is not None else build_mesh(config)

        self.model_runner = TPUModelRunner(config, self.mesh)
        self.model_runner.load_model()

        kv_pages = self._size_kv_cache()
        self.model_runner.initialize_kv_cache(kv_pages)
        num_pages = kv_pages[0]
        logger.info("KV cache: %s pages x %d tokens",
                    "+".join(map(str, kv_pages)),
                    config.cache_config.block_size)
        # liveness guard (reference: estimate_max_model_len /
        # "max seq len larger than KV cache" startup error,
        # vllm/v1/core/kv_cache_utils.py): a max_model_len request
        # must be admissible in EVERY kv group, else the scheduler
        # would spin forever on an unschedulable head-of-queue
        # request (observed: fp8-8B mis-sizing left 16 pages and the
        # engine spun 13M empty steps)
        bs = config.cache_config.block_size
        sc_cfg = config.scheduler_config
        enc_only = getattr(self.model_runner.model, "is_encoder_only",
                           False)
        for grp, pages in zip(
                [] if enc_only else self.model_runner.kv_groups,
                kv_pages):
            need = grp.max_pages_per_req(bs, sc_cfg.max_model_len,
                                         sc_cfg.num_lookahead_tokens)
            if pages - 1 < need:  # page/slot 0 = null block
                raise ValueError(
                    f"KV cache group '{grp.kind}' has {pages} pages "
                    f"x {bs} tokens but max_model_len="
                    f"{sc_cfg.max_model_len} needs {need}; decrease "
                    "max_model_len or free device memory (smaller "
                    "model / quantization / gpu_memory_utilization)")

        # P/D disaggregation connector (kv_transfer/connector.py):
        # the consumer role receives remote blocks into the offload
        # tier, so it forces that tier on
        from vllm_main_modify_tpu.kv_transfer import \
            create_kv_connector

        self.kv_connector = create_kv_connector(
            config.kv_transfer_config)

        offload_index = None
        swap_gb = config.cache_config.swap_space_gb
        need_offload = swap_gb > 0 or (
            self.kv_connector is not None
            and self.kv_connector.config.is_consumer)
        if need_offload and config.cache_config.enable_prefix_caching:
            from vllm_main_modify_tpu.kv_offload.manager import \
                KVOffloadIndex

            cap = int(swap_gb * (1 << 30) //
                      self.model_runner.page_bytes())
            # consumer default: mirror the device pool size
            cap = max(cap, num_pages)
            offload_index = KVOffloadIndex(cap)
            self.model_runner.init_kv_offload(cap)
            logger.info("KV offload: %d host blocks", cap)
        self.kv_offload_index = offload_index

        self.structured_output_manager = structured_output_manager
        # KV event stream for external prefix-cache-aware routers
        # (reference: vllm/distributed/kv_events.py emission from
        # block_pool.py:244-255,310-319)
        from vllm_main_modify_tpu.kv_events import \
            create_kv_event_publisher

        self.kv_event_publisher = create_kv_event_publisher(
            config.kv_events_config)
        self.scheduler = create_scheduler(
            config, num_kv_blocks=num_pages,
            structured_output_manager=structured_output_manager,
            offload_index=offload_index,
            kv_event_callback=self.kv_event_publisher.record,
            kv_groups=self.model_runner.kv_groups,
            num_blocks_per_group=kv_pages)
        if getattr(self.model_runner.model, "is_encoder_only", False):
            # bidirectional attention cannot be computed incrementally
            self.scheduler.enable_chunked_prefill = False
        # cascade attention (reference: gpu_model_runner.py:1293):
        # compute the shared-prefix hint only when the runner can
        # consume it (XLA path, single KV group, text decoder)
        self.scheduler.enable_cascade = (
            not self.model_runner.use_pallas
            and self.model_runner.num_kv_groups == 1
            and not self.model_runner.is_enc_dec
            and not self.model_runner.is_mm)
        # Gemma3-style bidirectional image blocks: prefill chunks must
        # not split an image (scheduler._trim_to_mm_boundary)
        self.scheduler.mm_span_align = bool(
            getattr(self.model_runner.model, "bidir_mm_spans", False))
        if getattr(self.model_runner.model, "prefix_lm", False):
            # PaliGemma prefix-LM: the whole bidirectional prompt must
            # enter the KV in one step (the scheduler trim also
            # refuses partial-prompt chunks, covering the
            # long_prefill_token_threshold path)
            self.scheduler.enable_chunked_prefill = False
            self.scheduler.prefix_lm = True
        # multi-step decode chunks cover plain decoder LMs; the runner
        # decides eligibility (enc-dec/mm/LoRA/spec keep single-step)
        self.scheduler.decode_steps_per_dispatch = min(
            self.scheduler.decode_steps_per_dispatch,
            self.model_runner.decode_chunk_steps)
        self.async_scheduling = config.scheduler_config.async_scheduling
        # async mode: FIFO of (scheduler_output, AsyncStepHandle) in
        # flight; depth 2 hides both the dispatch latency and the
        # host->device transfer round trip of a full step
        self.pipeline_depth = 2
        self._pending = []

        self._block_hasher = None
        if config.cache_config.enable_prefix_caching:
            # adapter identity is part of every block hash: KV computed
            # under adapter A must never serve a request under adapter
            # B (reference: LoRA extra keys,
            # vllm/v1/core/kv_cache_utils.py:420-545)
            def _lora_extra_key(request, block_idx):
                name = getattr(request, "lora_name", None)
                return (name, ) if name is not None else None

            self._block_hasher = get_request_block_hasher(
                config.cache_config.block_size,
                extra_keys_fn=_lora_extra_key)

    def _size_kv_cache(self) -> list[int]:
        """Per-KV-group page counts (one entry for single-group
        models). Block id 0 of each group is its null block."""
        cc = self.config.cache_config
        if cc.num_gpu_blocks is not None:
            return self.model_runner.plan_kv_pages(
                None, full_pages=cc.num_gpu_blocks)
        avail = self.model_runner.profile_available_kv_bytes()
        return [int(n) for n in
                self.model_runner.plan_kv_pages(avail)]

    # ------------------------------------------------------------------

    def add_request(self, request: EngineCoreRequest) -> None:
        req = Request(
            request_id=request.request_id,
            prompt_token_ids=request.prompt_token_ids,
            sampling_params=request.sampling_params,
            pooling_params=request.pooling_params,
            eos_token_id=request.eos_token_id,
            arrival_time=request.arrival_time,
            block_hasher=self._block_hasher,
            cache_salt=request.cache_salt,
            priority=request.priority,
            client_index=request.client_index,
            prompt=request.prompt,
            lora_name=request.lora_name,
            lora_path=request.lora_path,
            trace_headers=request.trace_headers,
            mm_inputs=request.mm_inputs,
        )
        if self.structured_output_manager is not None and \
                req.use_structured_output:
            self.structured_output_manager.add_request(req)
        self.scheduler.add_request(req)

    def abort_requests(self, request_ids) -> None:
        self.scheduler.finish_requests(request_ids,
                                       RequestStatus.FINISHED_ABORTED)

    def step(self) -> EngineCoreOutputs:
        """One engine iteration (reference: core.py:273-292; async
        variant mirrors step_with_batch_queue core.py:301)."""
        self._kv_connector_pre_step()
        if self.async_scheduling:
            out = self._step_async()
            self.kv_event_publisher.flush()
            return out
        if not self.scheduler.has_unfinished_requests():
            return EngineCoreOutputs()
        scheduler_output = self.scheduler.schedule()
        runner_output = self.model_runner.execute_model(scheduler_output)
        # producer scan BEFORE update_from_output: a request that
        # finishes on its last prefill chunk is freed by the update
        self._kv_connector_post_step()
        outputs = self.scheduler.update_from_output(scheduler_output,
                                                    runner_output)
        self.kv_event_publisher.flush()
        return outputs

    def _kv_connector_pre_step(self) -> None:
        """Consumer: land received remote blocks in the offload tier
        before scheduling (kv_transfer/connector.py)."""
        c = self.kv_connector
        if (c is not None and c.config.is_consumer
                and self.kv_offload_index is not None):
            c.drain_into(self.kv_offload_index,
                         self.model_runner.kv_offload_store)

    def _kv_connector_post_step(self) -> None:
        """Producer: ship KV of requests whose prompt just finished
        (reference hook: scheduler.py:344-355 connector callbacks)."""
        c = self.kv_connector
        if c is None or not c.config.is_producer:
            return
        for req in self.scheduler.running:
            if req.num_computed_tokens >= req.num_prompt_tokens and \
                    req.request_id not in c._sent_reqs:
                ids = self.scheduler.kv_cache_manager.get_block_ids(
                    req.request_id)
                if isinstance(ids, tuple):  # hybrid coordinator
                    ids = ids[0]
                c.on_prefill_finished(
                    req, list(ids),
                    self.model_runner.extract_kv_blocks)

    def _step_async(self) -> EngineCoreOutputs:
        """Pipelined step: dispatch step N+1 (and N+2) before
        materializing step N's results — the host never blocks between
        scheduling and dispatch, hiding device latency (and, on
        tunneled TPU, the full host<->device round trip)."""
        dispatched = False
        if self.scheduler.has_unfinished_requests():
            scheduler_output = self.scheduler.schedule()
            if scheduler_output.total_num_scheduled_tokens > 0:
                handle = self.model_runner.execute_model_async(
                    scheduler_output)
                self._pending.append((scheduler_output, handle))
                dispatched = True
            else:
                # still deliver batch evictions to the runner
                self.model_runner.execute_model(scheduler_output)

        outputs = EngineCoreOutputs()
        # drain when the pipeline is full — or when nothing could be
        # dispatched (idle or blocked), so in-flight work still lands
        drain = (not dispatched
                 or len(self._pending) >= self.pipeline_depth)
        if self._pending and drain:
            prev_so, prev_handle = self._pending.pop(0)
            prev_out = prev_handle.get()
            # device work for the drained step is complete; ship any
            # just-finished prefills before the update frees them
            self._kv_connector_post_step()
            outputs = self.scheduler.update_from_output(
                prev_so, prev_out)
        return outputs

    def shutdown(self) -> None:
        """Release background resources (KV-event replay thread, P/D
        connector sockets). Safe to call more than once."""
        try:
            self.kv_event_publisher.close()
        except Exception:  # noqa: BLE001
            pass
        if self.kv_connector is not None:
            try:
                self.kv_connector.close()
            except Exception:  # noqa: BLE001
                pass
        if getattr(self.model_runner, "dcp_size", 1) > 1:
            # trace-time module context (layers/attention.py); reset
            # so later engines in this process trace non-DCP
            from vllm_main_modify_tpu.layers.attention import \
                set_dcp_context

            set_dcp_context(None)

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished_requests()

    def reset_prefix_cache(self) -> bool:
        return self.scheduler.reset_prefix_cache()

    def sleep(self, level: int = 1) -> None:
        self.model_runner.sleep(level)

    def wake_up(self) -> None:
        self.model_runner.wake_up()

    def reload_weights(self) -> None:
        self.model_runner.reload_weights()

    def save_sharded_state(self, path: str) -> None:
        self.model_runner.save_sharded_state(path)

    def profile_start(self) -> None:
        import jax

        jax.profiler.start_trace("/tmp/tpu_profile")

    def profile_stop(self) -> None:
        import jax

        jax.profiler.stop_trace()
