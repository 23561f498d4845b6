"""TPU model runner: the device hot path.

Reference: vllm/v1/worker/tpu_model_runner.py (``TPUModelRunner``) and
gpu_model_runner.py. TPU-native redesign:

- ONE jitted step function: forward → gather logits at sample positions
  → sample — no per-phase jitted callables to stitch on host
  (the reference splits select_hidden_states / compute_logits / sample,
  tpu_model_runner.py:1746-1806, because torch_xla lacks a fused jit;
  JAX does not).
- Static shapes via bucketed padding of token and request counts
  (reference precedent: _get_token_paddings tpu_model_runner.py:1892,
  _get_req_paddings :1874); every (token_bucket, req_bucket,
  sampler-static) combination hits a cached XLA executable.
- KV caches are donated through the step, so the paged cache is updated
  in place with zero copies.
- Parallelism is GSPMD: params and KV enter sharded; the same step
  function runs unmodified on any mesh.
"""

from __future__ import annotations

import contextlib
import functools
from collections import OrderedDict
import logging
import time
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu import envs
from vllm_main_modify_tpu.config import EngineConfig
from vllm_main_modify_tpu.core.kv_cache_interface import \
    normalize_kv_groups
from vllm_main_modify_tpu.core.sched.output import SchedulerOutput
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   KVGroupMeta)
from vllm_main_modify_tpu.models.loader import load_model_weights
from vllm_main_modify_tpu.models.registry import create_model
from vllm_main_modify_tpu.ops.kv_cache import (QuantizedKV,
                                               kv_cache_shape)
from vllm_main_modify_tpu.quantization.weights import lora_context
from vllm_main_modify_tpu.sample.metadata import SamplingMetadata
from vllm_main_modify_tpu.sample.sampler import sample
from vllm_main_modify_tpu.utils import cdiv, next_power_of_2
from vllm_main_modify_tpu.worker.input_batch import (CachedRequestState,
                                                     InputBatch)
from vllm_main_modify_tpu.worker.outputs import (LogprobsLists,
                                                 ModelRunnerOutput)

logger = logging.getLogger(__name__)

# smallest padded token batch (one bf16 MXU tile's worth of rows)


def _instance_memo(fn):
    """Per-INSTANCE memoization. functools.lru_cache on a bound method
    keys on ``self`` and pins every runner — and with it every
    compiled executable and the full param tree — for the process
    lifetime. A per-instance dict keeps the cache semantics and lets
    dead runners (tests, sleep/wake cycles, multi-engine processes)
    actually free their device state."""
    import functools as _ft

    name = "_memo_" + fn.__name__

    @_ft.wraps(fn)
    def wrapper(self, *args):
        cache = getattr(self, name, None)
        if cache is None:
            cache = {}
            setattr(self, name, cache)
        if args not in cache:
            cache[args] = fn(self, *args)
        return cache[args]

    def cache_clear(self):
        getattr(self, "_memo_" + fn.__name__, {}).clear()

    wrapper.clear_for = cache_clear
    return wrapper


MIN_TOKEN_BUCKET = 16
MIN_REQ_BUCKET = 8


class TPUModelRunner:

    def __init__(self, config: EngineConfig, mesh: Mesh,
                 use_pallas: Optional[bool] = None) -> None:
        self.config = config
        self.mesh = mesh
        if use_pallas is None:
            use_pallas = jax.devices()[0].platform == "tpu"
        self.use_pallas = use_pallas
        mc = config.model_config
        cc = config.cache_config
        sc = config.scheduler_config

        self.page_size = cc.block_size
        self.max_model_len = mc.max_model_len
        self.max_num_reqs = sc.max_num_seqs
        self.max_num_tokens = sc.max_num_batched_tokens
        self.max_blocks_per_req = cdiv(self.max_model_len, self.page_size)

        self.model = create_model(mc)
        self.params: Optional[dict] = None
        # single-group models: one stacked array; hybrid models: a
        # tuple of per-group arrays (core/kv_cache_interface.py)
        self.kv_caches = None
        self.num_pages = 0
        self.kv_groups = normalize_kv_groups(
            self.model, enable_hybrid=not cc.disable_hybrid_kv)
        self.num_kv_groups = len(self.kv_groups)

        self.input_batch = InputBatch(self.max_num_reqs,
                                      self.max_model_len,
                                      self.max_blocks_per_req,
                                      num_kv_groups=self.num_kv_groups)
        self.requests: dict[str, CachedRequestState] = {}

        self.token_buckets = self._get_paddings(MIN_TOKEN_BUCKET,
                                                self.max_num_tokens)
        self.req_buckets = self._get_paddings(MIN_REQ_BUCKET,
                                              self.max_num_reqs)
        self._step_count = 0
        self.cascade_steps = 0  # steps served via cascade attention
        # async pipelining state: device arrays of the last TWO steps'
        # sampled tokens + req_id -> (age, dispatch row, position)
        # fills (age 0 = newest). Depth-2 pipelining keeps two steps in
        # flight, so a chained input token may come from either array.
        self._prev_sampled = None
        self._prev_sampled2 = None
        self._pending_fill: dict[str, tuple[int, int, int]] = {}
        # prompt logprobs accumulators: req_id -> [None, {tid: Logprob}...]
        self._prompt_lp_acc: dict[str, list] = {}
        # sleep/wake state
        self._host_params = None
        self._param_shardings = None
        # host-RAM KV offload store (kv_offload/manager.py)
        self.kv_offload_store = None
        # jit-cache-miss sanitizer (SURVEY.md §5.2 build note)
        self.num_compilations = 0
        self._compiled_keys: set[tuple] = set()
        self._compile_baseline: Optional[int] = None
        self._check_recompilation = bool(
            config.compilation_config.check_recompilation)

        # grammar bitmask width (int32 words over the model vocab)
        self.num_words = (mc.vocab_size + 31) // 32

        # speculative decoding (ngram): K drafts → K+1 sample positions
        spec = config.speculative_config
        self.max_spec = (spec.num_speculative_tokens
                         if spec.enabled else 0)
        self.num_sample_positions = self.max_spec + 1
        self.proposer = None
        self.eagle = None  # EAGLE draft model (spec_decode/eagle.py)
        self.eagle_cfg = None
        self.medusa = None  # Medusa heads (spec_decode/medusa.py)
        self.medusa_cfg = None
        self.mlpspec = None  # MLP speculator (spec_decode/...)
        self.mlpspec_cfg = None
        if spec.enabled:
            from vllm_main_modify_tpu.spec_decode.mtp import \
                MTP_METHODS

            assert spec.method in ("ngram", "eagle", "eagle3",
                                   "medusa", "mlp_speculator",
                                   "draft_model") + MTP_METHODS, \
                spec.method
            assert not sc.async_scheduling, \
                "spec decode requires sync scheduling"
            if spec.method == "ngram":
                from vllm_main_modify_tpu.spec_decode.ngram_proposer \
                    import NgramProposer

                self.proposer = NgramProposer(
                    spec.num_speculative_tokens,
                    spec.prompt_lookup_min, spec.prompt_lookup_max)
            elif spec.method == "mlp_speculator":
                from vllm_main_modify_tpu.spec_decode.mlp_speculator \
                    import MLPSpeculatorHeads, make_mlp_spec_config

                assert spec.draft_model, \
                    "mlp_speculator spec decode needs --draft-model"
                self.mlpspec_cfg = make_mlp_spec_config(
                    spec.draft_model, mc)
                self.mlpspec = MLPSpeculatorHeads(self.mlpspec_cfg,
                                                  mc)
                assert spec.num_speculative_tokens <= \
                    self.mlpspec.n_predict, (
                        "num_speculative_tokens exceeds the "
                        "speculator's n_predict")
            elif spec.method == "medusa":
                from vllm_main_modify_tpu.spec_decode.medusa import (
                    MedusaHeads, make_medusa_config)

                assert spec.draft_model, \
                    "medusa spec decode needs --draft-model"
                self.medusa_cfg = make_medusa_config(
                    spec.draft_model, mc)
                self.medusa = MedusaHeads(self.medusa_cfg, mc)
                assert spec.num_speculative_tokens <= \
                    self.medusa.num_heads, (
                        "num_speculative_tokens exceeds the medusa "
                        "head count")
            elif spec.method == "draft_model":
                # classic two-model speculation (reference:
                # eagle.py:41 draft-model path) — an independent
                # small decoder behind the EAGLE draft interface
                from vllm_main_modify_tpu.spec_decode.draft_model \
                    import SeparateDraftModel
                from vllm_main_modify_tpu.spec_decode.eagle import \
                    make_draft_config

                assert spec.draft_model, \
                    "draft_model spec decode needs --draft-model"
                self.eagle_cfg = make_draft_config(
                    spec.draft_model, mc)
                self.eagle = SeparateDraftModel(self.eagle_cfg, mc)
            elif spec.method in MTP_METHODS:
                # the MTP head lives inside the target checkpoint —
                # same dir, shares the target's embedding; rides the
                # EAGLE draft interface (fused propose + rejection
                # sampling)
                from vllm_main_modify_tpu.spec_decode.mtp import (
                    MtpDraftModel, make_mtp_config)

                self.eagle_cfg = make_mtp_config(mc)
                if spec.draft_model:
                    self.eagle_cfg.model = spec.draft_model
                self.eagle = MtpDraftModel(self.eagle_cfg, mc,
                                           spec.method)
            else:
                from vllm_main_modify_tpu.spec_decode.eagle import (
                    Eagle3DraftModel, EagleDraftModel,
                    make_draft_config)

                assert spec.draft_model, \
                    "eagle spec decode needs --draft-model"
                self.eagle_cfg = make_draft_config(
                    spec.draft_model, mc)
                cls = Eagle3DraftModel if spec.method == "eagle3" \
                    else EagleDraftModel
                self.eagle = cls(self.eagle_cfg, mc)
                if spec.method == "eagle3":
                    # the target collects aux hidden states at the
                    # EAGLE-3 tap layers (reference: llama.py
                    # get_eagle3_aux_hidden_state_layers)
                    L = mc.num_layers
                    # always exactly 3 taps (repeats allowed on tiny
                    # models): fc expects [T, 3*target_hidden]
                    self.model.aux_hidden_ids = (
                        min(2, L - 1), L // 2, max(L - 3, 0))

        # multimodal: image features live in a fixed device-side
        # buffer (rows allocated per request, written once by the
        # jitted vision encoder, gathered into the step by mm_gather /
        # mm_scatter packed segments). Reference capability:
        # EncoderCacheManager (vllm/v1/core/encoder_cache_manager.py)
        # — here the "cache" IS the device buffer.
        self._score_np = None  # classification head, host-cached
        self._score_bias_np = None
        self.is_mm = mc.is_multimodal or mc.enable_prompt_embeds
        self.uses_mrope = bool(getattr(self.model, "uses_mrope",
                                       False))
        # Gemma3-style bidirectional attention between tokens of the
        # same image block (layers/attention.py bidir_spans);
        # prefix_lm (PaliGemma): the whole prompt is ONE span
        self.prefix_lm = bool(getattr(self.model, "prefix_lm", False))
        self.bidir_mm = bool(getattr(self.model, "bidir_mm_spans",
                                     False)) or self.prefix_lm
        self.MAX_MM_SPANS = 4
        # encoder-decoder (Whisper): separate paged pool of per-layer
        # cross K/V, written once per request at ingest
        self.is_enc_dec = getattr(self.model, "is_encoder_decoder",
                                  False)
        self.cross_cache: Optional[jax.Array] = None
        self.cross_tables: dict[str, int] = {}  # req_id -> slot
        # per-request TRUE encoder length (text enc-dec pads to t_enc)
        self.cross_lens: dict[str, int] = {}
        self._cross_free: list[int] = []
        self._cross_pages_per_req = 0
        self._cross_encode = None
        self.mm_buffer: Optional[jax.Array] = None
        self.mm_rows = 4096
        self.mm_ranges: dict[str, list[tuple[int, int, int]]] = {}
        # cross-request encoder-output cache (reference:
        # vllm/v1/core/encoder_cache_manager.py): content hash →
        # [start, n, refcount]; zero-ref entries stay resident in an
        # idle LRU and are evicted only when the buffer fills
        self.mm_cache: dict[str, list] = {}
        self.mm_idle: "OrderedDict[str, tuple[int, int]]" =             OrderedDict()
        self.mm_req_hashes: dict[str, list] = {}
        self.mm_encode_calls = 0  # encoder invocations (tests/stats)
        self._mm_free: list[list[int]] = [[0, self.mm_rows]]
        self._mm_encode_write = None
        self._mm_encode_write_video = None
        self._mm_write_raw = None

        # multi-LoRA
        lc = config.lora_config
        self.enable_lora = lc.enable_lora
        self.lora_manager = None
        if self.enable_lora:
            from vllm_main_modify_tpu.lora.manager import LoRAManager

            self.lora_manager = LoRAManager(lc.max_loras,
                                            lc.max_lora_rank,
                                            mc.num_layers)

        # multi-step decode chunks (scan path): only for plain decoder
        # LMs — enc-dec / multimodal / LoRA / spec decode keep the
        # single-step path (extra per-step state)
        self.decode_chunk_steps = 1
        if not (self.is_enc_dec or self.is_mm or self.enable_lora
                or self.max_spec > 0 or self.num_kv_groups > 1):
            self.decode_chunk_steps = max(
                sc.num_decode_steps_per_dispatch, 1)
        if self.eagle is not None:
            assert self.num_kv_groups == 1, \
                "EAGLE requires a single full-attention KV group"

        # multi-host fan-out (parallel/multihost.py): when set on the
        # leader, every dispatch publishes (kind-statics, packed) so
        # follower hosts execute the identical jitted program and the
        # global GSPMD arrays stay consistent
        self.step_broadcaster = None

        # EPLB (reference: eplb_state.py + gpu_model_runner.py:1834
        # eplb_step): physical expert placement + load tracking; the
        # step fn returns per-layer logical expert histograms and the
        # runner rearranges the placement every eplb_window steps.
        self.eplb_state = None
        pc = config.parallel_config
        if pc.enable_eplb:
            ex_specs = [s for s in self.model.param_specs()
                        if getattr(s, "num_experts", 0) > 0]
            if not ex_specs:
                raise ValueError("enable_eplb on a non-MoE model")
            if not hasattr(type(self.model), "eplb_collect"):
                raise ValueError(
                    f"{type(self.model).__name__} does not support "
                    "EPLB load collection yet")
            from vllm_main_modify_tpu.parallel.eplb import EplbState

            num_moe_layers = ex_specs[0].shape[0]
            num_logical = ex_specs[0].num_experts
            self.eplb_state = EplbState(
                num_layers=num_moe_layers,
                num_logical=num_logical,
                num_physical=num_logical + pc.num_redundant_experts,
                num_devices=pc.tensor_parallel_size,
                window=pc.eplb_window)
            self.model.eplb_collect = True
            # the multi-step decode scan does not thread histograms
            self.decode_chunk_steps = 1

        # cache stored width-native [L, P, page, 2K*D]; 'model' shards
        # the width axis (whole (k,v,D) pairs per head stay contiguous)
        self._kv_sharding = NamedSharding(
            self.mesh, P(None, None, None, "model"))
        self._replicated = NamedSharding(self.mesh, P())
        # PP (parallel/pp.py): layer axis of weights + KV shards on
        # the 'stage' mesh axis; the model runs its layer stack as a
        # ring-ppermute pipeline
        self.pp_size = pc.pipeline_parallel_size
        if self.pp_size > 1:
            if pc.stage_axis not in self.mesh.axis_names:
                raise ValueError(
                    f"pipeline_parallel_size {self.pp_size} needs a "
                    f"{pc.stage_axis!r} mesh axis (got "
                    f"{self.mesh.axis_names})")
            if (self.num_kv_groups > 1 or self.is_enc_dec
                    or self.eagle is not None
                    or self.medusa is not None
                    or self.mlpspec is not None or self.enable_lora
                    or pc.decode_context_parallel_size > 1
                    or pc.enable_eplb):
                raise ValueError(
                    "pipeline parallelism requires a single "
                    "full-attention KV group and no "
                    "spec-decode/LoRA/DCP/EPLB (round-4 work)")
            if not hasattr(type(self.model), "_layer_step"):
                raise ValueError(
                    f"{type(self.model).__name__} does not support "
                    "pipeline parallelism (no _layer_step seam)")
            if mc.num_layers % self.pp_size:
                raise ValueError(
                    f"num_layers ({mc.num_layers}) must divide "
                    f"pipeline_parallel_size ({self.pp_size})")
            self._kv_sharding = NamedSharding(
                self.mesh, P(pc.stage_axis, None, None, "model"))
            self.model.pp_mesh = self.mesh
            self.model.pp_axis = pc.stage_axis
            self.model.pp_stages = self.pp_size
        # DCP (decode context parallel): shard KV PAGES across the
        # model axis instead of heads, attention merges per-shard
        # partials by LSE (layers/attention.py _dcp_attention). For
        # when TP exceeds the KV-head count (reference:
        # mla/common.py:487-700, scheduler.py:105-112).
        self.dcp_size = config.parallel_config.decode_context_parallel_size
        if self.dcp_size > 1:
            tp = config.parallel_config.tensor_parallel_size
            if self.dcp_size != tp:
                raise ValueError(
                    f"decode_context_parallel_size ({self.dcp_size}) "
                    f"must equal tensor_parallel_size ({tp}) — pages "
                    "shard over the whole model axis")
            if (self.num_kv_groups > 1 or self.is_enc_dec
                    or self.eagle is not None):
                raise ValueError(
                    "DCP requires a single full-attention KV group "
                    "(no hybrid/enc-dec/EAGLE)")
            self._kv_sharding = NamedSharding(
                self.mesh, P(None, "model", None, None))
            from vllm_main_modify_tpu.layers.attention import \
                set_dcp_context

            set_dcp_context((self.mesh, "model", self.dcp_size))

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    @staticmethod
    def _get_paddings(lo: int, hi: int) -> list[int]:
        """Power-of-2 buckets, switching to LINEAR gaps above
        VLLM_TPU_BUCKET_PADDING_GAP (reference:
        tpu_model_runner.py:1892 _get_token_paddings exponential →
        linear): between 1024 and 2048 a 1025-token step would
        otherwise pad 2x."""
        gap = envs.VLLM_TPU_BUCKET_PADDING_GAP
        out, v = [], lo
        while v < hi and (gap <= 0 or v < gap):
            out.append(v)
            v *= 2
        if gap > 0:
            v = out[-1] + gap if out else gap
            while v < hi:
                out.append(v)
                v += gap
        if not out or out[-1] < hi:
            out.append(hi)
        return out

    def _pad_to_bucket(self, n: int, buckets: list[int]) -> int:
        for b in buckets:
            if n <= b:
                return b
        return buckets[-1]

    def load_model(self) -> None:
        t0 = time.monotonic()
        self.params = load_model_weights(
            self.model, self.config.model_config, self.mesh,
            self.config.load_config.load_format,
            stage_axis=(self.config.parallel_config.stage_axis
                        if self.pp_size > 1 else None))
        if self.eagle is not None:
            # draft weights ride in the same tree so the fused step
            # stays a (params, inputs) pure function
            self.params["__draft__"] = load_model_weights(
                self.eagle, self.eagle_cfg, self.mesh,
                self.config.load_config.load_format)
        if self.medusa is not None:
            self.params["__draft__"] = load_model_weights(
                self.medusa, self.medusa_cfg, self.mesh,
                self.config.load_config.load_format)
        if self.mlpspec is not None:
            self.params["__draft__"] = load_model_weights(
                self.mlpspec, self.mlpspec_cfg, self.mesh,
                self.config.load_config.load_format)
        if self.enable_lora:
            self._init_lora_stacks()
        if self.eplb_state is not None:
            self._eplb_wrap_params()
        jax.block_until_ready(jax.tree.leaves(self.params))
        logger.info("model loaded in %.1fs", time.monotonic() - t0)

    # ------------------------------------------------------------------
    # EPLB: physical expert placement (reference: eplb_state.py,
    # rebalance_execute.py — the P2P weight shuffle collapses to one
    # device gather per expert tensor under GSPMD)
    # ------------------------------------------------------------------

    def _expert_param_paths(self) -> list[str]:
        return [s.path for s in self.model.param_specs()
                if getattr(s, "num_experts", 0) > 0]

    def _eplb_wrap_params(self) -> None:
        """Replace each logical [L, E, ...] expert tensor with the
        physical-layout container (layers/moe.py EplbExpertWeight)."""
        from vllm_main_modify_tpu.layers.moe import EplbExpertWeight

        st = self.eplb_state
        l2p = jnp.asarray(st.log2phy, jnp.int32)
        cnt = jnp.asarray(st.logcnt, jnp.int32)
        for path in self._expert_param_paths():
            node, key = self._tree_node(path)
            arr = node[key]
            if not isinstance(arr, jax.Array):
                raise ValueError(
                    "EPLB with quantized expert weights is not "
                    f"supported yet ({path} is {type(arr).__name__})")
            node[key] = EplbExpertWeight(
                st.build_physical_weights(arr), l2p, cnt)

    def _tree_node(self, path: str):
        parts = path.split(".")
        node = self.params
        for p in parts[:-1]:
            node = node[p]
        return node, parts[-1]

    def eplb_step(self, counts: np.ndarray) -> None:
        """Accumulate one step's histograms; rearrange on cadence
        (reference: gpu_model_runner.py:1834 eplb_step)."""
        from vllm_main_modify_tpu.layers.moe import EplbExpertWeight

        st = self.eplb_state
        st.loads += counts.astype(np.int64)
        if not st.should_rebalance():
            return
        old_l2p = st.log2phy  # [L, E, R]
        st.rearrange()
        # new physical slot p holds logical e = phy2log[l, p]; gather
        # its weights from e's FIRST replica in the OLD placement
        rows = np.arange(st.num_layers)[:, None]
        src = old_l2p[rows, st.phy2log, 0]  # [L, P] old physical slot
        src_dev = jnp.asarray(src, jnp.int32)
        l2p = jnp.asarray(st.log2phy, jnp.int32)
        cnt = jnp.asarray(st.logcnt, jnp.int32)
        for path in self._expert_param_paths():
            node, key = self._tree_node(path)
            w = node[key]
            idx = src_dev.reshape(*src_dev.shape,
                                  *([1] * (w.phys.ndim - 2)))
            node[key] = EplbExpertWeight(
                jnp.take_along_axis(w.phys, idx, axis=1), l2p, cnt)

    # adapter-targetable module tails (HF/PEFT naming; fused-weight
    # layouts like qkv_proj are per-model opt-ins via lora_sites())
    _LORA_TARGET_TAILS = frozenset(
        ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
         "up_proj", "down_proj", "fc1", "fc2", "out_proj"))

    def _init_lora_stacks(self) -> None:
        """Wrap every adapter-targetable weight in a LoraWeight with
        zero-initialized stacked slots, so adapter loads are slot-slice
        updates, the jitted step never changes shape, and EVERY model
        gets adapters through the shared matmul() seam (reference
        capability: vllm/lora/layers/ wraps every linear;
        vllm/lora/models.py LoRAModelManager slots)."""
        from vllm_main_modify_tpu.quantization.weights import \
            LoraWeight

        s_slots = self.lora_manager.num_slots
        r = self.config.lora_config.max_lora_rank
        # target tail -> [(tree path, num_layers, layer_offset)]
        self._lora_sites: dict[str, list] = {}
        for spec in self.model.param_specs():
            if not spec.stacked or getattr(spec, "num_experts", 0):
                continue
            if len(spec.shape) != 3:
                continue
            tail = spec.path.split(".")[-1]
            if tail not in self._LORA_TARGET_TAILS:
                continue
            num_l, din, dout = spec.shape
            node, key = self._tree_node(spec.path)
            node[key] = LoraWeight(
                node[key],
                jnp.zeros((num_l, s_slots, din, r),
                          dtype=jnp.float32),
                jnp.zeros((num_l, s_slots, r, dout),
                          dtype=jnp.float32))
            self._lora_sites.setdefault(tail, []).append(
                (spec.path, num_l,
                 getattr(spec, "layer_offset", 0)))
        self.params["lora_scales"] = jnp.zeros(s_slots,
                                               dtype=jnp.float32)

    def _lora_update_fn(self, path: str, slot: int,
                        a: np.ndarray, b: np.ndarray) -> None:
        from vllm_main_modify_tpu.quantization.weights import \
            LoraWeight

        node, key = self._tree_node(path)
        w = node[key]
        node[key] = LoraWeight(
            w.base,
            w.a.at[:, slot].set(jnp.asarray(a)),
            w.b.at[:, slot].set(jnp.asarray(b)))

    def _activate_loras(self,
                        scheduler_output: SchedulerOutput) -> None:
        has_new = any(r.lora_name is not None
                      for r in scheduler_output.scheduled_new_reqs)
        if has_new:
            # touch every adapter still resident in the batch so LRU
            # eviction can only hit adapters with no running requests
            # (the scheduler caps distinct running adapters at
            # max_loras, so a safe victim always exists)
            for state in self.requests.values():
                if state.lora_name is not None:
                    try:
                        self.lora_manager.slot_of(state.lora_name)
                    except KeyError:
                        pass
        for new_req in scheduler_output.scheduled_new_reqs:
            if new_req.lora_name is None:
                continue
            if new_req.lora_path is not None:
                self.lora_manager.register(new_req.lora_name,
                                           new_req.lora_path)
            self.lora_manager.activate(new_req.lora_name,
                                       self._lora_sites,
                                       self._lora_update_fn)
            self.params["lora_scales"] = jnp.asarray(
                self.lora_manager.scales)

    # HBM per chip by device kind (fallback when the runtime exposes
    # no allocator stats, e.g. through the axon tunnel)
    _HBM_BY_KIND = {
        "TPU v4": 32, "TPU v5": 16, "TPU v5 lite": 16,
        "TPU v5e": 16, "TPU v5p": 95, "TPU v6": 32, "TPU v6 lite": 32,
        "TPU v6e": 32,
    }

    def profile_available_kv_bytes(self) -> int:
        """KV budget after weights (reference capability:
        determine_available_memory, gpu_worker.py:222 — on TPU we read
        allocator stats instead of running a profiling forward, since
        XLA activations are transient and bounded by the step shapes."""
        dev = jax.local_devices()[0]
        mc = self.config.model_config
        # headroom for activations, double-buffered: the widest live
        # tensor in a step is the MLP intermediate [T, 2*inter] (bf16);
        # logits are only materialized at the <= max_seqs * nsp sample
        # rows, NOT all T positions (a T x vocab reservation starved
        # fp8-8B to 16 KV pages and deadlocked admission). The
        # prompt-logprobs path does build [chunk, vocab] logits — its
        # chunk is budgeted by the scheduler, not reserved here.
        inter = getattr(mc, "intermediate_size", 0) or \
            4 * mc.hidden_size
        widest = max(2 * inter, 8 * mc.hidden_size)
        act = (self.max_num_tokens * widest * 2 * 2 +
               self.max_num_reqs * self.num_sample_positions *
               mc.vocab_size * 4 * 4)
        util = self.config.cache_config.gpu_memory_utilization

        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats and "bytes_limit" in stats:
            limit = int(stats["bytes_limit"] * util)
            in_use = int(stats.get("bytes_in_use", 0))
            return max(limit - in_use - act, 0)
        if dev.platform == "tpu":
            # no allocator stats (axon tunnel): size from the device
            # kind and the actual parameter bytes
            kind = getattr(dev, "device_kind", "")
            gib = next((v for k, v in self._HBM_BY_KIND.items()
                        if kind.startswith(k)), 16)
            param_bytes = sum(
                leaf.nbytes for leaf in jax.tree.leaves(self.params)
            ) if self.params is not None else 0
            total = int(gib * (1 << 30) * util)
            return max(total - param_bytes - act, 0)
        # CPU/test fallback: fixed small budget
        return 64 * 1024 * 1024

    def kv_dtype(self):
        """KV-cache element dtype (reference: cache_config.cache_dtype
        + Fp8KVCacheMethod, quantization/kv_cache.py:14-56 and the TPU
        backend's fp8/int8 modes pallas.py:29,335-343). fp8/int8 halve
        KV HBM → 2x batch/context capacity; the attention kernel
        upcasts in VMEM. int8 additionally carries per-token scales
        (ops/kv_cache.py QuantizedKV) and upcasts at native VPU speed
        — prefer it over fp8 on TPU (docs/perf_v5e.md gap #1)."""
        cd = (self.config.cache_config.cache_dtype or "auto").lower()
        mc = self.config.model_config
        if cd in ("auto", ""):
            return mc.jax_dtype
        table = {
            "bfloat16": jnp.bfloat16,
            "float32": jnp.float32,
            "fp8": jnp.float8_e4m3fn,
            "fp8_e4m3": jnp.float8_e4m3fn,
            "fp8_e5m2": jnp.float8_e5m2,
            "int8": jnp.int8,
        }
        if cd not in table:
            raise ValueError(f"unknown kv cache dtype {cd!r}")
        if jnp.dtype(table[cd]).itemsize == 1 and self.use_pallas and \
                self.page_size % 32 != 0:
            # 1-byte types tile (32, 128) on TPU: page-granular DMA
            # slices need 32-row alignment
            raise ValueError(
                "fp8/int8 KV cache on TPU requires block_size % 32 "
                f"== 0 (got {self.page_size})")
        return table[cd]

    def kv_is_int8(self) -> bool:
        cd = (self.config.cache_config.cache_dtype or "auto").lower()
        return cd == "int8"

    def page_bytes(self) -> int:
        dtype_size = jnp.dtype(self.kv_dtype()).itemsize
        # the model's kv_cache_spec is authoritative — e.g. DeepSeek
        # MLA caches num_heads x (qk_nope+qk_rope), not
        # num_kv_heads x head_dim
        kv_heads, kv_dim, kv_layers = self.model.kv_cache_spec()
        if self.eagle is not None:
            kv_layers += self.eagle.L
        per_page = self.page_size * 2 * kv_heads * kv_dim * dtype_size
        if self.kv_is_int8():
            # + per-token K/V scales [2, page] f32
            per_page += 2 * self.page_size * 4
        return kv_layers * per_page

    def plan_kv_pages(self, avail_bytes: Optional[int],
                      full_pages: Optional[int] = None) -> list[int]:
        """Per-group page counts. Bounded groups (window / mamba) are
        sized by their per-request demand cap; full-attention groups
        share whatever HBM remains (or take ``full_pages`` when the
        user pinned --num-kv-blocks). Reference capability:
        kv_cache_utils.py get_kv_cache_configs per-spec sizing."""
        ds = jnp.dtype(self.kv_dtype()).itemsize
        pg = self.page_size
        if self.num_kv_groups == 1:
            if self.kv_groups[0].num_layers == 0:
                return [2]  # encoder-only: no KV at all
            if full_pages is not None:
                n = full_pages
            else:
                n = max(avail_bytes // self.page_bytes(), 16)
            if self.dcp_size > 1:  # page axis shards evenly
                n = max(n // self.dcp_size, 1) * self.dcp_size
            return [n]
        counts = [0] * self.num_kv_groups
        spent = 0
        for gi, g in enumerate(self.kv_groups):
            if g.kind in ("window", "mamba"):
                per_req = g.max_pages_per_req(pg, self.max_model_len,
                                              self.max_spec)
                counts[gi] = self.max_num_reqs * per_req + 1
                spent += counts[gi] * g.page_bytes(pg, ds)
        fulls = [gi for gi, g in enumerate(self.kv_groups)
                 if g.kind == "full"]
        if fulls:
            per = sum(self.kv_groups[gi].page_bytes(pg, ds)
                      for gi in fulls)
            if full_pages is not None:
                n = full_pages
            elif per == 0:
                n = 2  # zero-layer group (pure-SSM models)
            else:
                n = max((avail_bytes - spent) // per, 16)
                n = min(n, self.max_num_reqs *
                        cdiv(self.max_model_len, pg) + 1)
            for gi in fulls:
                counts[gi] = n
        return counts

    def initialize_kv_cache(self, num_pages) -> None:
        mc = self.config.model_config
        kv_dtype = self.kv_dtype()
        if self.kv_is_int8():
            if self.num_kv_groups > 1 or self.is_enc_dec or \
                    self.dcp_size > 1:
                raise ValueError(
                    "int8 KV cache requires a single full-attention "
                    "KV group (no hybrid/enc-dec/DCP)")
            if isinstance(num_pages, (list, tuple)):
                num_pages = num_pages[0]
            self.num_pages = num_pages
            kv_heads, kv_dim, kv_layers = self.model.kv_cache_spec()
            if self.eagle is not None:
                kv_layers += self.eagle.L
            shape = (kv_layers, num_pages, self.page_size,
                     2 * kv_heads * kv_dim)
            sc_shape = (kv_layers, num_pages, self.page_size, 2)
            sc_sharding = NamedSharding(
                self.mesh,
                P(self._kv_sharding.spec[0], None, None, None))
            self.kv_caches = jax.jit(
                lambda: QuantizedKV(
                    jnp.zeros(shape, dtype=jnp.int8),
                    jnp.zeros(sc_shape, dtype=jnp.float32)),
                out_shardings=QuantizedKV(self._kv_sharding,
                                          sc_sharding))()
            self._init_aux_buffers(mc)
            return
        if self.num_kv_groups > 1:
            self.num_pages = list(num_pages)
            caches = []
            for g, n in zip(self.kv_groups, num_pages):
                if g.kind == "mamba":
                    # state slots, not pages: one array per state
                    # tensor, stacked over the group's layers
                    caches.append(tuple(
                        jnp.zeros((g.num_layers, n, *shape),
                                  dtype=jnp.dtype(dt))
                        for shape, dt in g.state_shapes))
                    continue
                shape = (g.num_layers, n, self.page_size,
                         2 * g.kv_heads * g.head_dim)
                caches.append(jax.jit(
                    functools.partial(jnp.zeros, shape,
                                      dtype=kv_dtype),
                    out_shardings=self._kv_sharding)())
            self.kv_caches = tuple(caches)
            self._init_aux_buffers(mc)
            return
        if isinstance(num_pages, (list, tuple)):
            num_pages = num_pages[0]
        self.num_pages = num_pages
        kv_heads, kv_dim, kv_layers = self.model.kv_cache_spec()
        if self.eagle is not None:
            # draft layers stack after the target's: same pages, same
            # block tables, one donated array (reference constraint:
            # eagle.py:984 validate_same_kv_cache_group)
            kv_layers += self.eagle.L
        shape = (kv_layers, num_pages, self.page_size,
                 2 * kv_heads * kv_dim)
        self.kv_caches = jax.jit(
            lambda: jnp.zeros(shape, dtype=kv_dtype),
            out_shardings=self._kv_sharding)()
        self._init_aux_buffers(mc)

    def _init_aux_buffers(self, mc) -> None:
        if self.is_mm and self.mm_buffer is None:
            # Qwen3-VL DeepStack carries (1+nds)*H per image token
            width = getattr(self.model, "mm_embed_width",
                            mc.hidden_size)
            self.mm_buffer = jnp.zeros((self.mm_rows, width),
                                       dtype=mc.jax_dtype)
        if self.is_enc_dec and self.cross_cache is None:
            kvh, kvd, xl, t_enc = self.model.cross_cache_spec()
            cp = cdiv(t_enc, self.page_size)
            self._cross_pages_per_req = cp
            # page 0 is the null page (padded block-table entries)
            p2 = self.max_num_reqs * cp + 1
            self.cross_cache = jnp.zeros(
                (xl, p2, self.page_size, 2 * kvh * kvd),
                dtype=mc.jax_dtype)
            self._cross_free = list(range(self.max_num_reqs))
            type(self)._packed_layout.clear_for(self)

    def init_kv_offload(self, capacity_blocks: int) -> None:
        from vllm_main_modify_tpu.kv_offload.manager import \
            KVOffloadStore

        self.kv_offload_store = KVOffloadStore(capacity_blocks)

    def extract_kv_blocks(self, block_ids: list) -> np.ndarray:
        """Device → host gather of whole KV pages (P/D disaggregation
        producer; kv_transfer/connector.py). [L, n, page, W]; int8
        caches yield (data, scales) pairs."""
        ids = jnp.asarray(block_ids, dtype=jnp.int32)
        kv = self.kv_caches
        if isinstance(kv, QuantizedKV):
            return (np.asarray(kv.data[:, ids]),
                    np.asarray(kv.scales[:, ids]))
        return np.asarray(kv[:, ids])

    def _process_kv_offload_ops(self,
                                scheduler_output: SchedulerOutput
                                ) -> None:
        """Snapshot evicted blocks to host / restore offload hits into
        fresh blocks, BEFORE the step that reuses or reads them (device
        ordering makes the gather consistent with in-flight steps)."""
        store = self.kv_offload_store
        if store is None:
            return
        saves = scheduler_output.kv_save_blocks
        quant = isinstance(self.kv_caches, QuantizedKV)
        if saves:
            ids = jnp.asarray([bid for _, bid in saves],
                              dtype=jnp.int32)
            if quant:
                data = np.asarray(self.kv_caches.data[:, ids])
                sc = np.asarray(self.kv_caches.scales[:, ids])
                for i, (h, _) in enumerate(saves):
                    store.put(h, (data[:, i], sc[:, i]))
            else:
                data = np.asarray(
                    self.kv_caches[:, ids])  # [L, n, pg, W]
                for i, (h, _) in enumerate(saves):
                    store.put(h, data[:, i])
        loads = scheduler_output.kv_load_blocks
        if loads:
            datas = []
            for h, _ in loads:
                d = store.get(h)
                assert d is not None, "offload index/store divergence"
                datas.append(d)
            ids = jnp.asarray([bid for _, bid in loads],
                              dtype=jnp.int32)
            if quant:
                arr = jnp.asarray(
                    np.stack([d[0] for d in datas], axis=1),
                    dtype=jnp.int8)
                sc = jnp.asarray(
                    np.stack([d[1] for d in datas], axis=1),
                    dtype=jnp.float32)
                self.kv_caches = QuantizedKV(
                    _kv_restore(self.kv_caches.data, ids, arr),
                    _kv_restore(self.kv_caches.scales, ids, sc))
            else:
                arr = jnp.asarray(np.stack(datas, axis=1),
                                  dtype=self.kv_caches.dtype)
                self.kv_caches = _kv_restore(self.kv_caches, ids, arr)

    # ------------------------------------------------------------------
    # sleep / wake / weight reload (reference: CuMem sleep mode
    # gpu_worker.py:98-135, reload_weights :218, save_sharded_state
    # core.py:402-411 — TPU-native: host-offload the param pytree and
    # free the device arrays; XLA reallocates on wake)
    # ------------------------------------------------------------------

    def sleep(self, level: int = 1) -> None:
        """Offload weights to host RAM and free device HBM (used for
        RLHF-style weight swaps). Level 2 also drops the KV cache."""
        if self.params is None:
            return
        self._host_params = jax.tree.map(
            lambda a: np.asarray(a) if isinstance(a, jax.Array) else a,
            self.params)
        self._param_shardings = jax.tree.map(
            lambda a: a.sharding if isinstance(a, jax.Array) else None,
            self.params)
        for leaf in jax.tree.leaves(self.params):
            if isinstance(leaf, jax.Array):
                leaf.delete()
        self.params = None
        if level >= 2 and self.kv_caches is not None:
            for leaf in jax.tree.leaves(self.kv_caches):
                leaf.delete()
            self.kv_caches = None
        type(self)._get_step_fn.clear_for(self)

    def wake_up(self) -> None:
        assert self._host_params is not None, "not sleeping"
        self.params = jax.tree.map(
            lambda host, sh: jax.device_put(host, sh)
            if sh is not None else host,
            self._host_params, self._param_shardings)
        self._host_params = None
        if self.kv_caches is None and self.num_pages:
            self.initialize_kv_cache(self.num_pages)

    def reload_weights(self) -> None:
        """Re-read the checkpoint in place (post weight-update swap)."""
        old = self.params
        self.params = None
        if old is not None:
            for leaf in jax.tree.leaves(old):
                if isinstance(leaf, jax.Array):
                    leaf.delete()
        self.load_model()
        type(self)._get_step_fn.clear_for(self)

    def save_sharded_state(self, path: str) -> None:
        """Persist the (host-gathered) param pytree as safetensors for
        fast reload (reference: save_sharded_state gpu_worker.py:665)."""
        import os

        from safetensors.numpy import save_file

        os.makedirs(path, exist_ok=True)
        flat = {}
        leaves, treedef = jax.tree.flatten_with_path(self.params)
        for path_elems, leaf in leaves:
            if not isinstance(leaf, jax.Array):
                continue
            name = ".".join(
                str(getattr(p, "key", getattr(p, "idx", p)))
                for p in path_elems)
            flat[name] = np.asarray(leaf)
        save_file(flat, os.path.join(path, "model.safetensors"))

    # ------------------------------------------------------------------
    # persistent-batch sync (reference: _update_states
    # tpu_model_runner.py:340 / gpu_model_runner.py:542)
    # ------------------------------------------------------------------

    def _update_states(self, scheduler_output: SchedulerOutput) -> None:
        if self.enable_lora:
            self._activate_loras(scheduler_output)
        for req_id in scheduler_output.finished_req_ids:
            self.requests.pop(req_id, None)
            self._prompt_lp_acc.pop(req_id, None)
            self.input_batch.remove_request(req_id)
            self._free_mm(req_id)

        # Evict unscheduled rows (preempted, or running-but-unscheduled)
        # while keeping their cached state for future re-admission
        # (reference: gpu_model_runner.py:569-581).
        scheduled = scheduler_output.num_scheduled_tokens
        for req_id in list(self.input_batch.req_id_to_index):
            if req_id not in scheduled:
                self.input_batch.remove_request(req_id)

        reqs_to_add: list[CachedRequestState] = []
        cached = scheduler_output.scheduled_cached_reqs
        for i, req_id in enumerate(cached.req_ids):
            state = self.requests[req_id]
            state.num_computed_tokens = cached.num_computed_tokens[i]
            new_blocks = cached.new_block_ids[i]
            resumed = cached.resumed_from_preemption[i]
            if resumed:
                state.block_ids = (
                    tuple(list(g) for g in new_blocks)
                    if isinstance(new_blocks, tuple)
                    else list(new_blocks or []))
                if cached.new_token_ids[i]:
                    # tokens sampled before preemption, re-learned here
                    state.output_token_ids = list(cached.new_token_ids[i])
            elif new_blocks:
                if isinstance(new_blocks, tuple):
                    for cur, new in zip(state.block_ids, new_blocks):
                        cur.extend(new)
                else:
                    state.block_ids.extend(new_blocks)
            row = self.input_batch.req_id_to_index.get(req_id)
            if row is None:
                # evicted earlier (preemption / scheduling gap): re-add
                reqs_to_add.append(state)
            else:
                self.input_batch.num_computed_tokens[row] = \
                    state.num_computed_tokens
                if new_blocks:
                    self.input_batch.append_block_ids(row, new_blocks)
            if state.mm_inputs:
                # encoder-budgeted prompts: encode images as their
                # blocks come into this step's chunk
                self._ingest_mm(state, upto=state.num_computed_tokens +
                                scheduled.get(req_id, 0))

        for new_req in scheduler_output.scheduled_new_reqs:
            state = CachedRequestState(new_req)
            self.requests[new_req.req_id] = state
            reqs_to_add.append(state)
            if state.mm_inputs:
                self._ingest_mm(
                    state,
                    upto=getattr(state, "num_computed_tokens", 0) +
                    scheduled.get(new_req.req_id, 0))

        # condense BEFORE adding so new rows land on free tail slots
        self.input_batch.condense()
        for state in reqs_to_add:
            row = self.input_batch.add_request(state)
            if self.enable_lora:
                self.input_batch.lora_slots[row] = \
                    self.lora_manager.slot_of(state.lora_name)

    # ------------------------------------------------------------------
    # multimodal feature ingestion
    # ------------------------------------------------------------------

    def _mm_alloc(self, n: int) -> int:
        for blk in self._mm_free:
            if blk[1] >= n:
                start = blk[0]
                blk[0] += n
                blk[1] -= n
                return start
        # evict idle (zero-ref) cached encoder outputs, oldest first
        while self.mm_idle:
            h, (start, rows) = self.mm_idle.popitem(last=False)
            del self.mm_cache[h]
            self._mm_free.append([start, rows])
            for blk in self._mm_free:
                if blk[1] >= n:
                    s = blk[0]
                    blk[0] += n
                    blk[1] -= n
                    return s
        raise RuntimeError(
            f"multimodal feature buffer exhausted (need {n} rows; "
            f"mm_rows={self.mm_rows})")

    def _free_mm(self, req_id: str) -> None:
        ranges = self.mm_ranges.pop(req_id, None)
        hashes = self.mm_req_hashes.pop(req_id, None) or []
        if ranges:
            for (_, n, start), h in zip(
                    ranges, list(hashes) + [None] * len(ranges)):
                ent = self.mm_cache.get(h) if h else None
                if ent is not None:
                    ent[2] -= 1
                    if ent[2] <= 0:
                        # keep resident for reuse; reclaimable on
                        # pressure (_mm_alloc)
                        self.mm_idle[h] = (ent[0], ent[1])
                else:
                    self._mm_free.append([start, n])
        slot = self.cross_tables.pop(req_id, None)
        self.cross_lens.pop(req_id, None)
        if slot is not None:
            self._cross_free.append(slot)

    def _ingest_audio(self, state) -> None:
        """Encoder-decoder ingest: run the audio encoder and write the
        per-layer cross K/V into this request's pages of the cross
        pool (reference capability: whisper encoder execution +
        CrossAttentionSpec)."""
        if self._cross_encode is None:
            model = self.model
            page = self.page_size

            text_enc = getattr(model, "is_text_enc_dec", False)
            vision_enc = hasattr(model, "encode_vision_cross")

            def enc_write(params, feats, enc_len, cache, start_row):
                if text_enc:
                    # BART family: padded encoder token ids + true
                    # length (models/bart.py encode_text_enc)
                    enc = model.encode_text_enc(params, feats,
                                                enc_len)
                elif vision_enc:
                    # Mllama: padded pixel tiles; the scalar slot
                    # carries the aspect-ratio id (true encoder len
                    # goes through cross_lens)
                    enc = model.encode_vision_cross(params, feats,
                                                    enc_len)
                else:
                    enc = model.encode_audio(params, feats[None])[0]
                ckv = model.encode_cross_kv(params, enc)  # [L, T, W]
                xl, p2, pg, wdt = cache.shape
                flat = cache.reshape(xl, p2 * pg, wdt)
                flat = jax.lax.dynamic_update_slice(
                    flat, ckv.astype(flat.dtype), (0, start_row, 0))
                return flat.reshape(cache.shape)

            self._cross_encode = jax.jit(enc_write,
                                         donate_argnums=(3, ))
        mm0 = state.mm_inputs[0]
        t_enc = self.model.cross_cache_spec()[3]
        if "encoder_input_ids" in mm0:
            ids = np.asarray(mm0["encoder_input_ids"],
                             dtype=np.int32)[:t_enc]
            enc_len = len(ids)
            feats = np.zeros(t_enc, np.int32)
            feats[:enc_len] = ids
            self.cross_lens[state.req_id] = enc_len
        elif "pixel_values_tiles" in mm0:
            feats = mm0["pixel_values_tiles"]
            enc_len = int(mm0["aspect_ratio_id"])
            self.cross_lens[state.req_id] = int(mm0["enc_len"])
        else:
            feats, enc_len = mm0["input_features"], t_enc
        slot = self._cross_free.pop()
        first_page = 1 + slot * self._cross_pages_per_req
        self.cross_cache = self._cross_encode(
            self.params, jnp.asarray(feats), enc_len,
            self.cross_cache, first_page * self.page_size)
        self.cross_tables[state.req_id] = slot

    def _ingest_mm(self, state, upto: Optional[int] = None) -> None:
        """Run the vision encoder for this request's not-yet-encoded
        images whose token block starts before ``upto`` (None = all),
        writing projected features into the device buffer. Encoder
        outputs are cached across requests by content hash (reference:
        _execute_mm_encoder gpu_model_runner.py:1565 +
        encoder_cache_manager.py)."""
        if state.mm_inputs and ("input_features" in state.mm_inputs[0]
                                or "encoder_input_ids"
                                in state.mm_inputs[0]
                                or "pixel_values_tiles"
                                in state.mm_inputs[0]):
            if not getattr(state, "mm_encoded", None):
                self._ingest_audio(state)
                state.mm_encoded = set(range(len(state.mm_inputs)))
            return
        if self._mm_encode_write is None:
            model = self.model

            def encode_write(params, pix, buf, start):
                feats = model.encode_images(params, pix)
                feats = feats.reshape(-1, buf.shape[1])
                return jax.lax.dynamic_update_slice(
                    buf, feats.astype(buf.dtype), (start, 0))

            self._mm_encode_write = jax.jit(encode_write)
        if self._mm_encode_write_video is None and \
                hasattr(self.model, "encode_video"):
            model = self.model

            def encode_write_video(params, pix, buf, start):
                feats = model.encode_video(params, pix)
                feats = feats.reshape(-1, buf.shape[1])
                return jax.lax.dynamic_update_slice(
                    buf, feats.astype(buf.dtype), (start, 0))

            self._mm_encode_write_video = jax.jit(encode_write_video)
        done = getattr(state, "mm_encoded", None)
        if done is None:
            done = state.mm_encoded = set()
        ranges = self.mm_ranges.setdefault(state.req_id, [])
        hashes = self.mm_req_hashes.setdefault(state.req_id, [])
        for i, mm in enumerate(state.mm_inputs):
            if i in done:
                continue
            if upto is not None and int(mm["offset"]) >= upto:
                continue  # not reached by this chunk yet (encoder
                # budget chunks multi-image prompts across steps)
            done.add(i)
            n = int(mm["num_tokens"])
            h = mm.get("hash")
            ent = self.mm_cache.get(h) if h else None
            if ent is not None:
                # cross-request reuse: same content already encoded
                ent[2] += 1
                self.mm_idle.pop(h, None)
                ranges.append((int(mm["offset"]), n, ent[0]))
                hashes.append(h)
                continue
            start = self._mm_alloc(n)
            if "embeds" in mm:
                # precomputed prompt embeddings: no encoder, write
                # the rows straight into the device buffer
                # (reference: EmbedsPrompt, vllm/inputs/data.py)
                if self._mm_write_raw is None:
                    self._mm_write_raw = jax.jit(
                        lambda buf, rows, s0:
                        jax.lax.dynamic_update_slice(
                            buf, rows.astype(buf.dtype), (s0, 0)))
                self.mm_buffer = self._mm_write_raw(
                    self.mm_buffer, jnp.asarray(mm["embeds"]),
                    start)
            else:
                pix = jnp.asarray(mm["pixel_values"][None])
                enc = (self._mm_encode_write_video
                       if mm.get("is_video")
                       else self._mm_encode_write)
                self.mm_buffer = enc(self.params, pix,
                                     self.mm_buffer, start)
            self.mm_encode_calls += 1
            ranges.append((int(mm["offset"]), n, start))
            if h:
                self.mm_cache[h] = [start, n, 1]
                hashes.append(h)
            else:
                hashes.append(None)

    # ------------------------------------------------------------------
    # per-step input build (reference: _prepare_inputs
    # tpu_model_runner.py:625)
    # ------------------------------------------------------------------

    def _prepare_inputs(self, scheduler_output: SchedulerOutput):
        """Build ONE packed int32 host buffer for the whole step.

        The axon TPU tunnel charges ~30 ms latency per host->device
        transfer; a step needs ~10 logically separate arrays, so they
        are packed into a single int32 buffer (floats bitcast) and
        sliced apart inside the jitted step. On real hardware this is
        still the right call: one dispatch instead of ten.
        """
        batch = self.input_batch
        num_reqs = batch.num_reqs
        sched = scheduler_output.num_scheduled_tokens
        total = scheduler_output.total_num_scheduled_tokens
        assert total > 0 and num_reqs > 0

        t_pad = self._pad_to_bucket(total, self.token_buckets)
        r_pad = self._pad_to_bucket(num_reqs, self.req_buckets)
        page = self.page_size
        s_pad = t_pad // page + r_pad + 1
        mp = self.max_blocks_per_req
        has_penalties = bool(batch.penalty_reqs)
        has_bias = bool(batch.logit_bias_reqs)

        # multimodal pre-pass: image-token rows in this step's chunks
        # (gather row in the feature buffer → scatter row in packed)
        mm_pairs: list[tuple[int, int]] = []
        if self.mm_ranges:
            off = 0
            for row in range(num_reqs):
                rid = batch.req_ids[row]
                ns = sched.get(rid, 0)
                sp = int(batch.num_computed_tokens[row])
                ep = sp + ns
                for (ioff, ntok, buf_start) in \
                        self.mm_ranges.get(rid, ()):
                    lo, hi = max(sp, ioff), min(ep, ioff + ntok)
                    for p in range(lo, hi):
                        mm_pairs.append((buf_start + (p - ioff),
                                         off + (p - sp)))
                off += ns
        mm_pad = next_power_of_2(max(len(mm_pairs),
                                     64)) if mm_pairs else 0

        # prompt logprobs: largest k among requests with prompt
        # positions scheduled this step (0 = fast path, no full-vocab
        # logits). Reference: _get_prompt_logprobs_dict
        # (vllm/v1/worker/gpu_model_runner.py).
        prompt_lp = 0
        if batch.num_prompt_logprobs[:num_reqs].any():
            for row in range(num_reqs):
                k = int(batch.num_prompt_logprobs[row])
                if (k and sched.get(batch.req_ids[row], 0)
                        and batch.num_computed_tokens[row] <
                        batch.num_prompt_tokens[row]):
                    prompt_lp = max(prompt_lp, k)
            if prompt_lp:
                prompt_lp = next_power_of_2(prompt_lp)

        layout = self._packed_layout(t_pad, r_pad, s_pad,
                                     has_penalties, has_bias, mm_pad,
                                     prompt_lp > 0)
        packed = np.zeros(layout["total"], dtype=np.int32)

        def seg(name):
            a, b = layout[name]
            return packed[a:b]

        input_ids = seg("input_ids")
        positions = seg("positions")
        slot_mapping = seg("slot_mapping")
        slot_mapping[:] = -1
        query_start_loc = seg("query_start_loc")
        seq_lens = seg("seq_lens")
        nsp = self.num_sample_positions
        logits_indices = seg("logits_indices").reshape(r_pad, nsp)
        block_tables = seg("block_tables").reshape(r_pad, mp)
        kv_slices_arr = seg("kv_slices").reshape(3, s_pad)
        scalars = seg("scalars")

        sample_rows: list[int] = []
        kv_slices: list[tuple[int, int, int]] = []
        if self.max_spec > 0:
            seg("spec_drafts")[:] = -1
        if self.is_enc_dec:
            cp = self._cross_pages_per_req
            cbt = seg("cross_block_tables").reshape(r_pad, cp)
            csl = seg("cross_seq_lens")
            t_enc = self.model.cross_cache_spec()[3]
            for row in range(num_reqs):
                slot = self.cross_tables.get(batch.req_ids[row])
                if slot is not None:
                    first = 1 + slot * cp
                    cbt[row] = np.arange(first, first + cp)
                    csl[row] = self.cross_lens.get(
                        batch.req_ids[row], t_enc)
        lora_seg = seg("lora_slots") if self.enable_lora else None
        spec_counts: dict[int, int] = {}
        proposed: dict[int, list[int]] = {}
        prev_scatter = seg("prev_scatter")
        prev_scatter[:] = -1
        prev_gather = seg("prev_gather")
        prev2_scatter = seg("prev2_scatter")
        prev2_scatter[:] = -1
        prev2_gather = seg("prev2_gather")

        # ---- vectorized token-level build (reference style:
        # gpu_model_runner.py:939 numpy _prepare_inputs) -------------
        rows_r = np.arange(num_reqs, dtype=np.int32)
        n_sched_arr = np.fromiter(
            (sched.get(batch.req_ids[i], 0) for i in range(num_reqs)),
            dtype=np.int32, count=num_reqs)
        starts = batch.num_computed_tokens[:num_reqs].astype(np.int32)
        ends = starts + n_sched_arr
        cu = np.zeros(num_reqs + 1, dtype=np.int32)
        np.cumsum(n_sched_arr, out=cu[1:])
        offset = int(cu[-1])
        assert offset == total
        # per-token row index and within-request offset
        req_of_tok = np.repeat(rows_r, n_sched_arr)
        tok_off = (np.arange(total, dtype=np.int32) -
                   np.repeat(cu[:-1], n_sched_arr))
        tok_pos = starts[req_of_tok] + tok_off
        input_ids[:total] = batch.token_ids[req_of_tok, tok_pos]
        positions[:total] = tok_pos
        if self.uses_mrope:
            # 3-D rope positions: stored per-request for the prompt
            # (image grids), sequential + delta past it (reference:
            # MRotaryEmbedding.get_next_input_positions)
            mr = seg("mrope_positions").reshape(3, t_pad)
            mr[:, :total] = tok_pos[None]
            for row in range(num_reqs):
                st = self.requests.get(batch.req_ids[row])
                if st is None or not st.mm_inputs:
                    continue
                pos3 = st.mm_inputs[0].get("mrope_positions")
                if pos3 is None:
                    continue
                delta = int(st.mm_inputs[0].get("mrope_delta", 0))
                sel = np.flatnonzero(req_of_tok == row)
                tp_sel = tok_pos[sel]
                in_prompt = tp_sel < pos3.shape[1]
                mr[:, sel[in_prompt]] = pos3[:, tp_sel[in_prompt]]
                mr[:, sel[~in_prompt]] = tp_sel[~in_prompt][None] + \
                    delta
        if prompt_lp:
            tgt = seg("plp_targets")
            tgt[:] = -1
            nxt_pos = np.minimum(tok_pos + 1, batch.max_model_len - 1)
            tgt[:total] = np.where(
                tok_pos + 1 < batch.num_prompt_tokens[req_of_tok],
                batch.token_ids[req_of_tok, nxt_pos], -1)
        page_ids_tok = batch.block_table[req_of_tok, tok_pos // page]
        slot_mapping[:total] = page_ids_tok * page + tok_pos % page
        if lora_seg is not None:
            lora_seg[:total] = batch.lora_slots[req_of_tok]

        # per-(row,page) KV-update slices, vectorized at page level
        sched_rows = rows_r[n_sched_arr > 0]
        p_start = starts[sched_rows] // page
        p_end = (ends[sched_rows] - 1) // page
        nseg = p_end - p_start + 1
        total_segs = int(nseg.sum())
        seg_cu = np.zeros(len(sched_rows) + 1, dtype=np.int32)
        np.cumsum(nseg, out=seg_cu[1:])
        seg_of = np.repeat(np.arange(len(sched_rows), dtype=np.int32),
                           nseg)
        seg_page = (p_start[seg_of] +
                    np.arange(total_segs, dtype=np.int32) -
                    np.repeat(seg_cu[:-1], nseg))
        seg_row = sched_rows[seg_of]
        seg_lo = np.maximum(starts[seg_row], seg_page * page)
        seg_hi = np.minimum(ends[seg_row], (seg_page + 1) * page)
        kv_slices_arr[0, :total_segs] = \
            batch.block_table[seg_row, seg_page] * page + seg_lo % page
        kv_slices_arr[1, :total_segs] = \
            cu[seg_row] + seg_lo - starts[seg_row]
        kv_slices_arr[2, :total_segs] = seg_hi - seg_lo

        query_start_loc[1:num_reqs + 1] = cu[1:]
        # padded rows repeat the cumulative sum so searchsorted maps
        # padded tokens to a padded row
        query_start_loc[num_reqs + 1:] = offset
        seq_lens[:num_reqs] = ends
        scalars[0] = total_segs
        scalars[1] = num_reqs
        block_tables[:num_reqs] = batch.block_table[:num_reqs, :mp]

        # sample rows + per-row sample positions (vector; spec rows
        # patched below)
        ns_row = np.zeros(num_reqs, dtype=np.int32)
        logits_indices[:num_reqs] = (cu[1:] - 1)[:, None]
        for req_id, spec_toks in (
                scheduler_output.scheduled_spec_decode_tokens.items()):
            if not spec_toks:
                continue
            row = batch.req_id_to_index.get(req_id)
            if row is None:
                continue
            # draft tokens are not in the batch's token history; they
            # occupy the tail of this row's scheduled range
            ns = len(spec_toks)
            end = cu[row + 1]
            input_ids[end - ns:end] = spec_toks
            spec_counts[row] = ns
            proposed[row] = spec_toks
            ns_row[row] = ns
            seg("spec_drafts")[row * nsp:row * nsp + ns] = spec_toks
            # sample positions: the last real token plus each draft
            # (position j predicts draft j / the correction token)
            for j in range(nsp):
                logits_indices[row, j] = end - 1 - max(ns - j, 0) \
                    if j <= ns else end - 1
        sample_rows = rows_r[
            ends >= batch.num_tokens[:num_reqs] + ns_row].tolist()

        if self.eagle is not None:
            # draft-model inputs: position i pairs target hidden h_i
            # with the token at i+1 (reference: eagle.py:197-200 input
            # shift). The host fills every position whose next token it
            # knows; the device patches the rest (drafts via in-buffer
            # shift, the final sampled token via scatter at the last
            # accepted position).
            dn = seg("draft_next")
            dn[:] = -1
            nxt = np.minimum(tok_pos + 1, batch.max_model_len - 1)
            dn[:total] = np.where(
                tok_pos + 1 < batch.num_tokens[req_of_tok],
                batch.token_ids[req_of_tok, nxt], -1)
            em = seg("eagle_mask")
            em[:] = 0
            em[sample_rows] = 1

        # hybrid KV groups 1..N-1: same ragged structure, each group's
        # own page ids (the seg_row/seg_page/seg_lo/seg_hi geometry is
        # identical across paged groups — only the table differs)
        for gi, grp in enumerate(self.kv_groups[1:], start=1):
            tbl = batch.extra_block_tables[gi - 1]
            if grp.kind == "mamba":
                seg(f"state_slots@{gi}")[:num_reqs] = tbl[:num_reqs, 0]
                # first chunk of a request: its (possibly reused) slot
                # must not contribute stale carry-in state
                seg(f"state_fresh@{gi}")[:num_reqs] = (
                    batch.num_computed_tokens[:num_reqs] == 0
                ).astype(np.int32)
                continue
            seg(f"block_tables@{gi}").reshape(
                r_pad, mp)[:num_reqs] = tbl[:num_reqs, :mp]
            sm_g = seg(f"slot_mapping@{gi}")
            sm_g[:] = -1
            pids = tbl[req_of_tok, tok_pos // page]
            sm_g[:total] = pids * page + tok_pos % page
            ks_g = seg(f"kv_slices@{gi}").reshape(3, s_pad)
            ks_g[0, :total_segs] = \
                tbl[seg_row, seg_page] * page + seg_lo % page
            ks_g[1, :total_segs] = kv_slices_arr[1, :total_segs]
            ks_g[2, :total_segs] = kv_slices_arr[2, :total_segs]
            seg(f"kv_slices_n@{gi}")[0] = total_segs

        # async token chaining: previous steps' device-resident tokens
        for rid, (age, prev_row, pos) in self._pending_fill.items():
            row = batch.req_id_to_index.get(rid)
            if row is None or not (starts[row] <= pos < ends[row]):
                continue
            # value still on device: chain it in the jitted step
            if age == 0:
                prev_scatter[row] = cu[row] + (pos - starts[row])
                prev_gather[row] = prev_row
            else:
                prev2_scatter[row] = cu[row] + (pos - starts[row])
                prev2_gather[row] = prev_row

        # sampling knobs (floats bitcast into the int32 buffer)
        n = num_reqs
        temp = seg("temperature").view(np.float32)
        temp[:] = -1.0
        temp[:n] = batch.temperature[:n]
        seg("top_k")[:n] = batch.top_k[:n]
        top_p = seg("top_p").view(np.float32)
        top_p[:] = 1.0
        top_p[:n] = batch.top_p[:n]
        seg("min_p").view(np.float32)[:n] = batch.min_p[:n]
        seg("seeds").view(np.uint32)[:n] = batch.seeds[:n]
        seg("sample_pos")[:n] = batch.num_tokens[:n]

        apply_grammar = (scheduler_output.grammar_bitmask is not None
                         or bool(batch.word_mask_reqs))
        if apply_grammar:
            words = seg("grammar_words").reshape(r_pad, self.num_words)
            words[:] = -1
            bm = scheduler_output.grammar_bitmask
            if bm is not None:
                for req_id, row_i in (
                        scheduler_output.structured_output_request_ids
                        .items()):
                    batch_row = batch.req_id_to_index.get(req_id)
                    if batch_row is not None and batch_row < r_pad:
                        words[batch_row] = bm[row_i]
            # allowed_token_ids / bad_words fold into the same mask
            for row in range(num_reqs):
                allowed = batch.allowed_token_ids[row]
                if allowed is not None:
                    mask = np.zeros(self.num_words * 32, dtype=bool)
                    ids = np.asarray(allowed)
                    mask[ids[ids < self.num_words * 32]] = True
                    # bit j of word w = token w*32+j (TokenIndex
                    # pack_bitmask convention)
                    packed_mask = (
                        mask.reshape(-1, 32).astype(np.uint64) *
                        (1 << np.arange(32, dtype=np.uint64))
                    ).sum(axis=1).astype(np.uint32).view(np.int32)
                    words[row] &= packed_mask
                banned = self._banned_next_tokens(row)
                for tok in banned:
                    if tok < self.num_words * 32:
                        words[row, tok // 32] &= ~np.int32(
                            1 << (tok % 32))

        if has_penalties:
            pp = seg("pen_params").view(np.float32).reshape(3, r_pad)
            pp[0, :num_reqs] = batch.presence_penalties[:num_reqs]
            pp[1, :num_reqs] = batch.frequency_penalties[:num_reqs]
            pp[2, :] = 1.0
            pp[2, :num_reqs] = batch.repetition_penalties[:num_reqs]
            hist = seg("pen_history").reshape(r_pad,
                                              self.max_model_len)
            hist[:] = -1
            for row in range(num_reqs):
                n = batch.num_tokens[row]
                hist[row, :n] = batch.token_ids[row, :n]
            seg("pen_num_prompt")[:num_reqs] = \
                batch.num_prompt_tokens[:num_reqs]

        if has_bias:
            bias_ids = seg("bias_ids").reshape(r_pad, self.BIAS_MAX)
            bias_ids[:] = -1
            bias_vals = seg("bias_vals").view(np.float32).reshape(
                r_pad, self.BIAS_MAX)
            for row in range(num_reqs):
                lb = batch.logit_bias[row]
                if not lb:
                    continue
                if len(lb) > self.BIAS_MAX:
                    # surface the clamp instead of silently dropping
                    logger.warning(
                        "request %s: logit_bias has %d entries; only "
                        "the first %d are applied (BIAS_MAX)",
                        batch.req_ids[row], len(lb), self.BIAS_MAX)
                for j, (tid, val) in enumerate(
                        list(lb.items())[:self.BIAS_MAX]):
                    bias_ids[row, j] = tid
                    bias_vals[row, j] = val

        if mm_pad:
            seg("mm_gather")[:len(mm_pairs)] = [g for g, _ in mm_pairs]
            mm_scatter = seg("mm_scatter")
            mm_scatter[:] = -1
            mm_scatter[:len(mm_pairs)] = [s for _, s in mm_pairs]
            if self.bidir_mm:
                spans = seg("bidir_spans").reshape(
                    r_pad, self.MAX_MM_SPANS, 2)
                spans[:] = -1
                for row in range(num_reqs):
                    rid = batch.req_ids[row]
                    if self.prefix_lm:
                        # PaliGemma: image + text prefix all attend
                        # bidirectionally
                        spans[row, 0, 0] = 0
                        spans[row, 0, 1] = \
                            batch.num_prompt_tokens[row]
                        continue
                    rr = self.mm_ranges.get(rid, ())
                    for j, (ioff, ntok, _) in enumerate(
                            rr[:self.MAX_MM_SPANS]):
                        spans[row, j, 0] = ioff
                        spans[row, j, 1] = ioff + ntok

        return (packed, sample_rows, t_pad, r_pad, s_pad,
                apply_grammar, spec_counts, proposed, has_penalties,
                has_bias, mm_pad, prompt_lp)

    def _banned_next_tokens(self, row: int) -> list[int]:
        """bad_words: last tokens banned when the preceding history
        matches the word's prefix (reference:
        vllm/v1/sample/ops/bad_words.py)."""
        batch = self.input_batch
        bad = batch.bad_words_ids[row]
        if not bad:
            return []
        n = int(batch.num_tokens[row])
        history = batch.token_ids[row, :n]
        banned = []
        for word in bad:
            if len(word) == 1:
                banned.append(word[0])
                continue
            prefix = word[:-1]
            if n >= len(prefix) and list(
                    history[n - len(prefix):]) == list(prefix):
                banned.append(word[-1])
        return banned

    BIAS_MAX = 64  # logit_bias entries per request (clamped)

    @_instance_memo
    def _packed_layout(self, t_pad: int, r_pad: int, s_pad: int,
                       has_penalties: bool = False,
                       has_bias: bool = False,
                       mm_pad: int = 0,
                       plp: bool = False) -> dict:
        """Static segment offsets of the packed step buffer."""
        mp = self.max_blocks_per_req
        sizes = [
            ("input_ids", t_pad),
            ("positions", t_pad),
            # mrope models (Qwen2-VL): 3-D rope positions t/h/w
            ("mrope_positions", 3 * t_pad if self.uses_mrope else 0),
            ("slot_mapping", t_pad),
            ("query_start_loc", r_pad + 1),
            ("seq_lens", r_pad),
            ("logits_indices", r_pad * self.num_sample_positions),
            ("block_tables", r_pad * mp),
            ("kv_slices", 3 * s_pad),
            ("scalars", 2),  # num_kv_slices, num_seqs
            ("temperature", r_pad),
            ("top_k", r_pad),
            ("top_p", r_pad),
            ("min_p", r_pad),
            ("seeds", r_pad),
            ("sample_pos", r_pad),
            # async token chaining: position in input_ids to overwrite
            # with a previous step's device-resident sampled token
            # (slot 1 = last step, slot 2 = the step before)
            ("prev_scatter", r_pad),
            ("prev_gather", r_pad),
            ("prev2_scatter", r_pad),
            ("prev2_gather", r_pad),
            ("lora_slots", t_pad if self.enable_lora else 0),
            ("grammar_words", r_pad * self.num_words),
            # penalties: per-row params + full token history
            ("pen_params", 3 * r_pad if has_penalties else 0),
            ("pen_history",
             r_pad * self.max_model_len if has_penalties else 0),
            ("pen_num_prompt", r_pad if has_penalties else 0),
            # sparse logit bias (token id, f32 bias) pairs
            ("bias_ids", r_pad * self.BIAS_MAX if has_bias else 0),
            ("bias_vals", r_pad * self.BIAS_MAX if has_bias else 0),
            # multimodal merge: feature-buffer row → packed token row
            ("mm_gather", mm_pad),
            ("mm_scatter", mm_pad),
            # bidirectional image spans (Gemma3): [R, S, 2] absolute
            # prompt positions, -1 padded
            ("bidir_spans", r_pad * self.MAX_MM_SPANS * 2
             if (self.bidir_mm and mm_pad) else 0),
            # spec decode: draft token per sample position (-1 = none)
            ("spec_drafts",
             r_pad * self.num_sample_positions
             if self.max_spec > 0 else 0),
            # encoder-decoder: cross pool pages + encoder lengths
            ("cross_block_tables",
             r_pad * self._cross_pages_per_req
             if self.is_enc_dec else 0),
            ("cross_seq_lens", r_pad if self.is_enc_dec else 0),
            # prompt logprobs: the ACTUAL next prompt token per packed
            # position (-1 where undefined), so the step can gather its
            # logprob from the full-position logits
            ("plp_targets", t_pad if plp else 0),
            # EAGLE: host-known next token per packed position (-1
            # where only the device knows it) + per-row sampling mask
            ("draft_next", t_pad if self.eagle is not None else 0),
            ("eagle_mask", r_pad if self.eagle is not None else 0),
        ]
        # hybrid KV groups 1..N-1: per-group paging segments. Mamba
        # groups need only a state slot per row; paged groups mirror
        # the group-0 table/slot/slice layout (+1 scalar count each)
        for gi, grp in enumerate(self.kv_groups[1:], start=1):
            if grp.kind == "mamba":
                sizes.append((f"state_slots@{gi}", r_pad))
                sizes.append((f"state_fresh@{gi}", r_pad))
                continue
            sizes += [
                (f"block_tables@{gi}", r_pad * mp),
                (f"slot_mapping@{gi}", t_pad),
                (f"kv_slices@{gi}", 3 * s_pad),
                (f"kv_slices_n@{gi}", 1),
            ]
        layout = {}
        off = 0
        for name, size in sizes:
            layout[name] = (off, off + size)
            off += size
        layout["total"] = off
        return layout

    def _note_compile(self, compile_key) -> None:
        if compile_key in self._compiled_keys:
            return
        self._compiled_keys.add(compile_key)
        self.num_compilations += 1
        if self._check_recompilation and \
                self._compile_baseline is not None:
            raise RuntimeError(
                "recompilation detected after the capture phase "
                f"(check_recompilation): {compile_key}")

    def _sampling_statics(self):
        batch = self.input_batch
        n = batch.num_reqs
        max_lp = int(batch.num_logprobs[:n].max()) if n else 0
        if max_lp > 0:
            max_lp = next_power_of_2(max_lp)
        return (not batch.random_reqs, bool(batch.top_k_reqs),
                bool(batch.top_p_reqs), bool(batch.min_p_reqs), max_lp)

    # ------------------------------------------------------------------
    # the jitted step
    # ------------------------------------------------------------------

    @_instance_memo
    def _get_step_fn(self, t_pad: int, r_pad: int, all_greedy: bool,
                     need_top_k: bool, need_top_p: bool,
                     need_min_p: bool, max_num_logprobs: int,
                     apply_grammar: bool, has_prev: bool = False,
                     return_hidden: bool = False,
                     has_prev2: bool = False,
                     has_penalties: bool = False,
                     has_bias: bool = False,
                     mm_pad: int = 0,
                     prompt_lp: int = 0,
                     cascade: int = 0,
                     pure_decode: bool = False):
        """One compiled executable per (bucket, sampler-static)
        combination. The step consumes ONE packed int32 buffer (see
        _prepare_inputs) and unpacks with static slices on device."""
        model = self.model
        use_pallas = self.use_pallas
        uses_mrope = self.uses_mrope
        bidir_mm = self.bidir_mm
        max_mm_spans = self.MAX_MM_SPANS
        base_seed = self.config.model_config.seed
        page = self.page_size
        s_pad = t_pad // page + r_pad + 1
        layout = self._packed_layout(t_pad, r_pad, s_pad,
                                     has_penalties, has_bias, mm_pad,
                                     prompt_lp > 0)
        mp = self.max_blocks_per_req
        max_model_len = self.max_model_len
        bias_max = self.BIAS_MAX
        num_words = self.num_words
        nsp = self.num_sample_positions
        enable_lora = self.enable_lora
        is_enc_dec = self.is_enc_dec
        cross_pages = self._cross_pages_per_req
        eagle = self.eagle
        is_eagle3 = eagle is not None and getattr(eagle, "is_eagle3",
                                                  False)
        eplb = self.eplb_state is not None
        medusa = self.medusa
        mlpspec = self.mlpspec
        max_spec = self.max_spec
        target_layers = self.model.kv_cache_spec()[2]
        group_kinds = tuple(g.kind for g in self.kv_groups[1:])

        def eagle_propose(params, kv_caches, out, hidden, input_ids,
                          attn_meta, seg):
            """Fused EAGLE proposal (reference: EagleProposer.propose,
            vllm/v1/spec_decode/eagle.py:169 — there a separate
            dispatch + K-1 CUDA-graph replays; here part of the same
            device program).

            1. From the verification output, find each row's number of
               accepted drafts and its final emitted token.
            2. Draft forward over ALL packed positions with the inputs
               shifted by one (position i pairs target hidden h_i with
               token t_{i+1}), writing draft KV at the target's slots.
            3. K-1 autoregressive single-token draft iterations from
               the last accepted position.
            Draft KV at rejected positions is junk but those sequence
            positions are rescheduled (and rewritten) next step before
            any attention window covers them — same invariant the
            target KV already relies on."""
            dparams = params["__draft__"]
            sampled_m = out.sampled.reshape(r_pad, nsp)
            acc = out.spec_accept.reshape(r_pad, nsp)
            li = seg("logits_indices").reshape(r_pad, nsp)
            # leading accepted drafts per row; position n_acc emits
            # the final (recovery or bonus) token
            n_acc = jnp.sum(jnp.cumprod(
                acc[:, :nsp - 1].astype(jnp.int32), axis=1), axis=1)
            final_tok = jnp.take_along_axis(sampled_m, n_acc[:, None],
                                            axis=1)[:, 0]
            last_idx = jnp.take_along_axis(li, n_acc[:, None],
                                           axis=1)[:, 0]
            emask = seg("eagle_mask").astype(bool)

            positions = seg("positions")
            dn = seg("draft_next")
            shifted = jnp.roll(input_ids, -1)
            shifted = jnp.where(dn >= 0, dn, shifted)
            scat = jnp.where(emask, last_idx, t_pad)
            shifted = shifted.at[scat].set(final_tok, mode="drop")

            d_hidden, kv_caches = eagle(dparams, params, shifted,
                                        hidden, positions, kv_caches,
                                        attn_meta,
                                        layer_offset=target_layers,
                                        use_pallas=use_pallas)
            h = jnp.take(d_hidden, last_idx, axis=0)  # [r_pad, H]
            p_last = jnp.take(positions, last_idx)  # [r_pad]
            tok = eagle.propose_token(dparams, params, model, h)
            drafts = [tok]

            bt = attn_meta.block_tables
            qsl = jnp.arange(r_pad + 1, dtype=jnp.int32)
            for k in range(1, max_spec):
                pos = p_last + k
                ok = emask & (pos < max_model_len)
                posc = jnp.where(ok, pos, 0)
                page_idx = jnp.clip(posc // page, 0, mp - 1)
                slot = jnp.take_along_axis(
                    bt, page_idx[:, None], axis=1)[:, 0] * page + \
                    posc % page
                meta_k = AttentionMetadata(
                    block_tables=bt,
                    query_start_loc=qsl,
                    seq_lens=jnp.where(ok, posc + 1, 1),
                    slot_mapping=jnp.where(ok, slot, -1),
                    num_seqs=attn_meta.num_seqs,
                )
                h, kv_caches = eagle(dparams, params, tok, h, posc,
                                     kv_caches, meta_k,
                                     layer_offset=target_layers,
                                     use_pallas=use_pallas)
                tok = eagle.propose_token(dparams, params, model, h)
                drafts.append(tok)
            return out._replace(
                draft_tokens=jnp.stack(drafts, axis=1)), kv_caches

        def step(params, kv_caches, packed, prev_sampled=None,
                 prev_sampled2=None, mm_buffer=None,
                 cross_cache=None):
            def seg(name):
                a, b = layout[name]
                return jax.lax.slice_in_dim(packed, a, b)

            def seg_f32(name):
                return jax.lax.bitcast_convert_type(
                    seg(name), jnp.float32)

            input_ids = seg("input_ids")
            if has_prev:
                # chain the previous steps' sampled tokens on-device:
                # no host round trip between consecutive decode steps
                gather = jnp.clip(seg("prev_gather"), 0,
                                  prev_sampled.shape[0] - 1)
                vals = jnp.take(prev_sampled, gather)
                scat = seg("prev_scatter")
                idx = jnp.where(scat >= 0, scat, t_pad)
                input_ids = input_ids.at[idx].set(vals, mode="drop")
            if has_prev2:
                gather = jnp.clip(seg("prev2_gather"), 0,
                                  prev_sampled2.shape[0] - 1)
                vals = jnp.take(prev_sampled2, gather)
                scat = seg("prev2_scatter")
                idx = jnp.where(scat >= 0, scat, t_pad)
                input_ids = input_ids.at[idx].set(vals, mode="drop")

            attn_meta = AttentionMetadata(
                block_tables=seg("block_tables").reshape(r_pad, mp),
                query_start_loc=seg("query_start_loc"),
                seq_lens=seg("seq_lens"),
                slot_mapping=seg("slot_mapping"),
                num_seqs=jax.lax.slice_in_dim(
                    seg("scalars"), 1, 2),
                kv_update_slices=seg("kv_slices").reshape(3, s_pad),
                num_kv_update_slices=jax.lax.slice_in_dim(
                    seg("scalars"), 0, 1),
                token_lora_slots=(seg("lora_slots")
                                  if enable_lora else None),
                cross_block_tables=(
                    seg("cross_block_tables").reshape(
                        r_pad, cross_pages) if is_enc_dec else None),
                cross_seq_lens=(seg("cross_seq_lens")
                                if is_enc_dec else None),
                bidir_spans=(seg("bidir_spans").reshape(
                    r_pad, max_mm_spans, 2)
                    if (bidir_mm and mm_pad) else None),
                cascade_pages=cascade,
                pure_decode=pure_decode,
            )
            if group_kinds:
                attn_meta = attn_meta._replace(groups=tuple(
                    KVGroupMeta(block_tables=None, slot_mapping=None,
                                state_slots=seg(f"state_slots@{gi}"),
                                state_fresh=seg(f"state_fresh@{gi}"))
                    if kind == "mamba" else
                    KVGroupMeta(
                        block_tables=seg(f"block_tables@{gi}").reshape(
                            r_pad, mp),
                        slot_mapping=seg(f"slot_mapping@{gi}"),
                        kv_update_slices=seg(f"kv_slices@{gi}").reshape(
                            3, s_pad),
                        num_kv_update_slices=seg(f"kv_slices_n@{gi}"))
                    for gi, kind in enumerate(group_kinds, start=1)))
            logits_indices = seg("logits_indices")  # [r_pad * nsp]
            mm_kwargs = {}
            if mm_pad:
                g = jnp.clip(seg("mm_gather"), 0,
                             mm_buffer.shape[0] - 1)
                rows = jnp.take(mm_buffer, g, axis=0)
                scat = seg("mm_scatter")
                import inspect as _inspect
                if "mm_embeds" in _inspect.signature(
                        model.__call__).parameters:
                    mm_kwargs = dict(mm_embeds=rows, mm_scatter=scat)
                else:
                    # prompt-embeds on a plain decoder: merge into
                    # the embedding stream here (reference:
                    # EmbedsPrompt handling in get_input_embeddings)
                    x0 = jnp.take(params["embed_tokens"], input_ids,
                                  axis=0)
                    idx = jnp.where(scat >= 0, scat, x0.shape[0])
                    x0 = x0.at[idx].set(rows.astype(x0.dtype),
                                        mode="drop")
                    mm_kwargs = dict(inputs_embeds=x0)
            if is_enc_dec:
                mm_kwargs = dict(cross_kv_cache=cross_cache)
            model_positions = (
                seg("mrope_positions").reshape(3, t_pad)
                if uses_mrope else seg("positions"))
            # LoRA context: while tracing inside it, every matmul()
            # over a LoraWeight adds the per-token adapter delta —
            # adapters reach EVERY model through the shared weight
            # seam (reference: vllm/lora/layers/ wraps every linear)
            lora_ctx = (lora_context(params["lora_scales"],
                                     seg("lora_slots"))
                        if enable_lora else contextlib.nullcontext())
            with lora_ctx:
                if is_eagle3:
                    # target collects aux tap hiddens for the draft's
                    # fc
                    hidden, kv_caches, aux3 = model(
                        params, input_ids, model_positions, kv_caches,
                        attn_meta, use_pallas=use_pallas, **mm_kwargs)
                elif eplb:
                    hidden, kv_caches, eplb_counts = model(
                        params, input_ids, model_positions, kv_caches,
                        attn_meta, use_pallas=use_pallas, **mm_kwargs)
                else:
                    hidden, kv_caches = model(params, input_ids,
                                              model_positions,
                                              kv_caches, attn_meta,
                                              use_pallas=use_pallas,
                                              **mm_kwargs)
            sampled_hidden = jnp.take(hidden, logits_indices, axis=0)
            logits = model.compute_logits(params, sampled_hidden)

            def rep(a):
                return jnp.repeat(a, nsp) if nsp > 1 else a
            if apply_grammar:
                # unpack bit w*32+j of int32 words -> bool [R, V]; mask
                # disallowed tokens before sampling (reference:
                # structured_decode tpu_model_runner.py:1786-1806)
                vocab = logits.shape[-1]
                w = seg("grammar_words").reshape(
                    r_pad, num_words).astype(jnp.uint32)
                bits = (w[:, :, None] >>
                        jnp.arange(32, dtype=jnp.uint32)) & 1
                allowed = bits.reshape(r_pad, -1)[:, :vocab]
                if nsp > 1:
                    allowed = jnp.repeat(allowed, nsp, axis=0)
                logits = jnp.where(allowed.astype(bool), logits,
                                   jnp.float32(-jnp.inf))
            pen_kwargs = {}
            if has_penalties:
                pp = seg_f32("pen_params").reshape(3, r_pad)
                pen_kwargs = dict(
                    presence_penalties=rep(pp[0]),
                    frequency_penalties=rep(pp[1]),
                    repetition_penalties=rep(pp[2]),
                    token_history=(jnp.repeat(
                        seg("pen_history").reshape(
                            r_pad, max_model_len), nsp, axis=0)
                                   if nsp > 1 else
                                   seg("pen_history").reshape(
                                       r_pad, max_model_len)),
                    num_prompt_tokens=rep(seg("pen_num_prompt")),
                    need_penalties=True)
            bias_kwargs = {}
            if has_bias:
                bi = seg("bias_ids").reshape(r_pad, bias_max)
                bv = seg_f32("bias_vals").reshape(r_pad, bias_max)
                if nsp > 1:
                    bi = jnp.repeat(bi, nsp, axis=0)
                    bv = jnp.repeat(bv, nsp, axis=0)
                bias_kwargs = dict(bias_token_ids=bi, bias_values=bv,
                                   need_logit_bias=True)
            sample_pos = rep(seg("sample_pos"))
            spec_kwargs = {}
            if nsp > 1:
                # decouple the nsp per-row draws: position j samples
                # the token at sequence index pos + j
                sample_pos = sample_pos + jnp.tile(
                    jnp.arange(nsp, dtype=jnp.int32), r_pad)
                spec_kwargs = dict(
                    draft_token_ids=seg("spec_drafts"),
                    need_rejection=True)
            meta = SamplingMetadata(
                temperature=rep(seg_f32("temperature")),
                top_k=rep(seg("top_k")),
                top_p=rep(seg_f32("top_p")),
                min_p=rep(seg_f32("min_p")),
                seeds=rep(jax.lax.bitcast_convert_type(
                    seg("seeds"), jnp.uint32)),
                sample_pos=sample_pos,
                all_greedy=all_greedy,
                **spec_kwargs,
                need_top_k=need_top_k, need_top_p=need_top_p,
                need_min_p=need_min_p,
                max_num_logprobs=max_num_logprobs,
                **pen_kwargs, **bias_kwargs)
            key = jax.random.PRNGKey(base_seed)
            out = sample(logits, meta, key)
            if eplb:
                out = out._replace(eplb_counts=eplb_counts)
            if eagle is not None:
                # EAGLE-3 drafts from the fc-combined aux hiddens;
                # EAGLE-1 from the target's final hidden
                eagle_hidden = eagle.combine(params["__draft__"],
                                             aux3) \
                    if is_eagle3 else hidden
                out, kv_caches = eagle_propose(
                    params, kv_caches, out, eagle_hidden, input_ids,
                    attn_meta, seg)
            elif medusa is not None:
                # Medusa proposal (reference: MedusaProposer.propose):
                # heads read the target hidden at each row's FINAL
                # emitted position — one forward, no draft KV
                sampled_m = out.sampled.reshape(r_pad, nsp)
                acc = out.spec_accept.reshape(r_pad, nsp)
                li = seg("logits_indices").reshape(r_pad, nsp)
                n_acc = jnp.sum(jnp.cumprod(
                    acc[:, :nsp - 1].astype(jnp.int32), axis=1),
                    axis=1)
                last_idx = jnp.take_along_axis(li, n_acc[:, None],
                                               axis=1)[:, 0]
                h_last = jnp.take(hidden, last_idx, axis=0)
                drafts = medusa.propose(params["__draft__"], h_last)
                out = out._replace(
                    draft_tokens=drafts[:, :max_spec])
            elif mlpspec is not None:
                # MLP-speculator (reference:
                # mlp_speculator.py generate_proposals): sequential
                # token/embedding recurrence from the final emitted
                # position — no attention, no draft KV
                sampled_m = out.sampled.reshape(r_pad, nsp)
                acc = out.spec_accept.reshape(r_pad, nsp)
                li = seg("logits_indices").reshape(r_pad, nsp)
                n_acc = jnp.sum(jnp.cumprod(
                    acc[:, :nsp - 1].astype(jnp.int32), axis=1),
                    axis=1)
                final_tok = jnp.take_along_axis(
                    sampled_m, n_acc[:, None], axis=1)[:, 0]
                last_idx = jnp.take_along_axis(li, n_acc[:, None],
                                               axis=1)[:, 0]
                h_last = jnp.take(hidden, last_idx, axis=0)
                drafts = mlpspec.propose(params["__draft__"], h_last,
                                         final_tok, max_spec)
                out = out._replace(draft_tokens=drafts)
            plp_aux = None
            if prompt_lp > 0:
                # prompt logprobs: logits over ALL packed positions
                # (position i predicts the token at i+1; the host put
                # that target token in plp_targets). Only compiled in
                # when a prompt-logprobs request has prompt positions
                # this step. Reference: _get_prompt_logprobs_dict
                # (vllm/v1/worker/gpu_model_runner.py).
                full_logits = model.compute_logits(params, hidden)
                lse = jax.scipy.special.logsumexp(full_logits,
                                                  axis=-1,
                                                  keepdims=True)
                tgt = seg("plp_targets")
                tgtc = jnp.clip(tgt, 0, full_logits.shape[-1] - 1)
                tgt_logit = jnp.take_along_axis(full_logits,
                                                tgtc[:, None], axis=1)
                tgt_rank = jnp.sum(full_logits > tgt_logit,
                                   axis=-1).astype(jnp.int32) + 1
                top_logit, top_ids = jax.lax.top_k(
                    full_logits, prompt_lp)
                plp_aux = ((tgt_logit - lse)[:, 0], tgt_rank, top_ids,
                           top_logit - lse)
            if return_hidden:
                # pooling/embedding requests (reference: pooler
                # layer). Decoders pool the last token; encoder-only
                # models (BERT family) pool CLS or the segment mean
                pooling_type = getattr(model, "pooling_type", "last")
                if pooling_type == "cls":
                    qsl = seg("query_start_loc")
                    pooled = jnp.take(hidden, qsl[:-1], axis=0)
                elif pooling_type == "mean":
                    qsl = seg("query_start_loc")
                    tt = jnp.arange(hidden.shape[0], dtype=jnp.int32)
                    row_of = (jnp.searchsorted(
                        qsl, tt, side="right").astype(jnp.int32) -
                        1).clip(0, r_pad - 1)
                    valid = (tt < qsl[r_pad])[:, None]
                    sums = jax.ops.segment_sum(
                        jnp.where(valid, hidden.astype(jnp.float32),
                                  0.0), row_of, num_segments=r_pad)
                    counts = jnp.maximum(qsl[1:] - qsl[:-1], 1)
                    pooled = sums / counts[:, None]
                elif pooling_type == "all":
                    # token-level heads (BertForTokenClassification):
                    # ship the full packed hidden; the host slices
                    # each request's rows via its token offsets
                    pooled = hidden
                else:
                    pooled = sampled_hidden
                if hasattr(model, "pool_projection"):
                    # classification pooler (BERT tanh head) fused in
                    pooled = model.pool_projection(params, pooled)
                return kv_caches, out, pooled, plp_aux
            return kv_caches, out, None, plp_aux

        return jax.jit(step, donate_argnums=(1, ))

    # ------------------------------------------------------------------
    # multi-step decode: K decode iterations per device dispatch
    # ------------------------------------------------------------------
    # When the scheduler marks a step as a pure-decode chunk
    # (SchedulerOutput.num_decode_steps > 1), the runner executes K
    # decode iterations inside ONE jitted lax.scan: each iteration is
    # shape-identical to a normal single-token decode step (r_pad
    # tokens, one per request), and the sampled tokens chain through
    # the scan carry — zero host round trips between iterations.
    # TPU-native replacement for the reference's per-step dispatch
    # (tpu_model_runner.py:981 runs multiple forwards per schedule for
    # the opposite reason: oversized batches).

    @_instance_memo
    def _decode_layout(self, r_pad: int) -> dict:
        """Packed int32 buffer layout for one decode chunk."""
        mp = self.max_blocks_per_req
        sizes = [
            ("tokens0", r_pad),  # input token per row (may be -1)
            ("positions0", r_pad),  # first position per row
            ("block_tables", r_pad * mp),
            ("temperature", r_pad),
            ("top_k", r_pad),
            ("top_p", r_pad),
            ("min_p", r_pad),
            ("seeds", r_pad),
            ("sample_pos", r_pad),
            # on-device chaining of the previous dispatch's sampled
            # tokens (row-indexed, -1 = no chain), depth-2 as in the
            # single-step path
            ("prev_scatter", r_pad),
            ("prev_gather", r_pad),
            ("prev2_scatter", r_pad),
            ("prev2_gather", r_pad),
            ("scalars", 1),  # num_reqs
        ]
        layout = {}
        off = 0
        for name, size in sizes:
            layout[name] = (off, off + size)
            off += size
        layout["total"] = off
        return layout

    @_instance_memo
    def _get_decode_step_fn(self, r_pad: int, num_steps: int,
                            all_greedy: bool, need_top_k: bool,
                            need_top_p: bool, need_min_p: bool,
                            has_prev: bool, has_prev2: bool):
        model = self.model
        use_pallas = self.use_pallas
        base_seed = self.config.model_config.seed
        page = self.page_size
        mp = self.max_blocks_per_req
        layout = self._decode_layout(r_pad)

        def chunk(params, kv_caches, packed, prev_sampled=None,
                  prev_sampled2=None):
            def seg(name):
                a, b = layout[name]
                return jax.lax.slice_in_dim(packed, a, b)

            def seg_f32(name):
                return jax.lax.bitcast_convert_type(
                    seg(name), jnp.float32)

            tokens = seg("tokens0")
            if has_prev:
                gather = jnp.clip(seg("prev_gather"), 0,
                                  prev_sampled.shape[0] - 1)
                vals = jnp.take(prev_sampled, gather)
                scat = seg("prev_scatter")
                idx = jnp.where(scat >= 0, scat, r_pad)
                tokens = tokens.at[idx].set(vals, mode="drop")
            if has_prev2:
                gather = jnp.clip(seg("prev2_gather"), 0,
                                  prev_sampled2.shape[0] - 1)
                vals = jnp.take(prev_sampled2, gather)
                scat = jnp.asarray(seg("prev2_scatter"))
                idx = jnp.where(scat >= 0, scat, r_pad)
                tokens = tokens.at[idx].set(vals, mode="drop")

            positions0 = seg("positions0")
            block_tables = seg("block_tables").reshape(r_pad, mp)
            num_seqs = jax.lax.slice_in_dim(seg("scalars"), 0, 1)
            num_reqs = num_seqs[0]
            rows = jnp.arange(r_pad, dtype=jnp.int32)
            active = rows < num_reqs
            qsl = jnp.minimum(jnp.arange(r_pad + 1, dtype=jnp.int32),
                              num_reqs)
            sample_pos0 = seg("sample_pos")
            meta0 = SamplingMetadata(
                temperature=seg_f32("temperature"),
                top_k=seg("top_k"),
                top_p=seg_f32("top_p"),
                min_p=seg_f32("min_p"),
                seeds=jax.lax.bitcast_convert_type(
                    seg("seeds"), jnp.uint32),
                sample_pos=sample_pos0,
                all_greedy=all_greedy,
                need_top_k=need_top_k, need_top_p=need_top_p,
                need_min_p=need_min_p, max_num_logprobs=0)
            key = jax.random.PRNGKey(base_seed)

            def body(carry, j):
                kv, toks = carry
                pos = positions0 + j
                seq_lens = jnp.where(active, pos + 1, 0)
                page_ids = jnp.take_along_axis(
                    block_tables, (pos // page)[:, None], axis=1)[:, 0]
                slots = page_ids * page + pos % page
                attn_meta = AttentionMetadata(
                    block_tables=block_tables,
                    query_start_loc=qsl,
                    seq_lens=seq_lens,
                    slot_mapping=jnp.where(active, slots, -1),
                    num_seqs=num_seqs,
                    kv_update_slices=jnp.stack([
                        slots, rows,
                        jnp.where(active, 1, 0).astype(jnp.int32)
                    ]),
                    num_kv_update_slices=num_seqs,
                    pure_decode=True,
                )
                hidden, kv = model(params, toks, pos, kv, attn_meta,
                                   use_pallas=use_pallas)
                logits = model.compute_logits(params, hidden)
                out = sample(logits,
                             meta0._replace(sample_pos=sample_pos0 + j),
                             key)
                return (kv, out.sampled), out.sampled

            (kv_caches, last), sampled_steps = jax.lax.scan(
                body, (kv_caches, tokens),
                jnp.arange(num_steps, dtype=jnp.int32))
            return kv_caches, sampled_steps, last

        return jax.jit(chunk, donate_argnums=(1, ))

    def _prepare_decode_chunk(self, scheduler_output: SchedulerOutput):
        """Vectorized numpy build of the decode-chunk buffer (one row
        per request; reference for the vectorized style:
        gpu_model_runner.py:939 ``_prepare_inputs``)."""
        batch = self.input_batch
        n = batch.num_reqs
        assert n > 0
        r_pad = self._pad_to_bucket(n, self.req_buckets)
        layout = self._decode_layout(r_pad)
        packed = np.zeros(layout["total"], dtype=np.int32)

        def seg(name):
            a, b = layout[name]
            return packed[a:b]

        mp = self.max_blocks_per_req
        pos0 = batch.num_computed_tokens[:n]
        seg("positions0")[:n] = pos0
        seg("tokens0")[:n] = batch.token_ids[np.arange(n), pos0]
        seg("block_tables").reshape(r_pad, mp)[:n] = \
            batch.block_table[:n, :mp]
        temp = seg("temperature").view(np.float32)
        temp[:] = -1.0
        temp[:n] = batch.temperature[:n]
        seg("top_k")[:n] = batch.top_k[:n]
        top_p = seg("top_p").view(np.float32)
        top_p[:] = 1.0
        top_p[:n] = batch.top_p[:n]
        seg("min_p").view(np.float32)[:n] = batch.min_p[:n]
        seg("seeds").view(np.uint32)[:n] = batch.seeds[:n]
        seg("sample_pos")[:n] = batch.num_tokens[:n]
        seg("scalars")[0] = n

        prev_scatter = seg("prev_scatter")
        prev_scatter[:] = -1
        prev2_scatter = seg("prev2_scatter")
        prev2_scatter[:] = -1
        has_prev = has_prev2 = False
        for rid, (age, prev_row, pos) in self._pending_fill.items():
            row = batch.req_id_to_index.get(rid)
            if row is None or pos0[row] != pos:
                continue
            if age == 0:
                prev_scatter[row] = row
                seg("prev_gather")[row] = prev_row
                has_prev = True
            else:
                prev2_scatter[row] = row
                seg("prev2_gather")[row] = prev_row
                has_prev2 = True
        return packed, r_pad, has_prev, has_prev2

    def _execute_decode_chunk(self, scheduler_output: SchedulerOutput,
                              num_steps: int, is_async: bool):
        packed, r_pad, row_prev, row_prev2 = \
            self._prepare_decode_chunk(scheduler_output)
        (all_greedy, need_top_k, need_top_p, need_min_p,
         max_lp) = self._sampling_statics()
        assert max_lp == 0, \
            "scheduler must not multi-step logprobs requests"
        has_prev = is_async and self._prev_sampled is not None
        has_prev2 = (is_async and row_prev2
                     and self._prev_sampled2 is not None)

        chunk_fn = self._get_decode_step_fn(r_pad, num_steps,
                                            all_greedy, need_top_k,
                                            need_top_p, need_min_p,
                                            has_prev, has_prev2)
        self._note_compile(
            ("decode_chunk", r_pad, num_steps, all_greedy, need_top_k,
             need_top_p, need_min_p, has_prev, has_prev2,
             None if not has_prev else self._prev_sampled.shape[0]))

        self._step_count += 1
        if self.step_broadcaster is not None:
            self.step_broadcaster.publish(
                self._step_count,
                ("chunk", r_pad, num_steps, all_greedy, need_top_k,
                 need_top_p, need_min_p, has_prev, has_prev2), packed)
        packed_dev = jnp.asarray(packed, device=self._replicated)
        self.kv_caches, sampled_steps, last = chunk_fn(
            self.params, self.kv_caches, packed_dev,
            self._prev_sampled if has_prev else None,
            self._prev_sampled2 if has_prev2 else None)

        batch = self.input_batch
        num_reqs = batch.num_reqs
        req_ids = [batch.req_ids[i] for i in range(num_reqs)]

        if not is_async:
            sampled_np = np.asarray(sampled_steps)  # [K, r_pad]
            sampled_token_ids = []
            for row in range(num_reqs):
                toks = sampled_np[:, row].tolist()
                sampled_token_ids.append(toks)
                for tok in toks:
                    self._append_token(row, tok)
            return ModelRunnerOutput(
                req_ids=req_ids,
                req_id_to_index={r: i for i, r in enumerate(req_ids)},
                sampled_token_ids=sampled_token_ids)

        # async: K placeholders per row; chain the chunk's LAST token
        # into the next dispatch exactly like the single-step path
        pending: list[tuple[str, int, int]] = []
        new_fill: dict[str, tuple[int, int, int]] = {
            rid: (1, row, pos)
            for rid, (age, row, pos) in self._pending_fill.items()
            if age == 0
        }
        for row in range(num_reqs):
            req_id = batch.req_ids[row]
            first_pos = int(batch.num_tokens[row])
            for _ in range(num_steps):
                self._append_token(row, -1)
            pending.append((req_id, row, first_pos))
            new_fill[req_id] = (0, row, first_pos + num_steps - 1)
        self._prev_sampled2 = self._prev_sampled
        self._prev_sampled = last
        self._pending_fill = new_fill
        try:
            sampled_steps.copy_to_host_async()
        except AttributeError:
            pass
        return AsyncChunkHandle(self, sampled_steps, req_ids, pending,
                                num_steps)

    # ------------------------------------------------------------------
    # execute (reference: execute_model tpu_model_runner.py:981)
    # ------------------------------------------------------------------

    def _cascade_bucket(self, scheduler_output) -> int:
        """Static shared-prefix page bucket for cascade attention
        (power-of-2 floor of the scheduler hint bounds compile
        variants; 0 = off). XLA path only this round — the Pallas
        kernel fast-path is future work."""
        n = getattr(scheduler_output, "num_common_prefix_pages", 0)
        if n < 2 or self.use_pallas or self.num_kv_groups > 1 or \
                self.is_enc_dec or self.is_mm:
            return 0
        self.cascade_steps += 1
        return 1 << (n.bit_length() - 1)

    def _is_pure_decode(self, scheduler_output: SchedulerOutput,
                        t_pad: int, r_pad: int) -> bool:
        """True when this dispatch can take the Pallas decode fast
        path: q row s IS sequence s (every persistent-batch row has
        exactly one scheduled token) and the token/request pads agree
        so the kernel sees one q row per batch row."""
        if t_pad != r_pad or self.num_sample_positions > 1:
            return False
        batch = self.input_batch
        sched = scheduler_output.num_scheduled_tokens
        return all(
            sched.get(batch.req_ids[i], 0) == 1
            for i in range(batch.num_reqs))

    def execute_model(
            self, scheduler_output: SchedulerOutput) -> ModelRunnerOutput:
        self._update_states(scheduler_output)
        self._process_kv_offload_ops(scheduler_output)
        if scheduler_output.total_num_scheduled_tokens == 0:
            return ModelRunnerOutput(req_ids=[], req_id_to_index={},
                                     sampled_token_ids=[])
        if scheduler_output.num_decode_steps > 1:
            return self._execute_decode_chunk(
                scheduler_output, scheduler_output.num_decode_steps,
                is_async=False)

        (packed, sample_rows, t_pad, r_pad, s_pad, apply_grammar,
         spec_counts, proposed, has_penalties, has_bias, mm_pad,
         prompt_lp) = self._prepare_inputs(scheduler_output)
        statics = self._sampling_statics()
        max_num_logprobs = statics[-1]
        cascade = self._cascade_bucket(scheduler_output)
        pooling_rows = [
            row for row in sample_rows
            if (st := self.requests.get(
                self.input_batch.req_ids[row])) is not None
            and st.sampling_params is None
        ]
        return_hidden = bool(pooling_rows)
        plp_plan = (self._prompt_lp_plan(scheduler_output)
                    if prompt_lp else None)

        pure_decode = self._is_pure_decode(scheduler_output, t_pad,
                                           r_pad)
        step_fn = self._get_step_fn(t_pad, r_pad, *statics,
                                    apply_grammar, False,
                                    return_hidden, False,
                                    has_penalties, has_bias, mm_pad,
                                    prompt_lp, cascade, pure_decode)
        self._note_compile((t_pad, r_pad, *statics, apply_grammar,
                            return_hidden, has_penalties, has_bias,
                            mm_pad, prompt_lp, cascade, pure_decode))

        self._step_count += 1
        if self.step_broadcaster is not None:
            self.step_broadcaster.publish(
                self._step_count,
                ("step", t_pad, r_pad, *statics, apply_grammar, False,
                 return_hidden, False, has_penalties, has_bias,
                 mm_pad, prompt_lp, cascade, pure_decode), packed)
        packed_dev = jnp.asarray(packed, device=self._replicated)
        self.kv_caches, out, hidden, plp_aux = step_fn(
            self.params, self.kv_caches, packed_dev,
            mm_buffer=self.mm_buffer if mm_pad else None,
            cross_cache=(self.cross_cache
                         if self.is_enc_dec else None))

        # device -> host (single transfer of the small sampled arrays)
        sampled_np = np.asarray(out.sampled)
        if self.eplb_state is not None:
            self.eplb_step(np.asarray(out.eplb_counts))
        nsp = self.num_sample_positions
        accept_np = None
        if nsp > 1:
            sampled_np = sampled_np.reshape(r_pad, nsp)
            accept_np = np.asarray(out.spec_accept).reshape(r_pad, nsp)
        if max_num_logprobs > 0:
            lp_ids_np = np.asarray(out.logprob_token_ids)
            lps_np = np.asarray(out.logprobs)
            ranks_np = np.asarray(out.sampled_ranks)

        batch = self.input_batch
        num_reqs = batch.num_reqs
        req_ids = [batch.req_ids[i] for i in range(num_reqs)]
        sampled_token_ids: list[list[int]] = [[] for _ in range(num_reqs)]
        sample_row_set = set(sample_rows)
        draft_token_ids = None
        pooler_output = None
        if return_hidden:
            hidden_np = np.asarray(hidden)
            pooler_output = {}
            token_level = getattr(self.model, "pooling_type",
                                  "last") == "all"
            if token_level:
                # row -> packed token offsets, same order as the
                # device qsl build in _prepare_inputs
                offs = np.zeros(num_reqs + 1, np.int64)
                for i in range(num_reqs):
                    offs[i + 1] = offs[i] + \
                        scheduler_output.num_scheduled_tokens.get(
                            batch.req_ids[i], 0)
            for row in pooling_rows:
                req_id = batch.req_ids[row]
                state = self.requests.get(req_id)
                pp = state.pooling_params if state else None
                if token_level:
                    hs = hidden_np[offs[row]:offs[row + 1]].astype(
                        np.float32)
                    if self._score_np is None:
                        self._score_np = np.asarray(
                            self.params["score"], dtype=np.float32)
                        self._score_bias_np = (
                            np.asarray(self.params["score_bias"],
                                       dtype=np.float32)
                            if "score_bias" in self.params else None)
                    logits = hs @ self._score_np
                    if self._score_bias_np is not None:
                        logits = logits + self._score_bias_np
                    if pp is None or pp.activation != "none":
                        logits = logits - logits.max(-1, keepdims=True)
                        e = np.exp(logits)
                        logits = e / e.sum(-1, keepdims=True)
                    pooler_output[req_id] = logits
                    continue
                vec = hidden_np[row * nsp].astype(np.float32)
                if hasattr(self.model, "classify_logits"):
                    # classification pooler: score head + softmax
                    # (reference: pooler 'classify' activation)
                    if self._score_np is None:
                        self._score_np = np.asarray(
                            self.params["score"], dtype=np.float32)
                        self._score_bias_np = (
                            np.asarray(self.params["score_bias"],
                                       dtype=np.float32)
                            if "score_bias" in self.params else None)
                    logits = vec @ self._score_np
                    if self._score_bias_np is not None:
                        logits = logits + self._score_bias_np
                    if pp is None or pp.activation != "none":
                        logits = logits - logits.max()
                        e = np.exp(logits)
                        logits = e / e.sum()
                    pooler_output[req_id] = logits
                    continue
                if pp is None or pp.normalize:
                    vec = vec / max(np.linalg.norm(vec), 1e-12)
                pooler_output[req_id] = vec
        pooling_row_set = set(pooling_rows)
        for row in sample_rows:
            if row in pooling_row_set:
                continue  # embedding request: no token emitted
            if nsp > 1:
                # draft verification via device-side rejection
                # sampling (reference: RejectionSampler,
                # vllm/v1/sample/rejection_sampler.py): accepted
                # positions emit the draft; the first rejection emits
                # the recovery sample; full acceptance emits a bonus
                drafts = proposed.get(row, [])
                toks = []
                for j, d in enumerate(drafts):
                    if accept_np[row, j]:
                        toks.append(int(d))
                    else:
                        toks.append(int(sampled_np[row, j]))
                        break
                else:
                    toks.append(int(sampled_np[row, len(drafts)]))
            else:
                toks = [int(sampled_np[row])]
            sampled_token_ids[row] = toks
            for tok in toks:
                self._append_token(row, tok)

        if self.proposer is not None:
            draft_token_ids = [[] for _ in range(num_reqs)]
            # rejection sampling verifies drafts for random rows too
            for row, draft in self.proposer.propose_batch(
                    batch.token_ids, batch.num_tokens,
                    list(sample_rows)).items():
                draft_token_ids[row] = draft
        elif (self.eagle is not None or self.medusa is not None
              or self.mlpspec is not None):
            # drafts were proposed on device inside the fused step
            drafts_np = np.asarray(out.draft_tokens)  # [r_pad, K]
            draft_token_ids = [[] for _ in range(num_reqs)]
            for row in sample_rows:
                if row in pooling_row_set:
                    continue
                # leave room: drafts occupy positions num_tokens.. and
                # the verifying step emits up to one more token
                room = self.max_model_len - int(
                    batch.num_tokens[row]) - 1
                k = max(min(self.max_spec, room), 0)
                draft_token_ids[row] = drafts_np[row, :k].tolist()

        logprobs_lists = None
        if max_num_logprobs > 0:
            # one row per EMITTED token: under spec decode (nsp > 1)
            # request i's accepted token j lives at device row
            # i*nsp + j (the sampler wrote the emitted token's
            # logprob/rank there)
            def _rows(src, cast):
                out = []
                for i in range(num_reqs):
                    if i not in sample_row_set:
                        out.append([])
                    elif nsp > 1:
                        out.append([
                            cast(src[i * nsp + j])
                            for j in range(len(sampled_token_ids[i]))
                        ])
                    else:
                        out.append([cast(src[i])])
                return out

            logprobs_lists = LogprobsLists(
                logprob_token_ids=_rows(lp_ids_np,
                                        lambda r: r.tolist()),
                logprobs=_rows(lps_np, lambda r: r.tolist()),
                sampled_token_ranks=_rows(ranks_np, int),
            )

        plp_dict = {}
        if plp_aux is not None:
            plp_dict = self._assemble_prompt_logprobs(
                plp_plan, plp_aux)

        return ModelRunnerOutput(
            req_ids=req_ids,
            req_id_to_index={r: i for i, r in enumerate(req_ids)},
            sampled_token_ids=sampled_token_ids,
            logprobs=logprobs_lists,
            prompt_logprobs_dict=plp_dict,
            draft_token_ids=draft_token_ids,
            pooler_output=pooler_output,
        )

    # ------------------------------------------------------------------
    # prompt logprobs (reference: _get_prompt_logprobs_dict,
    # vllm/v1/worker/gpu_model_runner.py)
    # ------------------------------------------------------------------

    def _prompt_lp_plan(self, scheduler_output: SchedulerOutput):
        """Capture, at dispatch time, which packed positions belong to
        which prompt-logprobs request (the batch mutates before an
        async handle materializes)."""
        batch = self.input_batch
        plan = []
        off = 0
        for row in range(batch.num_reqs):
            rid = batch.req_ids[row]
            ns = scheduler_output.num_scheduled_tokens.get(rid, 0)
            k = int(batch.num_prompt_logprobs[row])
            start = int(batch.num_computed_tokens[row])
            n_prompt = int(batch.num_prompt_tokens[row])
            if k and ns and start < n_prompt:
                # targets exist for positions p with p+1 <= n_prompt-1
                hi = min(start + ns, n_prompt - 1)
                targets = batch.token_ids[row,
                                          start + 1:hi + 1].tolist()
                plan.append((rid, off, start, hi, k, targets,
                             start + ns >= n_prompt))
            off += ns
        return plan

    def _assemble_prompt_logprobs(self, plan, plp_aux) -> dict:
        """Fold one step's device plp arrays into per-request
        accumulators; emit a request's full LogprobsDict on the step
        that finishes its prompt."""
        from vllm_main_modify_tpu.outputs import Logprob

        tgt_lp, tgt_rank, top_ids, top_lp = (np.asarray(a)
                                             for a in plp_aux)
        result: dict = {}
        for rid, off, start, hi, k, targets, done in plan:
            acc = self._prompt_lp_acc.setdefault(rid, [None])
            for j, tid in enumerate(targets):
                i = off + j  # packed index of prompt position start+j
                d = {
                    int(t): Logprob(float(lp), rank=r + 1)
                    for r, (t, lp) in enumerate(
                        zip(top_ids[i, :k], top_lp[i, :k]))
                }
                if tid not in d:
                    d[tid] = Logprob(float(tgt_lp[i]),
                                     rank=int(tgt_rank[i]))
                # index-aligned write: position start+j's target is
                # prompt token start+j+1 — preemption/recompute may
                # replay positions, so never blind-append
                idx = start + 1 + j
                if idx < len(acc):
                    acc[idx] = d
                else:
                    acc.append(d)
            if done:
                result[rid] = self._prompt_lp_acc.pop(rid)
        return result

    def _append_token(self, row: int, tok: int) -> None:
        """Keep BOTH the persistent batch arrays and the cached request
        state in sync (the state is the source of truth when a row is
        evicted and later re-admitted)."""
        batch = self.input_batch
        req_id = batch.req_ids[row]
        batch.append_token_id(row, tok)
        state = self.requests.get(req_id)
        if state is not None:
            state.output_token_ids.append(tok)

    # ------------------------------------------------------------------
    # async execution (one-step pipelining; reference: AsyncScheduler +
    # AsyncModelRunnerOutput, vllm/v1/outputs.py)
    # ------------------------------------------------------------------

    def execute_model_async(self, scheduler_output: SchedulerOutput):
        """Dispatch the step WITHOUT waiting for results. Sampled
        tokens stay on device and feed the next step's inputs; the
        returned handle materializes them one step later."""
        self._update_states(scheduler_output)
        self._process_kv_offload_ops(scheduler_output)
        if scheduler_output.total_num_scheduled_tokens == 0:
            return None
        if scheduler_output.num_decode_steps > 1:
            return self._execute_decode_chunk(
                scheduler_output, scheduler_output.num_decode_steps,
                is_async=True)

        (packed, sample_rows, t_pad, r_pad, s_pad, apply_grammar,
         _spec_counts, _proposed, has_penalties, has_bias, mm_pad,
         prompt_lp) = self._prepare_inputs(scheduler_output)
        statics = self._sampling_statics()
        max_num_logprobs = statics[-1]
        cascade = self._cascade_bucket(scheduler_output)
        has_prev = self._prev_sampled is not None
        has_prev2 = self._prev_sampled2 is not None and any(
            v[0] == 1 for v in self._pending_fill.values())
        plp_plan = (self._prompt_lp_plan(scheduler_output)
                    if prompt_lp else None)

        pure_decode = self._is_pure_decode(scheduler_output, t_pad,
                                           r_pad)
        step_fn = self._get_step_fn(t_pad, r_pad, *statics,
                                    apply_grammar, has_prev, False,
                                    has_prev2, has_penalties, has_bias,
                                    mm_pad, prompt_lp, cascade,
                                    pure_decode)
        self._note_compile((t_pad, r_pad, *statics, apply_grammar,
                            has_prev, has_prev2, has_penalties,
                            has_bias, mm_pad, prompt_lp, cascade,
                            pure_decode,
                            None if not has_prev
                            else self._prev_sampled.shape[0]))

        self._step_count += 1
        if self.step_broadcaster is not None:
            self.step_broadcaster.publish(
                self._step_count,
                ("step", t_pad, r_pad, *statics, apply_grammar,
                 has_prev, False, has_prev2, has_penalties, has_bias,
                 mm_pad, prompt_lp, cascade, pure_decode), packed)
        packed_dev = jnp.asarray(packed, device=self._replicated)
        self.kv_caches, out, _, plp_aux = step_fn(
            self.params, self.kv_caches, packed_dev,
            self._prev_sampled if has_prev else None,
            self._prev_sampled2 if has_prev2 else None,
            mm_buffer=self.mm_buffer if mm_pad else None,
            cross_cache=self.cross_cache if self.is_enc_dec else None)

        batch = self.input_batch
        num_reqs = batch.num_reqs
        req_ids = [batch.req_ids[i] for i in range(num_reqs)]
        pending: list[tuple[str, int, int]] = []
        # age existing fills; entries older than 1 step have been
        # materialized by their handle (depth-2 pipeline invariant)
        new_fill: dict[str, tuple[int, int, int]] = {
            rid: (1, row, pos)
            for rid, (age, row, pos) in self._pending_fill.items()
            if age == 0
        }
        for row in sample_rows:
            req_id = batch.req_ids[row]
            pos = int(batch.num_tokens[row])
            # placeholder; the true value is still on device
            self._append_token(row, -1)
            pending.append((req_id, row, pos))
            new_fill[req_id] = (0, row, pos)
        self._prev_sampled2 = self._prev_sampled
        self._prev_sampled = out.sampled
        self._pending_fill = new_fill
        if self.eplb_state is not None:
            # blocking fetch; EPLB cadence work rides the async path
            # at one small [L, E] transfer per step
            self.eplb_step(np.asarray(out.eplb_counts))

        # start the D2H transfer now; by the time the engine materializes
        # this handle (one step later) the copy is already on the host —
        # the per-step transfer round trip overlaps the next dispatch
        for arr in (out.sampled, out.logprob_token_ids, out.logprobs,
                    out.sampled_ranks):
            try:
                arr.copy_to_host_async()
            except AttributeError:
                break
        return AsyncStepHandle(self, out, req_ids, pending,
                               max_num_logprobs, plp_plan, plp_aux)

    # ------------------------------------------------------------------
    # precompile (reference: capture_model tpu_model_runner.py:1537)
    # ------------------------------------------------------------------

    def capture_model(self) -> None:
        """Warm the jit cache for every (token, req) bucket so serving
        never compiles."""
        t0 = time.monotonic()
        n = 0
        for t_pad in self.token_buckets:
            for r_pad in self.req_buckets:
                if r_pad > t_pad:
                    continue
                self._run_dummy_step(t_pad, r_pad)
                n += 1
                if t_pad == r_pad:
                    # decode fast-path variant (pure_decode=True):
                    # serving hits it on every all-decode step
                    self._run_dummy_step(t_pad, r_pad,
                                         pure_decode=True)
                    n += 1
        if self.decode_chunk_steps > 1:
            for r_pad in self.req_buckets:
                for hp, hp2 in ((False, False), (True, False),
                                (True, True)):
                    self._run_dummy_chunk(r_pad, hp, hp2)
                    n += 1
        logger.info("precompiled %d buckets in %.1fs", n,
                    time.monotonic() - t0)
        # VLLM_XLA_CHECK_RECOMPILATION semantics (reference:
        # _verify_num_xla_graphs tpu_model_runner.py:329): after the
        # capture phase, any new compile during serving is a bug
        self._compile_baseline = self.num_compilations

    def _run_dummy_step(self, t_pad: int, r_pad: int,
                        pure_decode: bool = False) -> None:
        s_pad = t_pad // self.page_size + r_pad + 1
        layout = self._packed_layout(t_pad, r_pad, s_pad)
        packed = np.zeros(layout["total"], dtype=np.int32)
        a, b = layout["temperature"]
        packed[a:b].view(np.float32)[:] = -1.0
        a, b = layout["top_p"]
        packed[a:b].view(np.float32)[:] = 1.0
        step_fn = self._get_step_fn(t_pad, r_pad, True, False, False,
                                    False, 0, False,
                                    pure_decode=pure_decode)
        self.kv_caches, _, _, _ = step_fn(
            self.params, self.kv_caches,
            jnp.asarray(packed, device=self._replicated))

    def _run_dummy_chunk(self, r_pad: int, has_prev: bool,
                         has_prev2: bool) -> None:
        layout = self._decode_layout(r_pad)
        packed = np.zeros(layout["total"], dtype=np.int32)
        a, b = layout["temperature"]
        packed[a:b].view(np.float32)[:] = -1.0
        a, b = layout["top_p"]
        packed[a:b].view(np.float32)[:] = 1.0
        for name in ("prev_scatter", "prev2_scatter"):
            a, b = layout[name]
            packed[a:b] = -1
        # scalars[0] (num_reqs) stays 0: no KV writes, inert rows
        chunk_fn = self._get_decode_step_fn(r_pad,
                                            self.decode_chunk_steps,
                                            True, False, False, False,
                                            has_prev, has_prev2)
        prev = (jnp.zeros(r_pad, dtype=jnp.int32)
                if has_prev else None)
        prev2 = (jnp.zeros(r_pad, dtype=jnp.int32)
                 if has_prev2 else None)
        self.kv_caches, _, _ = chunk_fn(
            self.params, self.kv_caches,
            jnp.asarray(packed, device=self._replicated), prev, prev2)


class AsyncChunkHandle:
    """Deferred multi-step chunk result: `.get()` materializes the
    [K, r_pad] sampled-token matrix and patches the K placeholder
    tokens per request into runner state."""

    def __init__(self, runner: TPUModelRunner, sampled_steps, req_ids,
                 pending, num_steps: int) -> None:
        self.runner = runner
        self.sampled_steps = sampled_steps  # [K, r_pad] device
        self.req_ids = req_ids
        self.pending = pending  # (req_id, dispatch_row, first_pos)
        self.num_steps = num_steps

    def get(self) -> ModelRunnerOutput:
        runner = self.runner
        sampled_np = np.asarray(self.sampled_steps)  # [K, r_pad]
        req_id_to_index = {r: i for i, r in enumerate(self.req_ids)}
        sampled_token_ids: list[list[int]] = [[] for _ in self.req_ids]
        for req_id, dispatch_row, first_pos in self.pending:
            toks = sampled_np[:, dispatch_row].tolist()
            sampled_token_ids[req_id_to_index[req_id]] = toks
            cur_row = runner.input_batch.req_id_to_index.get(req_id)
            if cur_row is not None:
                runner.input_batch.token_ids[
                    cur_row, first_pos:first_pos + self.num_steps] = \
                    toks
            state = runner.requests.get(req_id)
            if state is not None:
                base = first_pos - len(state.prompt_token_ids)
                for j, tok in enumerate(toks):
                    out_idx = base + j
                    if 0 <= out_idx < len(state.output_token_ids):
                        state.output_token_ids[out_idx] = tok
        return ModelRunnerOutput(
            req_ids=self.req_ids,
            req_id_to_index=req_id_to_index,
            sampled_token_ids=sampled_token_ids)


class AsyncStepHandle:
    """Deferred step result: `.get()` blocks on the device and patches
    the placeholder tokens into runner state (reference:
    AsyncModelRunnerOutput, vllm/v1/outputs.py deferred D2H copy)."""

    def __init__(self, runner: TPUModelRunner, out, req_ids, pending,
                 max_num_logprobs: int, plp_plan=None,
                 plp_aux=None) -> None:
        self.runner = runner
        self.out = out
        self.req_ids = req_ids
        self.pending = pending  # (req_id, dispatch_row, position)
        self.max_num_logprobs = max_num_logprobs
        self.plp_plan = plp_plan
        self.plp_aux = plp_aux

    def get(self) -> ModelRunnerOutput:
        runner = self.runner
        sampled_np = np.asarray(self.out.sampled)
        req_id_to_index = {r: i for i, r in enumerate(self.req_ids)}
        sampled_token_ids: list[list[int]] = [
            [] for _ in self.req_ids
        ]
        sampled_rows = set()
        for req_id, dispatch_row, pos in self.pending:
            tok = int(sampled_np[dispatch_row])
            sampled_token_ids[req_id_to_index[req_id]] = [tok]
            sampled_rows.add(req_id_to_index[req_id])
            # patch the placeholder wherever the request lives now
            cur_row = runner.input_batch.req_id_to_index.get(req_id)
            if cur_row is not None:
                runner.input_batch.token_ids[cur_row, pos] = tok
            state = runner.requests.get(req_id)
            if state is not None:
                out_idx = pos - len(state.prompt_token_ids)
                if 0 <= out_idx < len(state.output_token_ids):
                    state.output_token_ids[out_idx] = tok

        logprobs_lists = None
        if self.max_num_logprobs > 0:
            lp_ids_np = np.asarray(self.out.logprob_token_ids)
            lps_np = np.asarray(self.out.logprobs)
            ranks_np = np.asarray(self.out.sampled_ranks)
            n = len(self.req_ids)
            logprobs_lists = LogprobsLists(
                logprob_token_ids=[
                    [lp_ids_np[i].tolist()] if i in sampled_rows
                    else [] for i in range(n)
                ],
                logprobs=[
                    [lps_np[i].tolist()] if i in sampled_rows else []
                    for i in range(n)
                ],
                sampled_token_ranks=[
                    [int(ranks_np[i])] if i in sampled_rows else []
                    for i in range(n)
                ],
            )
        plp_dict = {}
        if self.plp_aux is not None:
            plp_dict = runner._assemble_prompt_logprobs(
                self.plp_plan, self.plp_aux)
        return ModelRunnerOutput(
            req_ids=self.req_ids,
            req_id_to_index=req_id_to_index,
            sampled_token_ids=sampled_token_ids,
            logprobs=logprobs_lists,
            prompt_logprobs_dict=plp_dict,
        )


@functools.partial(jax.jit, donate_argnums=(0, ))
def _kv_restore(kv_caches, block_ids, data):
    """In-place restore of offloaded pages: kv[:, ids] = data."""
    return kv_caches.at[:, block_ids].set(data)
