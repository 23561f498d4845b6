"""Typed engine configuration.

TPU-native analogue of the reference's ``vllm/config/`` package: one
dataclass per concern, composed into :class:`EngineConfig` (reference:
vllm/config/__init__.py:90-148 ``VllmConfig``). CLI flags are generated
from these dataclasses (see ``entrypoints/cli.py``), and
``compute_hash()`` keys the XLA compile cache the way the reference's
``VllmConfig.compute_hash`` keys torch.compile artifacts
(vllm/config/__init__.py:150).

Unlike the reference there is no per-rank worker process; parallelism is
expressed as a JAX device mesh (``ParallelConfig.mesh_shape``) and GSPMD
sharding rules, so ``ParallelConfig`` describes mesh axes, not ranks.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field, fields
from typing import Any, Literal, Optional

from vllm_main_modify_tpu.utils import cdiv, round_up


@dataclass
class ModelConfig:
    """Model identity + architecture hyperparameters.

    Reference: vllm/config/model.py ModelConfig. The HF config is parsed
    eagerly so everything downstream works with plain ints.
    """

    model: str = "."
    tokenizer: Optional[str] = None
    trust_remote_code: bool = False
    dtype: str = "bfloat16"  # compute/weight dtype
    seed: int = 0
    max_model_len: int = 2048
    revision: Optional[str] = None

    # Derived from the HF config at __post_init__ (or injected for tests).
    hf_config: Any = None
    architecture: str = ""
    vocab_size: int = 0
    hidden_size: int = 0
    num_layers: int = 0
    num_attention_heads: int = 0
    num_kv_heads: int = 0
    head_dim: int = 0
    intermediate_size: int = 0
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    tie_word_embeddings: bool = False
    # MoE
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    shared_expert_intermediate_size: int = 0
    # attention extras
    sliding_window: Optional[int] = None
    attention_bias: bool = False
    logit_softcap: Optional[float] = None
    quantization: Optional[str] = None
    # embedding/pooling checkpoints (no lm_head; last-token pooling)
    is_pooling_model: bool = False
    # multimodal composite configs (text_config + vision_config)
    is_multimodal: bool = False
    image_token_index: int = -1
    # canonical square image size for dynamic-resolution ViTs
    # (Qwen2-VL): static compile shapes; processor resizes to this
    mm_image_size: Optional[int] = None
    # accept per-request precomputed prompt embeddings (reference:
    # vllm EmbedsPrompt, vllm/inputs/data.py + --enable-prompt-embeds)
    enable_prompt_embeds: bool = False

    def __post_init__(self) -> None:
        if self.tokenizer is None:
            self.tokenizer = self.model
        if self.hf_config is None and self.model and os.path.isdir(self.model):
            self._load_hf_config()
        if self.hf_config is not None:
            self._derive_from_hf()

    def _load_hf_config(self) -> None:
        from transformers import AutoConfig

        # register local config classes for remote-code model types
        # (ultravox, ...) so offline loading works without
        # trust_remote_code (reference: vllm/transformers_utils/config.py)
        from vllm_main_modify_tpu.models import hf_config_shims  # noqa: F401

        if not os.path.exists(os.path.join(self.model, "config.json")) \
                and os.path.exists(os.path.join(self.model,
                                                "params.json")):
            # mistral-format repo (reference:
            # vllm/transformers_utils/configs/mistral adaptation)
            self.hf_config = hf_config_shims.load_mistral_params_json(
                self.model)
            return
        self.hf_config = AutoConfig.from_pretrained(
            self.model,
            trust_remote_code=self.trust_remote_code,
            revision=self.revision,
        )
        # composite HF configs (Qwen2-VL style sub-config trees) can
        # silently replace a custom `architectures` entry (e.g.
        # JinaVLForRanking) with the class default on reload; the raw
        # config.json is authoritative (reference:
        # vllm/transformers_utils/config.py reads the file directly)
        cfg_path = os.path.join(self.model, "config.json")
        if os.path.exists(cfg_path):
            import json
            try:
                raw = json.load(open(cfg_path)).get("architectures")
            except (OSError, ValueError):
                raw = None
            if raw:
                self.hf_config.architectures = raw

    def _derive_from_hf(self) -> None:
        hf = self.hf_config
        top_get = lambda k, d=None: getattr(hf, k, d)
        archs = top_get("architectures") or []
        self.architecture = archs[0] if archs else type(hf).__name__
        # composite multimodal configs: the decoder fields live in
        # text_config (reference: vllm/config/model.py hf_text_config)
        text = top_get("text_config")
        # composite when the decoder fields live in text_config —
        # either the top config has none (LLaVA style) or it proxies
        # them but carries a vision tower (Qwen2-VL style)
        if text is not None and (top_get("hidden_size") is None
                                 or top_get("vision_config")
                                 is not None
                                 or top_get("audio_config")
                                 is not None
                                 # Fuyu: no vision tower — raw patch
                                 # projection; only image_token_id
                                 # marks the composite
                                 or top_get("image_token_id")
                                 is not None):
            self.is_multimodal = True
            self.image_token_index = (
                top_get("image_token_index")
                or top_get("image_token_id")
                or top_get("audio_token_index")
                # Kimi-VL: <|media_pad|> (kimi_vl.py image_token_id)
                or top_get("media_placeholder_token_id")
                # Emu3-style: the placeholder id lives in the
                # vocabulary map
                or dict(top_get("vocabulary_map") or {}).get("<image>")
                or -1)
            hf = text
        elif top_get("image_token_index") is not None:
            # Phi-3V style: the top config IS the text config with an
            # embedded vision tower description (img_processor dict)
            self.is_multimodal = True
            self.image_token_index = top_get("image_token_index")
        elif top_get("vision_config") is not None and \
                (top_get("image_token_id") is not None
                 or top_get("im_patch_id") is not None):
            # DotsOCR / Ernie4.5-VL style: the top config IS the text
            # config plus a vision_config and a top-level placeholder
            # id (image_token_id / im_patch_id)
            self.is_multimodal = True
            self.image_token_index = int(
                top_get("image_token_id")
                if top_get("image_token_id") is not None
                else top_get("im_patch_id"))
        elif top_get("vision_config") is not None and (
                (top_get("vision_config").get("image_token_id")
                 if isinstance(top_get("vision_config"), dict)
                 else getattr(top_get("vision_config"),
                              "image_token_id", None)) is not None):
            # Phi-4-multimodal: the top config IS the text config and
            # the placeholder ids live in the sub-configs
            vcfg = top_get("vision_config")
            self.is_multimodal = True
            self.image_token_index = int(
                vcfg["image_token_id"] if isinstance(vcfg, dict)
                else vcfg.image_token_id)
        elif (top_get("vision_config") is not None
              and "MiniCPMV" in (top_get("architectures") or [""])[0]):
            # MiniCPM-V: top-level text config + vision_config dict;
            # the placeholder id comes from image_token_id (or the
            # tokenizer's unk id as the upstream processor uses)
            self.is_multimodal = True
            self.image_token_index = int(
                top_get("image_token_id")
                or top_get("unk_token_id") or -1)
        elif "GLM4VForCausalLM" in (top_get("architectures")
                                    or [""])[0] and \
                top_get("vision_config") is not None:
            # legacy GLM-4V: ChatGLM text config + vision_config dict;
            # the placeholder expands to 2 + (grid/2)^2 rows
            # (boi/eoi embeds come from the tower output)
            self.is_multimodal = True
            self.image_token_index = int(
                top_get("image_token_id")
                or top_get("boi_token_id") or -1)
        elif top_get("visual") is not None and isinstance(
                top_get("visual"), dict) and \
                "image_start_id" in top_get("visual"):
            # original Qwen-VL: `visual` dict at the top level; the
            # placeholder is the image PAD id (start id + 2)
            self.is_multimodal = True
            self.image_token_index = int(
                top_get("visual")["image_start_id"]) + 2
        elif top_get("vocabulary_map") is not None:
            # Chameleon-style early fusion: images become DISCRETE
            # codebook tokens; the placeholder id comes from the
            # vocabulary map (reference: chameleon.py vocab mapping)
            vm = dict(top_get("vocabulary_map") or {})
            if "<image>" in vm:
                self.is_multimodal = True
                self.image_token_index = int(vm["<image>"])
        get = lambda k, d=None: getattr(hf, k, d)
        self.vocab_size = get("vocab_size", self.vocab_size)
        self.hidden_size = get("hidden_size", self.hidden_size)
        self.num_layers = get("num_hidden_layers", self.num_layers)
        self.num_attention_heads = get("num_attention_heads",
                                       self.num_attention_heads)
        self.num_kv_heads = get("num_key_value_heads",
                                self.num_attention_heads)
        self.head_dim = get("head_dim") or (
            self.hidden_size // max(self.num_attention_heads, 1))
        self.intermediate_size = get("intermediate_size",
                                     self.intermediate_size)
        self.rms_norm_eps = get("rms_norm_eps", self.rms_norm_eps)
        self.rope_theta = get("rope_theta", self.rope_theta)
        self.rope_scaling = get("rope_scaling", self.rope_scaling)
        self.tie_word_embeddings = get("tie_word_embeddings", False)
        self.sliding_window = get("sliding_window", None)
        if not get("use_sliding_window", True):
            self.sliding_window = None
        self.attention_bias = get("attention_bias",
                                  get("qkv_bias", False) or False)
        self.logit_softcap = get("final_logit_softcapping", None)
        # MoE fields (mixtral/qwen-moe style)
        self.num_experts = get("num_local_experts",
                               get("num_experts", 0) or 0)
        self.num_experts_per_tok = get("num_experts_per_tok", 0) or 0
        self.moe_intermediate_size = get("moe_intermediate_size",
                                         self.intermediate_size) or 0
        self.shared_expert_intermediate_size = get(
            "shared_expert_intermediate_size", 0) or 0
        hf_max = get("max_position_embeddings")
        if hf_max is not None:
            self.max_model_len = min(self.max_model_len, hf_max) \
                if self.max_model_len else hf_max
        quant_cfg = get("quantization_config", None)
        if quant_cfg is not None and self.quantization is None:
            self.quantization = quant_cfg.get("quant_method") if isinstance(
                quant_cfg, dict) else getattr(quant_cfg, "quant_method", None)

    @property
    def jax_dtype(self):
        import jax.numpy as jnp

        return {
            "bfloat16": jnp.bfloat16,
            "float32": jnp.float32,
            "float16": jnp.float16,
        }[self.dtype]


@dataclass
class CacheConfig:
    """Paged KV-cache sizing (reference: vllm/config/cache.py)."""

    block_size: int = 16  # tokens per KV page
    num_gpu_blocks: Optional[int] = None  # None → profile-derived
    gpu_memory_utilization: float = 0.9
    swap_space_gb: float = 0.0
    # auto | bfloat16 | fp8 | fp8_e5m2 | int8 (int8: per-token scales,
    # the preferred quantized-KV mode on TPU — native VPU upcasts)
    cache_dtype: str = "auto"
    enable_prefix_caching: bool = True
    # hybrid-attention models (Gemma-2/3 style): manage sliding-window
    # layers as their own window-sized page pool (reference:
    # disable_hybrid_kv_cache_manager, vllm/config/scheduler.py).
    # Disabling collapses every layer to full-attention allocation.
    disable_hybrid_kv: bool = False

    def __post_init__(self) -> None:
        assert self.block_size > 0


@dataclass
class SchedulerConfig:
    """Continuous-batching knobs (reference: vllm/config/scheduler.py)."""

    max_num_batched_tokens: int = 1024  # per-step token budget
    max_num_seqs: int = 64
    max_model_len: int = 2048
    enable_chunked_prefill: bool = True
    long_prefill_token_threshold: int = 0  # 0 = off
    # Per-step budget for NEW vision-encoder work (reference:
    # max_num_encoder_input_tokens, scheduler.py:711-831): a prompt
    # with many images prefills across several steps instead of
    # encoding everything at once. 0 = unlimited.
    max_num_encoder_input_tokens: int = 16384
    policy: Literal["fcfs", "priority"] = "fcfs"
    # Spec decode lookahead tokens per request (0 = disabled).
    num_lookahead_tokens: int = 0
    # Async scheduling (schedule step t+1 while t executes).
    async_scheduling: bool = False
    # Multi-step decode: when every running request is in steady
    # decode, run up to this many decode iterations inside ONE device
    # dispatch (a jitted lax.scan with on-device token chaining).
    # Amortizes host->device dispatch latency K-fold on the
    # decode-dominated phase. 1 disables (exact reference step
    # semantics); the LLM / server entrypoints default to 8.
    # TPU-native analogue of the reference's multi-step execution loop
    # (vllm/v1/worker/tpu_model_runner.py:981).
    num_decode_steps_per_dispatch: int = 1

    def __post_init__(self) -> None:
        self.max_num_batched_tokens = max(self.max_num_batched_tokens,
                                          1)


@dataclass
class ParallelConfig:
    """Mesh-based parallelism.

    The reference builds ExternalDP x DP x PP x TP rank process groups
    (vllm/distributed/parallel_state.py:1090). TPU-native: one process per
    host, a ``jax.sharding.Mesh`` with named axes, GSPMD for everything
    inside a step. ``tensor_parallel_size`` maps to the ``"model"`` mesh
    axis; ``data_parallel_size`` to ``"data"``; expert parallelism reuses
    the model axis ("expert" sub-axis) per MoE layer sharding rules.
    """

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    # PP (pipeline parallel, reference: parallel_state.py:654-829 +
    # get_pp_indices): the stacked layer axis of the weights and the
    # KV cache shards across a "stage" mesh axis; the decoder runs as
    # a ring-ppermute pipeline inside shard_map (parallel/pp.py). For
    # models whose weights exceed one host's HBM.
    pipeline_parallel_size: int = 1
    # DCP (decode context parallel, reference: vllm/v1/attention/
    # backends/mla/common.py:487-700 + scheduler.py:105-112): shard KV
    # PAGES across the model axis and merge per-shard attention
    # partials by LSE. Use when tensor_parallel_size exceeds the
    # model's KV-head count (head sharding would split inside a head).
    # Must divide tensor_parallel_size.
    decode_context_parallel_size: int = 1
    # run the engine core in a background process over ZMQ RPC
    # (reference: VLLM_ENABLE_V1_MULTIPROCESSING / EngineCoreProc);
    # dp > 1 implies one process per DP engine
    engine_multiprocess: bool = False
    expert_parallel_size: int = 1
    enable_expert_parallel: bool = False
    # EPLB (expert load balancing, reference: vllm/distributed/eplb/):
    # track per-expert routing load and periodically rebalance the
    # physical expert placement (hot experts get redundant replicas).
    enable_eplb: bool = False
    num_redundant_experts: int = 0
    eplb_window: int = 32  # engine steps between rearrangements
    # axis names used in sharding rules
    data_axis: str = "data"
    model_axis: str = "model"
    stage_axis: str = "stage"

    @property
    def world_size(self) -> int:
        return (self.tensor_parallel_size * self.data_parallel_size *
                self.pipeline_parallel_size)

    @property
    def mesh_shape(self) -> tuple[int, ...]:
        if self.pipeline_parallel_size > 1:
            return (self.data_parallel_size,
                    self.pipeline_parallel_size,
                    self.tensor_parallel_size)
        return (self.data_parallel_size, self.tensor_parallel_size)

    @property
    def mesh_axes(self) -> tuple[str, ...]:
        if self.pipeline_parallel_size > 1:
            return (self.data_axis, self.stage_axis, self.model_axis)
        return (self.data_axis, self.model_axis)


@dataclass
class DeviceConfig:
    device: str = "auto"  # auto | tpu | cpu

    def resolve(self) -> str:
        if self.device != "auto":
            return self.device
        import jax

        plat = jax.default_backend()
        return "tpu" if plat in ("tpu", "axon") else plat


@dataclass
class LoadConfig:
    """Weight-loading options (reference: vllm/config/load.py)."""

    load_format: str = "auto"  # auto | safetensors | dummy
    download_dir: Optional[str] = None


@dataclass
class LoRAConfig:
    """Multi-LoRA serving (reference: vllm/config/lora.py)."""

    enable_lora: bool = False
    max_loras: int = 4
    max_lora_rank: int = 16


@dataclass
class SpeculativeConfig:
    """Spec-decode config (reference: vllm/config/speculative.py)."""

    method: Optional[str] = None  # ngram | eagle | medusa
    num_speculative_tokens: int = 0
    # ngram proposer window
    prompt_lookup_max: int = 4
    prompt_lookup_min: int = 1
    draft_model: Optional[str] = None

    def __post_init__(self) -> None:
        # Auto-detect the method from the draft checkpoint's declared
        # architecture (reference: vllm/config/speculative.py
        # __post_init__ infers eagle/medusa/mtp from the draft config).
        if self.method is None and self.draft_model:
            self.method = _detect_spec_method(self.draft_model)

    @property
    def enabled(self) -> bool:
        return self.method is not None and self.num_speculative_tokens > 0


def _detect_spec_method(draft_dir: str) -> str:
    import json
    import os

    path = os.path.join(draft_dir, "config.json")
    archs = []
    try:
        with open(path) as f:
            archs = json.load(f).get("architectures") or []
    except OSError:
        pass
    name = archs[0] if archs else ""
    if "Medusa" in name:
        return "medusa"
    if "Eagle3" in name or "eagle3" in name.lower():
        return "eagle3"
    if "MTP" in name.upper():
        # checkpoint-shipped MTP heads (reference: deepseek_mtp.py,
        # glm4_moe_mtp.py, ernie_mtp.py, qwen3_next_mtp.py,
        # longcat_flash_mtp.py) — family picked by architecture
        low = name.lower()
        for fam, method in (("deepseek", "deepseek_mtp"),
                            ("glm", "glm4_moe_mtp"),
                            ("ernie", "ernie_mtp"),
                            ("qwen3next", "qwen3_next_mtp"),
                            ("longcat", "longcat_flash_mtp")):
            if fam in low.replace("_", ""):
                return method
        return "deepseek_mtp"
    if "Eagle" in name:
        return "eagle"
    if "MLPSpeculator" in name:
        return "mlp_speculator"
    # plain decoder checkpoint: EAGLE re-exports often declare the
    # base architecture — the fc(embed ++ hidden) combiner weight is
    # the discriminator; otherwise classic two-model speculation
    # (reference: SpeculativeConfig method="draft_model")
    try:
        from vllm_main_modify_tpu.models.loader import \
            _hf_tensor_index
        keys = set(_hf_tensor_index(draft_dir))
    except Exception:  # noqa: BLE001
        keys = set()
    if "fc.weight" in keys or "model.fc.weight" in keys:
        return "eagle"
    return "draft_model"


@dataclass
class StructuredOutputsConfig:
    backend: str = "auto"
    enable_audit: bool = False
    audit_dir: Optional[str] = None


@dataclass
class ObservabilityConfig:
    collect_detailed_traces: bool = False
    otlp_traces_endpoint: Optional[str] = None
    log_stats_interval_s: float = 10.0


@dataclass
class CompilationConfig:
    """XLA compile discipline (replaces the reference's torch.compile
    config, vllm/config/compilation.py). Buckets keep every jitted shape
    static (reference precedent: tpu_model_runner.py:1874-1935)."""

    # token-count buckets: powers of two between min and max, plus
    # multiples of `bucket_padding_gap` if set.
    min_token_bucket: int = 16
    bucket_padding_gap: int = 0  # 0 → pure powers of 2
    cache_dir: Optional[str] = None  # XLA persistent compile cache
    check_recompilation: bool = False  # jit-cache-miss sanitizer


@dataclass
class EngineConfig:
    """Root config (reference: VllmConfig, vllm/config/__init__.py:90)."""

    model_config: ModelConfig = field(default_factory=ModelConfig)
    cache_config: CacheConfig = field(default_factory=CacheConfig)
    scheduler_config: SchedulerConfig = field(default_factory=SchedulerConfig)
    parallel_config: ParallelConfig = field(default_factory=ParallelConfig)
    device_config: DeviceConfig = field(default_factory=DeviceConfig)
    load_config: LoadConfig = field(default_factory=LoadConfig)
    lora_config: LoRAConfig = field(default_factory=LoRAConfig)
    speculative_config: SpeculativeConfig = field(
        default_factory=SpeculativeConfig)
    structured_outputs_config: StructuredOutputsConfig = field(
        default_factory=StructuredOutputsConfig)
    observability_config: ObservabilityConfig = field(
        default_factory=ObservabilityConfig)
    compilation_config: CompilationConfig = field(
        default_factory=CompilationConfig)
    kv_events_config: Optional[object] = None  # KVEventsConfig
    # P/D disaggregation (kv_transfer/connector.py KVTransferConfig)
    kv_transfer_config: Optional[object] = None

    def __post_init__(self) -> None:
        # keep max_model_len consistent across sub-configs
        self.scheduler_config.max_model_len = self.model_config.max_model_len
        if self.speculative_config.enabled:
            self.scheduler_config.num_lookahead_tokens = (
                self.speculative_config.num_speculative_tokens)

    @property
    def max_blocks_per_req(self) -> int:
        return cdiv(self.model_config.max_model_len,
                    self.cache_config.block_size)

    def compute_hash(self) -> str:
        """Structure hash keying compile caches
        (reference: vllm/config/__init__.py:150)."""

        def enc(o):
            if hasattr(o, "__dataclass_fields__"):
                return {
                    f.name: enc(getattr(o, f.name))
                    for f in fields(o) if f.name != "hf_config"
                }
            if isinstance(o, (list, tuple)):
                return [enc(x) for x in o]
            if isinstance(o, dict):
                return {k: enc(v) for k, v in o.items()}
            return o if isinstance(o, (int, float, str, bool,
                                       type(None))) else str(o)

        blob = json.dumps(enc(self), sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]
