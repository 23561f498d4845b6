"""Transformers-backend fallback for unregistered text architectures.

Reference capability: vllm/model_executor/models/transformers.py
(registered at registry.py:330-334) — there, an unknown architecture
falls back to running the HF torch module with vLLM attention
injected. A torch forward has no TPU path here, so the TPU-native
equivalent maps the HF CONFIG onto the native Llama scaffold instead:
the long tail of new decoder releases (Helium, Ministral, OpenLlama,
…) is weight-for-weight the Llama graph — same key layout
(model.layers.{i}.self_attn.{q,k,v,o}_proj / mlp.{gate,up,down}_proj,
RMSNorm, gated-SiLU MLP, rope) with different dims. The factory
verifies that structural contract from the config (and, when a real
checkpoint is present, from its tensor index) and refuses clearly
when the architecture needs math the scaffold does not implement.

Covers the registry gap without one-file-per-arch: any llama-layout
``*ForCausalLM`` loads and serves without registration.
"""

from __future__ import annotations

import logging

from vllm_main_modify_tpu.config import ModelConfig

logger = logging.getLogger(__name__)

# attributes whose PRESENCE signals math the Llama scaffold does not
# implement (state-space mixers, differential attention, alternating
# local/global patterns, softcaps, per-layer types)
_INCOMPATIBLE_ATTRS = (
    "ssm_state_size", "mamba_d_state", "conv_kernel",
    "attn_layer_indices", "lambda_std_dev",
    "attn_logit_softcapping", "final_logit_softcapping",
    "sliding_window_pattern", "expert_interval", "num_local_experts",
    "num_experts", "linear_attn", "use_cache_quantization",
)

_SUPPORTED_ACTS = ("silu", "swish")

_LLAMA_LAYOUT_PROBES = (
    "model.layers.0.self_attn.q_proj.weight",
    "model.layers.0.mlp.gate_proj.weight",
    "model.layers.0.input_layernorm.weight",
    "model.embed_tokens.weight",
)


def transformers_fallback_factory(config: ModelConfig):
    """Build the Llama scaffold for an unregistered architecture, or
    raise ValueError explaining why the fallback cannot serve it."""
    from vllm_main_modify_tpu.models.llama import LlamaForCausalLM

    hf = config.hf_config
    arch = config.architecture
    problems = []
    if hf is None:
        problems.append("no HF config available")
    else:
        if getattr(hf, "is_encoder_decoder", False):
            problems.append("encoder-decoder model")
        if getattr(hf, "rms_norm_eps", None) is None:
            problems.append("no rms_norm_eps (non-RMSNorm decoder)")
        act = getattr(hf, "hidden_act", "silu")
        if act not in _SUPPORTED_ACTS:
            problems.append(f"hidden_act={act!r} (gated-SiLU only)")
        for attr in _INCOMPATIBLE_ATTRS:
            if getattr(hf, attr, None):
                problems.append(f"config has {attr} — needs a "
                                "dedicated implementation")
        lt = getattr(hf, "layer_types", None)
        if lt and len(set(lt)) > 1:
            # uniform layer_types (all-full or all-sliding) is plain
            # llama math; a MIXED pattern needs per-layer handling
            problems.append("mixed layer_types pattern")
        for attr in ("hidden_size", "num_attention_heads",
                     "num_hidden_layers", "intermediate_size"):
            if not getattr(hf, attr, None):
                problems.append(f"missing {attr}")
    # checkpoint key layout, when a real checkpoint is on disk
    if not problems and config.model:
        try:
            from vllm_main_modify_tpu.models.loader import \
                _hf_tensor_index

            index = _hf_tensor_index(config.model)
            missing = [k for k in _LLAMA_LAYOUT_PROBES
                       if k not in index]
            if missing:
                problems.append(
                    f"checkpoint lacks llama-layout keys {missing}")
        except FileNotFoundError:
            pass  # dummy load / no safetensors yet — config checks
    if problems:
        raise ValueError(
            f"Architecture {arch!r} is not registered and the "
            f"transformers fallback cannot serve it: "
            f"{'; '.join(problems)}. Add a dedicated model class "
            "(models/) or use a registered architecture.")
    logger.warning(
        "Architecture %r is not registered; serving it through the "
        "llama-layout transformers fallback (reference capability: "
        "vllm/model_executor/models/transformers.py).", arch)
    return LlamaForCausalLM(config)
