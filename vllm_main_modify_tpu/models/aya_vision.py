"""Aya Vision (Cohere): SigLIP tower + pixel-shuffle SwiGLU adapter +
Cohere decoder.

Reference parity: vllm/model_executor/models/aya_vision.py (+ HF
modeling_aya_vision.py). The tower output is hidden_states[-1] — the
last encoder layer WITHOUT post_layernorm (vision_feature_layer=-1,
strategy "full"); the projector pixel-shuffles the g x g grid by
``downsample_factor`` (double-permute swizzle), layer-norms at
``adapter_layer_norm_eps``, then a SwiGLU alignment MLP
(x, gate = chunk(2); silu(gate) * x) into the Cohere width. Tokens
per image = (g // downsample_factor)^2.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.models.gemma3_mm import (VP, siglip_encode,
                                                   siglip_specs)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.registry import resolve_model_cls

MMP = "multi_modal_projector."


class AyaVisionForConditionalGeneration:

    # subclass knobs (Cohere2Vision/Command-A-Vision flips these)
    post_norm = False  # tower feature: hidden_states[-1] vs post-LN
    adapter_ln = True  # layernorm before the alignment MLP
    root = ""  # serialized key root ("model." on newer exports)
    default_text_arch = "CohereForCausalLM"

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        self.v_hidden = vc.hidden_size
        self.v_inter = vc.intermediate_size
        self.v_layers = vc.num_hidden_layers
        self.v_heads = vc.num_attention_heads
        self.v_head_dim = self.v_hidden // self.v_heads
        self.patch = vc.patch_size
        self.image_size = vc.image_size
        self.grid = self.image_size // self.patch
        self.num_patches = self.grid * self.grid
        self.v_eps = getattr(vc, "layer_norm_eps", 1e-6)
        self.f = int(getattr(hf, "downsample_factor", 2))
        self.adapter_eps = getattr(hf, "adapter_layer_norm_eps", 1e-6)
        self.align_inter = getattr(hf, "alignment_intermediate_size",
                                   hf.text_config.hidden_size)
        self.num_image_tokens = (self.grid // self.f)**2

        text_archs = getattr(hf.text_config, "architectures",
                             None) or [self.default_text_arch]
        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = text_archs[0]
        self.language_model = resolve_model_cls(text_archs[0])(
            text_cfg)
        self.text_cfg = text_cfg

    def param_specs(self) -> list[ParamSpec]:
        D, H = self.v_hidden, self.cfg.hidden_size
        df2 = D * self.f * self.f
        t = transpose2d
        rt = self.root
        mmp = rt + MMP
        specs = siglip_specs(D, self.v_inter, self.v_layers,
                             self.patch, self.num_patches,
                             prefix=rt + VP)
        if self.adapter_ln:
            specs += [
                ParamSpec("adapter.ln", (df2, ), P(),
                          mmp + "layernorm.weight", transform=None),
                ParamSpec("adapter.ln_bias", (df2, ), P(),
                          mmp + "layernorm.bias", transform=None),
            ]
        specs += [
            ParamSpec("adapter.linear_1", (df2, self.align_inter),
                      P(None, None), mmp + "linear_1.weight",
                      transform=t),
            ParamSpec("adapter.linear_1_bias", (self.align_inter, ),
                      P(), mmp + "linear_1.bias", transform=None),
            ParamSpec("adapter.linear_2", (self.align_inter // 2, H),
                      P(None, None), mmp + "linear_2.weight",
                      transform=t),
            ParamSpec("adapter.linear_2_bias", (H, ), P(),
                      mmp + "linear_2.bias", transform=None),
        ]
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            if rt:
                # newer export: model.language_model.* replaces the
                # inner "model." root
                s.hf_key = (
                    rt + "language_model." + s.hf_key[len("model."):]
                    if s.hf_key.startswith("model.")
                    else rt + "language_model." + s.hf_key)
            else:
                s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self):
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N, (g//f)^2, text_H]."""
        if pixel_values.ndim == 5:
            pixel_values = pixel_values[0]
        n = pixel_values.shape[0]
        x = siglip_encode(params["vision"], pixel_values,
                          patch=self.patch,
                          num_patches=self.num_patches,
                          v_hidden=self.v_hidden,
                          v_heads=self.v_heads,
                          v_head_dim=self.v_head_dim,
                          v_layers=self.v_layers, eps=self.v_eps,
                          post_norm=self.post_norm)
        # AyaVision pixel_shuffle: [N, g, g, D] double-permute swizzle
        g, f, d = self.grid, self.f, x.shape[-1]
        x = x.reshape(n, g, g, d)
        x = x.reshape(n, g, g // f, d * f)
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(n, g // f, g // f, d * f * f)
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(n, (g // f) * (g // f), d * f * f)
        a = params["adapter"]
        if self.adapter_ln:
            x = layer_norm(x, a["ln"], a["ln_bias"], self.adapter_eps)
        h = x @ a["linear_1"] + a["linear_1_bias"]
        half = self.align_inter // 2
        h = jax.nn.silu(h[..., half:]) * h[..., :half]
        return h @ a["linear_2"] + a["linear_2_bias"]

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None):
        lm_params = params["language_model"]
        x = jnp.take(lm_params["embed_tokens"], input_ids, axis=0)
        if mm_embeds is not None:
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds.astype(x.dtype), mode="drop")
        return self.language_model(lm_params, input_ids, positions,
                                   kv_caches, attn_meta,
                                   use_pallas=use_pallas,
                                   inputs_embeds=x)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(
            params["language_model"], hidden)


class Cohere2VisionForConditionalGeneration(
        AyaVisionForConditionalGeneration):
    """Command A Vision (reference:
    vllm/model_executor/models/cohere2_vision.py): same pixel-shuffle
    SwiGLU alignment as Aya Vision but the tower feature is the
    post-layernormed SigLIP output, there is no adapter layernorm,
    the decoder is Cohere2 (sliding-window pattern), and the export
    roots every key under "model."."""

    post_norm = True
    adapter_ln = False
    root = "model."
    default_text_arch = "Cohere2ForCausalLM"
