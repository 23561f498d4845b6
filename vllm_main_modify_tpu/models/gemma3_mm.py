"""Gemma 3 multimodal (Gemma3ForConditionalGeneration).

Reference: vllm/model_executor/models/gemma3_mm.py. SigLIP vision
tower (same encoder skeleton as models/idefics3.py), the Gemma3
projector — avg-pool the patch grid down to ``mm_tokens_per_image``,
zero-centered RMS norm, then a raw [vision_D, text_H] projection
matrix (HF Gemma3MultiModalProjector) — and the Gemma3 text decoder.

Image soft tokens attend BIDIRECTIONALLY to each other (HF
token-type-ids or-mask): the wrapper sets ``bidir_mm_spans`` so the
runner ships per-request [start, end) spans into the attention kernels
(layers/attention.py bidir_spans); sliding-window layers keep full KV
pools because an image block may live behind the window.
"""

from __future__ import annotations

import math
from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.models.gemma import gemma_rms_norm
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.registry import resolve_model_cls

VP = "vision_tower.vision_model."


def siglip_specs(D, I, L, patch, num_patches, prefix=VP):
    """Parameter specs of a SigLIP vision tower (shared by Gemma3-mm
    and Aya Vision): conv patch embed + learned positions, pre-LN
    encoder layers, final post_layernorm."""
    t = transpose2d

    def vstk(path, shape, spec, hf_key, transform=t):
        return ParamSpec(f"vision.layers.{path}", (L, *shape), spec,
                         prefix + "encoder.layers.{i}." + hf_key,
                         stacked=True, transform=transform)

    specs = [
        ParamSpec("vision.patch_embedding", (D, 3, patch, patch),
                  P(None, None, None, None),
                  prefix + "embeddings.patch_embedding.weight",
                  transform=None),
        ParamSpec("vision.patch_bias", (D, ), P(),
                  prefix + "embeddings.patch_embedding.bias",
                  transform=None),
        ParamSpec("vision.position_embedding", (num_patches, D),
                  P(None, None),
                  prefix + "embeddings.position_embedding.weight",
                  transform=None),
        ParamSpec("vision.post_norm", (D, ), P(),
                  prefix + "post_layernorm.weight", transform=None),
        ParamSpec("vision.post_norm_bias", (D, ), P(),
                  prefix + "post_layernorm.bias", transform=None),
    ]
    for n in ("layer_norm1", "layer_norm2"):
        specs += [
            vstk(n, (D, ), P(None, None), f"{n}.weight",
                 transform=None),
            vstk(f"{n}_bias", (D, ), P(None, None), f"{n}.bias",
                 transform=None),
        ]
    for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
        specs += [
            vstk(n, (D, D), P(None, None, None),
                 f"self_attn.{n}.weight"),
            vstk(f"{n}_bias", (D, ), P(None, None),
                 f"self_attn.{n}.bias", transform=None),
        ]
    specs += [
        vstk("fc1", (D, I), P(None, None, None), "mlp.fc1.weight"),
        vstk("fc1_bias", (I, ), P(None, None), "mlp.fc1.bias",
             transform=None),
        vstk("fc2", (I, D), P(None, None, None), "mlp.fc2.weight"),
        vstk("fc2_bias", (D, ), P(None, None), "mlp.fc2.bias",
             transform=None),
    ]
    return specs


def siglip_encode(v, pixel_values, *, patch, num_patches, v_hidden,
                  v_heads, v_head_dim, v_layers, eps,
                  post_norm=True):
    """SigLIP tower forward → [N, P, D]. ``post_norm=False`` returns
    hidden_states[-1] (pre post_layernorm — what a composite with
    vision_feature_layer=-1 selects)."""
    n = pixel_values.shape[0]
    x = jax.lax.conv_general_dilated(
        pixel_values.astype(jnp.float32),
        v["patch_embedding"].astype(jnp.float32),
        window_strides=(patch, patch), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = x.reshape(n, v_hidden, num_patches)
    x = jnp.transpose(x, (0, 2, 1)) + \
        v["patch_bias"].astype(jnp.float32)
    x = x + v["position_embedding"].astype(jnp.float32)[None]

    layers = v["layers"]

    def layer_fn(l, x):
        w = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(
                a, l, 0, keepdims=False), layers)
        res = x
        h = layer_norm(x, w["layer_norm1"], w["layer_norm1_bias"],
                       eps)
        t = h.shape[1]
        q = (h @ w["q_proj"] + w["q_proj_bias"]).reshape(
            n, t, v_heads, v_head_dim)
        k = (h @ w["k_proj"] + w["k_proj_bias"]).reshape(
            n, t, v_heads, v_head_dim)
        val = (h @ w["v_proj"] + w["v_proj_bias"]).reshape(
            n, t, v_heads, v_head_dim)
        s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * (v_head_dim**-0.5)
        p_ = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("nhqk,nkhd->nqhd", p_, val)
        x = res + (o.reshape(n, t, -1) @ w["out_proj"] +
                   w["out_proj_bias"])
        res = x
        h = layer_norm(x, w["layer_norm2"], w["layer_norm2_bias"],
                       eps)
        h = jax.nn.gelu(h @ w["fc1"] + w["fc1_bias"],
                        approximate=True)
        return res + (h @ w["fc2"] + w["fc2_bias"])

    x = jax.lax.fori_loop(0, v_layers, layer_fn, x)
    if post_norm:
        x = layer_norm(x, v["post_norm"], v["post_norm_bias"], eps)
    return x


class Gemma3ForConditionalGeneration:

    bidir_mm_spans = True  # image blocks attend bidirectionally

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
        self.mm_tokens = int(getattr(hf, "mm_tokens_per_image", 256))
        side = int(math.isqrt(self.mm_tokens))
        assert side * side == self.mm_tokens
        self.pool_k = self.grid // side
        self.tokens_per_side = side

        text_archs = getattr(hf.text_config, "architectures",
                             None) or ["Gemma3ForCausalLM"]
        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = text_archs[0]
        self.language_model = resolve_model_cls(text_archs[0])(
            text_cfg)
        self.text_cfg = text_cfg
        self.embed_scale = self.language_model.embed_scale

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        D = self.v_hidden
        H = self.cfg.hidden_size
        specs = siglip_specs(D, self.v_inter, self.v_layers,
                             self.patch, self.num_patches)
        specs += [
            # raw parameter, already [vD, tH] — no transpose
            ParamSpec("mm_projection", (D, H), P(None, None),
                      "multi_modal_projector"
                      ".mm_input_projection_weight", transform=None),
            ParamSpec("mm_soft_emb_norm", (D, ), P(),
                      "multi_modal_projector.mm_soft_emb_norm.weight",
                      transform=None),
        ]
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.language_model.kv_cache_spec()

    def kv_cache_groups(self):
        """Full pools for ALL layers: image blocks attend across the
        sliding window, so window-sized pools would free pages the
        bidirectional mask still reads."""
        from vllm_main_modify_tpu.core.kv_cache_interface import \
            single_full_group

        kv_heads, head_dim, num_layers = self.kv_cache_spec()
        return single_full_group(kv_heads, head_dim, num_layers)

    # ------------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N, mm_tokens_per_image, text_H]."""
        n = pixel_values.shape[0]
        x = siglip_encode(params["vision"], pixel_values,
                          patch=self.patch,
                          num_patches=self.num_patches,
                          v_hidden=self.v_hidden,
                          v_heads=self.v_heads,
                          v_head_dim=self.v_head_dim,
                          v_layers=self.v_layers, eps=self.v_eps)
        # Gemma3MultiModalProjector: grid avg-pool → (1+w) RMS → proj
        g, k = self.grid, self.pool_k
        x = x.reshape(n, g, g, self.v_hidden)
        x = x.reshape(n, g // k, k, g // k, k, self.v_hidden)
        x = x.mean(axis=(2, 4)).reshape(n, self.mm_tokens,
                                        self.v_hidden)
        x = gemma_rms_norm(x, params["mm_soft_emb_norm"], self.v_eps)
        return x @ params["mm_projection"].astype(jnp.float32)

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None):
        lm_params = params["language_model"]
        x = jnp.take(lm_params["embed_tokens"], input_ids, axis=0)
        x = x * jnp.asarray(self.embed_scale, dtype=x.dtype)
        if mm_embeds is not None:
            # image features REPLACE the scaled text embeddings
            # unscaled (HF Gemma3: scaling lives inside embed_tokens)
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds.astype(x.dtype), mode="drop")
        return self.language_model(lm_params, input_ids, positions,
                                   kv_caches, attn_meta,
                                   use_pallas=use_pallas,
                                   inputs_embeds=x)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(
            params["language_model"], hidden)
