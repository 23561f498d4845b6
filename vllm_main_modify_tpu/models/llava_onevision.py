"""LLaVA-OneVision (single-tile mode).

Reference: vllm/model_executor/models/llava_onevision.py + HF
modeling_llava_onevision. SigLIP tower (features taken from the LAST
encoder layer, ``vision_feature_select_strategy="full"`` — NO
post-layernorm, HF hidden_states[-1]), 2-layer gelu projector, and
HF ``pack_image_features`` with the FIXED base-resolution grid: every
image becomes [base, one tile] (the tile equals the base at the
canonical square resolution), packed as base features + the 1x1 tile
grid with the learned ``image_newline`` appended per row — exactly
the anyres path at pinpoint == base size. Other pinpoints would be
additional encode calls at other shapes.
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
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.registry import resolve_model_cls

VP = "vision_tower.vision_model."


class LlavaOnevisionForConditionalGeneration:

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

        text_archs = getattr(hf.text_config, "architectures",
                             None) or ["Qwen2ForCausalLM"]
        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = text_archs[0]
        self.language_model = resolve_model_cls(text_archs[0])(
            text_cfg)
        self.text_cfg = text_cfg

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        D, I, L = self.v_hidden, self.v_inter, self.v_layers
        H = self.cfg.hidden_size
        t = transpose2d

        def vstk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"vision.layers.{path}", (L, *shape),
                             spec, VP + "encoder.layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("vision.patch_embedding",
                      (D, 3, self.patch, self.patch),
                      P(None, None, None, None),
                      VP + "embeddings.patch_embedding.weight",
                      transform=None),
            ParamSpec("vision.patch_bias", (D, ), P(),
                      VP + "embeddings.patch_embedding.bias",
                      transform=None),
            ParamSpec("vision.position_embedding",
                      (self.num_patches, D), P(None, None),
                      VP + "embeddings.position_embedding.weight",
                      transform=None),
            ParamSpec("proj_fc1", (D, H), P(None, None),
                      "multi_modal_projector.linear_1.weight",
                      transform=t),
            ParamSpec("proj_fc1_bias", (H, ), P(),
                      "multi_modal_projector.linear_1.bias",
                      transform=None),
            ParamSpec("proj_fc2", (H, H), P(None, None),
                      "multi_modal_projector.linear_2.weight",
                      transform=t),
            ParamSpec("proj_fc2_bias", (H, ), P(),
                      "multi_modal_projector.linear_2.bias",
                      transform=None),
            ParamSpec("image_newline", (H, ), P(), "image_newline",
                      transform=None),
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
            vstk("fc1", (D, I), P(None, None, None),
                 "mlp.fc1.weight"),
            vstk("fc1_bias", (I, ), P(None, None), "mlp.fc1.bias",
                 transform=None),
            vstk("fc2", (I, D), P(None, None, None),
                 "mlp.fc2.weight"),
            vstk("fc2_bias", (D, ), P(None, None), "mlp.fc2.bias",
                 transform=None),
        ]
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[B, 2, 3, S, S] (base + tile) → [B, P + g·(g+1), text_H]
        (HF pack_image_features at pinpoint == base size)."""
        v = params["vision"]
        b = pixel_values.shape[0]
        pixel_values = pixel_values.reshape(-1, *pixel_values.shape[-3:])
        n = pixel_values.shape[0]
        x = jax.lax.conv_general_dilated(
            pixel_values.astype(jnp.float32),
            v["patch_embedding"].astype(jnp.float32),
            window_strides=(self.patch, self.patch), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x.reshape(n, self.v_hidden, self.num_patches)
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
                           self.v_eps)
            t = h.shape[1]
            q = (h @ w["q_proj"] + w["q_proj_bias"]).reshape(
                n, t, self.v_heads, self.v_head_dim)
            k = (h @ w["k_proj"] + w["k_proj_bias"]).reshape(
                n, t, self.v_heads, self.v_head_dim)
            val = (h @ w["v_proj"] + w["v_proj_bias"]).reshape(
                n, t, self.v_heads, self.v_head_dim)
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_head_dim**-0.5)
            p_ = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", p_, val)
            x = res + (o.reshape(n, t, -1) @ w["out_proj"] +
                       w["out_proj_bias"])
            res = x
            h = layer_norm(x, w["layer_norm2"], w["layer_norm2_bias"],
                           self.v_eps)
            h = jax.nn.gelu(h @ w["fc1"] + w["fc1_bias"],
                            approximate=True)
            return res + (h @ w["fc2"] + w["fc2_bias"])

        x = jax.lax.fori_loop(0, self.v_layers, layer_fn, x)
        # select "full" from the LAST encoder layer: NO post layernorm
        if "proj_pre_norm" in params:
            # RVL (Reka): LayerNorm ahead of the projector MLP
            x = layer_norm(x, params["proj_pre_norm"],
                           params["proj_pre_norm_bias"], 1e-6)
        x = jax.nn.gelu(x @ params["proj_fc1"] +
                        params["proj_fc1_bias"], approximate=False)
        x = x @ params["proj_fc2"] + params["proj_fc2_bias"]
        # pack: [B, 2, P, H] → base ++ (tile grid + newline per row)
        g = self.grid
        h_dim = x.shape[-1]
        x = x.reshape(b, 2, self.num_patches, h_dim)
        base, tile = x[:, 0], x[:, 1]
        tile = tile.reshape(b, g, g, h_dim)
        nl = jnp.broadcast_to(
            params["image_newline"].astype(jnp.float32)[None, None,
                                                        None],
            (b, g, 1, h_dim))
        tile = jnp.concatenate([tile, nl], axis=2)  # [B, g, g+1, H]
        tile = tile.reshape(b, g * (g + 1), h_dim)
        return jnp.concatenate([base, tile], axis=1)

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


class RForConditionalGeneration(LlavaOnevisionForConditionalGeneration):
    """RVL / Reka Flash VL (reference:
    vllm/model_executor/models/rvl.py): the LLaVA-OneVision recipe
    with a LayerNorm ahead of the projector MLP."""

    def param_specs(self):
        from vllm_main_modify_tpu.models.interface import ParamSpec

        specs = super().param_specs()
        D = self.v_hidden
        specs += [
            ParamSpec("proj_pre_norm", (D, ), P(),
                      "multi_modal_projector.pre_norm.weight",
                      transform=None),
            ParamSpec("proj_pre_norm_bias", (D, ), P(),
                      "multi_modal_projector.pre_norm.bias",
                      transform=None),
        ]
        return specs
