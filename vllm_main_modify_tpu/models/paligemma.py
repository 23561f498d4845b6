"""PaliGemma / PaliGemma2 (SigLIP + linear projector + Gemma).

Reference: vllm/model_executor/models/paligemma.py + HF
modeling_paligemma. Structure:

- SigLIP tower under ``vision_tower.vision_model.`` (same encoder
  skeleton as models/gemma3_mm.py; legacy hub layout without the
  ``model.`` base prefix);
- projector: one biased linear [vision_D → projection_dim], features
  then divided by sqrt(text_hidden) (HF get_image_features);
- Gemma text under ``language_model.model.``.

PaliGemma is a PREFIX-LM: the whole prompt (image + text prefix)
attends bidirectionally; only generated tokens are causal. The
``prefix_lm`` flag makes the runner ship a [0, num_prompt_tokens)
bidirectional span per request (layers/attention.py bidir_spans), and
the engine disables chunked prefill so the prefix enters the KV in
one step.
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

# serialized hub layout (legacy top-level prefixes)
VP = "vision_tower.vision_model."


class PaliGemmaForConditionalGeneration:

    bidir_mm_spans = True
    prefix_lm = True  # whole prompt is bidirectional

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
        self.proj_dim = getattr(vc, "projection_dim",
                                config.hidden_size)

        text_archs = getattr(hf.text_config, "architectures",
                             None) or ["GemmaForCausalLM"]
        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = text_archs[0]
        self.language_model = resolve_model_cls(text_archs[0])(
            text_cfg)
        self.text_cfg = text_cfg
        self.embed_scale = self.language_model.embed_scale

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        D, I, L = self.v_hidden, self.v_inter, self.v_layers
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
            ParamSpec("vision.post_norm", (D, ), P(),
                      VP + "post_layernorm.weight", transform=None),
            ParamSpec("vision.post_norm_bias", (D, ), P(),
                      VP + "post_layernorm.bias", transform=None),
            ParamSpec("mm_projection", (D, self.proj_dim),
                      P(None, None),
                      "multi_modal_projector.linear.weight",
                      transform=t),
            ParamSpec("mm_projection_bias", (self.proj_dim, ), P(),
                      "multi_modal_projector.linear.bias",
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

    def kv_cache_groups(self):
        """Full pools on every layer — the bidirectional prefix may
        live behind a Gemma2 sliding window (PaliGemma2)."""
        from vllm_main_modify_tpu.core.kv_cache_interface import \
            single_full_group

        kv_heads, head_dim, num_layers = self.kv_cache_spec()
        return single_full_group(kv_heads, head_dim, num_layers)

    # ------------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N, num_patches, proj_dim] / sqrt(text_H)."""
        v = params["vision"]
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
        x = layer_norm(x, v["post_norm"], v["post_norm_bias"],
                       self.v_eps)
        x = x @ params["mm_projection"].astype(jnp.float32) + \
            params["mm_projection_bias"].astype(jnp.float32)
        # HF get_image_features: divide by sqrt(text hidden)
        return x / jnp.sqrt(jnp.asarray(self.cfg.hidden_size,
                                        jnp.float32))

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None):
        lm_params = params["language_model"]
        x = jnp.take(lm_params["embed_tokens"], input_ids, axis=0)
        x = x * jnp.asarray(self.embed_scale, dtype=x.dtype)
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
