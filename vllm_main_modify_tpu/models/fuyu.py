"""Fuyu-8B (Adept): raw image patches linearly projected into a
Persimmon decoder — no vision tower at all.

Reference: vllm/model_executor/models/fuyu.py + HF modeling_fuyu.
``vision_embed_tokens`` maps each flattened patch
(patch_h · patch_w · channels, channel-LAST per HF
FuyuImageProcessor.patchify_image) straight to a text embedding;
patch embeddings replace placeholder tokens. Fixed canonical
resolution (``mm_image_size``, default 224): one image =
(size/patch)² tokens in raster order."""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.registry import resolve_model_cls


class FuyuForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.patch = int(getattr(hf, "patch_size", 30))
        self.channels = int(getattr(hf, "num_channels", 3))
        self.image_size = int(config.mm_image_size or 224)
        assert self.image_size % self.patch == 0
        self.grid = self.image_size // self.patch
        self.num_image_tokens = self.grid * self.grid

        tc = getattr(hf, "text_config", hf)
        text_cfg = replace(config, hf_config=tc, is_multimodal=False)
        text_cfg.architecture = "PersimmonForCausalLM"
        self.language_model = resolve_model_cls(
            "PersimmonForCausalLM")(text_cfg)
        self.text_cfg = text_cfg

    def param_specs(self) -> list[ParamSpec]:
        H = self.cfg.hidden_size
        pd = self.channels * self.patch * self.patch
        specs = [
            ParamSpec("vision_embed", (pd, H), P(None, None),
                      "vision_embed_tokens.weight",
                      transform=transpose2d),
            ParamSpec("vision_embed_bias", (H, ), P(),
                      "vision_embed_tokens.bias", transform=None),
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
        """[N, 3, S, S] → [N, grid², text_H] (HF patchify order:
        raster patches, channel-LAST flatten)."""
        n, c = pixel_values.shape[0], self.channels
        g, ps = self.grid, self.patch
        x = pixel_values.reshape(n, c, g, ps, g, ps)
        x = jnp.transpose(x, (0, 2, 4, 3, 5, 1))  # [n, g, g, ps, ps, c]
        x = x.reshape(n, g * g, ps * ps * c).astype(jnp.float32)
        return x @ params["vision_embed"].astype(jnp.float32) + \
            params["vision_embed_bias"].astype(jnp.float32)

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
