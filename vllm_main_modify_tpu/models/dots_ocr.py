"""dots.ocr (rednote-hilab/dots.ocr): Qwen2-VL-style NaViT vision
tower with RMSNorm blocks + SwiGLU FFN, 2x2 patch merger, over a plain
Qwen2 decoder (standard 1-D rope — no mrope).

Reference parity: vllm/model_executor/models/dots_ocr.py (+
transformers_utils/configs/dotsocr.py: the TOP config is a
Qwen2Config carrying vision_config and image_token_id). Vision deltas
vs Qwen2-VL (dots_ocr.py:360-650): conv patch embed WITH bias +
RMSNorm on the patch tokens; RMSNorm (bias-free) block norms;
SwiGLU fc1/fc3/fc2 MLP (bias per use_bias, default off); optional
post_trunk_norm RMSNorm; merger ln_q is a biased LayerNorm (eps 1e-6)
before the standard 2-layer GELU MLP. The 2D rotary convention and
the merge-group patch raster are exactly Qwen2-VL's
(get_pos_ids_by_grid, dots_ocr.py:571-597).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.layers.normalization import (layer_norm,
                                                       rms_norm)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.llama import LlamaForCausalLM

VIS = "vision_tower."


class DotsOCRForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        g = lambda c, k, d=None: (c.get(k, d) if isinstance(c, dict)
                                  else getattr(c, k, d))
        self.v_hidden = int(g(vc, "embed_dim", 1536))
        self.out_hidden = int(g(vc, "hidden_size", 1536))
        self.v_layers = int(g(vc, "num_hidden_layers", 42))
        self.v_heads = int(g(vc, "num_attention_heads", 12))
        self.v_dh = self.v_hidden // self.v_heads
        self.v_inter = int(g(vc, "intermediate_size", 4224))
        self.patch = int(g(vc, "patch_size", 14))
        self.merge = int(g(vc, "spatial_merge_size", 2))
        self.use_bias = bool(g(vc, "use_bias", False))
        self.post_norm = bool(g(vc, "post_norm", True))
        self.v_eps = float(g(vc, "rms_norm_eps", 1e-5))
        self.image_size = int(config.mm_image_size or 448)
        self.grid = self.image_size // self.patch
        assert self.grid % self.merge == 0

        # text decoder: the top config IS the Qwen2 config
        text_cfg = replace(config, is_multimodal=False)
        text_cfg.architecture = "Qwen2ForCausalLM"
        text_cfg.attention_bias = True
        self.language_model = LlamaForCausalLM(text_cfg)

    def param_specs(self) -> list[ParamSpec]:
        D, I, L = self.v_hidden, self.v_inter, self.v_layers
        m2 = self.merge**2
        t = transpose2d

        def vstk(path, shape, hf_key, transform=t):
            return ParamSpec(
                f"vision.layers.{path}", (L, *shape),
                P(*([None] * (len(shape) + 1))),
                VIS + "blocks.{i}." + hf_key, stacked=True,
                transform=transform)

        specs = [
            ParamSpec("vision.patch_embed",
                      (D, 3, self.patch, self.patch),
                      P(None, None, None, None),
                      VIS + "patch_embed.patchifier.proj.weight",
                      transform=None),
            ParamSpec("vision.patch_bias", (D, ), P(),
                      VIS + "patch_embed.patchifier.proj.bias",
                      transform=None),
            ParamSpec("vision.patch_norm", (D, ), P(),
                      VIS + "patch_embed.patchifier.norm.weight",
                      transform=None),
            vstk("norm1", (D, ), "norm1.weight", transform=None),
            vstk("norm2", (D, ), "norm2.weight", transform=None),
            vstk("qkv", (D, 3 * D), "attn.qkv_proj.weight"),
            vstk("proj", (D, D), "attn.out_proj.weight"),
            vstk("fc1", (D, I), "mlp.fc1.weight"),
            vstk("fc3", (D, I), "mlp.fc3.weight"),
            vstk("fc2", (I, D), "mlp.fc2.weight"),
            ParamSpec("merger.ln_q", (D, ), P(),
                      VIS + "merger.ln_q.weight", transform=None),
            ParamSpec("merger.ln_q_bias", (D, ), P(),
                      VIS + "merger.ln_q.bias", transform=None),
            ParamSpec("merger.mlp0", (m2 * D, m2 * D), P(None, None),
                      VIS + "merger.mlp.0.weight", transform=t),
            ParamSpec("merger.mlp0_bias", (m2 * D, ), P(),
                      VIS + "merger.mlp.0.bias", transform=None),
            ParamSpec("merger.mlp2", (m2 * D, self.out_hidden),
                      P(None, None), VIS + "merger.mlp.2.weight",
                      transform=t),
            ParamSpec("merger.mlp2_bias", (self.out_hidden, ), P(),
                      VIS + "merger.mlp.2.bias", transform=None),
        ]
        if self.use_bias:
            specs += [
                vstk("qkv_bias", (3 * D, ), "attn.qkv_proj.bias",
                     transform=None),
                vstk("proj_bias", (D, ), "attn.out_proj.bias",
                     transform=None),
                vstk("fc1_bias", (I, ), "mlp.fc1.bias",
                     transform=None),
                vstk("fc3_bias", (I, ), "mlp.fc3.bias",
                     transform=None),
                vstk("fc2_bias", (D, ), "mlp.fc2.bias",
                     transform=None),
            ]
        if self.post_norm:
            specs.append(
                ParamSpec("vision.post_norm", (D, ), P(),
                          VIS + "post_trunk_norm.weight",
                          transform=None))
        specs += self.language_model.param_specs()
        return specs

    def kv_cache_spec(self):
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def _vit_pos_ids(self):
        g, m = self.grid, self.merge
        hh = np.arange(g)[:, None] * np.ones(g, np.int32)[None]
        ww = np.ones(g, np.int32)[:, None] * np.arange(g)[None]

        def reorder(a):
            return a.reshape(g // m, m, g // m,
                             m).transpose(0, 2, 1, 3).reshape(-1)

        return reorder(hh), reorder(ww)

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N*(grid/merge)^2, out_hidden]."""
        vw = params["vision"]
        n = pixel_values.shape[0]
        D = self.v_hidden
        g, m = self.grid, self.merge
        x = jax.lax.conv_general_dilated(
            pixel_values.astype(jnp.float32),
            vw["patch_embed"].astype(jnp.float32),
            (self.patch, self.patch), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x.reshape(n, D, g * g).transpose(0, 2, 1) + \
            vw["patch_bias"]
        x = rms_norm(x, vw["patch_norm"], self.v_eps)
        # merge-group raster (matches the merger's consecutive-m2
        # grouping and the 2D rope ids)
        idx = np.arange(g * g).reshape(g // m, m, g // m,
                                       m).transpose(0, 2, 1,
                                                    3).reshape(-1)
        x = x[:, jnp.asarray(idx)]

        hpos, wpos = self._vit_pos_ids()
        half = self.v_dh // 4
        inv_freq = 1.0 / (10000.0**(
            np.arange(0, self.v_dh // 2, 2, dtype=np.float64) /
            (self.v_dh // 2)))
        angles = np.concatenate([
            hpos[:, None] * inv_freq[None, :half],
            wpos[:, None] * inv_freq[None, :half],
        ], axis=-1)
        cos = jnp.asarray(np.cos(angles), jnp.float32)[None, :,
                                                       None, :]
        sin = jnp.asarray(np.sin(angles), jnp.float32)[None, :,
                                                       None, :]

        def rot(z):
            d2 = z.shape[-1] // 2
            z1, z2 = z[..., :d2], z[..., d2:]
            return jnp.concatenate(
                [z1 * cos - z2 * sin, z2 * cos + z1 * sin], axis=-1)

        for li in range(self.v_layers):
            w = jax.tree.map(lambda a, li=li: a[li], vw["layers"])
            h = rms_norm(x, w["norm1"], self.v_eps)
            t_ = h.shape[1]
            qkv = h @ w["qkv"]
            if self.use_bias:
                qkv = qkv + w["qkv_bias"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = rot(q.reshape(n, t_, self.v_heads, self.v_dh))
            k = rot(k.reshape(n, t_, self.v_heads, self.v_dh))
            v = v.reshape(n, t_, self.v_heads, self.v_dh)
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_dh**-0.5)
            p = jax.nn.softmax(s.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(n, t_, D)
            o = o @ w["proj"]
            if self.use_bias:
                o = o + w["proj_bias"]
            x = x + o
            h = rms_norm(x, w["norm2"], self.v_eps)
            g1 = h @ w["fc1"]
            g3 = h @ w["fc3"]
            if self.use_bias:
                g1 = g1 + w["fc1_bias"]
                g3 = g3 + w["fc3_bias"]
            h = jax.nn.silu(g1) * g3
            h = h @ w["fc2"]
            if self.use_bias:
                h = h + w["fc2_bias"]
            x = x + h
        if self.post_norm:
            x = rms_norm(x, vw["post_norm"], self.v_eps)
        mg = params["merger"]
        x = layer_norm(x, mg["ln_q"], mg["ln_q_bias"], 1e-6)
        m2 = m * m
        x = x.reshape(n * (g * g) // m2, m2 * D)
        x = jax.nn.gelu(x @ mg["mlp0"] + mg["mlp0_bias"],
                        approximate=False)
        return x @ mg["mlp2"] + mg["mlp2_bias"]

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        if mm_embeds is not None:
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds.astype(x.dtype), mode="drop")
        return self.language_model(params, input_ids, positions,
                                   kv_caches, attn_meta,
                                   use_pallas=use_pallas,
                                   inputs_embeds=x)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(params, hidden)
