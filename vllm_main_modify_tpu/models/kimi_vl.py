"""Kimi-VL (moonshotai/Kimi-VL-A3B): MoonViT tower + 2x2 patch-merge
GELU projector over a DeepSeek-V2/V3 MLA decoder.

Reference parity: vllm/model_executor/models/kimi_vl.py + moonvit.py.
MoonViT (moonvit.py:420-700): conv patch embed + learnable 2D
interpolated pos-emb (Learnable2DInterpPosEmb :199), pre-LN blocks
with biased packed wqkv/wo, 2D rotary applied as ADJACENT-pair complex
rotation where pair 2i rotates by the width position and pair 2i+1 by
the height position, both at freq theta^(-4i/dim) (Rope2DPosEmb
:277-345), gelu-tanh MLP2 (fc0/fc1), final_layernorm. The projector
(kimi_vl.py:95-126): LayerNorm over the vision width, then the 2x2
SPATIAL patch merge of patch_merger (moonvit.py:560-583), linear_1
(4W->4W) + gelu + linear_2 (4W->text H). Decoder: DeepseekV2Model +
separate lm_head, checkpoint keys under language_model.model.* /
language_model.lm_head (kimi_vl.py:452-456).

Canonical-square ingest: one image at ``mm_image_size`` yields
(grid/2)^2 tokens at <|media_pad|> placeholders.
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
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.registry import resolve_model_cls

VIS = "vision_tower."


def _cfg_get(c, k, d=None):
    if isinstance(c, dict):
        return c.get(k, d)
    return getattr(c, k, d)


class KimiVLForConditionalGeneration:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        self.width = int(_cfg_get(vc, "hidden_size", 1152))
        self.v_layers = int(_cfg_get(vc, "num_hidden_layers", 27))
        self.v_heads = int(_cfg_get(vc, "num_attention_heads", 16))
        self.v_dh = self.width // self.v_heads
        self.v_mlp = int(_cfg_get(vc, "intermediate_size", 4304))
        self.patch = int(_cfg_get(vc, "patch_size", 14))
        self.pos_h = int(_cfg_get(vc, "init_pos_emb_height", 64))
        self.pos_w = int(_cfg_get(vc, "init_pos_emb_width", 64))
        mks = _cfg_get(vc, "merge_kernel_size", (2, 2)) or (2, 2)
        self.merge = int(mks[0])
        self.image_size = int(config.mm_image_size or 448)
        self.grid = self.image_size // self.patch

        txt = hf.text_config
        archs = getattr(txt, "architectures", None)
        if archs:
            arch = archs[0]
        elif getattr(txt, "topk_method", None) == "noaux_tc":
            arch = "DeepseekV3ForCausalLM"
        else:
            arch = "DeepseekV2ForCausalLM"
        text_cfg = replace(config, hf_config=txt,
                           is_multimodal=False)
        text_cfg.architecture = arch
        self.language_model = resolve_model_cls(arch)(text_cfg)
        self.n_embed = text_cfg.hidden_size

    def param_specs(self) -> list[ParamSpec]:
        W, MW = self.width, self.v_mlp
        t = transpose2d
        specs = [
            ParamSpec("vision.patch_embed",
                      (W, 3, self.patch, self.patch),
                      P(None, None, None, None),
                      VIS + "patch_embed.proj.weight", transform=None),
            ParamSpec("vision.patch_bias", (W, ), P(),
                      VIS + "patch_embed.proj.bias", transform=None),
            ParamSpec("vision.pos_emb", (self.pos_h, self.pos_w, W),
                      P(None, None, None),
                      VIS + "patch_embed.pos_emb.weight",
                      transform=None),
            ParamSpec("vision.final_norm", (W, ), P(),
                      VIS + "encoder.final_layernorm.weight",
                      transform=None),
            ParamSpec("vision.final_norm_bias", (W, ), P(),
                      VIS + "encoder.final_layernorm.bias",
                      transform=None),
        ]

        def vstk(path, shape, hf_key, transform=t):
            return ParamSpec(
                f"vision.layers.{path}", (self.v_layers, *shape),
                P(*([None] * (len(shape) + 1))),
                VIS + "encoder.blocks.{i}." + hf_key, stacked=True,
                transform=transform)

        specs += [
            vstk("norm0", (W, ), "norm0.weight", transform=None),
            vstk("norm0_bias", (W, ), "norm0.bias", transform=None),
            vstk("norm1", (W, ), "norm1.weight", transform=None),
            vstk("norm1_bias", (W, ), "norm1.bias", transform=None),
            vstk("wqkv", (W, 3 * W), "wqkv.weight"),
            vstk("wqkv_bias", (3 * W, ), "wqkv.bias", transform=None),
            vstk("wo", (W, W), "wo.weight"),
            vstk("wo_bias", (W, ), "wo.bias", transform=None),
            vstk("fc0", (W, MW), "mlp.fc0.weight"),
            vstk("fc0_bias", (MW, ), "mlp.fc0.bias", transform=None),
            vstk("fc1", (MW, W), "mlp.fc1.weight"),
            vstk("fc1_bias", (W, ), "mlp.fc1.bias", transform=None),
        ]
        m2 = self.merge * self.merge
        specs += [
            ParamSpec("projector.pre_norm", (W, ), P(),
                      "multi_modal_projector.pre_norm.weight",
                      transform=None),
            ParamSpec("projector.pre_norm_bias", (W, ), P(),
                      "multi_modal_projector.pre_norm.bias",
                      transform=None),
            ParamSpec("projector.lin1", (W * m2, W * m2), P(None,
                                                            None),
                      "multi_modal_projector.linear_1.weight",
                      transform=t),
            ParamSpec("projector.lin1_bias", (W * m2, ), P(),
                      "multi_modal_projector.linear_1.bias",
                      transform=None),
            ParamSpec("projector.lin2", (W * m2, self.n_embed),
                      P(None, None),
                      "multi_modal_projector.linear_2.weight",
                      transform=t),
            ParamSpec("projector.lin2_bias", (self.n_embed, ), P(),
                      "multi_modal_projector.linear_2.bias",
                      transform=None),
        ]
        for s in self.language_model.param_specs():
            # checkpoint: language_model.model.* + language_model.lm_head
            s.path = "language_model." + s.path
            s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self):
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def _rope_cis(self, gh: int, gw: int):
        """cos/sin [gh*gw, v_dh/2]: pair 2i ← width pos, 2i+1 ←
        height pos, freq i = theta^(-4i/dim) (Rope2DPosEmb)."""
        c = self.v_dh // 2
        n4 = self.v_dh // 4
        freqs = 1.0 / (10000.0**(np.arange(n4) * 4.0 / self.v_dh))
        pos = np.arange(gh * gw)
        x_pos, y_pos = pos % gw, pos // gw
        ang = np.zeros((gh * gw, c), np.float32)
        ang[:, 0::2] = np.outer(x_pos, freqs)
        ang[:, 1::2] = np.outer(y_pos, freqs)
        return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N*(grid/merge)^2, text_H] image tokens."""
        vw = params["vision"]
        n = pixel_values.shape[0]
        W = self.width
        g = self.grid
        x = jax.lax.conv_general_dilated(
            pixel_values.astype(jnp.float32),
            vw["patch_embed"].astype(jnp.float32),
            (self.patch, self.patch), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x.reshape(n, W, g * g).transpose(0, 2, 1) + \
            vw["patch_bias"]
        pos = vw["pos_emb"].astype(jnp.float32)
        if (self.pos_h, self.pos_w) != (g, g):
            pos = jax.image.resize(pos, (g, g, W), method="cubic")
        x = x + pos.reshape(1, g * g, W)

        cos, sin = self._rope_cis(g, g)

        def rot(y):  # [n, t, heads, dh] adjacent-pair rotation
            yr = y.reshape(*y.shape[:-1], self.v_dh // 2, 2)
            re, im = yr[..., 0], yr[..., 1]
            c1 = cos[None, :, None, :]
            s1 = sin[None, :, None, :]
            return jnp.stack(
                [re * c1 - im * s1, re * s1 + im * c1],
                axis=-1).reshape(y.shape)

        for li in range(self.v_layers):
            w = jax.tree.map(lambda a, li=li: a[li], vw["layers"])
            h = layer_norm(x, w["norm0"], w["norm0_bias"], 1e-5)
            t = h.shape[1]
            qkv = (h @ w["wqkv"] + w["wqkv_bias"]).reshape(
                n, t, 3, self.v_heads, self.v_dh)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q, k = rot(q), rot(k)
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_dh**-0.5)
            p = jax.nn.softmax(s.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(n, t, W)
            x = x + (o @ w["wo"] + w["wo_bias"])
            h = layer_norm(x, w["norm1"], w["norm1_bias"], 1e-5)
            h = jax.nn.gelu(h @ w["fc0"] + w["fc0_bias"],
                            approximate=True)
            x = x + (h @ w["fc1"] + w["fc1_bias"])
        x = layer_norm(x, vw["final_norm"], vw["final_norm_bias"],
                       1e-5)
        # projector: LN, 2x2 spatial merge, 4W->4W gelu 4W->H
        pw = params["projector"]
        x = layer_norm(x, pw["pre_norm"], pw["pre_norm_bias"], 1e-5)
        m = self.merge
        g2 = g // m
        x = x.reshape(n, g2, m, g2, m, W)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            n * g2 * g2, m * m * W)
        x = jax.nn.gelu(x @ pw["lin1"] + pw["lin1_bias"],
                        approximate=False)
        return x @ pw["lin2"] + pw["lin2_bias"]

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None):
        lm = params["language_model"]
        x = jnp.take(lm["embed_tokens"], input_ids, axis=0)
        if mm_embeds is not None:
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds.astype(x.dtype), mode="drop")
        return self.language_model(lm, input_ids, positions,
                                   kv_caches, attn_meta,
                                   use_pallas=use_pallas,
                                   inputs_embeds=x)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(
            params["language_model"], hidden)
