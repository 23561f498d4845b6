"""HyperCLOVA-X Vision (naver-hyperclovax/HyperCLOVAX-SEED-Vision):
SigLIP tower + C-Abstractor (or MLP) projector over the HCX text
decoder.

Reference parity: vllm/model_executor/models/hyperclovax_vision.py.
- Tower: HF SiglipVisionModel (:389-416); SigLIP has no cls token so
  visual_token_idx = 0 keeps every patch (:769-771).
- Projector (:419-608): ``mm_projector_type`` selects linear /
  mlp / inverted_mlp (fc1-GELU-fc2) / **cabstractor** — the Honeybee
  C-Abstractor: learned pos-emb over the patch grid, two RegNet
  stages around an adaptive average pool to the query grid
  (net = Sequential(s1, AdaptiveAvgPool2d, s2), each stage depth-3
  timm RegStage Bottlenecks: 1x1 ConvNormAct → depthwise-3x3
  ConvNormAct → SE (rd = in/4) → 1x1 ConvNormAct (no act) →
  SiLU(residual add), LayerNorm2d norms), then a Linear-SiLU-Linear
  readout (:556-608). One image at the canonical square yields
  ``num_queries_vis_abstractor_image`` tokens (anyres off).
- Decoder: the text tree under ``text_config`` (Llama-shaped HCX).

Checkpoint: vision_model.vision_model.* (HF Siglip nesting),
mm_projector.*, language_model.*.
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
from vllm_main_modify_tpu.models.gemma3_mm import (siglip_encode,
                                                   siglip_specs)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.registry import resolve_model_cls

VP = "vision_model.vision_model."
MP = "mm_projector."


class HCXVisionForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        g = lambda c, k, d=None: (c.get(k, d) if isinstance(c, dict)
                                  else getattr(c, k, d))
        self.v_hidden = int(g(vc, "hidden_size", 1152))
        self.v_layers = int(g(vc, "num_hidden_layers", 27))
        self.v_heads = int(g(vc, "num_attention_heads", 16))
        self.v_dh = self.v_hidden // self.v_heads
        self.v_inter = int(g(vc, "intermediate_size", 4304))
        self.patch = int(g(vc, "patch_size", 14))
        self.native_size = int(g(vc, "image_size", 378))
        self.v_eps = float(g(vc, "layer_norm_eps", 1e-6))
        self.image_size = int(config.mm_image_size
                              or self.native_size)
        self.grid = self.image_size // self.patch
        self.num_patches = self.grid * self.grid
        self.proj_type = getattr(hf, "mm_projector_type",
                                 "cabstractor")
        self.num_queries = int(
            getattr(hf, "num_queries_vis_abstractor_image", 0)
            or self.num_patches)
        self.proj_pos_emb = bool(getattr(hf, "proj_pos_emb", True))
        self.proj_prenorm = bool(getattr(hf, "proj_prenorm", False))

        txt = hf.text_config
        archs = getattr(txt, "architectures", None) or \
            ["LlamaForCausalLM"]
        text_cfg = replace(config, hf_config=txt,
                           is_multimodal=False)
        text_cfg.architecture = archs[0]
        self.language_model = resolve_model_cls(archs[0])(text_cfg)
        self.n_embed = text_cfg.hidden_size

    def num_image_tokens(self) -> int:
        if self.proj_type == "cabstractor":
            return self.num_queries
        return self.num_patches

    def param_specs(self) -> list[ParamSpec]:
        D = self.v_hidden
        H = self.n_embed
        t = transpose2d
        specs = siglip_specs(D, self.v_inter, self.v_layers,
                             self.patch,
                             (self.native_size // self.patch)**2,
                             prefix=VP)
        if self.proj_type == "linear":
            specs += [
                ParamSpec("proj.fc", (D, H), P(None, None),
                          MP + "weight", transform=t),
                ParamSpec("proj.fc_bias", (H, ), P(), MP + "bias",
                          transform=None),
            ]
        elif self.proj_type in ("mlp", "inverted_mlp"):
            hid = D * (2 if self.proj_type == "inverted_mlp" else 1)
            specs += [
                ParamSpec("proj.fc1", (D, hid), P(None, None),
                          MP + "fc1.weight", transform=t),
                ParamSpec("proj.fc1_bias", (hid, ), P(),
                          MP + "fc1.bias", transform=None),
                ParamSpec("proj.fc2", (hid, H), P(None, None),
                          MP + "fc2.weight", transform=t),
                ParamSpec("proj.fc2_bias", (H, ), P(),
                          MP + "fc2.bias", transform=None),
            ]
        elif self.proj_type == "cabstractor":
            if self.proj_pos_emb:
                specs.append(
                    ParamSpec("proj.pos_emb",
                              (1, self.num_patches, D),
                              P(None, None, None), MP + "pos_emb",
                              transform=None))
            if self.proj_prenorm:
                specs += [
                    ParamSpec("proj.prenorm", (D, ), P(),
                              MP + "prenorm.weight", transform=None),
                    ParamSpec("proj.prenorm_bias", (D, ), P(),
                              MP + "prenorm.bias", transform=None),
                ]
            se = D // 4  # rd_channels = round(in_chs * 0.25)
            for stage, si in (("s1", 0), ("s2", 2)):
                for b in range(1, 4):  # depth-3 RegStage
                    pre = f"proj.{stage}_b{b}_"
                    hk = MP + f"net.{si}.b{b}."
                    specs += [
                        ParamSpec(pre + "c1", (D, D, 1, 1),
                                  P(None, None, None, None),
                                  hk + "conv1.conv.weight",
                                  transform=None),
                        ParamSpec(pre + "c1_n", (D, ), P(),
                                  hk + "conv1.bn.weight",
                                  transform=None),
                        ParamSpec(pre + "c1_nb", (D, ), P(),
                                  hk + "conv1.bn.bias",
                                  transform=None),
                        # depthwise 3x3 (groups == channels)
                        ParamSpec(pre + "c2", (D, 1, 3, 3),
                                  P(None, None, None, None),
                                  hk + "conv2.conv.weight",
                                  transform=None),
                        ParamSpec(pre + "c2_n", (D, ), P(),
                                  hk + "conv2.bn.weight",
                                  transform=None),
                        ParamSpec(pre + "c2_nb", (D, ), P(),
                                  hk + "conv2.bn.bias",
                                  transform=None),
                        ParamSpec(pre + "se1", (se, D, 1, 1),
                                  P(None, None, None, None),
                                  hk + "se.fc1.weight",
                                  transform=None),
                        ParamSpec(pre + "se1_b", (se, ), P(),
                                  hk + "se.fc1.bias",
                                  transform=None),
                        ParamSpec(pre + "se2", (D, se, 1, 1),
                                  P(None, None, None, None),
                                  hk + "se.fc2.weight",
                                  transform=None),
                        ParamSpec(pre + "se2_b", (D, ), P(),
                                  hk + "se.fc2.bias",
                                  transform=None),
                        ParamSpec(pre + "c3", (D, D, 1, 1),
                                  P(None, None, None, None),
                                  hk + "conv3.conv.weight",
                                  transform=None),
                        ParamSpec(pre + "c3_n", (D, ), P(),
                                  hk + "conv3.bn.weight",
                                  transform=None),
                        ParamSpec(pre + "c3_nb", (D, ), P(),
                                  hk + "conv3.bn.bias",
                                  transform=None),
                    ]
            specs += [
                ParamSpec("proj.r0", (D, H), P(None, None),
                          MP + "readout.0.weight", transform=t),
                ParamSpec("proj.r0_bias", (H, ), P(),
                          MP + "readout.0.bias", transform=None),
                ParamSpec("proj.r2", (H, H), P(None, None),
                          MP + "readout.2.weight", transform=t),
                ParamSpec("proj.r2_bias", (H, ), P(),
                          MP + "readout.2.bias", transform=None),
            ]
        else:
            raise NotImplementedError(
                f"mm_projector_type {self.proj_type!r}")
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self):
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def _reg_bottleneck(self, pw, pre, x):
        """timm RegNet Bottleneck (LayerNorm2d norms, SiLU acts,
        depthwise 3x3, SE with rd = D/4). x: [n, gh, gw, D] NHWC."""

        def ln2d(y, w, b):
            return layer_norm(y, w, b, 1e-5)  # channel-last LN

        sc = x
        y = jnp.einsum("nhwc,oc->nhwo", x,
                       pw[pre + "c1"][:, :, 0, 0])
        y = jax.nn.silu(ln2d(y, pw[pre + "c1_n"], pw[pre + "c1_nb"]))
        # depthwise 3x3, pad 1
        dw = pw[pre + "c2"][:, 0]  # [D, 3, 3]
        yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros_like(y)
        for di in range(3):
            for dj in range(3):
                acc = acc + yp[:, di:di + y.shape[1],
                               dj:dj + y.shape[2], :] * \
                    dw[:, di, dj][None, None, None, :]
        y = jax.nn.silu(ln2d(acc, pw[pre + "c2_n"],
                             pw[pre + "c2_nb"]))
        # SE
        s = y.mean(axis=(1, 2))  # [n, D]
        s = jax.nn.silu(s @ pw[pre + "se1"][:, :, 0, 0].T +
                        pw[pre + "se1_b"])
        s = jax.nn.sigmoid(s @ pw[pre + "se2"][:, :, 0, 0].T +
                           pw[pre + "se2_b"])
        y = y * s[:, None, None, :]
        y = jnp.einsum("nhwc,oc->nhwo", y,
                       pw[pre + "c3"][:, :, 0, 0])
        y = ln2d(y, pw[pre + "c3_n"], pw[pre + "c3_nb"])
        return jax.nn.silu(y + sc)

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N*num_image_tokens, text_H]."""
        n = pixel_values.shape[0]
        D = self.v_hidden
        x = siglip_encode(
            params["vision"], pixel_values, patch=self.patch,
            num_patches=self.num_patches, v_hidden=D,
            v_heads=self.v_heads, v_head_dim=self.v_dh,
            v_layers=self.v_layers, eps=self.v_eps)
        pw = params["proj"]
        if self.proj_type == "linear":
            return (x @ pw["fc"] + pw["fc_bias"]).reshape(
                -1, self.n_embed)
        if self.proj_type in ("mlp", "inverted_mlp"):
            y = jax.nn.gelu(x @ pw["fc1"] + pw["fc1_bias"],
                            approximate=False)
            return (y @ pw["fc2"] + pw["fc2_bias"]).reshape(
                -1, self.n_embed)
        # cabstractor
        if self.proj_prenorm:
            x = layer_norm(x, pw["prenorm"], pw["prenorm_bias"],
                           1e-5)
        if self.proj_pos_emb:
            x = x + pw["pos_emb"].astype(x.dtype)
        g = self.grid
        x = x.reshape(n, g, g, D)
        for b in range(1, 4):
            x = self._reg_bottleneck(pw, f"s1_b{b}_", x)
        # adaptive average pool to the query grid
        hw = int(round(self.num_queries**0.5))
        x = x.reshape(n, hw, g // hw, hw, g // hw, D).mean(
            axis=(2, 4))
        for b in range(1, 4):
            x = self._reg_bottleneck(pw, f"s2_b{b}_", x)
        x = x.reshape(n * hw * hw, D)
        y = jax.nn.silu(x @ pw["r0"] + pw["r0_bias"])
        return y @ pw["r2"] + pw["r2_bias"]

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
