"""Nemotron VL family: C-RADIO vision tower + pixel shuffle over
(a) Llama — Llama-3.1-Nemotron-Nano-VL (reference:
vllm/model_executor/models/nemotron_vl.py) and (b) the NemotronH
mamba2/attention hybrid — NemotronH-Nano-VL-V2 (reference:
nano_nemotron_vl.py).

RADIO tower (reference: models/radio.py + configs/radio.py): linear
bias-free patch embed over row-major patches, abs pos-embed added to
the PATCH tokens only, then cls+register tokens prepended (ClsToken:
1 cls padded to ``reg_tokens`` rows, radio.py:74-116); timm-style
pre-LN blocks with biased fused qkv/proj and exact-gelu MLP (layer
scales absent — the reference loader skips ls1/ls2, radio.py:556-560);
no final norm; the first ``reg_tokens`` rows are dropped
(_extract_final, radio.py:570-576). Input normalization
(InputConditioner) happens at ingest.

Projector deltas: Llama variant mlp1 = LayerNorm → Linear → GELU →
Linear with biases (nemotron_vl.py:417-430); NemotronH variant mlp1 =
RMSNorm(1e-5) → bias-free Linear → ReLU^2 → bias-free Linear
(nano_nemotron_vl.py:909-922). Both pixel-shuffle the grid by
``downsample_ratio`` first (ps_version v2).

Checkpoint: vision under vision_model.radio_model.*, projector mlp1.*,
text under language_model.*.
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
from vllm_main_modify_tpu.models.registry import resolve_model_cls

RAD = "vision_model.radio_model."


def _radio_dims(hf, mm_image_size):
    """(patch, image_size, D, layers, heads, inter, reg_tokens)."""
    vc = getattr(hf, "vision_config", None) or {}
    g = lambda c, k, d=None: (c.get(k, d) if isinstance(c, dict)
                              else getattr(c, k, d))
    # RadioConfig-style flat fields, with nano's args-dict fallback
    args = g(vc, "args", None) or {}
    patch = int(g(vc, "patch_size", 16))
    pref = g(vc, "preferred_resolution", None)
    native = int(pref[0]) if pref else int(
        g(vc, "image_size", getattr(hf, "force_image_size", 224)))
    return dict(
        patch=patch,
        native=native,
        size=int(mm_image_size or native),
        D=int(g(vc, "hidden_size", getattr(hf, "vit_hidden_size",
                                           1280))),
        layers=int(g(vc, "num_hidden_layers", 32)),
        heads=int(g(vc, "num_attention_heads", 16)),
        inter=int(g(vc, "intermediate_size", 5120)),
        reg=int(g(vc, "reg_tokens", None)
                or args.get("register_multiple", 0) or 0),
        eps=float(g(vc, "layer_norm_eps", 1e-6)),
    )


class LlamaNemotronVLChatModel:

    proj_norm_rms = False  # nano: RMSNorm + ReLU^2 + no biases
    proj_bias = True

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        d = _radio_dims(hf, config.mm_image_size)
        self.patch = d["patch"]
        self.native_grid = d["native"] // d["patch"]
        self.image_size = d["size"]
        self.grid = self.image_size // self.patch
        self.v_dim = d["D"]
        self.v_layers = d["layers"]
        self.v_heads = d["heads"]
        self.v_dh = self.v_dim // self.v_heads
        self.v_inter = d["inter"]
        self.v_eps = d["eps"]
        # ClsToken: 1 cls + (reg - 1) registers when reg_tokens set
        self.skip = d["reg"] if d["reg"] else 1
        r = float(getattr(hf, "downsample_ratio", 0.5))
        self.ds = int(round(1 / r))
        assert self.grid % self.ds == 0
        self.num_image_tokens = (self.grid // self.ds)**2
        self.vit_hidden = int(getattr(hf, "vit_hidden_size",
                                      self.v_dim))
        self.proj_mid = int(getattr(hf, "projector_hidden_size",
                                    4096))

        txt = hf.text_config
        archs = getattr(txt, "architectures", None) or \
            [self.default_text_arch]
        text_cfg = replace(config, hf_config=txt,
                           is_multimodal=False)
        text_cfg.architecture = archs[0]
        self.language_model = resolve_model_cls(archs[0])(text_cfg)
        self.n_embed = text_cfg.hidden_size

    default_text_arch = "LlamaForCausalLM"

    def param_specs(self) -> list[ParamSpec]:
        D, I, L = self.v_dim, self.v_inter, self.v_layers
        H = self.n_embed
        pd = self.vit_hidden * self.ds**2
        mid = self.proj_mid
        t = transpose2d

        def vstk(path, shape, hf_key, transform=t):
            return ParamSpec(
                f"vision.layers.{path}", (L, *shape),
                P(*([None] * (len(shape) + 1))),
                RAD + "model.blocks.{i}." + hf_key, stacked=True,
                transform=transform)

        specs = [
            ParamSpec("vision.patch_embed", (3 * self.patch**2, D),
                      P(None, None),
                      RAD + "model.patch_generator.embedder.weight",
                      transform=t),
            ParamSpec("vision.pos_embed",
                      (1, self.native_grid**2, D), P(None, None,
                                                     None),
                      RAD + "model.patch_generator.pos_embed",
                      transform=None),
            ParamSpec("vision.cls", (self.skip, D), P(None, None),
                      RAD + "model.patch_generator.cls_token.token",
                      transform=None),
            vstk("norm1", (D, ), "norm1.weight", transform=None),
            vstk("norm1_bias", (D, ), "norm1.bias", transform=None),
            vstk("norm2", (D, ), "norm2.weight", transform=None),
            vstk("norm2_bias", (D, ), "norm2.bias", transform=None),
            vstk("qkv", (D, 3 * D), "attn.qkv.weight"),
            vstk("qkv_bias", (3 * D, ), "attn.qkv.bias",
                 transform=None),
            vstk("proj", (D, D), "attn.proj.weight"),
            vstk("proj_bias", (D, ), "attn.proj.bias",
                 transform=None),
            vstk("fc1", (D, I), "mlp.fc1.weight"),
            vstk("fc1_bias", (I, ), "mlp.fc1.bias", transform=None),
            vstk("fc2", (I, D), "mlp.fc2.weight"),
            vstk("fc2_bias", (D, ), "mlp.fc2.bias", transform=None),
            ParamSpec("proj_norm", (pd, ), P(), "mlp1.0.weight",
                      transform=None),
            ParamSpec("proj_fc1", (pd, mid), P(None, None),
                      "mlp1.1.weight", transform=t),
            ParamSpec("proj_fc2", (mid, H), P(None, None),
                      "mlp1.3.weight", transform=t),
        ]
        if not self.proj_norm_rms:
            specs.append(
                ParamSpec("proj_norm_bias", (pd, ), P(),
                          "mlp1.0.bias", transform=None))
        if self.proj_bias:
            specs += [
                ParamSpec("proj_fc1_bias", (mid, ), P(),
                          "mlp1.1.bias", transform=None),
                ParamSpec("proj_fc2_bias", (H, ), P(),
                          "mlp1.3.bias", transform=None),
            ]
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self):
        return self.language_model.kv_cache_spec()

    def __getattr__(self, name):
        # forward hybrid-decoder hooks (kv_cache_groups for the
        # NemotronH variant) only when the wrapped LM defines them —
        # a plain method would make hasattr() true for Llama too
        if name == "kv_cache_groups":
            lm = self.__dict__.get("language_model")
            if lm is not None and hasattr(lm, "kv_cache_groups"):
                return lm.kv_cache_groups
        raise AttributeError(name)

    # ------------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N*num_image_tokens, text_H]."""
        vw = params["vision"]
        n = pixel_values.shape[0]
        D = self.v_dim
        g, p = self.grid, self.patch
        x = pixel_values.astype(jnp.float32).reshape(
            n, 3, g, p, g, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(n, g * g,
                                                  3 * p * p)
        x = x @ vw["patch_embed"].astype(jnp.float32)
        pos = vw["pos_embed"].astype(jnp.float32)[0]
        src = self.native_grid
        if src != g:
            pos = jax.image.resize(pos.reshape(src, src, D),
                                   (g, g, D),
                                   method="bilinear").reshape(
                                       g * g, D)
        x = x + pos[None]
        cls = jnp.broadcast_to(vw["cls"].astype(x.dtype)[None],
                               (n, self.skip, D))
        x = jnp.concatenate([cls, x], axis=1)
        for li in range(self.v_layers):
            w = jax.tree.map(lambda a, li=li: a[li], vw["layers"])
            t_ = x.shape[1]
            h = layer_norm(x, w["norm1"], w["norm1_bias"],
                           self.v_eps)
            qkv = (h @ w["qkv"] + w["qkv_bias"]).reshape(
                n, t_, 3, self.v_heads, self.v_dh)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_dh**-0.5)
            pr = jax.nn.softmax(s.astype(jnp.float32),
                                axis=-1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", pr, v).reshape(
                n, t_, D)
            x = x + (o @ w["proj"] + w["proj_bias"])
            h = layer_norm(x, w["norm2"], w["norm2_bias"],
                           self.v_eps)
            h = jax.nn.gelu(h @ w["fc1"] + w["fc1_bias"],
                            approximate=False)
            x = x + (h @ w["fc2"] + w["fc2_bias"])
        x = x[:, self.skip:]
        # pixel shuffle (ps_version v2 — HF InternVLModel semantics)
        ds = self.ds
        c = self.vit_hidden
        x = x.reshape(n, g, g, c)
        x = x.reshape(n, g, g // ds, c * ds)
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(n, g // ds, g // ds, c * ds * ds)
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(n * self.num_image_tokens, c * ds * ds)
        # projector
        if self.proj_norm_rms:
            x = rms_norm(x, params["proj_norm"], 1e-5)
        else:
            x = layer_norm(x, params["proj_norm"],
                           params["proj_norm_bias"], 1e-5)
        x = x @ params["proj_fc1"]
        if self.proj_bias:
            x = x + params["proj_fc1_bias"]
        if self.proj_norm_rms:
            x = jnp.square(jax.nn.relu(x))  # ReLU^2
        else:
            x = jax.nn.gelu(x, approximate=False)
        x = x @ params["proj_fc2"]
        if self.proj_bias:
            x = x + params["proj_fc2_bias"]
        return x

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


class NemotronHNanoVLV2(LlamaNemotronVLChatModel):
    """NemotronH-Nano-VL-V2 (reference: nano_nemotron_vl.py): same
    RADIO tower, RMSNorm/ReLU^2 bias-free projector, NemotronH
    mamba2/attention hybrid decoder."""

    proj_norm_rms = True
    proj_bias = False
    default_text_arch = "NemotronHForCausalLM"
