"""ERNIE-4.5-VL MoE (baidu/ERNIE-4.5-VL-*): Qwen2-VL-style ViT +
variable-resolution resampler over an ERNIE MoE decoder with
MODALITY-ROUTED experts and a 3D rope.

Reference parity: vllm/model_executor/models/ernie45_vl.py +
ernie45_vl_moe.py + layers/rotary_embedding/ernie45_vl_rope.py.

- Vision (ernie45_vl.py:138-580): bias-free linear patch embed,
  LayerNorm (1e-6) pre-norm blocks, QuickGELU MLP, Qwen2-VL 2D rope in
  the merge-group raster, final ln — structurally Qwen2-VL's original
  tower.
- Resampler (ernie45_vl.py:666-830): spatial 2x2 concat →
  linear/gelu/linear/LayerNorm; with use_temporal_conv the single
  image timestep is duplicated to the temporal width
  (fwd_placeholder with t=1 concatenates the same rows), passed
  through the temporal MLP; then mlp → RMSNorm to the text width.
  Checkpoint keys live under model.resampler_model.* (remapped,
  :1232-1236).
- Decoder (ernie45_vl_moe.py): ERNIE MoE (softmax scores,
  bias-corrected selection, clamped renormalize) with SEPARATE text
  and vision expert banks + gates per MoE layer — vision tokens
  (input_ids == im_patch_id) route through the vision bank
  (:275-330); checkpoint experts 0..E_text-1 are text, the rest
  vision, gate.weight/gate.weight_1 are the two routers, and
  moe_statics.e_score_correction_bias is [2, E] (:646-705).
- 3D rope (ernie45_vl_rope.py): head_dim/2 frequencies split
  [h w h w ... | t x freq_allocation] — pair j < hd/2-F rotates by
  the h (even j) or w (odd j) position at freq j, the last F pairs by
  the t position — applied INTERLEAVED (is_neox_style=False). Text
  positions have t == h == w, reproducing the plain interleaved rope
  of the text-only ERNIE.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.activation import silu_and_mul
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.moe import moe_apply
from vllm_main_modify_tpu.layers.normalization import (layer_norm,
                                                       rms_norm)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.moe_v3 import (Ernie4_5_MoeForCausalLM,
                                                _texpert)


class Ernie45VLTextModel(Ernie4_5_MoeForCausalLM):
    """ERNIE MoE decoder + modality expert banks + 3D rope."""

    uses_mrope = True

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        # normalize the VL config's per-modality lists for the base
        def first(v):
            return v[0] if isinstance(v, (list, tuple)) else v

        self._E_list = getattr(hf, "moe_num_experts", 0)
        hf.moe_num_experts = first(self._E_list)
        hf.moe_intermediate_size = first(
            getattr(hf, "moe_intermediate_size", None)
            or hf.intermediate_size)
        hf.moe_layer_start_index = first(
            getattr(hf, "moe_layer_start_index", 0))
        mle = getattr(hf, "moe_layer_end_index", None)
        if mle is not None:
            hf.moe_layer_end_index = first(mle)
        super().__init__(config)
        self.freq_allocation = int(getattr(hf, "freq_allocation", 20))
        self.im_patch_id = int(getattr(hf, "im_patch_id", -1))

    # e_score_correction_bias ships [2, E]: row 0 text, row 1 vision
    e_score_key = "mlp.moe_statics.e_score_correction_bias"

    def param_specs(self):
        specs = super().param_specs()
        E, H, mi = self.E, self.hidden, self.moe_inter
        for s in specs:
            if s.path == "moe.e_score_bias":
                s.transform = lambda x: np.ascontiguousarray(
                    x.reshape(2, -1)[0])

        def stk(path, shape, spec, hf_key, transform=transpose2d,
                experts=0, expert_offset=0):
            return ParamSpec(f"moe.{path}", (len(self.moe_ids),
                                             *shape), spec,
                             "model.layers.{i}." + hf_key,
                             stacked=True,
                             layer_ids=tuple(self.moe_ids),
                             num_experts=experts,
                             expert_offset=expert_offset,
                             transform=transform)

        if self.moe_ids:
            specs += [
                stk("router_v", (H, E), P(None, None, None),
                    "mlp.gate.weight_1"),
                stk("e_score_bias_v", (E, ), P(None, None),
                    self.e_score_key,
                    transform=lambda x: np.ascontiguousarray(
                        x.reshape(2, -1)[1])),
                stk("w_gate_v", (E, H, mi), P(None, None, None,
                                              "model"),
                    "mlp.experts.{e}.gate_proj.weight", experts=E,
                    expert_offset=E, transform=_texpert),
                stk("w_up_v", (E, H, mi), P(None, None, None,
                                            "model"),
                    "mlp.experts.{e}.up_proj.weight", experts=E,
                    expert_offset=E, transform=_texpert),
                stk("w_down_v", (E, mi, H), P(None, None, "model",
                                              None),
                    "mlp.experts.{e}.down_proj.weight", experts=E,
                    expert_offset=E, transform=_texpert),
            ]
        return specs

    def _rope(self, q, k, positions):
        """ERNIE 3D rope (see module docstring)."""
        if positions.ndim == 1:
            positions = jnp.broadcast_to(positions[None],
                                         (3, positions.shape[0]))
        hd2 = self.head_dim // 2
        F = self.freq_allocation
        inv = 1.0 / (self.cfg.rope_theta**(
            np.arange(hd2, dtype=np.float64) * 2.0 / self.head_dim))
        axis = np.empty(hd2, np.int32)
        axis[:hd2 - F:2] = 1  # h
        axis[1:hd2 - F:2] = 2  # w
        axis[hd2 - F:] = 0  # t
        pos_sel = positions[jnp.asarray(axis)]  # [hd2, T]
        ang = pos_sel.T.astype(jnp.float32) * \
            jnp.asarray(inv, jnp.float32)[None]  # [T, hd2]
        cos = jnp.cos(ang)[:, None, :]
        sin = jnp.sin(ang)[:, None, :]

        def rot(x):  # interleaved pairs (is_neox_style=False)
            xr = x.astype(jnp.float32).reshape(*x.shape[:-1], hd2, 2)
            re, im = xr[..., 0], xr[..., 1]
            return jnp.stack(
                [re * cos - im * sin, re * sin + im * cos],
                axis=-1).reshape(x.shape).astype(x.dtype)

        return rot(q), rot(k)

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None,
                 visual_mask: Optional[jax.Array] = None):
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        layers = params["layers"]

        def idx_map(ids):
            m = np.zeros(self.L, dtype=np.int32)
            for i, l in enumerate(ids):
                m[l] = i
            return jnp.asarray(m)

        dense_map = idx_map(self.dense_ids)
        moe_map = idx_map(self.moe_ids)
        is_moe = jnp.asarray(
            [l in set(self.moe_ids) for l in range(self.L)], bool)

        def pick(group, gl):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, gl, 0, keepdims=False), params[group])

        def route_softmax(h, router, bias):
            logits = h.astype(jnp.float32) @ router.astype(
                jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            choice = probs + bias.astype(jnp.float32)[None, :]
            _, experts = jax.lax.top_k(choice, self.top_k)
            weights = jnp.take_along_axis(probs, experts, axis=1)
            weights = weights / jnp.maximum(
                weights.sum(axis=-1, keepdims=True), self.norm_min)
            return weights, experts

        def dense_branch(l, h):
            w = pick("dense", dense_map[l])
            return silu_and_mul(h @ w["gate_proj"],
                                h @ w["up_proj"]) @ w["down_proj"]

        def moe_branch(l, h):
            w = pick("moe", moe_map[l])
            tw, te = route_softmax(h, w["router"], w["e_score_bias"])
            y = moe_apply(h, tw, te, w["w_gate"], w["w_up"],
                          w["w_down"], silu_and_mul)
            if visual_mask is not None:
                vw, ve = route_softmax(h, w["router_v"],
                                       w["e_score_bias_v"])
                yv = moe_apply(h, vw, ve, w["w_gate_v"], w["w_up_v"],
                               w["w_down_v"], silu_and_mul)
                y = jnp.where(visual_mask[:, None], yv, y)
            if "shared_gate" in w:
                y = y + silu_and_mul(h @ w["shared_gate"],
                                     h @ w["shared_up"]) @ \
                    w["shared_down"]
            return y

        def layer_fn(l, carry):
            x, kv_caches = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = rms_norm(x, w["input_layernorm"], self.eps)
            q = h @ w["q_proj"]
            k = h @ w["k_proj"]
            v = h @ w["v_proj"]
            if self.qkv_bias:
                q, k, v = q + w["q_bias"], k + w["k_bias"], \
                    v + w["v_bias"]
            q = q.reshape(t, self.num_q, self.head_dim)
            k = k.reshape(t, self.num_kv, self.head_dim)
            v = v.reshape(t, self.num_kv, self.head_dim)
            q, k = self._rope(q, k, positions)
            o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                     self.sm_scale,
                                     use_pallas=use_pallas)
            x = res + o.reshape(t, -1) @ w["o_proj"]

            res = x
            h = rms_norm(x, w["post_attention_layernorm"], self.eps)
            if not self.dense_ids:
                y = moe_branch(l, h)
            elif not self.moe_ids:
                y = dense_branch(l, h)
            else:
                y = jax.lax.cond(is_moe[l], moe_branch, dense_branch,
                                 l, h)
            return res + y, kv_caches

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, kv_caches


class Ernie4_5_VLMoeForConditionalGeneration:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        g = lambda c, k, d=None: (c.get(k, d) if isinstance(c, dict)
                                  else getattr(c, k, d))
        self.v_hidden = int(g(vc, "embed_dim", 1280))
        self.v_layers = int(g(vc, "depth", 32))
        self.v_heads = int(g(vc, "num_heads", 16))
        self.v_dh = self.v_hidden // self.v_heads
        self.v_inter = int(self.v_hidden *
                           float(g(vc, "mlp_ratio", 4)))
        self.patch = int(g(vc, "patch_size", 14))
        self.merge = int(g(vc, "spatial_merge_size", 2))
        self.pixel_hidden = int(getattr(hf, "pixel_hidden_size",
                                        self.v_hidden))
        self.sconv = int(getattr(hf, "spatial_conv_size", 2))
        self.tconv = int(getattr(hf, "temporal_conv_size", 2))
        self.use_temporal = bool(getattr(hf, "use_temporal_conv",
                                         True))
        self.image_size = int(config.mm_image_size or 448)
        self.grid = self.image_size // self.patch
        assert self.grid % max(self.merge, self.sconv) == 0

        text_cfg = replace(config, is_multimodal=False)
        text_cfg.architecture = "Ernie45VLTextModel"
        self.language_model = Ernie45VLTextModel(text_cfg)
        self.n_embed = config.hidden_size
        self.uses_mrope = True

    def param_specs(self) -> list[ParamSpec]:
        D, I = self.v_hidden, self.v_inter
        t = transpose2d
        VP = "vision_model."
        RS = "model.resampler_model."
        sd = self.pixel_hidden * self.sconv * self.sconv

        def vstk(path, shape, hf_key, transform=t):
            return ParamSpec(
                f"vision.layers.{path}", (self.v_layers, *shape),
                P(*([None] * (len(shape) + 1))),
                VP + "blocks.{i}." + hf_key, stacked=True,
                transform=transform)

        specs = [
            ParamSpec("vision.patch_embed",
                      (3 * self.patch**2, D), P(None, None),
                      VP + "patch_embed.proj.weight", transform=t),
            ParamSpec("vision.ln", (D, ), P(), VP + "ln.weight",
                      transform=None),
            ParamSpec("vision.ln_bias", (D, ), P(), VP + "ln.bias",
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
            # resampler
            ParamSpec("resampler.sp1", (sd, sd), P(None, None),
                      RS + "spatial_linear1.weight", transform=t),
            ParamSpec("resampler.sp1_bias", (sd, ), P(),
                      RS + "spatial_linear1.bias", transform=None),
            ParamSpec("resampler.sp2", (sd, sd), P(None, None),
                      RS + "spatial_linear2.weight", transform=t),
            ParamSpec("resampler.sp2_bias", (sd, ), P(),
                      RS + "spatial_linear2.bias", transform=None),
            ParamSpec("resampler.sp_norm", (sd, ), P(),
                      RS + "spatial_norm.weight", transform=None),
            ParamSpec("resampler.sp_norm_bias", (sd, ), P(),
                      RS + "spatial_norm.bias", transform=None),
            ParamSpec("resampler.mlp", (sd, self.n_embed),
                      P(None, None), RS + "mlp.weight", transform=t),
            ParamSpec("resampler.mlp_bias", (self.n_embed, ), P(),
                      RS + "mlp.bias", transform=None),
            ParamSpec("resampler.after_norm", (self.n_embed, ), P(),
                      RS + "after_norm.weight", transform=None),
        ]
        if self.use_temporal:
            td = sd * self.tconv
            specs += [
                ParamSpec("resampler.tp1", (td, sd), P(None, None),
                          RS + "temporal_linear1.weight",
                          transform=t),
                ParamSpec("resampler.tp1_bias", (sd, ), P(),
                          RS + "temporal_linear1.bias",
                          transform=None),
                ParamSpec("resampler.tp2", (sd, sd), P(None, None),
                          RS + "temporal_linear2.weight",
                          transform=t),
                ParamSpec("resampler.tp2_bias", (sd, ), P(),
                          RS + "temporal_linear2.bias",
                          transform=None),
                ParamSpec("resampler.tp_norm", (sd, ), P(),
                          RS + "temporal_norm.weight",
                          transform=None),
                ParamSpec("resampler.tp_norm_bias", (sd, ), P(),
                          RS + "temporal_norm.bias", transform=None),
            ]
        specs += self.language_model.param_specs()
        return specs

    def kv_cache_spec(self):
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N*(grid/sconv)^2, text_H]."""
        vw = params["vision"]
        n = pixel_values.shape[0]
        D = self.v_hidden
        g, m = self.grid, self.merge
        # patchify row-major then reorder to the merge-group raster
        p = self.patch
        x = pixel_values.astype(jnp.float32).reshape(
            n, 3, g, p, g, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(n, g * g,
                                                  3 * p * p)
        idx = np.arange(g * g).reshape(g // m, m, g // m,
                                       m).transpose(0, 2, 1,
                                                    3).reshape(-1)
        x = x[:, jnp.asarray(idx)]
        x = x @ vw["patch_embed"].astype(jnp.float32)

        hh = (np.arange(g)[:, None] *
              np.ones(g, np.int32)[None]).reshape(-1)[idx]
        ww = (np.ones(g, np.int32)[:, None] *
              np.arange(g)[None]).reshape(-1)[idx]
        half = self.v_dh // 4
        inv_freq = 1.0 / (10000.0**(
            np.arange(0, self.v_dh // 2, 2, dtype=np.float64) /
            (self.v_dh // 2)))
        angles = np.concatenate([
            hh[:, None] * inv_freq[None, :half],
            ww[:, None] * inv_freq[None, :half],
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
            h = layer_norm(x, w["norm1"], w["norm1_bias"], 1e-6)
            t_ = h.shape[1]
            qkv = (h @ w["qkv"] + w["qkv_bias"]).reshape(
                n, t_, 3, self.v_heads, self.v_dh)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q, k = rot(q), rot(k)
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_dh**-0.5)
            pr = jax.nn.softmax(s.astype(jnp.float32),
                                axis=-1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", pr, v).reshape(
                n, t_, D)
            x = x + (o @ w["proj"] + w["proj_bias"])
            h = layer_norm(x, w["norm2"], w["norm2_bias"], 1e-6)
            h = (h @ w["fc1"] + w["fc1_bias"])
            h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu
            x = x + (h @ w["fc2"] + w["fc2_bias"])
        x = layer_norm(x, vw["ln"], vw["ln_bias"], 1e-6)

        # resampler (module docstring): spatial concat of sconv^2
        # consecutive tokens (merge raster → spatial blocks)
        rw = params["resampler"]
        x = x.reshape(-1, D * self.sconv * self.sconv)
        x = x @ rw["sp1"] + rw["sp1_bias"]
        x = jax.nn.gelu(x, approximate=False)
        x = x @ rw["sp2"] + rw["sp2_bias"]
        x = layer_norm(x, rw["sp_norm"], rw["sp_norm_bias"], 1e-6)
        if self.use_temporal:
            # t=1 image: the same timestep duplicated to temporal
            # width (fwd_placeholder)
            x = jnp.concatenate([x, x], axis=-1)
            x = x @ rw["tp1"] + rw["tp1_bias"]
            x = jax.nn.gelu(x, approximate=False)
            x = x @ rw["tp2"] + rw["tp2_bias"]
            x = layer_norm(x, rw["tp_norm"], rw["tp_norm_bias"],
                           1e-6)
        x = x @ rw["mlp"] + rw["mlp_bias"]
        return rms_norm(x, rw["after_norm"],
                        getattr(self.cfg.hf_config, "rms_norm_eps",
                                1e-6))

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        visual_mask = None
        if mm_embeds is not None:
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds.astype(x.dtype), mode="drop")
            visual_mask = input_ids == \
                self.language_model.im_patch_id
        return self.language_model(params, input_ids, positions,
                                   kv_caches, attn_meta,
                                   use_pallas=use_pallas,
                                   inputs_embeds=x,
                                   visual_mask=visual_mask)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(params, hidden)
