"""Aria (AriaForConditionalGeneration).

Reference: vllm/model_executor/models/aria.py — Idefics3-style SigLIP
vision tower → AriaProjector (learned queries cross-attending the
patch embeddings through a double-projected attention: q/k/v_proj then
a torch ``nn.MultiheadAttention`` in/out projection — the quirk is
faithful to the checkpoint) → MoE decoder (llama attention + grouped
experts with a FUSED fc1 = [proj | gate], silu(proj)·gate, plus
ungated shared experts).

TPU design: the text model rides MoeDecoderBase (ragged_dot MoE path)
with fused-tensor slicing at load; vision + projector run in the
jitted image encoder at the canonical resolution.
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
from vllm_main_modify_tpu.models.moe_llama import MoeDecoderBase

VP = "vision_tower."
PP = "multi_modal_projector."


def _fc1_slice(lo, hi):
    """Aria expert tensors are already [E, in, out]; fc1 fuses
    [proj | gate] along OUT."""

    def f(x):
        return np.ascontiguousarray(x[:, :, lo:hi])

    return f


class AriaTextForCausalLM(MoeDecoderBase):
    """Reference: aria.py AriaTextModel — mixtral-style top-k softmax
    (renormalize) + fused grouped experts + ungated shared experts."""

    renormalize = True
    has_shared_expert = True

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        config.num_experts = getattr(hf, "moe_num_experts", 8)
        config.num_experts_per_tok = getattr(hf, "moe_topk", 2)
        # Aria experts use intermediate_size (moe_intermediate_size
        # does not exist in AriaTextConfig)
        config.moe_intermediate_size = hf.intermediate_size
        config.shared_expert_intermediate_size = hf.intermediate_size
        super().__init__(config)

    def param_specs(self) -> list[ParamSpec]:
        mi = self.moe_inter
        specs = super().param_specs()
        base = "model.layers.{i}.mlp."
        remap = {
            "layers.router": (base + "router.weight", transpose2d),
            "layers.w_gate": (base + "experts.fc1.weight",
                              _fc1_slice(0, mi)),
            "layers.w_up": (base + "experts.fc1.weight",
                            _fc1_slice(mi, 2 * mi)),
            "layers.w_down": (base + "experts.fc2.weight",
                              lambda x: np.ascontiguousarray(x)),
            "layers.shared_gate_proj": (
                base + "shared_experts.gate_proj.weight", transpose2d),
            "layers.shared_up_proj": (
                base + "shared_experts.up_proj.weight", transpose2d),
            "layers.shared_down_proj": (
                base + "shared_experts.down_proj.weight", transpose2d),
        }
        out = []
        for s in specs:
            if s.path == "layers.shared_expert_gate":
                continue  # Aria shared experts are ungated
            if s.path in remap:
                s.hf_key, s.transform = remap[s.path]
                if s.path.startswith("layers.w_"):
                    s.num_experts = 0  # fused: no {e} expansion
            out.append(s)
        return out


class AriaForConditionalGeneration:

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
        p2q = {int(k): int(v) for k, v in
               dict(hf.projector_patch_to_query_dict).items()}
        self.max_query = max(p2q.values())
        self.num_query = int(p2q[self.num_patches])

        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = "AriaTextForCausalLM"
        self.language_model = AriaTextForCausalLM(text_cfg)
        self.text_cfg = text_cfg

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        D, I, L = self.v_hidden, self.v_inter, self.v_layers
        H = getattr(self.text_cfg.hf_config, "hidden_size", 0)
        t = transpose2d

        def vstk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"vision.layers.{path}", (L, *shape),
                             spec, VP + "encoder.layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        def proj(path, shape, hf_key, transform=t):
            return ParamSpec(f"projector.{path}", shape,
                             P(*([None] * len(shape))), PP + hf_key,
                             transform=transform)

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
            proj("query", (self.max_query, D), "query",
                 transform=None),
            proj("q_proj", (D, D), "cross_attn.q_proj.weight"),
            proj("k_proj", (D, D), "cross_attn.k_proj.weight"),
            proj("v_proj", (D, D), "cross_attn.v_proj.weight"),
            proj("in_proj", (3 * D, D),
                 "cross_attn.multihead_attn.in_proj_weight",
                 transform=None),
            proj("in_proj_bias", (3 * D, ),
                 "cross_attn.multihead_attn.in_proj_bias",
                 transform=None),
            proj("attn_out", (D, D),
                 "cross_attn.multihead_attn.out_proj.weight"),
            proj("attn_out_bias", (D, ),
                 "cross_attn.multihead_attn.out_proj.bias",
                 transform=None),
            proj("linear", (D, D), "cross_attn.linear.weight"),
            proj("linear_bias", (D, ), "cross_attn.linear.bias",
                 transform=None),
            proj("ln_q", (D, ), "cross_attn.layer_norm.weight",
                 transform=None),
            proj("ln_q_bias", (D, ), "cross_attn.layer_norm.bias",
                 transform=None),
            proj("ln_kv", (D, ), "cross_attn.layer_norm_kv.weight",
                 transform=None),
            proj("ln_kv_bias", (D, ), "cross_attn.layer_norm_kv.bias",
                 transform=None),
            proj("ln_ff", (D, ), "layer_norm.weight", transform=None),
            proj("ln_ff_bias", (D, ), "layer_norm.bias",
                 transform=None),
            proj("ff_in", (D, H), "feed_forward.linear_in.weight"),
            proj("ff_out", (H, H), "feed_forward.linear_out.weight"),
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
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def _vision(self, params, pixel_values: jax.Array) -> jax.Array:
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
        return layer_norm(x, v["post_norm"], v["post_norm_bias"],
                          self.v_eps)

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N, num_query, H_text] (AriaProjector)."""
        pr = params["projector"]
        img = self._vision(params, pixel_values)  # [N, P, D]
        n = img.shape[0]
        d, heads = self.v_hidden, self.v_heads
        hd = d // heads
        qt = jnp.broadcast_to(
            pr["query"][: self.num_query].astype(jnp.float32),
            (n, self.num_query, d))
        q1 = layer_norm(qt, pr["ln_q"], pr["ln_q_bias"],
                        1e-5) @ pr["q_proj"]
        kv = layer_norm(img, pr["ln_kv"], pr["ln_kv_bias"], 1e-5)
        k1 = kv @ pr["k_proj"]
        v1 = kv @ pr["v_proj"]
        # torch nn.MultiheadAttention: its OWN in/out projections on
        # top of the q/k/v projections above (checkpoint quirk)
        wi = pr["in_proj"].astype(jnp.float32)
        bi = pr["in_proj_bias"].astype(jnp.float32)
        q2 = q1 @ wi[:d].T + bi[:d]
        k2 = k1 @ wi[d:2 * d].T + bi[d:2 * d]
        v2 = v1 @ wi[2 * d:].T + bi[2 * d:]
        q2 = q2.reshape(n, -1, heads, hd)
        k2 = k2.reshape(n, -1, heads, hd)
        v2 = v2.reshape(n, -1, heads, hd)
        s = jnp.einsum("nqhd,nkhd->nhqk", q2, k2) * (hd**-0.5)
        p_ = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("nhqk,nkhd->nqhd", p_, v2).reshape(
            n, self.num_query, d)
        o = o @ pr["attn_out"] + pr["attn_out_bias"]
        o = o @ pr["linear"] + pr["linear_bias"]
        h = layer_norm(o, pr["ln_ff"], pr["ln_ff_bias"], 1e-5)
        h = jax.nn.gelu(h @ pr["ff_in"], approximate=True)
        return h @ pr["ff_out"]

    # ------------------------------------------------------------------

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
