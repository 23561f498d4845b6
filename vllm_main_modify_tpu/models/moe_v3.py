"""Standard-attention decoders with DeepSeek-V3-style MoE:
GLM-4.5 (Glm4Moe), dots.llm1 (Dots1), ERNIE 4.5 MoE.

Reference parity: vllm/model_executor/models/{glm4_moe.py, dots1.py,
ernie45_moe.py}. All three pair plain GQA attention (no MLA) with the
V3 routing recipe — a correction bias that shifts scores for
*selection only*, grouped top-k, shared experts added unscaled, and a
routed_scaling_factor on the routed output:

- Glm4Moe / Dots1: sigmoid scores (HF Glm4MoeTopkRouter /
  Dots1TopkRouter == layers/moe.py deepseek_v3_routing), per-head RMS
  q/k norm (Dots1 always, GLM behind ``use_qk_norm``), GLM partial
  rotary 0.5;
- Ernie 4.5 MoE: softmax scores, bias-corrected selection, weights
  renormalized with a ``moe_norm_min`` clamp (HF
  Ernie4_5_MoeSparseMoeBlock), dense layers before
  ``moe_layer_start_index`` and off the ``moe_layer_interval`` grid.

TPU-native: dense and MoE layers carry separate stacked param groups
(ParamSpec.layer_ids) under one ``lax.fori_loop`` with a
``lax.cond`` dispatch — one compiled body per kind.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.activation import silu_and_mul
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.moe import (deepseek_v3_routing,
                                             moe_apply)
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope_interleaved,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.gpt_neox import apply_rope_partial
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d


def _texpert(x):
    return np.ascontiguousarray(x.T)


class _V3MoeDecoder:
    """Class-attr deltas per family (see subclasses)."""

    scoring = "sigmoid"  # sigmoid (v3) | softmax (ernie)
    qk_norm = False  # per-head RMS on q/k
    rope_interleaved = False  # ernie rotate-pairs convention
    full_bias = False  # ernie use_bias: biases on o/mlp/experts too
    e_score_key = "mlp.gate.e_score_correction_bias"

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self.hidden = config.hidden_size
        self.inter = config.intermediate_size
        self.L = config.num_layers
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = config.head_dim
        self.sm_scale = self.head_dim**-0.5
        self.eps = g("rms_norm_eps", 1e-5)
        self.rot_dim = int(self.head_dim *
                           (g("partial_rotary_factor", None) or 1.0))
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.rot_dim, config.rope_theta,
                             config.rope_scaling))
        use_bias = bool(g("use_bias", False))
        self.qkv_bias = bool(g("attention_bias", False)) or use_bias
        self.full_bias = self.full_bias and use_bias
        if self.qk_norm is None:  # GLM: config-driven
            self.qk_norm = bool(g("use_qk_norm", False))
        self.E = g("n_routed_experts", None) or g("moe_num_experts", 0)
        self.top_k = g("num_experts_per_tok", None) or g("moe_k", 2)
        self.moe_inter = g("moe_intermediate_size", self.inter)
        n_sh = g("n_shared_experts", None)
        if n_sh is None:
            n_sh = g("moe_num_shared_experts", 0)
        self.shared_inter = self.moe_inter * int(n_sh or 0)
        self.n_group = g("n_group", 1) or 1
        self.topk_group = g("topk_group", 1) or 1
        self.renormalize = bool(g("norm_topk_prob", True))
        self.routed_scaling = float(g("routed_scaling_factor", 1.0)
                                    or 1.0)
        self.norm_min = float(g("moe_norm_min", 1e-20) or 1e-20)
        self.moe_ids = tuple(self._moe_layer_ids(hf))
        self.dense_ids = tuple(l for l in range(self.L)
                               if l not in set(self.moe_ids))
        self.tie_embeddings = config.tie_word_embeddings

    def _moe_layer_ids(self, hf) -> list[int]:
        first = getattr(hf, "first_k_dense_replace", None)
        if first is not None:
            return list(range(first, self.L))
        start = getattr(hf, "moe_layer_start_index", 0)
        interval = getattr(hf, "moe_layer_interval", 1) or 1
        end = getattr(hf, "moe_layer_end_index", self.L - 1)
        return [l for l in range(self.L)
                if start <= l <= end and (l - start) % interval == 0]

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V, I, E = self.hidden, c.vocab_size, self.inter, self.E
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        mi, si = self.moe_inter, self.shared_inter
        t = transpose2d

        def stk(group, ids, path, shape, spec, hf_key, transform=t,
                experts=0):
            return ParamSpec(f"{group}.{path}", (len(ids), *shape),
                             spec, "model.layers.{i}." + hf_key,
                             stacked=True, layer_ids=tuple(ids),
                             num_experts=experts, transform=transform)

        all_ids = tuple(range(self.L))
        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
            stk("layers", all_ids, "input_layernorm", (H, ),
                P(None, None), "input_layernorm.weight",
                transform=None),
            stk("layers", all_ids, "post_attention_layernorm", (H, ),
                P(None, None), "post_attention_layernorm.weight",
                transform=None),
            stk("layers", all_ids, "q_proj", (H, qd),
                P(None, None, "model"), "self_attn.q_proj.weight"),
            stk("layers", all_ids, "k_proj", (H, kd),
                P(None, None, "model"), "self_attn.k_proj.weight"),
            stk("layers", all_ids, "v_proj", (H, kd),
                P(None, None, "model"), "self_attn.v_proj.weight"),
            stk("layers", all_ids, "o_proj", (qd, H),
                P(None, "model", None), "self_attn.o_proj.weight"),
        ]
        if not self.tie_embeddings:
            specs.append(ParamSpec("lm_head", (H, V), P(None, "model"),
                                   "lm_head.weight", transform=t))
        if self.qkv_bias:
            for n, width in (("q", qd), ("k", kd), ("v", kd)):
                specs.append(
                    stk("layers", all_ids, f"{n}_bias", (width, ),
                        P(None, "model"),
                        f"self_attn.{n}_proj.bias", transform=None))
        if self.qk_norm:
            specs += [
                stk("layers", all_ids, "q_norm", (self.head_dim, ),
                    P(None, None), "self_attn.q_norm.weight",
                    transform=None),
                stk("layers", all_ids, "k_norm", (self.head_dim, ),
                    P(None, None), "self_attn.k_norm.weight",
                    transform=None),
            ]
        if self.full_bias:
            specs.append(
                stk("layers", all_ids, "o_bias", (H, ), P(None, None),
                    "self_attn.o_proj.bias", transform=None))
        if self.dense_ids:
            specs += [
                stk("dense", self.dense_ids, "gate_proj", (H, I),
                    P(None, None, "model"), "mlp.gate_proj.weight"),
                stk("dense", self.dense_ids, "up_proj", (H, I),
                    P(None, None, "model"), "mlp.up_proj.weight"),
                stk("dense", self.dense_ids, "down_proj", (I, H),
                    P(None, "model", None), "mlp.down_proj.weight"),
            ]
            if self.full_bias:
                specs += [
                    stk("dense", self.dense_ids, "gate_bias", (I, ),
                        P(None, "model"), "mlp.gate_proj.bias",
                        transform=None),
                    stk("dense", self.dense_ids, "up_bias", (I, ),
                        P(None, "model"), "mlp.up_proj.bias",
                        transform=None),
                    stk("dense", self.dense_ids, "down_bias", (H, ),
                        P(None, None), "mlp.down_proj.bias",
                        transform=None),
                ]
        if self.moe_ids:
            specs += [
                stk("moe", self.moe_ids, "router", (H, E),
                    P(None, None, None), "mlp.gate.weight"),
                stk("moe", self.moe_ids, "e_score_bias", (E, ),
                    P(None, None), self.e_score_key,
                    transform=lambda x: np.ascontiguousarray(
                        x.reshape(-1))),
                stk("moe", self.moe_ids, "w_gate", (E, H, mi),
                    P(None, None, None, "model"),
                    "mlp.experts.{e}.gate_proj.weight", experts=E,
                    transform=_texpert),
                stk("moe", self.moe_ids, "w_up", (E, H, mi),
                    P(None, None, None, "model"),
                    "mlp.experts.{e}.up_proj.weight", experts=E,
                    transform=_texpert),
                stk("moe", self.moe_ids, "w_down", (E, mi, H),
                    P(None, None, "model", None),
                    "mlp.experts.{e}.down_proj.weight", experts=E,
                    transform=_texpert),
            ]
            if self.full_bias:
                specs += [
                    stk("moe", self.moe_ids, "b_gate", (E, mi),
                        P(None, None, "model"),
                        "mlp.experts.{e}.gate_proj.bias", experts=E,
                        transform=None),
                    stk("moe", self.moe_ids, "b_up", (E, mi),
                        P(None, None, "model"),
                        "mlp.experts.{e}.up_proj.bias", experts=E,
                        transform=None),
                    stk("moe", self.moe_ids, "b_down", (E, H),
                        P(None, None, None),
                        "mlp.experts.{e}.down_proj.bias", experts=E,
                        transform=None),
                ]
            if si:
                specs += [
                    stk("moe", self.moe_ids, "shared_gate", (H, si),
                        P(None, None, "model"),
                        "mlp.shared_experts.gate_proj.weight"),
                    stk("moe", self.moe_ids, "shared_up", (H, si),
                        P(None, None, "model"),
                        "mlp.shared_experts.up_proj.weight"),
                    stk("moe", self.moe_ids, "shared_down", (si, H),
                        P(None, "model", None),
                        "mlp.shared_experts.down_proj.weight"),
                ]
                if self.full_bias:
                    specs += [
                        stk("moe", self.moe_ids, "shared_gate_bias",
                            (si, ), P(None, "model"),
                            "mlp.shared_experts.gate_proj.bias",
                            transform=None),
                        stk("moe", self.moe_ids, "shared_up_bias",
                            (si, ), P(None, "model"),
                            "mlp.shared_experts.up_proj.bias",
                            transform=None),
                        stk("moe", self.moe_ids, "shared_down_bias",
                            (H, ), P(None, None),
                            "mlp.shared_experts.down_proj.bias",
                            transform=None),
                    ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    def _rope(self, q, k, positions):
        if self.rope_interleaved:
            return apply_rope_interleaved(q, k, positions,
                                          self.inv_freq)
        return apply_rope_partial(q, k, positions, self.inv_freq,
                                  self.rot_dim)

    # ------------------------------------------------------------------

    def _route(self, h, w):
        """(weights, experts) per family scoring."""
        if self.scoring == "sigmoid":
            return deepseek_v3_routing(
                h, w["router"], w["e_score_bias"], self.top_k,
                self.n_group, self.topk_group, self.renormalize,
                self.routed_scaling)
        # ernie softmax: selection on bias-corrected softmax, weights
        # from the unbiased softmax, clamp-renormalized
        logits = h.astype(jnp.float32) @ w["router"].astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        choice = probs + w["e_score_bias"].astype(jnp.float32)[None, :]
        _, experts = jax.lax.top_k(choice, self.top_k)
        weights = jnp.take_along_axis(probs, experts, axis=1)
        weights = weights / jnp.maximum(
            weights.sum(axis=-1, keepdims=True), self.norm_min)
        return weights * self.routed_scaling, experts

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
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

        def dense_branch(l, h):
            w = pick("dense", dense_map[l])
            gate, up = h @ w["gate_proj"], h @ w["up_proj"]
            if "gate_bias" in w:
                gate, up = gate + w["gate_bias"], up + w["up_bias"]
            y = silu_and_mul(gate, up) @ w["down_proj"]
            if "down_bias" in w:
                y = y + w["down_bias"]
            return y

        def moe_branch(l, h):
            w = pick("moe", moe_map[l])
            weights, experts = self._route(h, w)
            eb = (w["b_gate"], w["b_up"], w["b_down"]) \
                if "b_gate" in w else None
            y = moe_apply(h, weights, experts, w["w_gate"], w["w_up"],
                          w["w_down"], silu_and_mul, biases=eb)
            if "shared_gate" in w:
                sg, su = h @ w["shared_gate"], h @ w["shared_up"]
                if "shared_gate_bias" in w:
                    sg = sg + w["shared_gate_bias"]
                    su = su + w["shared_up_bias"]
                sh = silu_and_mul(sg, su) @ w["shared_down"]
                if "shared_down_bias" in w:
                    sh = sh + w["shared_down_bias"]
                y = y + sh
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
            if self.qk_norm:
                q = rms_norm(q, w["q_norm"], self.eps)
                k = rms_norm(k, w["k_norm"], self.eps)
            q, k = self._rope(q, k, positions)
            o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                     self.sm_scale,
                                     use_pallas=use_pallas)
            attn_out = o.reshape(t, -1) @ w["o_proj"]
            if "o_bias" in w:
                attn_out = attn_out + w["o_bias"]
            x = res + attn_out

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

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)


class Glm4MoeForCausalLM(_V3MoeDecoder):
    """GLM-4.5 family (reference: glm4_moe.py): sigmoid V3 routing,
    partial rotary 0.5, optional per-head qk RMS norm
    (``use_qk_norm``)."""

    scoring = "sigmoid"
    qk_norm = None  # from config use_qk_norm


class Dots1ForCausalLM(_V3MoeDecoder):
    """dots.llm1 (reference: dots1.py): sigmoid V3 routing, per-head
    qk RMS norm always on, full rotary."""

    scoring = "sigmoid"
    qk_norm = True


class Ernie4_5_MoeForCausalLM(_V3MoeDecoder):
    """ERNIE 4.5 MoE (reference: ernie45_moe.py): softmax scores with
    bias-corrected selection (moe_statics), clamp-renormalized
    weights, moe_layer_start_index/interval layer grid, tied
    embeddings, qkv bias behind ``use_bias``."""

    scoring = "softmax"
    qk_norm = False
    rope_interleaved = True
    full_bias = True  # active only when config use_bias is set
    e_score_key = "mlp.moe_statics.e_score_correction_bias"
