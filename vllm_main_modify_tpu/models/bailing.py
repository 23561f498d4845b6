"""Bailing / Ling MoE (BailingMoeForCausalLM, BailingMoeV2ForCausalLM).

Reference: vllm/model_executor/models/bailing_moe.py — DeepSeek-style
MoE decoder with family-specific wiring:
- fused ``attention.query_key_value`` projection (optional bias via
  use_bias/use_qkv_bias), output ``attention.dense`` (bias: use_bias);
- optional per-head q/k norm (RMS at rms_norm_eps, or LayerNorm at
  1e-6 when use_rmsnorm is false) BEFORE rope (bailing_moe.py:155-162);
- partial rotary via ``rotary_dim`` / ``partial_rotary_factor``;
- dense SwiGLU MLP for layers < first_k_dense_replace
  (``mlp.gate_up_proj`` fused key), MoE elsewhere: softmax top-k
  (norm_topk_prob), or sigmoid scoring + expert bias + group-limited
  top-k (V2 'noaux_tc', same math as DeepSeek-V3), scaled by
  routed_scaling_factor, plus ungated shared experts;
- ``model.word_embeddings`` embedding key, optional norm_head
  (column-L2-normalized lm_head, bailing_moe.py:495-500).

V2 (Ling-2.0) is the same class — the config carries the deltas
(reference registers both names onto one implementation).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.activation import ACT2FN
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.moe import (deepseek_v3_routing,
                                             moe_apply, moe_ffn)
from vllm_main_modify_tpu.layers.normalization import (layer_norm,
                                                       rms_norm)
from vllm_main_modify_tpu.layers.rotary import compute_inv_freq
from vllm_main_modify_tpu.models.gpt_neox import apply_rope_partial
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.quantization.weights import matmul


def _t_slice(lo, hi):
    """Slice rows [lo, hi) of a torch [out, in] weight, then
    transpose to jax [in, out]."""

    def f(x):
        return np.ascontiguousarray(x[lo:hi].T)

    return f


def _transpose_expert(x):
    return np.ascontiguousarray(x.T)


class BailingMoeForCausalLM:
    """Covers BailingMoeForCausalLM and BailingMoeV2ForCausalLM."""

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = g("head_dim", None) or \
            config.hidden_size // self.num_q
        self.hidden = config.hidden_size
        self.inter = config.intermediate_size
        self.L = config.num_layers
        self.eps = g("rms_norm_eps", 1e-6)
        self.sm_scale = self.head_dim**-0.5
        self.E = g("num_experts", 0) or 0
        self.top_k = g("num_experts_per_tok", 2)
        self.moe_inter = g("moe_intermediate_size", self.inter)
        self.renormalize = bool(g("norm_topk_prob", False))
        self.n_shared = g("num_shared_experts", 0) or 0
        self.shared_inter = (g("moe_shared_expert_intermediate_size",
                               None) or self.moe_inter) * \
            max(self.n_shared, 1)
        self.routed_scaling = g("routed_scaling_factor", 1.0) or 1.0
        self.score_function = g("score_function", None) or "softmax"
        self.n_group = g("n_group", None)
        self.topk_group = g("topk_group", None)
        self.expert_bias = bool(g("moe_router_enable_expert_bias",
                                  False))
        self.use_qk_norm = bool(g("use_qk_norm", False))
        self.use_rmsnorm_qk = bool(g("use_rmsnorm", False))
        self.qkv_bias = bool(g("use_bias", False)
                             or g("use_qkv_bias", False))
        self.o_bias = bool(g("use_bias", False))
        self.mlp_bias = bool(g("use_bias", False))
        self.norm_head = bool(g("norm_head", False))
        self.rot_dim = g("rotary_dim", None) or int(
            self.head_dim * (g("partial_rotary_factor", 1.0) or 1.0))
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.rot_dim, config.rope_theta,
                             config.rope_scaling))
        self.act_fn = ACT2FN[g("hidden_act", "silu")]
        fkd = g("first_k_dense_replace", 0) or 0
        self.moe_ids = tuple(range(fkd, self.L)) if self.E else ()
        self.dense_ids = tuple(l for l in range(self.L)
                               if l not in set(self.moe_ids))
        self.tie_embeddings = config.tie_word_embeddings

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        L, H, V, E = self.L, self.hidden, c.vocab_size, self.E
        mi, I, si = self.moe_inter, self.inter, self.shared_inter
        t = transpose2d

        def stk(path, shape, spec, hf_key, ids=None, transform=t):
            return ParamSpec(
                path, ((L if ids is None else len(ids)), *shape),
                spec, "model.layers.{i}." + hf_key, stacked=True,
                layer_ids=(tuple(ids) if ids is not None else None),
                transform=transform)

        def lm_head_t(x):
            if self.norm_head:
                x = x / np.maximum(
                    np.linalg.norm(x, axis=0, keepdims=True), 1e-7)
            return np.ascontiguousarray(x.T)

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.word_embeddings.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
            stk("layers.input_layernorm", (H, ), P(None, None),
                "input_layernorm.weight", transform=None),
            stk("layers.post_attention_layernorm", (H, ),
                P(None, None), "post_attention_layernorm.weight",
                transform=None),
            # fused qkv, sliced into the jax q/k/v params
            stk("layers.q_proj", (H, qd), P(None, None, "model"),
                "attention.query_key_value.weight",
                transform=_t_slice(0, qd)),
            stk("layers.k_proj", (H, kd), P(None, None, "model"),
                "attention.query_key_value.weight",
                transform=_t_slice(qd, qd + kd)),
            stk("layers.v_proj", (H, kd), P(None, None, "model"),
                "attention.query_key_value.weight",
                transform=_t_slice(qd + kd, qd + 2 * kd)),
            stk("layers.o_proj", (qd, H), P(None, "model", None),
                "attention.dense.weight"),
        ]
        if not self.tie_embeddings:
            specs.append(
                ParamSpec("lm_head", (H, V), P(None, "model"),
                          "lm_head.weight", transform=lm_head_t))
        if self.qkv_bias:
            for name, lo, hi in (("q", 0, qd), ("k", qd, qd + kd),
                                 ("v", qd + kd, qd + 2 * kd)):
                specs.append(
                    stk(f"layers.{name}_bias", (hi - lo, ),
                        P(None, "model"),
                        "attention.query_key_value.bias",
                        transform=lambda x, lo=lo, hi=hi:
                        np.ascontiguousarray(x[lo:hi])))
        if self.o_bias:
            specs.append(
                stk("layers.o_bias", (H, ), P(None, None),
                    "attention.dense.bias", transform=None))
        if self.use_qk_norm:
            specs += [
                stk("layers.q_norm", (self.head_dim, ),
                    P(None, None), "attention.query_layernorm.weight",
                    transform=None),
                stk("layers.k_norm", (self.head_dim, ),
                    P(None, None), "attention.key_layernorm.weight",
                    transform=None),
            ]
            if not self.use_rmsnorm_qk:
                specs += [
                    stk("layers.q_norm_bias", (self.head_dim, ),
                        P(None, None),
                        "attention.query_layernorm.bias",
                        transform=None),
                    stk("layers.k_norm_bias", (self.head_dim, ),
                        P(None, None),
                        "attention.key_layernorm.bias",
                        transform=None),
                ]

        if self.dense_ids:
            specs += [
                stk("dense.gate_proj", (H, I), P(None, None, "model"),
                    "mlp.gate_up_proj.weight", ids=self.dense_ids,
                    transform=_t_slice(0, I)),
                stk("dense.up_proj", (H, I), P(None, None, "model"),
                    "mlp.gate_up_proj.weight", ids=self.dense_ids,
                    transform=_t_slice(I, 2 * I)),
                stk("dense.down_proj", (I, H), P(None, "model", None),
                    "mlp.down_proj.weight", ids=self.dense_ids),
            ]
        if self.moe_ids:
            def expert(path, shape, spec, hf_key):
                return ParamSpec(path, (len(self.moe_ids), E, *shape),
                                 spec, "model.layers.{i}." + hf_key,
                                 stacked=True, num_experts=E,
                                 layer_ids=self.moe_ids,
                                 transform=_transpose_expert)

            specs += [
                stk("moe.router", (H, E), P(None, None, None),
                    "mlp.gate.weight", ids=self.moe_ids),
                expert("moe.w_gate", (H, mi),
                       P(None, None, None, "model"),
                       "mlp.experts.{e}.gate_proj.weight"),
                expert("moe.w_up", (H, mi),
                       P(None, None, None, "model"),
                       "mlp.experts.{e}.up_proj.weight"),
                expert("moe.w_down", (mi, H),
                       P(None, None, "model", None),
                       "mlp.experts.{e}.down_proj.weight"),
            ]
            if self.expert_bias:
                specs.append(
                    stk("moe.expert_bias", (E, ), P(None, None),
                        "mlp.gate.expert_bias", ids=self.moe_ids,
                        transform=None))
            if self.n_shared:
                specs += [
                    stk("moe.shared_gate_proj", (H, si),
                        P(None, None, "model"),
                        "mlp.shared_experts.gate_proj.weight",
                        ids=self.moe_ids),
                    stk("moe.shared_up_proj", (H, si),
                        P(None, None, "model"),
                        "mlp.shared_experts.up_proj.weight",
                        ids=self.moe_ids),
                    stk("moe.shared_down_proj", (si, H),
                        P(None, "model", None),
                        "mlp.shared_experts.down_proj.weight",
                        ids=self.moe_ids),
                ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    # ------------------------------------------------------------------

    def _qk_norm(self, q, k, w):
        if not self.use_qk_norm:
            return q, k
        if self.use_rmsnorm_qk:
            return (rms_norm(q, w["q_norm"], self.eps),
                    rms_norm(k, w["k_norm"], self.eps))
        return (layer_norm(q, w["q_norm"], w["q_norm_bias"], 1e-6),
                layer_norm(k, w["k_norm"], w["k_norm_bias"], 1e-6))

    def _route(self, w, h):
        if self.score_function == "sigmoid":
            weights, experts = deepseek_v3_routing(
                h, w["router"],
                w.get("expert_bias",
                      jnp.zeros((self.E, ), jnp.float32)),
                self.top_k, self.n_group or 1, self.topk_group or 1,
                self.renormalize, self.routed_scaling)
            return moe_apply(h, weights, experts, w["w_gate"],
                             w["w_up"], w["w_down"], self.act_fn)
        y = moe_ffn(h, w["router"], w["w_gate"], w["w_up"],
                    w["w_down"], self.top_k, self.act_fn,
                    renormalize=self.renormalize,
                    n_group=self.n_group or 0,
                    topk_group=self.topk_group or 0)
        if self.routed_scaling != 1.0:
            y = y * self.routed_scaling
        return y

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

        moe_map = idx_map(self.moe_ids)
        dense_map = idx_map(self.dense_ids)
        is_moe = jnp.asarray(
            [l in set(self.moe_ids) for l in range(self.L)], bool)

        def pick(group, gl):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, gl, 0, keepdims=False), params[group])

        def moe_branch(l, h):
            w = pick("moe", moe_map[l])
            y = self._route(w, h)
            if self.n_shared:
                sh = self.act_fn(matmul(h, w["shared_gate_proj"]),
                                 matmul(h, w["shared_up_proj"]))
                y = y + matmul(sh, w["shared_down_proj"])
            return y

        def dense_branch(l, h):
            w = pick("dense", dense_map[l])
            return matmul(
                self.act_fn(matmul(h, w["gate_proj"]),
                            matmul(h, w["up_proj"])), w["down_proj"])

        def layer_fn(l, carry):
            x, kv_caches = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = rms_norm(x, w["input_layernorm"], self.eps)
            q = matmul(h, w["q_proj"])
            k = matmul(h, w["k_proj"])
            v = matmul(h, w["v_proj"])
            if self.qkv_bias:
                q, k, v = (q + w["q_bias"], k + w["k_bias"],
                           v + w["v_bias"])
            q = q.reshape(t, self.num_q, self.head_dim)
            k = k.reshape(t, self.num_kv, self.head_dim)
            v = v.reshape(t, self.num_kv, self.head_dim)
            q, k = self._qk_norm(q, k, w)
            q, k = apply_rope_partial(q, k, positions, self.inv_freq,
                                      self.rot_dim)
            o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                     self.sm_scale,
                                     use_pallas=use_pallas)
            o = matmul(o.reshape(t, -1), w["o_proj"])
            if self.o_bias:
                o = o + w["o_bias"]
            x = res + o
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
