"""DBRX and PhiMoE decoders.

Reference parity: vllm/model_executor/models/dbrx.py + phimoe.py.
Family deltas vs the Mixtral-style scaffold (models/moe_llama.py):

- DBRX: bias-free LayerNorms, fused Wqkv with clip, experts stored
  FLATTENED ([E*I, H] w1/v1/w2 tensors, reshaped at load), router key
  ``ffn.router.layer``, L1-renormalized top-k.
- PhiMoE: LayerNorm WITH bias everywhere, Mixtral expert keys
  (w1=gate, w3=up, w2=down), and the **sparsemixer** router — each of
  the two slots takes the argmax of the (progressively masked) logits
  and weights it by a softmax over a jitter-thresholded mask, exactly
  reproducing HF inference semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.moe import moe_apply
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.quantization.weights import matmul


def _silu_mul(g, u):
    return jax.nn.silu(g) * u


def _dbrx_expert(e: int, i: int, transpose: bool):
    """[E*I, H] flattened expert tensor → [E, H, I] (or [E, I, H])."""

    def f(x):
        y = x.reshape(e, i, -1)
        if transpose:
            y = y.transpose(0, 2, 1)
        return np.ascontiguousarray(y)

    return f


class DbrxForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.hidden = getattr(hf, "d_model", config.hidden_size)
        self.L = getattr(hf, "n_layers", config.num_layers)
        self.num_q = getattr(hf, "n_heads", config.num_attention_heads)
        attn_cfg = getattr(hf, "attn_config", None)
        ga = lambda k, d=None: getattr(attn_cfg, k, d) \
            if attn_cfg is not None else d
        self.num_kv = ga("kv_n_heads", self.num_q)
        self.head_dim = self.hidden // self.num_q
        self.sm_scale = self.head_dim**-0.5
        self.clip_qkv = ga("clip_qkv", None)
        ffn_cfg = getattr(hf, "ffn_config", None)
        gf = lambda k, d=None: getattr(ffn_cfg, k, d) \
            if ffn_cfg is not None else d
        self.E = gf("moe_num_experts", 16)
        self.top_k = gf("moe_top_k", 4)
        self.inter = gf("ffn_hidden_size", 4 * self.hidden)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim,
                             ga("rope_theta", 500000.0), None))

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V, L, E, I = (self.hidden, c.vocab_size, self.L, self.E,
                         self.inter)
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        t = transpose2d

        def slc(lo, hi):
            return lambda x: np.ascontiguousarray(x[lo:hi].T)

        def stk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"layers.{path}", (L, *shape), spec,
                             "transformer.blocks.{i}." + hf_key,
                             stacked=True, transform=transform)

        return [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "transformer.wte.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(),
                      "transformer.norm_f.weight", transform=None),
            ParamSpec("lm_head", (H, V), P(None, "model"),
                      "lm_head.weight", transform=t),
            stk("norm_1", (H, ), P(None, None),
                "norm_attn_norm.norm_1.weight", transform=None),
            stk("norm_2", (H, ), P(None, None),
                "norm_attn_norm.norm_2.weight", transform=None),
            stk("q_proj", (H, qd), P(None, None, "model"),
                "norm_attn_norm.attn.Wqkv.weight",
                transform=slc(0, qd)),
            stk("k_proj", (H, kd), P(None, None, "model"),
                "norm_attn_norm.attn.Wqkv.weight",
                transform=slc(qd, qd + kd)),
            stk("v_proj", (H, kd), P(None, None, "model"),
                "norm_attn_norm.attn.Wqkv.weight",
                transform=slc(qd + kd, qd + 2 * kd)),
            stk("o_proj", (qd, H), P(None, "model", None),
                "norm_attn_norm.attn.out_proj.weight"),
            stk("router", (H, E), P(None, None, None),
                "ffn.router.layer.weight"),
            stk("w_gate", (E, H, I), P(None, None, None, "model"),
                "ffn.experts.mlp.w1",
                transform=_dbrx_expert(E, I, True)),
            stk("w_up", (E, H, I), P(None, None, None, "model"),
                "ffn.experts.mlp.v1",
                transform=_dbrx_expert(E, I, True)),
            stk("w_down", (E, I, H), P(None, None, "model", None),
                "ffn.experts.mlp.w2",
                transform=_dbrx_expert(E, I, False)),
        ]

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        layers = params["layers"]

        def layer_fn(l, carry):
            x, kv = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = layer_norm(x, w["norm_1"], None, 1e-5)
            q = matmul(h, w["q_proj"])
            k = matmul(h, w["k_proj"])
            v = matmul(h, w["v_proj"])
            if self.clip_qkv:
                q = jnp.clip(q, -self.clip_qkv, self.clip_qkv)
                k = jnp.clip(k, -self.clip_qkv, self.clip_qkv)
                v = jnp.clip(v, -self.clip_qkv, self.clip_qkv)
            q = q.reshape(t, self.num_q, self.head_dim)
            k = k.reshape(t, self.num_kv, self.head_dim)
            v = v.reshape(t, self.num_kv, self.head_dim)
            q, k = apply_rope(q, k, positions, self.inv_freq)
            o, kv = attention(q, k, v, kv, l, attn_meta, self.sm_scale,
                              use_pallas=use_pallas)
            x = res + matmul(o.reshape(t, -1), w["o_proj"])

            res = x
            h = layer_norm(x, w["norm_2"], None, 1e-5)
            logits = (h.astype(jnp.float32) @
                      w["router"].astype(jnp.float32))
            probs = jax.nn.softmax(logits, axis=-1)
            weights, experts = jax.lax.top_k(probs, self.top_k)
            weights = weights / jnp.sum(weights, axis=-1,
                                        keepdims=True)
            y = moe_apply(h, weights, experts, w["w_gate"], w["w_up"],
                          w["w_down"], _silu_mul)
            return res + y, kv

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = layer_norm(x, params["final_norm"], None, 1e-5)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        return hidden.astype(jnp.float32) @ \
            params["lm_head"].astype(jnp.float32)


def sparsemixer_inference(scores: jax.Array,
                          jitter_eps: float
                          ) -> tuple[jax.Array, jax.Array]:
    """PhiMoE sparsemixer at inference (HF phimoe sparsemixer,
    training=False): slot 1 = argmax with a jitter-thresholded-softmax
    weight; slot 2 repeats on logits with slot 1 masked out."""
    neg = -jnp.inf

    def one_slot(s, full):
        thr = jnp.max(s, axis=-1, keepdims=True)
        factor = jnp.maximum(jnp.abs(full), thr)
        masked = jnp.where((thr - full) / factor > 2 * jitter_eps,
                           neg, s)
        sel = jnp.argmax(s, axis=-1)
        gates = jax.nn.softmax(masked, axis=-1)
        w = jnp.take_along_axis(gates, sel[:, None], axis=-1)[:, 0]
        return sel, w

    sel1, w1 = one_slot(scores, scores)
    masked_scores = jnp.where(
        jax.nn.one_hot(sel1, scores.shape[-1], dtype=bool), neg,
        scores)
    sel2, w2 = one_slot(masked_scores, scores)
    experts = jnp.stack([sel1, sel2], axis=-1)
    weights = jnp.stack([w1, w2], axis=-1)
    return weights, experts


class PhiMoEForCausalLM:

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
        self.E = g("num_local_experts", 16)
        self.top_k = 2  # sparsemixer is a fixed top-2 scheme
        self.jitter_eps = g("router_jitter_noise", 0.01)
        self.attention_bias = bool(g("attention_bias", False))
        self.lm_head_bias = bool(g("lm_head_bias", False))
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta,
                             config.rope_scaling))

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V, L, E, I = (self.hidden, c.vocab_size, self.L, self.E,
                         self.inter)
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        t = transpose2d

        def stk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"layers.{path}", (L, *shape), spec,
                             "model.layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        def expert(path, shape, spec, hf_key):
            return ParamSpec(f"layers.{path}", (L, E, *shape), spec,
                             "model.layers.{i}." + hf_key,
                             stacked=True, num_experts=E,
                             transform=t)

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
            ParamSpec("final_norm_bias", (H, ), P(),
                      "model.norm.bias", transform=None),
            ParamSpec("lm_head", (H, V), P(None, "model"),
                      "lm_head.weight", transform=t),
        ]
        if self.lm_head_bias:
            specs.append(ParamSpec("lm_head_bias", (V, ), P("model"),
                                   "lm_head.bias", transform=None))
        for n in ("input_layernorm", "post_attention_layernorm"):
            specs += [
                stk(n, (H, ), P(None, None), f"{n}.weight",
                    transform=None),
                stk(f"{n}_bias", (H, ), P(None, None), f"{n}.bias",
                    transform=None),
            ]
        for name, width in (("q", qd), ("k", kd), ("v", kd)):
            specs.append(
                stk(f"{name}_proj", (H, width), P(None, None, "model"),
                    f"self_attn.{name}_proj.weight"))
            if self.attention_bias:
                specs.append(
                    stk(f"{name}_bias", (width, ), P(None, "model"),
                        f"self_attn.{name}_proj.bias",
                        transform=None))
        specs.append(
            stk("o_proj", (qd, H), P(None, "model", None),
                "self_attn.o_proj.weight"))
        if self.attention_bias:
            specs.append(
                stk("o_bias", (H, ), P(None, None),
                    "self_attn.o_proj.bias", transform=None))
        specs += [
            stk("router", (H, E), P(None, None, None),
                "block_sparse_moe.gate.weight"),
            expert("w_gate", (H, I), P(None, None, None, "model"),
                   "block_sparse_moe.experts.{e}.w1.weight"),
            expert("w_up", (H, I), P(None, None, None, "model"),
                   "block_sparse_moe.experts.{e}.w3.weight"),
            expert("w_down", (I, H), P(None, None, "model", None),
                   "block_sparse_moe.experts.{e}.w2.weight"),
        ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        layers = params["layers"]

        def layer_fn(l, carry):
            x, kv = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = layer_norm(x, w["input_layernorm"],
                           w["input_layernorm_bias"], self.eps)
            q = matmul(h, w["q_proj"])
            k = matmul(h, w["k_proj"])
            v = matmul(h, w["v_proj"])
            if self.attention_bias:
                q, k = q + w["q_bias"], k + w["k_bias"]
                v = v + w["v_bias"]
            q = q.reshape(t, self.num_q, self.head_dim)
            k = k.reshape(t, self.num_kv, self.head_dim)
            v = v.reshape(t, self.num_kv, self.head_dim)
            q, k = apply_rope(q, k, positions, self.inv_freq)
            o, kv = attention(q, k, v, kv, l, attn_meta, self.sm_scale,
                              sliding_window=self.cfg.sliding_window,
                              use_pallas=use_pallas)
            attn_out = matmul(o.reshape(t, -1), w["o_proj"])
            if self.attention_bias:
                attn_out = attn_out + w["o_bias"]
            x = res + attn_out

            res = x
            h = layer_norm(x, w["post_attention_layernorm"],
                           w["post_attention_layernorm_bias"],
                           self.eps)
            logits = (h.astype(jnp.float32) @
                      w["router"].astype(jnp.float32))
            weights, experts = sparsemixer_inference(logits,
                                                     self.jitter_eps)
            y = moe_apply(h, weights, experts, w["w_gate"], w["w_up"],
                          w["w_down"], _silu_mul)
            return res + y, kv

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = layer_norm(x, params["final_norm"],
                       params["final_norm_bias"], self.eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        logits = hidden.astype(jnp.float32) @ \
            params["lm_head"].astype(jnp.float32)
        if "lm_head_bias" in params:
            logits = logits + params["lm_head_bias"].astype(
                jnp.float32)
        return logits
