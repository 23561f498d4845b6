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


def _texp(x):
    return np.ascontiguousarray(x.T)


class Grok1ModelForCausalLM:
    """Grok-1 (reference: vllm/model_executor/models/grok1.py):
    sandwich norms — x += post_norm(mix(pre_norm(x))) — attention
    logit softcap 30 with an output multiplier, router logits
    softcapped by 30·tanh(/30), gelu-gated experts stored as
    ``moe_block.experts.{e}.{linear,linear_1,linear_v}`` (gate, down,
    up), embeddings and logits scaled by the config multipliers."""

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = g("head_dim", None) or \
            self.hidden // self.num_q
        self.sm_scale = self.head_dim**-0.5
        self.eps = g("rms_norm_eps", 1e-5)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta,
                             config.rope_scaling))
        self.E = config.num_experts or g("num_experts", 8)
        self.top_k = config.num_experts_per_tok or 2
        self.moe_inter = g("moe_intermediate_size", None) or \
            config.intermediate_size
        self.attn_softcap = float(g("attn_logit_softcapping", 30.0)
                                  or 30.0)
        self.router_softcap = float(g("router_logit_softcapping",
                                      30.0) or 30.0)
        self.attn_mult = float(g("attn_output_multiplier", 1.0)
                               or 1.0)
        self.embed_mult = float(g("embedding_multiplier_scale", 1.0)
                                or 1.0)
        self.logits_mult = float(g("output_multiplier_scale", 1.0)
                                 or 1.0)
        self.tie_embeddings = config.tie_word_embeddings

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V, E = self.hidden, c.vocab_size, self.E
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        mi = self.moe_inter
        t = transpose2d

        def stk(path, shape, spec, hf_key, transform=t, experts=0):
            return ParamSpec(f"layers.{path}", (self.L, *shape), spec,
                             "model.layers.{i}." + hf_key,
                             stacked=True, num_experts=experts,
                             transform=transform)

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
            stk("pre_attn_norm", (H, ), P(None, None),
                "pre_attn_norm.weight", transform=None),
            stk("post_attn_norm", (H, ), P(None, None),
                "post_attn_norm.weight", transform=None),
            stk("pre_moe_norm", (H, ), P(None, None),
                "pre_moe_norm.weight", transform=None),
            stk("post_moe_norm", (H, ), P(None, None),
                "post_moe_norm.weight", transform=None),
            stk("q_proj", (H, qd), P(None, None, "model"),
                "self_attn.q_proj.weight"),
            stk("k_proj", (H, kd), P(None, None, "model"),
                "self_attn.k_proj.weight"),
            stk("v_proj", (H, kd), P(None, None, "model"),
                "self_attn.v_proj.weight"),
            stk("o_proj", (qd, H), P(None, "model", None),
                "self_attn.o_proj.weight"),
            stk("router", (H, E), P(None, None, None),
                "moe_block.gate.weight"),
            stk("w_gate", (E, H, mi), P(None, None, None, "model"),
                "moe_block.experts.{e}.linear.weight", experts=E,
                transform=_texp),
            stk("w_up", (E, H, mi), P(None, None, None, "model"),
                "moe_block.experts.{e}.linear_v.weight", experts=E,
                transform=_texp),
            stk("w_down", (E, mi, H), P(None, None, "model", None),
                "moe_block.experts.{e}.linear_1.weight", experts=E,
                transform=_texp),
        ]
        if not self.tie_embeddings:
            specs.append(ParamSpec("lm_head", (H, V), P(None, "model"),
                                   "lm_head.weight", transform=t))
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        from vllm_main_modify_tpu.layers.normalization import rms_norm

        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        x = x * jnp.asarray(self.embed_mult, dtype=x.dtype)
        t = x.shape[0]
        layers = params["layers"]

        def gelu_mul(g_, u):
            # FusedMoE activation="gelu" is the EXACT gelu
            return jax.nn.gelu(g_, approximate=False) * u

        def layer_fn(l, carry):
            x, kv_caches = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = rms_norm(x, w["pre_attn_norm"], self.eps)
            q = (h @ w["q_proj"]).reshape(t, self.num_q,
                                          self.head_dim)
            k = (h @ w["k_proj"]).reshape(t, self.num_kv,
                                          self.head_dim)
            v = (h @ w["v_proj"]).reshape(t, self.num_kv,
                                          self.head_dim)
            q, k = apply_rope(q, k, positions, self.inv_freq)
            o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                     self.sm_scale,
                                     logit_softcap=self.attn_softcap,
                                     use_pallas=use_pallas)
            o = (o.reshape(t, -1) @ w["o_proj"]) * self.attn_mult
            x = res + rms_norm(o, w["post_attn_norm"], self.eps)

            res = x
            h = rms_norm(x, w["pre_moe_norm"], self.eps)
            # router logits softcapped BEFORE softmax (grok1.py:109)
            logits = (h.astype(jnp.float32) @
                      w["router"].astype(jnp.float32))
            cap = self.router_softcap
            logits = jnp.tanh(logits / cap) * cap
            probs = jax.nn.softmax(logits, axis=-1)
            wts, experts = jax.lax.top_k(probs, self.top_k)
            wts = wts / jnp.sum(wts, axis=-1, keepdims=True)
            y = moe_apply(h, wts, experts, w["w_gate"], w["w_up"],
                          w["w_down"], gelu_mul)
            x = res + rms_norm(y, w["post_moe_norm"], self.eps)
            return x, kv_caches

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        logits = hidden.astype(jnp.float32) @ w.astype(jnp.float32)
        return logits * self.logits_mult


class HunYuanMoEV1ForCausalLM:
    """HunYuan-A13B / MoE-V1 (reference: vllm hunyuan_v1.py MoE path):
    the HunYuan attention (per-head RMS q/k norm AFTER rope) with a
    per-layer MoE — softmax top-k (renormalized when k > 1) over
    ``mlp.experts.{e}.{gate,up,down}_proj`` plus an always-on
    ``mlp.shared_mlp``. Per-layer topk / intermediate lists are not
    supported (uniform checkpoints only)."""

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        if getattr(hf, "use_cla", False):
            raise NotImplementedError("HunYuan CLA is not supported")
        if isinstance(g("moe_topk"), list) and \
                len(set(g("moe_topk"))) > 1:
            raise NotImplementedError("per-layer moe_topk lists")
        if isinstance(g("moe_intermediate_size"), list) and \
                len(set(g("moe_intermediate_size"))) > 1:
            raise NotImplementedError(
                "per-layer moe_intermediate_size lists")
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = g("head_dim", None) or \
            self.hidden // self.num_q
        self.sm_scale = self.head_dim**-0.5
        self.eps = g("rms_norm_eps", 1e-5)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta,
                             config.rope_scaling))
        self.qk_norm = bool(g("use_qk_norm", True))
        self.attn_bias = bool(g("attention_bias", False))
        tk = g("moe_topk", 1)
        self.top_k = tk[0] if isinstance(tk, list) else int(tk or 1)
        self.E = int(g("num_experts", 0) or 0)
        mi = g("moe_intermediate_size", None)
        if isinstance(mi, list):
            mi = mi[0]
        self.moe_inter = int(mi or config.intermediate_size)
        n_sh = g("num_shared_expert", 0)
        if isinstance(n_sh, list):
            n_sh = n_sh[0]
        self.shared_inter = config.intermediate_size * int(n_sh or 0) \
            if g("use_mixed_mlp_moe", 0) else 0
        self.tie_embeddings = config.tie_word_embeddings

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V, E = self.hidden, c.vocab_size, self.E
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        mi, si = self.moe_inter, self.shared_inter
        t = transpose2d

        def stk(path, shape, spec, hf_key, transform=t, experts=0):
            return ParamSpec(f"layers.{path}", (self.L, *shape), spec,
                             "model.layers.{i}." + hf_key,
                             stacked=True, num_experts=experts,
                             transform=transform)

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
            stk("input_layernorm", (H, ), P(None, None),
                "input_layernorm.weight", transform=None),
            stk("post_attention_layernorm", (H, ), P(None, None),
                "post_attention_layernorm.weight", transform=None),
            stk("q_proj", (H, qd), P(None, None, "model"),
                "self_attn.q_proj.weight"),
            stk("k_proj", (H, kd), P(None, None, "model"),
                "self_attn.k_proj.weight"),
            stk("v_proj", (H, kd), P(None, None, "model"),
                "self_attn.v_proj.weight"),
            stk("o_proj", (qd, H), P(None, "model", None),
                "self_attn.o_proj.weight"),
            stk("router", (H, E), P(None, None, None),
                "mlp.gate.wg.weight"),
            stk("w_gate", (E, H, mi), P(None, None, None, "model"),
                "mlp.experts.{e}.gate_proj.weight", experts=E,
                transform=_texp),
            stk("w_up", (E, H, mi), P(None, None, None, "model"),
                "mlp.experts.{e}.up_proj.weight", experts=E,
                transform=_texp),
            stk("w_down", (E, mi, H), P(None, None, "model", None),
                "mlp.experts.{e}.down_proj.weight", experts=E,
                transform=_texp),
        ]
        if self.qk_norm:
            specs += [
                stk("q_norm", (self.head_dim, ), P(None, None),
                    "self_attn.query_layernorm.weight",
                    transform=None),
                stk("k_norm", (self.head_dim, ), P(None, None),
                    "self_attn.key_layernorm.weight",
                    transform=None),
            ]
        if si:
            specs += [
                stk("shared_gate", (H, si), P(None, None, "model"),
                    "mlp.shared_mlp.gate_proj.weight"),
                stk("shared_up", (H, si), P(None, None, "model"),
                    "mlp.shared_mlp.up_proj.weight"),
                stk("shared_down", (si, H), P(None, "model", None),
                    "mlp.shared_mlp.down_proj.weight"),
            ]
        if not self.tie_embeddings:
            specs.append(ParamSpec("lm_head", (H, V), P(None, "model"),
                                   "lm_head.weight", transform=t))
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        from vllm_main_modify_tpu.layers.moe import moe_ffn
        from vllm_main_modify_tpu.layers.normalization import rms_norm

        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        layers = params["layers"]

        def layer_fn(l, carry):
            x, kv_caches = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = rms_norm(x, w["input_layernorm"], self.eps)
            q = (h @ w["q_proj"]).reshape(t, self.num_q,
                                          self.head_dim)
            k = (h @ w["k_proj"]).reshape(t, self.num_kv,
                                          self.head_dim)
            v = (h @ w["v_proj"]).reshape(t, self.num_kv,
                                          self.head_dim)
            q, k = apply_rope(q, k, positions, self.inv_freq)
            if self.qk_norm:  # AFTER rope (hunyuan_v1.py:221-227)
                q = rms_norm(q, w["q_norm"], self.eps)
                k = rms_norm(k, w["k_norm"], self.eps)
            o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                     self.sm_scale,
                                     use_pallas=use_pallas)
            x = res + o.reshape(t, -1) @ w["o_proj"]

            res = x
            h = rms_norm(x, w["post_attention_layernorm"], self.eps)
            y = moe_ffn(h, w["router"], w["w_gate"], w["w_up"],
                        w["w_down"], self.top_k, _silu_mul,
                        renormalize=self.top_k > 1)
            if "shared_gate" in w:
                sh = _silu_mul(h @ w["shared_gate"],
                               h @ w["shared_up"]) @ w["shared_down"]
                y = y + sh
            return res + y, kv_caches

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)
