"""GPT-OSS (gpt-oss-20b / gpt-oss-120b).

Reference: vllm/model_executor/models/gpt_oss.py — every layer pairs
attention-with-sinks and a top-k MoE:

- attention sinks (gpt_oss.py:78-120): a learned per-q-head logit in
  the softmax denominator; implemented natively in both the XLA oracle
  and the Pallas ragged-attention kernel (finalization rescale);
- alternating sliding/full attention from config ``layer_types``
  (gpt_oss.py:106-108), mapped onto the hybrid KV-group machinery so
  sliding layers get window-sized KV pools;
- yarn rope with cos/sin attention scaling (gpt_oss.py:55-74);
- MoE with router bias, fused ``gate_up_proj`` [E, H, 2I] whose gate
  and up channels are INTERLEAVED (HF GptOssExperts: gate =
  x[..., ::2]), per-expert biases, and the clamped ``swigluoai``
  activation (vllm layers/activation.py SwigluOAIAndMul).

TPU-native: stacked layers under ``lax.fori_loop``, experts through
the ragged_dot grouped matmul (layers/moe.py), sinks carried as a
stacked [L, Hq] parameter so the loop keeps one compiled body.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.activation import swigluoai_and_mul
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.moe import moe_ffn
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                compute_inv_freq,
                                                yarn_attention_factor)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.quantization.weights import matmul


def _interleave_slice(start: int, transpose: bool = False):
    """HF GptOssExperts fused tensors interleave gate/up on the last
    axis: gate = x[..., 0::2], up = x[..., 1::2]."""

    def f(x):
        y = x[..., start::2]
        if transpose:
            y = y.transpose(0, 2, 1)
        return np.ascontiguousarray(y)

    return f


def _identity3(x):
    return np.ascontiguousarray(x)


class GptOssForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = config.head_dim
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.E = config.num_experts
        self.top_k = config.num_experts_per_tok
        self.inter = getattr(hf, "intermediate_size", 0)
        self.sm_scale = self.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta,
                             config.rope_scaling))
        rs = config.rope_scaling or {}
        self.rope_mscale = yarn_attention_factor(rs) \
            if (rs.get("rope_type") or rs.get("type")) == "yarn" else 1.0
        self.layer_types = list(
            getattr(hf, "layer_types", None) or
            ["sliding_attention" if i % 2 == 0 else "full_attention"
             for i in range(self.L)])
        self.window = config.sliding_window
        self.tie_embeddings = config.tie_word_embeddings

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        L, H, I, V, E = self.L, self.hidden, self.inter, c.vocab_size, \
            self.E
        t = transpose2d

        def stk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"layers.{path}", (L, *shape), spec,
                             "model.layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
            ParamSpec("lm_head", (H, V), P(None, "model"),
                      "lm_head.weight", transform=t),
            stk("input_layernorm", (H, ), P(None, None),
                "input_layernorm.weight", transform=None),
            stk("post_attention_layernorm", (H, ), P(None, None),
                "post_attention_layernorm.weight", transform=None),
            stk("sinks", (self.num_q, ), P(None, "model"),
                "self_attn.sinks", transform=None),
            # MoE: HF fused layouts are already [E, in, out] — only the
            # interleaved gate/up channels need de-interleaving
            stk("router", (H, E), P(None, None, None),
                "mlp.router.weight"),
            stk("router_bias", (E, ), P(None, None),
                "mlp.router.bias", transform=None),
            stk("w_gate", (E, H, I), P(None, None, None, "model"),
                "mlp.experts.gate_up_proj",
                transform=_interleave_slice(0)),
            stk("w_up", (E, H, I), P(None, None, None, "model"),
                "mlp.experts.gate_up_proj",
                transform=_interleave_slice(1)),
            stk("b_gate", (E, I), P(None, None, "model"),
                "mlp.experts.gate_up_proj_bias",
                transform=_interleave_slice(0)),
            stk("b_up", (E, I), P(None, None, "model"),
                "mlp.experts.gate_up_proj_bias",
                transform=_interleave_slice(1)),
            stk("w_down", (E, I, H), P(None, None, "model", None),
                "mlp.experts.down_proj", transform=_identity3),
            stk("b_down", (E, H), P(None, None, None),
                "mlp.experts.down_proj_bias", transform=_identity3),
        ]
        for name, width in (("q", qd), ("k", kd), ("v", kd)):
            specs += [
                stk(f"{name}_proj", (H, width),
                    P(None, None, "model"),
                    f"self_attn.{name}_proj.weight"),
                stk(f"{name}_bias", (width, ), P(None, "model"),
                    f"self_attn.{name}_proj.bias", transform=None),
            ]
        specs += [
            stk("o_proj", (qd, H), P(None, "model", None),
                "self_attn.o_proj.weight"),
            stk("o_bias", (H, ), P(None, None),
                "self_attn.o_proj.bias", transform=None),
        ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    def _sliding_layer_ids(self) -> list[int]:
        if not self.window:
            return []
        return [l for l in range(self.L)
                if self.layer_types[l] == "sliding_attention"]

    def kv_cache_groups(self):
        from vllm_main_modify_tpu.core.kv_cache_interface import (
            KVCacheGroupSpec, single_full_group)

        sliding = self._sliding_layer_ids()
        if not sliding or len(sliding) == self.L:
            return single_full_group(self.num_kv, self.head_dim,
                                     self.L)
        full = [l for l in range(self.L) if l not in set(sliding)]
        return [
            KVCacheGroupSpec(kind="full", layer_ids=tuple(full),
                             kv_heads=self.num_kv,
                             head_dim=self.head_dim),
            KVCacheGroupSpec(kind="window", layer_ids=tuple(sliding),
                             kv_heads=self.num_kv,
                             head_dim=self.head_dim,
                             window=self.window),
        ]

    # ------------------------------------------------------------------

    def _layer(self, w, x, positions, kv, l, meta, use_pallas, window):
        t = x.shape[0]
        res = x
        h = rms_norm(x, w["input_layernorm"], self.cfg.rms_norm_eps)
        q = matmul(h, w["q_proj"]) + w["q_bias"]
        k = matmul(h, w["k_proj"]) + w["k_bias"]
        v = matmul(h, w["v_proj"]) + w["v_bias"]
        q = q.reshape(t, self.num_q, self.head_dim)
        k = k.reshape(t, self.num_kv, self.head_dim)
        v = v.reshape(t, self.num_kv, self.head_dim)
        q, k = apply_rope(q, k, positions, self.inv_freq,
                          mscale=self.rope_mscale)
        o, kv = attention(q, k, v, kv, l, meta, self.sm_scale,
                          sliding_window=window,
                          use_pallas=use_pallas,
                          sinks=w["sinks"].astype(jnp.float32))
        x = res + matmul(o.reshape(t, -1), w["o_proj"]) + w["o_bias"]

        res = x
        h = rms_norm(x, w["post_attention_layernorm"],
                     self.cfg.rms_norm_eps)
        y = moe_ffn(h, w["router"], w["w_gate"], w["w_up"],
                    w["w_down"], self.top_k, swigluoai_and_mul,
                    renormalize=True,
                    router_bias=w["router_bias"],
                    biases=(w["b_gate"], w["b_up"], w["b_down"]))
        return res + y, kv

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids, axis=0)
        layers = params["layers"]
        sliding = self._sliding_layer_ids()
        hybrid = isinstance(kv_caches, tuple)
        window = self.window
        all_sliding = len(sliding) == self.L
        if sliding and not all_sliding:
            sliding_mask = jnp.asarray(
                [l in set(sliding) for l in range(self.L)], dtype=bool)
            if hybrid:
                groups = self.kv_cache_groups()
                gmaps, metas = [], []
                for gi, g in enumerate(groups):
                    m = np.zeros(self.L, dtype=np.int32)
                    for i, li in enumerate(g.layer_ids):
                        m[li] = i
                    gmaps.append(jnp.asarray(m))
                    metas.append(attn_meta.for_group(gi))

        def layer_fn(l, carry):
            x, kv_caches = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            if not sliding:
                return self._layer(w, x, positions, kv_caches, l,
                                   attn_meta, use_pallas, None)
            if all_sliding:
                return self._layer(w, x, positions, kv_caches, l,
                                   attn_meta, use_pallas, window)
            if hybrid:
                def win_branch(x, kv):
                    kv0, kv1 = kv
                    x, kv1 = self._layer(x=x, w=w, positions=positions,
                                         kv=kv1, l=gmaps[1][l],
                                         meta=metas[1],
                                         use_pallas=use_pallas,
                                         window=window)
                    return x, (kv0, kv1)

                def full_branch(x, kv):
                    kv0, kv1 = kv
                    x, kv0 = self._layer(x=x, w=w, positions=positions,
                                         kv=kv0, l=gmaps[0][l],
                                         meta=metas[0],
                                         use_pallas=use_pallas,
                                         window=None)
                    return x, (kv0, kv1)

                return jax.lax.cond(sliding_mask[l], win_branch,
                                    full_branch, x, kv_caches)
            return jax.lax.cond(
                sliding_mask[l],
                lambda x, kv: self._layer(w, x, positions, kv, l,
                                          attn_meta, use_pallas,
                                          window),
                lambda x, kv: self._layer(w, x, positions, kv, l,
                                          attn_meta, use_pallas,
                                          None),
                x, kv_caches)

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = rms_norm(x, params["final_norm"], self.cfg.rms_norm_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)
