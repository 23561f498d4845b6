"""MPT decoder (ALiBi, bias-free LayerNorm, contiguous fused Wqkv).

Reference parity: vllm/model_executor/models/mpt.py. MPT's alibi
tensor is anchored at the last position; by softmax translation
invariance that equals the per-query form slope*(kv_idx - q_pos) the
kernel implements, so only the slope schedule differs from BLOOM
(1/2^(8i/nP2) with an interleaved reorder for non-power-of-2 head
counts).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.models.interface import ParamSpec


def mpt_alibi_slopes(n_heads: int,
                     alibi_bias_max: int = 8) -> tuple[float, ...]:
    n_p2 = 2**math.ceil(math.log2(n_heads))
    base = [(i + 1) * alibi_bias_max / n_p2 for i in range(n_p2)]
    slopes = [1.0 / 2.0**b for b in base]
    if n_p2 != n_heads:
        slopes = (slopes[1::2] + slopes[0::2])[:n_heads]
    return tuple(slopes)


def _slice_rows_t(lo: int, hi: int):
    return lambda x: np.ascontiguousarray(x[lo:hi].T)


class MptForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.hidden = hf.d_model
        self.L = hf.n_layers
        self.num_heads = hf.n_heads
        self.head_dim = self.hidden // self.num_heads
        self.inter = getattr(hf, "expansion_ratio", 4) * self.hidden
        self.ln_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.sm_scale = self.head_dim**-0.5
        ac = getattr(hf, "attn_config", None)
        self.clip_qkv = getattr(ac, "clip_qkv", None) if ac else None
        use_alibi = getattr(ac, "alibi", True) if ac else True
        bias_max = getattr(ac, "alibi_bias_max", 8) if ac else 8
        self.slopes = (mpt_alibi_slopes(self.num_heads, bias_max)
                       if use_alibi else None)
        config.num_layers = self.L

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, I, V, L = self.hidden, self.inter, c.vocab_size, self.L
        t = lambda x: np.ascontiguousarray(x.T)

        def stk(path, shape, spec, hf_key, transform=None):
            return ParamSpec(f"layers.{path}", (L, *shape), spec,
                             "transformer.blocks.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("wte", (V, H), P("model", None),
                      "transformer.wte.weight", transform=None),
            ParamSpec("norm_f", (H, ), P(),
                      "transformer.norm_f.weight", transform=None),
            stk("norm_1", (H, ), P(None, None), "norm_1.weight"),
            stk("norm_2", (H, ), P(None, None), "norm_2.weight"),
        ]
        # Wqkv: contiguous [q | k | v] along the output axis
        for j, name in enumerate(("q", "k", "v")):
            specs.append(
                stk(f"{name}_proj", (H, H), P(None, None, "model"),
                    "attn.Wqkv.weight",
                    transform=_slice_rows_t(j * H, (j + 1) * H)))
        specs += [
            stk("o_proj", (H, H), P(None, "model", None),
                "attn.out_proj.weight", transform=t),
            stk("fc_in", (H, I), P(None, None, "model"),
                "ffn.up_proj.weight", transform=t),
            stk("fc_out", (I, H), P(None, "model", None),
                "ffn.down_proj.weight", transform=t),
        ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_heads, self.head_dim, self.L

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = jnp.take(params["wte"], input_ids, axis=0)
        t = x.shape[0]
        layers = params["layers"]

        def layer_fn(l, carry):
            x, kv = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = layer_norm(x, w["norm_1"], None, self.ln_eps)
            q = h @ w["q_proj"]
            k = h @ w["k_proj"]
            v = h @ w["v_proj"]
            if self.clip_qkv:
                q = jnp.clip(q, -self.clip_qkv, self.clip_qkv)
                k = jnp.clip(k, -self.clip_qkv, self.clip_qkv)
                v = jnp.clip(v, -self.clip_qkv, self.clip_qkv)
            q = q.reshape(t, self.num_heads, self.head_dim)
            k = k.reshape(t, self.num_heads, self.head_dim)
            v = v.reshape(t, self.num_heads, self.head_dim)
            o, kv = attention(q, k, v, kv, l, attn_meta, self.sm_scale,
                              use_pallas=use_pallas,
                              alibi_slopes=self.slopes)
            x = res + o.reshape(t, -1) @ w["o_proj"]
            res = x
            h = layer_norm(x, w["norm_2"], None, self.ln_eps)
            h = jax.nn.gelu(h @ w["fc_in"], approximate=False)
            x = res + h @ w["fc_out"]
            return x, kv

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = layer_norm(x, params["norm_f"], None, self.ln_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        return hidden.astype(jnp.float32) @ \
            params["wte"].T.astype(jnp.float32)
