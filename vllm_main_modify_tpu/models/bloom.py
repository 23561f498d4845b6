"""BLOOM decoder (ALiBi positions, LayerNorm, fused per-head QKV).

Reference parity: vllm/model_executor/models/bloom.py. No rotary or
learned positions — attention carries per-head ALiBi slopes straight
into the ragged paged kernel (compile-time constants, one fused add).
The fused ``query_key_value`` uses the same per-head [q|k|v]
interleave as GPT-NeoX and is de-interleaved at load.
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
from vllm_main_modify_tpu.models.gpt_neox import (_qkv_slice_b,
                                                  _qkv_slice_w)
from vllm_main_modify_tpu.models.interface import ParamSpec


def get_alibi_slopes(n_heads: int) -> tuple[float, ...]:
    """Standard ALiBi slope schedule (reference:
    vllm/model_executor/models/bloom.py _get_alibi_slopes)."""
    closest = 2**math.floor(math.log2(n_heads))
    base = 2.0**(-(2.0**-(math.log2(closest) - 3)))
    slopes = [base**(i + 1) for i in range(closest)]
    if closest != n_heads:
        extra_base = 2.0**(-(2.0**-(math.log2(2 * closest) - 3)))
        slopes += [extra_base**(i + 1)
                   for i in range(0, 2 * (n_heads - closest), 2)]
    return tuple(slopes)


class BloomForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_heads = config.num_attention_heads
        self.head_dim = self.hidden // self.num_heads
        self.inter = 4 * self.hidden
        self.ln_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.sm_scale = self.head_dim**-0.5
        self.slopes = get_alibi_slopes(self.num_heads)

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, I, V, L = self.hidden, self.inter, c.vocab_size, self.L
        nh, hd = self.num_heads, self.head_dim
        t = lambda x: np.ascontiguousarray(x.T)

        def stk(path, shape, spec, hf_key, transform=None):
            return ParamSpec(f"layers.{path}", (L, *shape), spec,
                             "transformer.h.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("word_embeddings", (V, H), P("model", None),
                      "transformer.word_embeddings.weight",
                      transform=None),
            ParamSpec("embed_norm", (H, ), P(),
                      "transformer.word_embeddings_layernorm.weight",
                      transform=None),
            ParamSpec("embed_norm_bias", (H, ), P(),
                      "transformer.word_embeddings_layernorm.bias",
                      transform=None),
            ParamSpec("ln_f", (H, ), P(), "transformer.ln_f.weight",
                      transform=None),
            ParamSpec("ln_f_bias", (H, ), P(),
                      "transformer.ln_f.bias", transform=None),
        ]
        for name in ("input_layernorm", "post_attention_layernorm"):
            specs += [
                stk(name, (H, ), P(None, None), f"{name}.weight"),
                stk(f"{name}_bias", (H, ), P(None, None),
                    f"{name}.bias"),
            ]
        for j, name in enumerate(("q", "k", "v")):
            specs += [
                stk(f"{name}_proj", (H, H), P(None, None, "model"),
                    "self_attention.query_key_value.weight",
                    transform=_qkv_slice_w(nh, hd, j)),
                stk(f"{name}_bias", (H, ), P(None, "model"),
                    "self_attention.query_key_value.bias",
                    transform=_qkv_slice_b(nh, hd, j)),
            ]
        specs += [
            stk("o_proj", (H, H), P(None, "model", None),
                "self_attention.dense.weight", transform=t),
            stk("o_bias", (H, ), P(None, None),
                "self_attention.dense.bias"),
            stk("fc_in", (H, I), P(None, None, "model"),
                "mlp.dense_h_to_4h.weight", transform=t),
            stk("fc_in_bias", (I, ), P(None, "model"),
                "mlp.dense_h_to_4h.bias"),
            stk("fc_out", (I, H), P(None, "model", None),
                "mlp.dense_4h_to_h.weight", transform=t),
            stk("fc_out_bias", (H, ), P(None, None),
                "mlp.dense_4h_to_h.bias"),
        ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_heads, self.head_dim, self.L

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = jnp.take(params["word_embeddings"], input_ids, axis=0)
        x = layer_norm(x, params["embed_norm"],
                       params["embed_norm_bias"], self.ln_eps)
        t = x.shape[0]
        layers = params["layers"]

        def layer_fn(l, carry):
            x, kv = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = layer_norm(x, w["input_layernorm"],
                           w["input_layernorm_bias"], self.ln_eps)
            q = (h @ w["q_proj"] + w["q_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            k = (h @ w["k_proj"] + w["k_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            v = (h @ w["v_proj"] + w["v_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            o, kv = attention(q, k, v, kv, l, attn_meta, self.sm_scale,
                              use_pallas=use_pallas,
                              alibi_slopes=self.slopes)
            x = res + (o.reshape(t, -1) @ w["o_proj"] + w["o_bias"])
            res = x
            h = layer_norm(x, w["post_attention_layernorm"],
                           w["post_attention_layernorm_bias"],
                           self.ln_eps)
            h = jax.nn.gelu(h @ w["fc_in"] + w["fc_in_bias"],
                            approximate=True)
            x = res + (h @ w["fc_out"] + w["fc_out_bias"])
            return x, kv

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = layer_norm(x, params["ln_f"], params["ln_f_bias"],
                       self.ln_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        return hidden.astype(jnp.float32) @ \
            params["word_embeddings"].T.astype(jnp.float32)
