"""GPT-NeoX / Pythia decoder (parallel residual, partial rotary,
LayerNorm + biases, fused per-head-interleaved QKV).

Reference parity: vllm/model_executor/models/gpt_neox.py. The fused
``query_key_value`` tensor interleaves q/k/v per head ([heads, 3,
head_dim] on the output axis); it is de-interleaved into separate
q/k/v ParamSpecs at load so the forward matches the common scaffold.
Rotary covers only ``head_dim * rotary_pct`` dims (neox halves
style); the remainder passes through.
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
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import ParamSpec
from vllm_main_modify_tpu.quantization.weights import matmul


def _qkv_slice_w(heads: int, hd: int, part: int):
    """[3H, H] head-interleaved torch weight → [H, heads*hd] for one
    of q/k/v."""

    def f(x: np.ndarray) -> np.ndarray:
        w = x.reshape(heads, 3, hd, x.shape[1])[:, part]
        return np.ascontiguousarray(
            w.reshape(heads * hd, x.shape[1]).T)

    return f


def _qkv_slice_b(heads: int, hd: int, part: int):
    def f(x: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(
            x.reshape(heads, 3, hd)[:, part].reshape(-1))

    return f


def apply_rope_partial(q, k, positions, inv_freq, rot_dim: int):
    """Neox-style rope on the leading rot_dim dims, pass-through for
    the rest (HF GPTNeoX apply_rotary_pos_emb partial path)."""
    if rot_dim == q.shape[-1]:
        return apply_rope(q, k, positions, inv_freq)
    q_rot, k_rot = apply_rope(q[..., :rot_dim], k[..., :rot_dim],
                              positions, inv_freq)
    q = jnp.concatenate([q_rot, q[..., rot_dim:]], axis=-1)
    k = jnp.concatenate([k_rot, k[..., rot_dim:]], axis=-1)
    return q, k


class GPTNeoXForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_heads = config.num_attention_heads
        self.head_dim = self.hidden // self.num_heads
        self.inter = config.intermediate_size
        self.ln_eps = getattr(hf, "layer_norm_eps", 1e-5)
        self.rot_dim = int(self.head_dim *
                           getattr(hf, "rotary_pct", 0.25))
        self.parallel = bool(getattr(hf, "use_parallel_residual",
                                     True))
        self.sm_scale = self.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.rot_dim, config.rope_theta,
                             config.rope_scaling))

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, I, V, L = self.hidden, self.inter, c.vocab_size, self.L
        nh, hd = self.num_heads, self.head_dim
        t = lambda x: np.ascontiguousarray(x.T)

        def stk(path, shape, spec, hf_key, transform=None):
            return ParamSpec(f"layers.{path}", (L, *shape), spec,
                             "gpt_neox.layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("embed_in", (V, H), P("model", None),
                      "gpt_neox.embed_in.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(),
                      "gpt_neox.final_layer_norm.weight",
                      transform=None),
            ParamSpec("final_norm_bias", (H, ), P(),
                      "gpt_neox.final_layer_norm.bias",
                      transform=None),
            ParamSpec("embed_out", (H, V), P(None, "model"),
                      "embed_out.weight", transform=t),
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
                    "attention.query_key_value.weight",
                    transform=_qkv_slice_w(nh, hd, j)),
                stk(f"{name}_bias", (H, ), P(None, "model"),
                    "attention.query_key_value.bias",
                    transform=_qkv_slice_b(nh, hd, j)),
            ]
        specs += [
            stk("o_proj", (H, H), P(None, "model", None),
                "attention.dense.weight", transform=t),
            stk("o_bias", (H, ), P(None, None),
                "attention.dense.bias"),
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
        x = jnp.take(params["embed_in"], input_ids, axis=0)
        t = x.shape[0]
        layers = params["layers"]

        def layer_fn(l, carry):
            x, kv_caches = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            h = layer_norm(x, w["input_layernorm"],
                           w["input_layernorm_bias"], self.ln_eps)
            q = (matmul(h, w["q_proj"]) + w["q_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            k = (matmul(h, w["k_proj"]) + w["k_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            v = (matmul(h, w["v_proj"]) + w["v_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            q, k = apply_rope_partial(q, k, positions, self.inv_freq,
                                      self.rot_dim)
            o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                     self.sm_scale,
                                     use_pallas=use_pallas)
            attn_out = matmul(o.reshape(t, -1), w["o_proj"]) + \
                w["o_bias"]

            def mlp(inp):
                hh = jax.nn.gelu(
                    matmul(inp, w["fc_in"]) + w["fc_in_bias"],
                    approximate=False)
                return matmul(hh, w["fc_out"]) + w["fc_out_bias"]

            if self.parallel:
                h2 = layer_norm(x, w["post_attention_layernorm"],
                                w["post_attention_layernorm_bias"],
                                self.ln_eps)
                x = x + attn_out + mlp(h2)
            else:
                x = x + attn_out
                h2 = layer_norm(x, w["post_attention_layernorm"],
                                w["post_attention_layernorm_bias"],
                                self.ln_eps)
                x = x + mlp(h2)
            return x, kv_caches

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = layer_norm(x, params["final_norm"],
                       params["final_norm_bias"], self.ln_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        return hidden.astype(jnp.float32) @ \
            params["embed_out"].astype(jnp.float32)
