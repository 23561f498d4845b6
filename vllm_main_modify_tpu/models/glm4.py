"""GLM-4 (0414 series) decoder.

Reference parity: vllm/model_executor/models/glm4.py. Deltas vs the
Llama family: sandwich RMS norms AFTER the attention and MLP outputs
(Gemma2 wiring with plain RMSNorm), fused ``gate_up_proj`` sliced at
load, qkv biases, and PARTIAL (0.5) INTERLEAVED rotary.
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
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope_interleaved,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d


def _slice_rows_t(lo: int, hi: int):
    return lambda x: np.ascontiguousarray(x[lo:hi].T)


class Glm4ForCausalLM:

    # GLM-4 (0414) adds post_self_attn/post_mlp sandwich norms; the
    # older GLM-4-9B "glm" architecture is the same block without them
    has_post_norms = True

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = config.head_dim
        self.hidden = config.hidden_size
        self.inter = config.intermediate_size
        self.L = config.num_layers
        self.sm_scale = self.head_dim**-0.5
        self.rot_dim = int(self.head_dim *
                           getattr(hf, "partial_rotary_factor", 0.5))
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.rot_dim, config.rope_theta,
                             config.rope_scaling))
        self.qkv_bias = bool(getattr(hf, "attention_bias", True))
        self.tie_embeddings = config.tie_word_embeddings

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        L, H, I, V = self.L, self.hidden, self.inter, c.vocab_size
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
        ]
        if not self.tie_embeddings:
            specs.append(
                ParamSpec("lm_head", (H, V), P(None, "model"),
                          "lm_head.weight", transform=t))
        norms = ["input_layernorm", "post_attention_layernorm"]
        if self.has_post_norms:
            norms += ["post_self_attn_layernorm",
                      "post_mlp_layernorm"]
        for name in norms:
            specs.append(
                stk(name, (H, ), P(None, None), f"{name}.weight",
                    transform=None))
        for name, width in (("q", qd), ("k", kd), ("v", kd)):
            specs.append(
                stk(f"{name}_proj", (H, width), P(None, None, "model"),
                    f"self_attn.{name}_proj.weight"))
            if self.qkv_bias:
                specs.append(
                    stk(f"{name}_bias", (width, ), P(None, "model"),
                        f"self_attn.{name}_proj.bias",
                        transform=None))
        specs += [
            stk("o_proj", (qd, H), P(None, "model", None),
                "self_attn.o_proj.weight"),
            stk("gate_proj", (H, I), P(None, None, "model"),
                "mlp.gate_up_proj.weight",
                transform=_slice_rows_t(0, I)),
            stk("up_proj", (H, I), P(None, None, "model"),
                "mlp.gate_up_proj.weight",
                transform=_slice_rows_t(I, 2 * I)),
            stk("down_proj", (I, H), P(None, "model", None),
                "mlp.down_proj.weight"),
        ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    def _rope(self, q, k, positions):
        return apply_rope_interleaved(q, k, positions, self.inv_freq)

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        cfg = self.cfg
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        layers = params["layers"]
        rd = self.rot_dim

        def layer_fn(l, carry):
            x, kv = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = rms_norm(x, w["input_layernorm"], cfg.rms_norm_eps)
            q = matmul_b(h, w, "q")
            k = matmul_b(h, w, "k")
            v = matmul_b(h, w, "v")
            q = q.reshape(t, self.num_q, self.head_dim)
            k = k.reshape(t, self.num_kv, self.head_dim)
            v = v.reshape(t, self.num_kv, self.head_dim)
            # partial INTERLEAVED rotary (GLM convention)
            q_rot, k_rot = self._rope(q[..., :rd], k[..., :rd],
                                      positions)
            q = jnp.concatenate([q_rot, q[..., rd:]], axis=-1)
            k = jnp.concatenate([k_rot, k[..., rd:]], axis=-1)
            o, kv = attention(q, k, v, kv, l, attn_meta, self.sm_scale,
                              use_pallas=use_pallas)
            o = o.reshape(t, -1) @ w["o_proj"]
            if self.has_post_norms:
                o = rms_norm(o, w["post_self_attn_layernorm"],
                             cfg.rms_norm_eps)
            x = res + o
            res = x
            h = rms_norm(x, w["post_attention_layernorm"],
                         cfg.rms_norm_eps)
            h = silu_and_mul(h @ w["gate_proj"], h @ w["up_proj"])
            h = h @ w["down_proj"]
            if self.has_post_norms:
                h = rms_norm(h, w["post_mlp_layernorm"],
                             cfg.rms_norm_eps)
            return res + h, kv

        def matmul_b(h, w, name):
            y = h @ w[f"{name}_proj"]
            if self.qkv_bias:
                y = y + w[f"{name}_bias"]
            return y

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)


class GlmForCausalLM(Glm4ForCausalLM):
    """Reference: vllm/model_executor/models/glm.py — GLM-4-9B/Z1
    (pre-0414): the Glm4 block without the sandwich post-norms."""

    has_post_norms = False
