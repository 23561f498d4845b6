"""OPT decoder (learned positions with the historical +2 offset,
ReLU MLP, pre-LN).

Reference parity: vllm/model_executor/models/opt.py. Only the
``do_layer_norm_before=True`` (OPT-350M+) and
``word_embed_proj_dim == hidden_size`` configurations are supported
— the 125M post-LN / projected-embedding variants assert.
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
from vllm_main_modify_tpu.models.interface import ParamSpec

POS_OFFSET = 2  # OPT's learned position table starts at index 2


class OPTForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_heads = config.num_attention_heads
        self.head_dim = self.hidden // self.num_heads
        self.inter = getattr(hf, "ffn_dim", 4 * self.hidden)
        self.max_pos = hf.max_position_embeddings
        self.ln_eps = 1e-5
        self.sm_scale = self.head_dim**-0.5
        assert getattr(hf, "do_layer_norm_before", True), \
            "OPT post-LN variant not supported"
        assert getattr(hf, "word_embed_proj_dim",
                       self.hidden) == self.hidden, \
            "OPT projected embeddings not supported"

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, I, V, L = self.hidden, self.inter, c.vocab_size, self.L
        t = lambda x: np.ascontiguousarray(x.T)

        def stk(path, shape, spec, hf_key, transform=None):
            return ParamSpec(f"layers.{path}", (L, *shape), spec,
                             "model.decoder.layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.decoder.embed_tokens.weight",
                      transform=None),
            ParamSpec("embed_positions",
                      (self.max_pos + POS_OFFSET, H), P(None, None),
                      "model.decoder.embed_positions.weight",
                      transform=None),
            ParamSpec("final_norm", (H, ), P(),
                      "model.decoder.final_layer_norm.weight",
                      transform=None),
            ParamSpec("final_norm_bias", (H, ), P(),
                      "model.decoder.final_layer_norm.bias",
                      transform=None),
        ]
        for name in ("self_attn_layer_norm", "final_layer_norm"):
            specs += [
                stk(name, (H, ), P(None, None), f"{name}.weight"),
                stk(f"{name}_bias", (H, ), P(None, None),
                    f"{name}.bias"),
            ]
        for name in ("q", "k", "v"):
            specs += [
                stk(f"{name}_proj", (H, H), P(None, None, "model"),
                    f"self_attn.{name}_proj.weight", transform=t),
                stk(f"{name}_bias", (H, ), P(None, "model"),
                    f"self_attn.{name}_proj.bias"),
            ]
        specs += [
            stk("o_proj", (H, H), P(None, "model", None),
                "self_attn.out_proj.weight", transform=t),
            stk("o_bias", (H, ), P(None, None),
                "self_attn.out_proj.bias"),
            stk("fc1", (H, I), P(None, None, "model"), "fc1.weight",
                transform=t),
            stk("fc1_bias", (I, ), P(None, "model"), "fc1.bias"),
            stk("fc2", (I, H), P(None, "model", None), "fc2.weight",
                transform=t),
            stk("fc2_bias", (H, ), P(None, None), "fc2.bias"),
        ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_heads, self.head_dim, self.L

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids, axis=0)
        x = x + jnp.take(params["embed_positions"],
                         positions + POS_OFFSET, axis=0)
        t = x.shape[0]
        layers = params["layers"]

        def layer_fn(l, carry):
            x, kv = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = layer_norm(x, w["self_attn_layer_norm"],
                           w["self_attn_layer_norm_bias"],
                           self.ln_eps)
            q = (h @ w["q_proj"] + w["q_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            k = (h @ w["k_proj"] + w["k_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            v = (h @ w["v_proj"] + w["v_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            o, kv = attention(q, k, v, kv, l, attn_meta, self.sm_scale,
                              use_pallas=use_pallas)
            x = res + (o.reshape(t, -1) @ w["o_proj"] + w["o_bias"])
            res = x
            h = layer_norm(x, w["final_layer_norm"],
                           w["final_layer_norm_bias"], self.ln_eps)
            h = jax.nn.relu(h @ w["fc1"] + w["fc1_bias"])
            x = res + (h @ w["fc2"] + w["fc2_bias"])
            return x, kv

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = layer_norm(x, params["final_norm"],
                       params["final_norm_bias"], self.ln_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        return hidden.astype(jnp.float32) @ \
            params["embed_tokens"].T.astype(jnp.float32)
