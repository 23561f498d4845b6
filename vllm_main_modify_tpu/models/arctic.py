"""Snowflake Arctic (ArcticForCausalLM): dense-MoE hybrid — every
MoE layer runs a parallel hidden-width dense "residual MLP" alongside
top-2-of-128 experts.

Reference parity: vllm/model_executor/models/arctic.py (+ its
remote-code ArcticConfig). Layer semantics with use_residual (the
shipped configuration — moe_layer_frequency 1):

    x1   = x + attn(input_layernorm(x))
    rmlp = residual_mlp(residual_layernorm(x1))      # ffn = hidden
    moe  = experts(post_attention_layernorm(x))      # NOTE: the
                                                     # PRE-attention
                                                     # residual input
    out  = x1 + rmlp + moe

Expert tensors are w1 (gate) / w3 (up) / w2 (down) under
``block_sparse_moe.experts.{e}``; the router is
``block_sparse_moe.gate``. Softmax top-k with renormalization.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import attention
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import apply_rope
from vllm_main_modify_tpu.layers.moe import moe_ffn
from vllm_main_modify_tpu.models.moe_llama import MoeDecoderBase
from vllm_main_modify_tpu.quantization.weights import matmul


class ArcticForCausalLM(MoeDecoderBase):

    ROUTER_KEY = "model.layers.{i}.block_sparse_moe.gate.weight"
    GATE_KEY = ("model.layers.{i}.block_sparse_moe.experts.{e}"
                ".w1.weight")
    UP_KEY = ("model.layers.{i}.block_sparse_moe.experts.{e}"
              ".w3.weight")
    DOWN_KEY = ("model.layers.{i}.block_sparse_moe.experts.{e}"
                ".w2.weight")

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        config.num_experts = int(getattr(hf, "num_local_experts", 8))
        config.num_experts_per_tok = int(
            getattr(hf, "num_experts_per_tok", 2))
        config.moe_intermediate_size = config.intermediate_size
        super().__init__(config)
        assert int(getattr(hf, "moe_layer_frequency", 1)) == 1, \
            "only the all-MoE Arctic configuration is supported"
        self.use_residual = bool(getattr(hf, "use_residual", True))

    def param_specs(self):
        specs = super().param_specs()
        if not self.use_residual:
            return specs
        from vllm_main_modify_tpu.models.interface import (
            ParamSpec, transpose2d)

        H, L = self.hidden, self.L
        t = transpose2d

        def stk(path, shape, hf_key, transform=t):
            return ParamSpec(f"layers.{path}", (L, *shape),
                             P(*([None] * (len(shape) + 1))),
                             "model.layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs += [
            stk("residual_layernorm", (H, ),
                "residual_layernorm.weight", transform=None),
            stk("residual_gate", (H, H), "residual_mlp.w1.weight"),
            stk("residual_up", (H, H), "residual_mlp.w3.weight"),
            stk("residual_down", (H, H), "residual_mlp.w2.weight"),
        ]
        return specs

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta, use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        cfg = self.cfg
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        layers = params["layers"]

        def layer_fn(l, carry):
            x, kv_caches = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res_in = x
            h = rms_norm(x, w["input_layernorm"], cfg.rms_norm_eps)
            q = matmul(h, w["q_proj"]).reshape(t, self.num_q,
                                               self.head_dim)
            k = matmul(h, w["k_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            v = matmul(h, w["v_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            q, k = apply_rope(q, k, positions, self.inv_freq)
            o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                     self.sm_scale,
                                     use_pallas=use_pallas)
            x1 = res_in + matmul(o.reshape(t, -1), w["o_proj"])

            if self.use_residual:
                hr = rms_norm(x1, w["residual_layernorm"],
                              cfg.rms_norm_eps)
                rmlp = matmul(
                    self.act_fn(matmul(hr, w["residual_gate"]),
                                matmul(hr, w["residual_up"])),
                    w["residual_down"])
                # the MoE branch reads the PRE-attention residual
                hm = rms_norm(res_in, w["post_attention_layernorm"],
                              cfg.rms_norm_eps)
                moe = moe_ffn(hm, w["router"], w["w_gate"],
                              w["w_up"], w["w_down"], self.top_k,
                              self.act_fn, renormalize=True)
                x = x1 + rmlp + moe
            else:
                hm = rms_norm(x1, w["post_attention_layernorm"],
                              cfg.rms_norm_eps)
                x = x1 + moe_ffn(hm, w["router"], w["w_gate"],
                                 w["w_up"], w["w_down"], self.top_k,
                                 self.act_fn, renormalize=True)
            return x, kv_caches

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, kv_caches
