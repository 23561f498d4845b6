"""Qwen3 / Qwen3-MoE decoders.

Reference parity: vllm/model_executor/models/qwen3.py + qwen3_moe.py.
Differences vs the Llama family: per-head RMSNorm on Q and K after
projection (before RoPE), explicit head_dim (may differ from
hidden/heads), no qkv bias. Qwen3-MoE swaps the dense SwiGLU MLP for
a softmax top-k expert block (no shared expert, unlike Qwen2-MoE).
Same stacked-layer fori_loop structure as models/llama.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.activation import ACT2FN
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.quantization.weights import matmul


class Qwen3ForCausalLM:

    is_moe = False

    def __init__(self, config: ModelConfig):
        self.cfg = config
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = config.head_dim
        self.hidden = config.hidden_size
        self.inter = config.intermediate_size
        self.L = config.num_layers
        self.sm_scale = self.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta,
                             config.rope_scaling))
        act = getattr(config.hf_config, "hidden_act", "silu") \
            if config.hf_config is not None else "silu"
        self.act_fn = ACT2FN[act]
        self.tie_embeddings = config.tie_word_embeddings

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        L, H, I, V = self.L, self.hidden, self.inter, c.vocab_size
        t = transpose2d

        def stk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(path, (L, *shape), spec, hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
            stk("layers.input_layernorm", (H, ), P(None, None),
                "model.layers.{i}.input_layernorm.weight",
                transform=None),
            stk("layers.q_proj", (H, qd), P(None, None, "model"),
                "model.layers.{i}.self_attn.q_proj.weight"),
            stk("layers.k_proj", (H, kd), P(None, None, "model"),
                "model.layers.{i}.self_attn.k_proj.weight"),
            stk("layers.v_proj", (H, kd), P(None, None, "model"),
                "model.layers.{i}.self_attn.v_proj.weight"),
            stk("layers.q_norm", (self.head_dim, ), P(None, None),
                "model.layers.{i}.self_attn.q_norm.weight",
                transform=None),
            stk("layers.k_norm", (self.head_dim, ), P(None, None),
                "model.layers.{i}.self_attn.k_norm.weight",
                transform=None),
            stk("layers.o_proj", (qd, H), P(None, "model", None),
                "model.layers.{i}.self_attn.o_proj.weight"),
            stk("layers.post_attention_layernorm", (H, ), P(None, None),
                "model.layers.{i}.post_attention_layernorm.weight",
                transform=None),
        ]
        if self.is_moe:
            E, mi = c.num_experts, c.moe_intermediate_size

            def expert(path, shape, spec, hf_key):
                return ParamSpec(path, (L, E, *shape), spec, hf_key,
                                 stacked=True, num_experts=E,
                                 transform=t)

            specs += [
                stk("layers.router", (H, E), P(None, None, None),
                    "model.layers.{i}.mlp.gate.weight"),
                expert("layers.w_gate", (H, mi),
                       P(None, None, None, "model"),
                       "model.layers.{i}.mlp.experts.{e}"
                       ".gate_proj.weight"),
                expert("layers.w_up", (H, mi),
                       P(None, None, None, "model"),
                       "model.layers.{i}.mlp.experts.{e}"
                       ".up_proj.weight"),
                expert("layers.w_down", (mi, H),
                       P(None, None, "model", None),
                       "model.layers.{i}.mlp.experts.{e}"
                       ".down_proj.weight"),
            ]
        else:
            specs += [
                stk("layers.gate_proj", (H, I), P(None, None, "model"),
                    "model.layers.{i}.mlp.gate_proj.weight"),
                stk("layers.up_proj", (H, I), P(None, None, "model"),
                    "model.layers.{i}.mlp.up_proj.weight"),
                stk("layers.down_proj", (I, H), P(None, "model", None),
                    "model.layers.{i}.mlp.down_proj.weight"),
            ]
        if not self.tie_embeddings:
            specs.append(
                ParamSpec("lm_head", (H, V), P(None, "model"),
                          "lm_head.weight", transform=t))
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    def _apply_rope(self, q, k, positions):
        """Hook: Qwen3-VL overrides with interleaved mrope."""
        return apply_rope(q, k, positions, self.inv_freq)

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None,
                 deepstack_embeds: Optional[jax.Array] = None):
        cfg = self.cfg
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        nds = (deepstack_embeds.shape[0]
               if deepstack_embeds is not None else 0)

        layers = params["layers"]

        def layer_fn(l, carry):
            x, kv_caches = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = rms_norm(x, w["input_layernorm"], cfg.rms_norm_eps)
            q = matmul(h, w["q_proj"]).reshape(t, self.num_q,
                                               self.head_dim)
            k = matmul(h, w["k_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            v = matmul(h, w["v_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            # per-head q/k norm (the Qwen3 delta)
            q = rms_norm(q, w["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, w["k_norm"], cfg.rms_norm_eps)
            q, k = self._apply_rope(q, k, positions)
            o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                     self.sm_scale,
                                     use_pallas=use_pallas)
            x = res + matmul(o.reshape(t, -1), w["o_proj"])

            res = x
            h = rms_norm(x, w["post_attention_layernorm"],
                         cfg.rms_norm_eps)
            if self.is_moe:
                from vllm_main_modify_tpu.layers.moe import moe_ffn

                x = res + moe_ffn(h, w["router"], w["w_gate"],
                                  w["w_up"], w["w_down"],
                                  cfg.num_experts_per_tok, self.act_fn,
                                  renormalize=self.renormalize)
            else:
                h = self.act_fn(matmul(h, w["gate_proj"]),
                                matmul(h, w["up_proj"]))
                x = res + matmul(h, w["down_proj"])
            if nds:
                # Qwen3-VL DeepStack: visual features injected into
                # the first len(deepstack) layers' outputs at the
                # image positions (qwen3_vl.py _deepstack_process)
                ds = jax.lax.dynamic_index_in_dim(
                    deepstack_embeds, jnp.minimum(l, nds - 1), 0,
                    keepdims=False)
                x = x + jnp.where(l < nds, 1.0, 0.0).astype(
                    x.dtype) * ds.astype(x.dtype)
            return x, kv_caches

        # fori_loop with the KV cache as carry: in-place page updates.
        # (a lax.scan emitting per-layer KV would allocate a SECOND
        # full-size KV buffer for the stacked outputs — 2x HBM)
        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)


class Qwen3MoeForCausalLM(Qwen3ForCausalLM):
    """Reference: vllm/model_executor/models/qwen3_moe.py. Softmax
    top-k routing with norm_topk_prob renormalization; every layer is
    sparse (mlp_only_layers / decoder_sparse_step variants are not
    supported)."""

    is_moe = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.renormalize = bool(getattr(hf, "norm_topk_prob", True))
        assert not getattr(hf, "mlp_only_layers", None), \
            "mlp_only_layers not supported"
        assert getattr(hf, "decoder_sparse_step", 1) in (0, 1), \
            "decoder_sparse_step > 1 not supported"
