"""GPT-2 decoder (learned position embeddings, LayerNorm, fused
Conv1D qkv, gelu_new MLP).

Reference parity: vllm/model_executor/models/gpt2.py. TPU notes: the
fused ``c_attn`` Conv1D is split into q/k/v at load time (three
ParamSpecs slicing one HF tensor), so the forward is the same
projection structure as every other family; position embeddings are a
second gather that XLA fuses with the token-embedding gather.
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
from vllm_main_modify_tpu.quantization.weights import matmul


def _slice_cols(lo: int, hi: int):
    # Conv1D weights are stored [in, out] — no transpose needed
    return lambda x: np.ascontiguousarray(x[:, lo:hi])


def _slice_vec(lo: int, hi: int):
    return lambda x: np.ascontiguousarray(x[lo:hi])


class GPT2LMHeadModel:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_heads = config.num_attention_heads
        self.head_dim = self.hidden // self.num_heads
        self.inter = (getattr(hf, "n_inner", None)
                      or 4 * self.hidden)
        self.max_pos = config.hf_config.n_positions
        self.ln_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.sm_scale = self.head_dim**-0.5
        assert not getattr(hf, "scale_attn_by_inverse_layer_idx",
                           False), "scale_attn_by_inverse_layer_idx"
        assert not getattr(hf, "reorder_and_upcast_attn", False)

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, I, V, L = self.hidden, self.inter, c.vocab_size, self.L

        def stk(path, shape, spec, hf_key, transform=None):
            return ParamSpec(f"layers.{path}", (L, *shape), spec,
                             "transformer.h.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("wte", (V, H), P("model", None),
                      "transformer.wte.weight", transform=None),
            ParamSpec("wpe", (self.max_pos, H), P(None, None),
                      "transformer.wpe.weight", transform=None),
            ParamSpec("ln_f", (H, ), P(), "transformer.ln_f.weight",
                      transform=None),
            ParamSpec("ln_f_bias", (H, ), P(), "transformer.ln_f.bias",
                      transform=None),
        ]
        for name, key in (("ln_1", "ln_1"), ("ln_2", "ln_2")):
            specs += [
                stk(name, (H, ), P(None, None), f"{key}.weight"),
                stk(f"{name}_bias", (H, ), P(None, None),
                    f"{key}.bias"),
            ]
        # fused c_attn [H, 3H] sliced into q/k/v at load
        for j, name in enumerate(("q", "k", "v")):
            specs += [
                stk(f"{name}_proj", (H, H), P(None, None, "model"),
                    "attn.c_attn.weight",
                    transform=_slice_cols(j * H, (j + 1) * H)),
                stk(f"{name}_bias", (H, ), P(None, "model"),
                    "attn.c_attn.bias",
                    transform=_slice_vec(j * H, (j + 1) * H)),
            ]
        specs += [
            stk("o_proj", (H, H), P(None, "model", None),
                "attn.c_proj.weight"),
            stk("o_bias", (H, ), P(None, None), "attn.c_proj.bias"),
            stk("fc_in", (H, I), P(None, None, "model"),
                "mlp.c_fc.weight"),
            stk("fc_in_bias", (I, ), P(None, "model"),
                "mlp.c_fc.bias"),
            stk("fc_out", (I, H), P(None, "model", None),
                "mlp.c_proj.weight"),
            stk("fc_out_bias", (H, ), P(None, None),
                "mlp.c_proj.bias"),
        ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_heads, self.head_dim, self.L

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = (jnp.take(params["wte"], input_ids, axis=0) +
             jnp.take(params["wpe"], positions, axis=0))
        t = x.shape[0]
        layers = params["layers"]

        def layer_fn(l, carry):
            x, kv_caches = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = layer_norm(x, w["ln_1"], w["ln_1_bias"], self.ln_eps)
            q = (matmul(h, w["q_proj"]) + w["q_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            k = (matmul(h, w["k_proj"]) + w["k_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            v = (matmul(h, w["v_proj"]) + w["v_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                     self.sm_scale,
                                     use_pallas=use_pallas)
            x = res + matmul(o.reshape(t, -1), w["o_proj"]) + \
                w["o_bias"]

            res = x
            h = layer_norm(x, w["ln_2"], w["ln_2_bias"], self.ln_eps)
            h = jax.nn.gelu(matmul(h, w["fc_in"]) + w["fc_in_bias"],
                            approximate=True)
            x = res + matmul(h, w["fc_out"]) + w["fc_out_bias"]
            return x, kv_caches

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = layer_norm(x, params["ln_f"], params["ln_f_bias"],
                       self.ln_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        # GPT-2 always ties lm_head to wte
        w = params["wte"].T
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)


class GPT2ForSequenceClassification(GPT2LMHeadModel):
    """Reference: vllm/model_executor/models/gpt2.py
    GPT2ForSequenceClassification — backbone + bias-free score head,
    last-token pooling (served through the classify/score path)."""

    def __init__(self, config: ModelConfig):
        config.is_pooling_model = True
        super().__init__(config)
        self.num_labels = getattr(config.hf_config, "num_labels", 2)

    def param_specs(self) -> list[ParamSpec]:
        specs = super().param_specs()
        specs.append(
            ParamSpec("score", (self.hidden, self.num_labels),
                      P(None, None), "score.weight",
                      transform=lambda x: np.ascontiguousarray(x.T)))
        return specs

    def classify_logits(self, params, pooled_hidden):
        return pooled_hidden  # score head applied by the runner


class JAISLMHeadModel(GPT2LMHeadModel):
    """JAIS (reference: vllm/model_executor/models/jais.py): a GPT-2
    skeleton with muP scaling — alibi position bias instead of wpe
    (jais.py:114-119,235), embeddings scale (jais.py:236-239), swiglu
    MLP via a second c_fc2 projection (jais.py:145-172), 1/d attention
    scaling when mup_scale_qk_dot_by_d (jais.py:93-94), and an output
    logits scale (jais.py:307-313)."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self.alibi = g("position_embedding_type",
                       "learned") == "alibi"
        if self.alibi:
            from vllm_main_modify_tpu.models.bloom import \
                get_alibi_slopes

            self.slopes = get_alibi_slopes(self.num_heads)
        self.emb_scale = g("embeddings_scale",
                           g("mup_embeddings_scale", 1.0)) or 1.0
        self.swiglu = g("activation_function") == "swiglu"
        if g("scale_qk_dot_by_d", g("mup_scale_qk_dot_by_d", False)):
            self.sm_scale = 1.0 / self.head_dim
        ws = g("width_scale")
        self.logits_scale = ws if ws is not None else \
            (g("mup_output_alpha", 1.0) * g("mup_width_scale", 1.0))

    def param_specs(self) -> list[ParamSpec]:
        specs = super().param_specs()
        if self.alibi:
            specs = [s for s in specs if s.path != "wpe"]
        if self.swiglu:
            H, I, L = self.hidden, self.inter, self.L
            specs += [
                ParamSpec("layers.fc_in2", (L, H, I),
                          P(None, None, "model"),
                          "transformer.h.{i}.mlp.c_fc2.weight",
                          stacked=True),
                ParamSpec("layers.fc_in2_bias", (L, I),
                          P(None, "model"),
                          "transformer.h.{i}.mlp.c_fc2.bias",
                          stacked=True),
            ]
        if not self.cfg.tie_word_embeddings:
            specs.append(
                ParamSpec("lm_head",
                          (self.hidden, self.cfg.vocab_size),
                          P(None, "model"), "lm_head.weight",
                          transform=lambda x: np.ascontiguousarray(
                              x.T)))
        return specs

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = jnp.take(params["wte"], input_ids, axis=0)
        if not self.alibi:
            x = x + jnp.take(params["wpe"], positions, axis=0)
        x = x * self.emb_scale
        t = x.shape[0]
        layers = params["layers"]
        slopes = self.slopes if self.alibi else None

        def layer_fn(l, carry):
            x, kv_caches = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = layer_norm(x, w["ln_1"], w["ln_1_bias"], self.ln_eps)
            q = (matmul(h, w["q_proj"]) + w["q_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            k = (matmul(h, w["k_proj"]) + w["k_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            v = (matmul(h, w["v_proj"]) + w["v_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                     self.sm_scale,
                                     alibi_slopes=slopes,
                                     use_pallas=use_pallas)
            x = res + matmul(o.reshape(t, -1), w["o_proj"]) + \
                w["o_bias"]

            res = x
            h = layer_norm(x, w["ln_2"], w["ln_2_bias"], self.ln_eps)
            h1 = matmul(h, w["fc_in"]) + w["fc_in_bias"]
            if self.swiglu:
                h2 = matmul(h, w["fc_in2"]) + w["fc_in2_bias"]
                h = h1 * jax.nn.silu(h2)
            else:
                h = jax.nn.gelu(h1, approximate=True)
            x = res + matmul(h, w["fc_out"]) + w["fc_out_bias"]
            return x, kv_caches

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = layer_norm(x, params["ln_f"], params["ln_f_bias"],
                       self.ln_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        w = params["lm_head"] if "lm_head" in params \
            else params["wte"].T
        logits = hidden.astype(jnp.float32) @ w.astype(jnp.float32)
        return logits * self.logits_scale
