"""Falcon decoder (7B multi-query / 40B+ grouped new-decoder /
RW sequential variants).

Reference parity: vllm/model_executor/models/falcon.py. The fused
``query_key_value`` tensor has three historical layouts (per-head
interleaved, multi-query [q...q k v], grouped [group: q.. k v]); all
are de-interleaved into separate q/k/v ParamSpecs at load. Residual
structure follows config: parallel attn+mlp from one LN (7B), two LNs
(40B, num_ln_in_parallel_attn=2), or sequential (falcon-rw). ALiBi
checkpoints are not supported (rotary only).
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


def _falcon_qkv_slice(nh: int, nkv: int, hd: int, part: str,
                      new_arch: bool, multi_query: bool):
    """[out, in] fused weight → [in, heads*hd] for q/k/v."""

    def f(x: np.ndarray) -> np.ndarray:
        inp = x.shape[1]
        if new_arch:
            qkv = x.reshape(nkv, nh // nkv + 2, hd, inp)
            w = {"q": qkv[:, :-2], "k": qkv[:, -2:-1],
                 "v": qkv[:, -1:]}[part]
        elif multi_query:
            qkv = x.reshape(nh + 2, hd, inp)
            w = {"q": qkv[:nh], "k": qkv[nh:nh + 1],
                 "v": qkv[nh + 1:]}[part]
        else:
            qkv = x.reshape(nh, 3, hd, inp)
            w = {"q": qkv[:, 0:1], "k": qkv[:, 1:2],
                 "v": qkv[:, 2:3]}[part]
            w = w[:, 0]
        return np.ascontiguousarray(w.reshape(-1, inp).T)

    return f


class FalconForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        assert not g("alibi", False), "Falcon ALiBi not supported"
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_heads = config.num_attention_heads
        self.head_dim = self.hidden // self.num_heads
        self.new_arch = bool(g("new_decoder_architecture", False))
        self.multi_query = bool(g("multi_query", True))
        if self.new_arch:
            self.num_kv = g("num_kv_heads") or self.num_heads
        elif self.multi_query:
            self.num_kv = 1
        else:
            self.num_kv = self.num_heads
        self.parallel = bool(g("parallel_attn", True))
        nln = g("num_ln_in_parallel_attn")
        self.two_ln = (nln or (2 if self.new_arch else 1)) == 2 \
            and self.new_arch
        self.bias = bool(g("bias", False))
        self.inter = g("ffn_hidden_size") or 4 * self.hidden
        self.ln_eps = g("layer_norm_epsilon", 1e-5)
        self.sm_scale = self.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta,
                             config.rope_scaling))
        self.tie_embeddings = config.tie_word_embeddings

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, I, V, L = self.hidden, self.inter, c.vocab_size, self.L
        nh, nkv, hd = self.num_heads, self.num_kv, self.head_dim
        t = lambda x: np.ascontiguousarray(x.T)

        def stk(path, shape, spec, hf_key, transform=None):
            return ParamSpec(f"layers.{path}", (L, *shape), spec,
                             "transformer.h.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("word_embeddings", (V, H), P("model", None),
                      "transformer.word_embeddings.weight",
                      transform=None),
            ParamSpec("ln_f", (H, ), P(), "transformer.ln_f.weight",
                      transform=None),
            ParamSpec("ln_f_bias", (H, ), P(),
                      "transformer.ln_f.bias", transform=None),
        ]
        if not self.tie_embeddings:
            specs.append(
                ParamSpec("lm_head", (H, V), P(None, "model"),
                          "lm_head.weight", transform=t))
        if self.two_ln:
            for name, key in (("ln_attn", "ln_attn"),
                              ("ln_mlp", "ln_mlp")):
                specs += [
                    stk(name, (H, ), P(None, None), f"{key}.weight"),
                    stk(f"{name}_bias", (H, ), P(None, None),
                        f"{key}.bias"),
                ]
        else:
            specs += [
                stk("input_layernorm", (H, ), P(None, None),
                    "input_layernorm.weight"),
                stk("input_layernorm_bias", (H, ), P(None, None),
                    "input_layernorm.bias"),
            ]
            if not self.parallel:
                specs += [
                    stk("post_attention_layernorm", (H, ),
                        P(None, None),
                        "post_attention_layernorm.weight"),
                    stk("post_attention_layernorm_bias", (H, ),
                        P(None, None),
                        "post_attention_layernorm.bias"),
                ]
        for part, width in (("q", nh * hd), ("k", nkv * hd),
                            ("v", nkv * hd)):
            specs.append(
                stk(f"{part}_proj", (H, width),
                    P(None, None, "model"),
                    "self_attention.query_key_value.weight",
                    transform=_falcon_qkv_slice(
                        nh, nkv, hd, part, self.new_arch,
                        self.multi_query)))
        specs += [
            stk("o_proj", (nh * hd, H), P(None, "model", None),
                "self_attention.dense.weight", transform=t),
            stk("fc_in", (H, I), P(None, None, "model"),
                "mlp.dense_h_to_4h.weight", transform=t),
            stk("fc_out", (I, H), P(None, "model", None),
                "mlp.dense_4h_to_h.weight", transform=t),
        ]
        if self.bias:
            specs += [
                stk("o_bias", (H, ), P(None, None),
                    "self_attention.dense.bias"),
                stk("fc_in_bias", (I, ), P(None, "model"),
                    "mlp.dense_h_to_4h.bias"),
                stk("fc_out_bias", (H, ), P(None, None),
                    "mlp.dense_4h_to_h.bias"),
                stk("qkv_bias_q", (nh * hd, ), P(None, "model"),
                    "self_attention.query_key_value.bias",
                    transform=_FalconBiasSlice(
                        nh, self.num_kv, hd, "q", self.new_arch,
                        self.multi_query)),
                stk("qkv_bias_k", (nkv * hd, ), P(None, "model"),
                    "self_attention.query_key_value.bias",
                    transform=_FalconBiasSlice(
                        nh, self.num_kv, hd, "k", self.new_arch,
                        self.multi_query)),
                stk("qkv_bias_v", (nkv * hd, ), P(None, "model"),
                    "self_attention.query_key_value.bias",
                    transform=_FalconBiasSlice(
                        nh, self.num_kv, hd, "v", self.new_arch,
                        self.multi_query)),
            ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = jnp.take(params["word_embeddings"], input_ids, axis=0)
        t = x.shape[0]
        layers = params["layers"]

        def layer_fn(l, carry):
            x, kv_caches = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            if self.two_ln:
                h_attn = layer_norm(x, w["ln_attn"], w["ln_attn_bias"],
                                    self.ln_eps)
                h_mlp = layer_norm(x, w["ln_mlp"], w["ln_mlp_bias"],
                                   self.ln_eps)
            else:
                h_attn = layer_norm(x, w["input_layernorm"],
                                    w["input_layernorm_bias"],
                                    self.ln_eps)
                h_mlp = h_attn  # parallel_attn shares the LN output

            q = matmul(h_attn, w["q_proj"])
            k = matmul(h_attn, w["k_proj"])
            v = matmul(h_attn, w["v_proj"])
            if self.bias:
                q = q + w["qkv_bias_q"]
                k = k + w["qkv_bias_k"]
                v = v + w["qkv_bias_v"]
            q = q.reshape(t, self.num_heads, self.head_dim)
            k = k.reshape(t, self.num_kv, self.head_dim)
            v = v.reshape(t, self.num_kv, self.head_dim)
            q, k = apply_rope(q, k, positions, self.inv_freq)
            o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                     self.sm_scale,
                                     use_pallas=use_pallas)
            attn_out = matmul(o.reshape(t, -1), w["o_proj"])
            if self.bias:
                attn_out = attn_out + w["o_bias"]

            if not (self.new_arch or self.parallel):
                x = x + attn_out
                h_mlp = layer_norm(x, w["post_attention_layernorm"],
                                   w["post_attention_layernorm_bias"],
                                   self.ln_eps)

            h = matmul(h_mlp, w["fc_in"])
            if self.bias:
                h = h + w["fc_in_bias"]
            h = jax.nn.gelu(h, approximate=False)
            mlp_out = matmul(h, w["fc_out"])
            if self.bias:
                mlp_out = mlp_out + w["fc_out_bias"]

            if self.new_arch or self.parallel:
                x = x + attn_out + mlp_out
            else:
                x = x + mlp_out
            return x, kv_caches

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = layer_norm(x, params["ln_f"], params["ln_f_bias"],
                       self.ln_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        w = params["word_embeddings"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)


class _FalconBiasSlice:

    def __init__(self, nh, nkv, hd, part, new_arch, multi_query):
        self.args = (nh, nkv, hd, part, new_arch, multi_query)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        nh, nkv, hd, part, new_arch, multi_query = self.args
        if new_arch:
            qkv = x.reshape(nkv, nh // nkv + 2, hd)
            b = {"q": qkv[:, :-2], "k": qkv[:, -2:-1],
                 "v": qkv[:, -1:]}[part]
        elif multi_query:
            qkv = x.reshape(nh + 2, hd)
            b = {"q": qkv[:nh], "k": qkv[nh:nh + 1],
                 "v": qkv[nh + 1:]}[part]
        else:
            qkv = x.reshape(nh, 3, hd)
            b = {"q": qkv[:, 0], "k": qkv[:, 1], "v": qkv[:, 2]}[part]
        return np.ascontiguousarray(b.reshape(-1))
