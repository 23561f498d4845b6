"""BART / mBART: text encoder-decoder served through the cross-KV
pool (reference: vllm/model_executor/models/bart.py,
vllm/model_executor/models/mbart.py — encoder prompt → encoder
states → per-layer cross K/V at ingest; decoder generates from
``decoder_start_token_id``).

TPU design: like Whisper, the encoder runs ONCE at request ingest and
the per-layer cross K/V are written into the paged cross pool, so the
jitted decode step stays shape-static. The encoder prompt is padded to
``t_enc`` (static shape) and masked by the true length; cross
attention masks via ``AttentionMetadata.cross_seq_lens``.

BART is post-LN (residual-add THEN LayerNorm); mBART is pre-LN with
final encoder/decoder LayerNorms (HF ``normalize_before``-style
difference between the two model families). Both use learned position
embeddings with the HF offset of 2 and optional sqrt(d) embed scale.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention,
                                                   cross_attention)
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d

_ACTS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


class BartForConditionalGeneration:
    """Post-LN BART; registered for ``BartForConditionalGeneration``
    and ``BartModel`` (reference registry.py maps both here)."""

    is_encoder_decoder = True
    # processor flag: the PROMPT is the encoder input; the decoder
    # side starts from decoder_start_token_id
    is_text_enc_dec = True
    pre_norm = False  # mBART overrides

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.d = hf.d_model
        self.enc_layers = hf.encoder_layers
        self.L = hf.decoder_layers
        self.heads = hf.decoder_attention_heads
        self.enc_heads = hf.encoder_attention_heads
        self.head_dim = self.d // self.heads
        self.ffn = hf.decoder_ffn_dim
        self.enc_ffn = hf.encoder_ffn_dim
        self.max_pos = hf.max_position_embeddings
        self.eps = 1e-5
        self.sm_scale = self.head_dim**-0.5
        self.embed_scale = (self.d**0.5
                            if getattr(hf, "scale_embedding", False)
                            else 1.0)
        self.act = _ACTS[getattr(hf, "activation_function", "gelu")]
        # static encoder length (one cross-pool stripe per request)
        self.t_enc = min(self.max_pos, config.max_model_len)
        config.max_model_len = min(config.max_model_len, self.max_pos)
        config.num_layers = self.L

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        D, V = self.d, c.vocab_size
        t = transpose2d

        specs = [
            ParamSpec("embed_tokens", (V, D), P("model", None),
                      "model.shared.weight", transform=None),
            ParamSpec("final_logits_bias", (1, V), P(None, "model"),
                      "final_logits_bias", transform=None),
        ]
        for side, n in (("encoder", self.enc_layers),
                        ("decoder", self.L)):
            specs += [
                ParamSpec(f"{side}.positions",
                          (self.max_pos + 2, D), P(None, None),
                          f"model.{side}.embed_positions.weight",
                          transform=None),
                ParamSpec(f"{side}.layernorm_embedding", (D, ), P(),
                          f"model.{side}.layernorm_embedding.weight",
                          transform=None),
                ParamSpec(f"{side}.layernorm_embedding_bias", (D, ),
                          P(),
                          f"model.{side}.layernorm_embedding.bias",
                          transform=None),
            ]
            if self.pre_norm:
                specs += [
                    ParamSpec(f"{side}.final_norm", (D, ), P(),
                              f"model.{side}.layer_norm.weight",
                              transform=None),
                    ParamSpec(f"{side}.final_norm_bias", (D, ), P(),
                              f"model.{side}.layer_norm.bias",
                              transform=None),
                ]

            def stk(name, shape, spec, hf_key, transform=t,
                    side=side, n=n):
                return ParamSpec(f"{side}.layers.{name}", (n, *shape),
                                 spec,
                                 f"model.{side}.layers.{{i}}." + hf_key,
                                 stacked=True, transform=transform)

            ffn = self.enc_ffn if side == "encoder" else self.ffn
            attns = ["self_attn"]
            if side == "decoder":
                attns.append("encoder_attn")
            for a in attns:
                for pn in ("q", "k", "v", "out"):
                    specs.append(
                        stk(f"{a}_{pn}_proj", (D, D),
                            P(None, None, "model" if pn != "out"
                              else None),
                            f"{a}.{pn}_proj.weight"))
                    specs.append(
                        stk(f"{a}_{pn}_proj_bias", (D, ),
                            P(None, "model" if pn != "out" else None),
                            f"{a}.{pn}_proj.bias", transform=None))
                specs += [
                    stk(f"{a}_layer_norm", (D, ), P(None, None),
                        f"{a}_layer_norm.weight", transform=None),
                    stk(f"{a}_layer_norm_bias", (D, ), P(None, None),
                        f"{a}_layer_norm.bias", transform=None),
                ]
            specs += [
                stk("fc1", (D, ffn), P(None, None, "model"),
                    "fc1.weight"),
                stk("fc1_bias", (ffn, ), P(None, "model"), "fc1.bias",
                    transform=None),
                stk("fc2", (ffn, D), P(None, "model", None),
                    "fc2.weight"),
                stk("fc2_bias", (D, ), P(None, None), "fc2.bias",
                    transform=None),
                stk("final_layer_norm", (D, ), P(None, None),
                    "final_layer_norm.weight", transform=None),
                stk("final_layer_norm_bias", (D, ), P(None, None),
                    "final_layer_norm.bias", transform=None),
            ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.heads, self.head_dim, self.L

    def cross_cache_spec(self) -> tuple[int, int, int, int]:
        """(kv_heads, head_dim, layers, encoder_len)."""
        return self.heads, self.head_dim, self.L, self.t_enc

    # ------------------------------------------------------------------
    # encoder (runs once at ingest)
    # ------------------------------------------------------------------

    def _sublayer(self, x, res, w, name):
        """Residual + LN with BART/mBART placement."""
        if self.pre_norm:
            return res + x
        return layer_norm(res + x, w[f"{name}"], w[f"{name}_bias"],
                          self.eps)

    def _pre(self, x, w, name):
        if self.pre_norm:
            return layer_norm(x, w[f"{name}"], w[f"{name}_bias"],
                              self.eps)
        return x

    def _enc_mha(self, w, x, pad_mask):
        t = x.shape[0]
        h, dh = self.enc_heads, self.d // self.enc_heads
        q = (x @ w["self_attn_q_proj"] +
             w["self_attn_q_proj_bias"]).reshape(t, h, dh)
        k = (x @ w["self_attn_k_proj"] +
             w["self_attn_k_proj_bias"]).reshape(t, h, dh)
        v = (x @ w["self_attn_v_proj"] +
             w["self_attn_v_proj_bias"]).reshape(t, h, dh)
        scores = jnp.einsum("qhd,khd->hqk", q, k) * (dh**-0.5)
        scores = jnp.where(pad_mask[None, None, :], scores,
                           jnp.finfo(scores.dtype).min)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", p, v).reshape(t, self.d)
        return o @ w["self_attn_out_proj"] + \
            w["self_attn_out_proj_bias"]

    def encode_text_enc(self, params, input_ids: jax.Array,
                        enc_len) -> jax.Array:
        """[T_enc] padded token ids (+ true length) → [T_enc, D]
        encoder states."""
        enc = params["encoder"]
        t = input_ids.shape[0]
        pad_mask = jnp.arange(t) < enc_len
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        x = x.astype(jnp.float32) * self.embed_scale
        x = x + enc["positions"][2:2 + t].astype(jnp.float32)
        x = layer_norm(x, enc["layernorm_embedding"],
                       enc["layernorm_embedding_bias"], self.eps)

        layers = enc["layers"]

        def layer_fn(l, x):
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = self._pre(x, w, "self_attn_layer_norm")
            h = self._enc_mha(w, h, pad_mask)
            x = self._sublayer(h, res, w, "self_attn_layer_norm")
            res = x
            h = self._pre(x, w, "final_layer_norm")
            h = self.act(h @ w["fc1"] + w["fc1_bias"])
            h = h @ w["fc2"] + w["fc2_bias"]
            return self._sublayer(h, res, w, "final_layer_norm")

        x = jax.lax.fori_loop(0, self.enc_layers, layer_fn, x)
        if self.pre_norm:
            x = layer_norm(x, enc["final_norm"],
                           enc["final_norm_bias"], self.eps)
        # zero padded rows so cross K/V of dead positions are inert
        return jnp.where(pad_mask[:, None], x, 0.0)

    def encode_cross_kv(self, params,
                        enc_states: jax.Array) -> jax.Array:
        """[T_enc, D] → [L, T_enc, 2*H*Dh] per-layer cross K/V in the
        paged pool's interleaved layout (same design as whisper.py
        encode_cross_kv)."""
        dec = params["decoder"]["layers"]
        t = enc_states.shape[0]

        def layer_kv(wk, bk, wv, bv):
            k = (enc_states @ wk + bk).reshape(t, self.heads,
                                               self.head_dim)
            v = (enc_states @ wv + bv).reshape(t, self.heads,
                                               self.head_dim)
            return jnp.stack([k, v], axis=2).reshape(t, -1)

        return jax.vmap(layer_kv)(dec["encoder_attn_k_proj"],
                                  dec["encoder_attn_k_proj_bias"],
                                  dec["encoder_attn_v_proj"],
                                  dec["encoder_attn_v_proj_bias"])

    # ------------------------------------------------------------------
    # decoder (the jitted step)
    # ------------------------------------------------------------------

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 cross_kv_cache: Optional[jax.Array] = None):
        t = input_ids.shape[0]
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        x = x * jnp.asarray(self.embed_scale, dtype=x.dtype)
        dec = params["decoder"]
        pos = jnp.clip(positions, 0, self.max_pos - 1)
        x = x + jnp.take(dec["positions"], pos + 2, axis=0)
        x = layer_norm(x, dec["layernorm_embedding"],
                       dec["layernorm_embedding_bias"], self.eps)

        layers = dec["layers"]

        def layer_fn(l, carry):
            x, kv = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            # self attention (causal, paged)
            res = x
            h = self._pre(x, w, "self_attn_layer_norm")
            q = (h @ w["self_attn_q_proj"] +
                 w["self_attn_q_proj_bias"]).reshape(
                     t, self.heads, self.head_dim)
            k = (h @ w["self_attn_k_proj"] +
                 w["self_attn_k_proj_bias"]).reshape(
                     t, self.heads, self.head_dim)
            v = (h @ w["self_attn_v_proj"] +
                 w["self_attn_v_proj_bias"]).reshape(
                     t, self.heads, self.head_dim)
            o, kv = attention(q, k, v, kv, l, attn_meta,
                              self.sm_scale, use_pallas=use_pallas)
            o = o.reshape(t, -1) @ w["self_attn_out_proj"] + \
                w["self_attn_out_proj_bias"]
            x = self._sublayer(o, res, w, "self_attn_layer_norm")
            # cross attention (non-causal vs the encoder pool)
            res = x
            h = self._pre(x, w, "encoder_attn_layer_norm")
            qc = (h @ w["encoder_attn_q_proj"] +
                  w["encoder_attn_q_proj_bias"]).reshape(
                      t, self.heads, self.head_dim)
            oc = cross_attention(qc, cross_kv_cache, l, attn_meta,
                                 self.sm_scale, self.heads,
                                 use_pallas=use_pallas)
            oc = oc.reshape(t, -1) @ w["encoder_attn_out_proj"] + \
                w["encoder_attn_out_proj_bias"]
            x = self._sublayer(oc, res, w, "encoder_attn_layer_norm")
            # FFN
            res = x
            h = self._pre(x, w, "final_layer_norm")
            h = self.act(h @ w["fc1"] + w["fc1_bias"])
            h = h @ w["fc2"] + w["fc2_bias"]
            x = self._sublayer(h, res, w, "final_layer_norm")
            return x, kv

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        if self.pre_norm:
            x = layer_norm(x, dec["final_norm"],
                           dec["final_norm_bias"], self.eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        logits = hidden.astype(jnp.float32) @ \
            params["embed_tokens"].T.astype(jnp.float32)
        return logits + params["final_logits_bias"].astype(
            jnp.float32)


class MBartForConditionalGeneration(BartForConditionalGeneration):
    """Pre-LN mBART with final encoder/decoder LayerNorms (reference:
    vllm/model_executor/models/mbart.py)."""

    pre_norm = True
