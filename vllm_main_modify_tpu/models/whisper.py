"""Whisper: audio encoder + cross-attending decoder.

Reference parity: vllm/model_executor/models/whisper.py (+ the
cross-attention KV-cache spec, vllm/v1/kv_cache_interface.py
CrossAttentionSpec). TPU-native structure:

- the **audio encoder** (conv downsampling + bidirectional pre-LN
  transformer) runs ONCE per request at ingest in its own jit — like
  the LLaVA vision tower — and its per-layer cross K/V projections
  are written into a separate paged pool;
- the **decoder** is a normal causal LM over the paged self-KV cache
  (learned positions, pre-LN, biased projections except k_proj), plus
  per-layer cross attention: the same ragged paged kernel with the
  causal mask off, reading the cross pool (layers/attention.py
  cross_attention);
- decoding therefore flows through the unchanged engine: chunked
  prefill of the decoder prompt, paged decode, prefix caching keyed
  by (decoder tokens, audio content salt).
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
from vllm_main_modify_tpu.models.interface import ParamSpec


def _t(x):
    return np.ascontiguousarray(x.T)


class WhisperForConditionalGeneration:

    is_encoder_decoder = True

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.d = hf.d_model
        self.mel = hf.num_mel_bins
        self.enc_layers = hf.encoder_layers
        self.L = hf.decoder_layers
        self.heads = hf.decoder_attention_heads
        self.enc_heads = hf.encoder_attention_heads
        self.head_dim = self.d // self.heads
        self.ffn = hf.decoder_ffn_dim
        self.enc_ffn = hf.encoder_ffn_dim
        self.t_enc = hf.max_source_positions
        self.max_target = hf.max_target_positions
        self.eps = 1e-5
        self.sm_scale = self.head_dim**-0.5
        self.embed_scale = (self.d**0.5
                            if getattr(hf, "scale_embedding", False)
                            else 1.0)
        # decoder positions are a learned table; cap max_model_len
        config.max_model_len = min(config.max_model_len,
                                   self.max_target)
        config.num_layers = self.L

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        D, F, EF, V = self.d, self.ffn, self.enc_ffn, c.vocab_size

        def stk(side, n, path, shape, hf_key, transform=_t):
            return ParamSpec(
                f"{side}.layers.{path}", (n, *shape), P(*([None] * (
                    len(shape) + 1))),
                f"model.{side}.layers.{{i}}.{hf_key}",
                stacked=True, transform=transform)

        specs = [
            ParamSpec("embed_tokens", (V, D), P(None, None),
                      "model.decoder.embed_tokens.weight",
                      transform=None),
            ParamSpec("decoder_positions", (self.max_target, D),
                      P(None, None),
                      "model.decoder.embed_positions.weight",
                      transform=None),
            ParamSpec("decoder_norm", (D, ), P(),
                      "model.decoder.layer_norm.weight",
                      transform=None),
            ParamSpec("decoder_norm_bias", (D, ), P(),
                      "model.decoder.layer_norm.bias",
                      transform=None),
            # encoder front-end
            ParamSpec("encoder.conv1", (D, self.mel, 3),
                      P(None, None, None),
                      "model.encoder.conv1.weight", transform=None),
            ParamSpec("encoder.conv1_bias", (D, ), P(),
                      "model.encoder.conv1.bias", transform=None),
            ParamSpec("encoder.conv2", (D, D, 3), P(None, None, None),
                      "model.encoder.conv2.weight", transform=None),
            ParamSpec("encoder.conv2_bias", (D, ), P(),
                      "model.encoder.conv2.bias", transform=None),
            ParamSpec("encoder.positions", (self.t_enc, D),
                      P(None, None),
                      "model.encoder.embed_positions.weight",
                      transform=None),
            ParamSpec("encoder.norm", (D, ), P(),
                      "model.encoder.layer_norm.weight",
                      transform=None),
            ParamSpec("encoder.norm_bias", (D, ), P(),
                      "model.encoder.layer_norm.bias", transform=None),
        ]

        def attn_block(side, n, prefix):
            out = []
            for name, bias in (("q_proj", True), ("k_proj", False),
                               ("v_proj", True), ("out_proj", True)):
                out.append(stk(side, n, f"{prefix}_{name}", (D, D),
                               f"{prefix}.{name}.weight"))
                if bias:
                    out.append(
                        stk(side, n, f"{prefix}_{name}_bias", (D, ),
                            f"{prefix}.{name}.bias", transform=None))
            return out

        def common_block(side, n):
            out = attn_block(side, n, "self_attn")
            ff = EF if side == "encoder" else F
            out += [
                stk(side, n, "self_attn_layer_norm", (D, ),
                    "self_attn_layer_norm.weight", transform=None),
                stk(side, n, "self_attn_layer_norm_bias", (D, ),
                    "self_attn_layer_norm.bias", transform=None),
                stk(side, n, "fc1", (D, ff), "fc1.weight"),
                stk(side, n, "fc1_bias", (ff, ), "fc1.bias",
                    transform=None),
                stk(side, n, "fc2", (ff, D), "fc2.weight"),
                stk(side, n, "fc2_bias", (D, ), "fc2.bias",
                    transform=None),
                stk(side, n, "final_layer_norm", (D, ),
                    "final_layer_norm.weight", transform=None),
                stk(side, n, "final_layer_norm_bias", (D, ),
                    "final_layer_norm.bias", transform=None),
            ]
            return out

        specs += common_block("encoder", self.enc_layers)
        specs += common_block("decoder", self.L)
        specs += attn_block("decoder", self.L, "encoder_attn")
        specs += [
            stk("decoder", self.L, "encoder_attn_layer_norm", (D, ),
                "encoder_attn_layer_norm.weight", transform=None),
            stk("decoder", self.L, "encoder_attn_layer_norm_bias",
                (D, ), "encoder_attn_layer_norm.bias",
                transform=None),
        ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.heads, self.head_dim, self.L

    def cross_cache_spec(self) -> tuple[int, int, int, int]:
        """(kv_heads, head_dim, layers, encoder_len)."""
        return self.heads, self.head_dim, self.L, self.t_enc

    # ------------------------------------------------------------------
    # encoder (runs at ingest)
    # ------------------------------------------------------------------

    def _mha(self, w, prefix, q_in, kv_in, causal_mask=None):
        """Dense bidirectional attention for the ENCODER only."""
        t = q_in.shape[0]
        h, dh = self.enc_heads, self.d // self.enc_heads
        q = (q_in @ w[f"{prefix}_q_proj"] +
             w[f"{prefix}_q_proj_bias"]).reshape(t, h, dh)
        k = (kv_in @ w[f"{prefix}_k_proj"]).reshape(-1, h, dh)
        v = (kv_in @ w[f"{prefix}_v_proj"] +
             w[f"{prefix}_v_proj_bias"]).reshape(-1, h, dh)
        scores = jnp.einsum("qhd,khd->hqk", q, k) * (dh**-0.5)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", p, v).reshape(t, self.d)
        return o @ w[f"{prefix}_out_proj"] + \
            w[f"{prefix}_out_proj_bias"]

    def encode_audio(self, params,
                     input_features: jax.Array) -> jax.Array:
        """[N, mel, frames] log-mel → [N, T_enc, D] encoder states
        (reference: whisper.py WhisperEncoder)."""
        enc = params["encoder"]
        n = input_features.shape[0]
        x = input_features.astype(jnp.float32)
        x = jax.lax.conv_general_dilated(
            x, enc["conv1"].astype(jnp.float32), (1, ), [(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH")) + \
            enc["conv1_bias"][None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        # torch Conv1d pads symmetrically (padding=1); "SAME" with
        # stride 2 pads asymmetrically and shifts every window
        x = jax.lax.conv_general_dilated(
            x, enc["conv2"].astype(jnp.float32), (2, ), [(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH")) + \
            enc["conv2_bias"][None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.transpose(x, (0, 2, 1))  # [N, T, D]
        x = x + enc["positions"].astype(jnp.float32)[None]

        layers = enc["layers"]

        def layer_fn(l, x):
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)

            def one(xb):
                res = xb
                h = layer_norm(xb, w["self_attn_layer_norm"],
                               w["self_attn_layer_norm_bias"],
                               self.eps)
                xb = res + self._mha(w, "self_attn", h, h)
                res = xb
                h = layer_norm(xb, w["final_layer_norm"],
                               w["final_layer_norm_bias"], self.eps)
                h = jax.nn.gelu(h @ w["fc1"] + w["fc1_bias"],
                                approximate=False)
                return res + (h @ w["fc2"] + w["fc2_bias"])

            return jax.vmap(one)(x)

        x = jax.lax.fori_loop(0, self.enc_layers, layer_fn, x)
        return jax.vmap(lambda xb: layer_norm(
            xb, enc["norm"], enc["norm_bias"], self.eps))(x)

    def encode_cross_kv(self, params,
                        enc_states: jax.Array) -> jax.Array:
        """[T_enc, D] encoder states → [L, T_enc, 2*H*Dh] per-layer
        cross K/V in the paged cache's per-head-interleaved layout
        (the reference computes these lazily inside each decoder
        layer's encoder_attn; computing once at ingest is the whole
        point of the cross pool)."""
        dec = params["decoder"]["layers"]
        t = enc_states.shape[0]

        def layer_kv(wk, bk_unused, wv, bv):
            k = (enc_states @ wk).reshape(t, self.heads, self.head_dim)
            v = (enc_states @ wv + bv).reshape(t, self.heads,
                                               self.head_dim)
            return jnp.stack([k, v], axis=2).reshape(t, -1)

        return jax.vmap(layer_kv)(dec["encoder_attn_k_proj"],
                                  dec["encoder_attn_q_proj_bias"],
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
        if self.embed_scale != 1.0:
            x = x * jnp.asarray(self.embed_scale, dtype=x.dtype)
        pos = jnp.clip(positions, 0, self.max_target - 1)
        x = x + jnp.take(params["decoder_positions"], pos, axis=0)

        layers = params["decoder"]["layers"]

        def layer_fn(l, carry):
            x, kv = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            # self attention (causal, paged)
            res = x
            h = layer_norm(x, w["self_attn_layer_norm"],
                           w["self_attn_layer_norm_bias"], self.eps)
            q = (h @ w["self_attn_q_proj"] +
                 w["self_attn_q_proj_bias"]).reshape(
                     t, self.heads, self.head_dim)
            k = (h @ w["self_attn_k_proj"]).reshape(
                t, self.heads, self.head_dim)
            v = (h @ w["self_attn_v_proj"] +
                 w["self_attn_v_proj_bias"]).reshape(
                     t, self.heads, self.head_dim)
            o, kv = attention(q, k, v, kv, l, attn_meta,
                              self.sm_scale, use_pallas=use_pallas)
            x = res + (o.reshape(t, -1) @ w["self_attn_out_proj"] +
                       w["self_attn_out_proj_bias"])
            # cross attention (non-causal vs the encoder pool)
            res = x
            h = layer_norm(x, w["encoder_attn_layer_norm"],
                           w["encoder_attn_layer_norm_bias"],
                           self.eps)
            qc = (h @ w["encoder_attn_q_proj"] +
                  w["encoder_attn_q_proj_bias"]).reshape(
                      t, self.heads, self.head_dim)
            oc = cross_attention(qc, cross_kv_cache, l, attn_meta,
                                 self.sm_scale, self.heads,
                                 use_pallas=use_pallas)
            x = res + (oc.reshape(t, -1) @ w["encoder_attn_out_proj"]
                       + w["encoder_attn_out_proj_bias"])
            # FFN
            res = x
            h = layer_norm(x, w["final_layer_norm"],
                           w["final_layer_norm_bias"], self.eps)
            h = jax.nn.gelu(h @ w["fc1"] + w["fc1_bias"],
                            approximate=False)
            x = res + (h @ w["fc2"] + w["fc2_bias"])
            return x, kv

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = layer_norm(x, params["decoder_norm"],
                       params["decoder_norm_bias"], self.eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        # proj_out is tied to embed_tokens
        return hidden.astype(jnp.float32) @ \
            params["embed_tokens"].T.astype(jnp.float32)
