"""Chameleon (ChameleonForConditionalGeneration).

Reference: vllm/model_executor/models/chameleon.py — an early-fusion
multimodal decoder: images are quantized to DISCRETE codebook tokens
by a VQ-GAN encoder and spliced into the token stream (no soft
embeddings), then a llama-variant decoder with per-head q/k LayerNorm
(stats over head_dim, per-head affine) runs as a plain LM; image
tokens are masked out of the text logits (HF parity).

TPU design: the VQ-GAN encode runs HOST-SIDE at ingest
(multimodal/chameleon_vq.py, numpy) — the engine then sees ordinary
token ids, so prefix caching, paging and the jitted step need no
special handling; the decoder rides LlamaForCausalLM with the
qk_headnorm hook. The 30B ``swin_norm`` layer order is also
implemented.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import attention
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.models.interface import ParamSpec
from vllm_main_modify_tpu.models.llama import LlamaForCausalLM
from vllm_main_modify_tpu.quantization.weights import matmul


def _headnorm(x: jax.Array, w: jax.Array, b: jax.Array,
              eps: float = 1e-5) -> jax.Array:
    """LayerNorm over head_dim with per-head affine ([Hn, D] params;
    reference: ChameleonLayerNorm)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu)**2).mean(axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32)[None] +
            b.astype(jnp.float32)[None]).astype(x.dtype)


class ChameleonForConditionalGeneration(LlamaForCausalLM):

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.swin_norm = bool(getattr(hf, "swin_norm", False))

        def qk_headnorm(w, q, k):
            q = _headnorm(q, w["q_norm"], w["q_norm_bias"])
            k = _headnorm(k, w["k_norm"], w["k_norm_bias"])
            return q, k

        self.qk_headnorm = qk_headnorm
        # text generation disallows image codebook tokens (reference:
        # HF ChameleonForConditionalGeneration.forward logits mask)
        vmap = dict(getattr(hf, "vocabulary_map", None) or {})
        img_ids = sorted(v for n, v in vmap.items()
                         if n.startswith("IMGIMG"))
        mask = np.zeros((config.vocab_size, ), np.bool_)
        if img_ids:
            mask[np.asarray(img_ids)] = True
        self._image_logit_mask = jnp.asarray(mask)

    def param_specs(self) -> list[ParamSpec]:
        specs = super().param_specs()
        L = self.L
        hd = self.head_dim
        for name, heads in (("q_norm", self.num_q),
                            ("k_norm", self.num_kv)):
            for suffix, p in ((".weight", f"layers.{name}"),
                              (".bias", f"layers.{name}_bias")):
                specs.append(
                    ParamSpec(p, (L, heads, hd), P(None, None, None),
                              "model.layers.{i}.self_attn." + name +
                              suffix, stacked=True, transform=None))
        return specs

    def _layer_step(self, w, x, kv_caches, l, positions, attn_meta,
                    params, use_pallas, t, rope_l=None):
        if not self.swin_norm:
            return super()._layer_step(w, x, kv_caches, l, positions,
                                       attn_meta, params, use_pallas,
                                       t, rope_l)
        # swin_norm (Chameleon-30B): norms applied AFTER each sublayer
        # (reference: ChameleonSwinDecoderLayer)
        cfg = self.cfg
        res = x
        q = matmul(x, w["q_proj"])
        k = matmul(x, w["k_proj"])
        v = matmul(x, w["v_proj"])
        q = q.reshape(t, self.num_q, self.head_dim)
        k = k.reshape(t, self.num_kv, self.head_dim)
        v = v.reshape(t, self.num_kv, self.head_dim)
        q, k = self.qk_headnorm(w, q, k)
        q, k = self._apply_rope(q, k, positions)
        o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                 self.sm_scale,
                                 use_pallas=use_pallas)
        attn_out = matmul(o.reshape(t, -1), w["o_proj"])
        attn_out = rms_norm(attn_out, w["input_layernorm"],
                            cfg.rms_norm_eps)
        x = res + attn_out
        res = x
        h = self.act_fn(matmul(x, w["gate_proj"]),
                        matmul(x, w["up_proj"]))
        mlp_out = matmul(h, w["down_proj"])
        mlp_out = rms_norm(mlp_out, w["post_attention_layernorm"],
                           cfg.rms_norm_eps)
        return res + mlp_out, kv_caches

    def compute_logits(self, params, hidden):
        logits = super().compute_logits(params, hidden)
        return jnp.where(self._image_logit_mask[None, :],
                         jnp.float32(-1e30), logits)
