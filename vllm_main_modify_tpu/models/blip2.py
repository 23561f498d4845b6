"""BLIP-2 (Blip2ForConditionalGeneration).

Reference: vllm/model_executor/models/blip2.py — ViT vision tower
(fused-qkv BLIP variant) → Q-Former (learned query tokens, BERT-style
post-LN layers with cross-attention to image embeds every
``cross_attention_frequency`` layers) → language projection → decoder
(OPT family via the registry). Each image contributes
``num_query_tokens`` soft tokens merged at the prompt's image
placeholders.

TPU design: vision + Q-Former run inside the jitted image encoder
(fixed shapes — one image resolution, fixed query count) and the soft
tokens ride the shared mm-buffer scatter path; the decoder is the
registry's own OPT implementation, untouched.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d

V_PREFIX = "vision_model."
Q_PREFIX = "qformer.encoder.layer.{i}."


def _bert_attn(w, x, kv_src, heads, head_dim, eps):
    """Post-LN BERT attention block (self or cross)."""
    n, tq = x.shape[:2]
    tk = kv_src.shape[1]
    q = (x @ w["query"] + w["query_bias"]).reshape(
        n, tq, heads, head_dim)
    k = (kv_src @ w["key"] + w["key_bias"]).reshape(
        n, tk, heads, head_dim)
    v = (kv_src @ w["value"] + w["value_bias"]).reshape(
        n, tk, heads, head_dim)
    scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) * (head_dim**-0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(n, tq, -1)
    o = o @ w["dense"] + w["dense_bias"]
    return layer_norm(x + o, w["norm"], w["norm_bias"], eps)


def qformer_forward(layers, x, enc_states, n_layers, heads, head_dim,
                    x_freq, eps):
    """BLIP-2-style Q-Former over stacked layer params (shared with
    GraniteSpeech's projector — reference: Blip2QFormerModel)."""
    for l in range(n_layers):
        w = jax.tree.map(lambda a, l=l: a[l], layers)
        x = _bert_attn(w["attention"], x, x, heads, head_dim, eps)
        if l % x_freq == 0:
            x = _bert_attn(w["crossattention"], x, enc_states, heads,
                           head_dim, eps)
        h = jax.nn.gelu(
            x @ w["intermediate_query"] +
            w["intermediate_query_bias"], approximate=False)
        h = h @ w["output_query"] + w["output_query_bias"]
        x = layer_norm(x + h, w["output_query_norm"],
                       w["output_query_norm_bias"], eps)
    return x


class Blip2ForConditionalGeneration:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        qc = hf.qformer_config
        self.v_hidden = vc.hidden_size
        self.v_inter = vc.intermediate_size
        self.v_layers = vc.num_hidden_layers
        self.v_heads = vc.num_attention_heads
        self.v_head_dim = self.v_hidden // self.v_heads
        self.patch = vc.patch_size
        self.image_size = vc.image_size
        self.grid = self.image_size // self.patch
        self.num_patches = self.grid * self.grid
        self.v_eps = getattr(vc, "layer_norm_eps", 1e-5)

        self.q_hidden = qc.hidden_size
        self.q_layers = qc.num_hidden_layers
        self.q_heads = qc.num_attention_heads
        self.q_head_dim = self.q_hidden // self.q_heads
        self.q_inter = qc.intermediate_size
        self.q_eps = getattr(qc, "layer_norm_eps", 1e-12)
        self.x_freq = getattr(qc, "cross_attention_frequency", 2)
        self.num_query = hf.num_query_tokens

        from vllm_main_modify_tpu.models.registry import \
            resolve_model_cls

        text_archs = getattr(hf.text_config, "architectures",
                             None) or ["OPTForCausalLM"]
        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = text_archs[0]
        self.language_model = resolve_model_cls(text_archs[0])(
            text_cfg)
        self.text_cfg = text_cfg

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        D, I, L = self.v_hidden, self.v_inter, self.v_layers
        Dq, Iq, Lq = self.q_hidden, self.q_inter, self.q_layers
        H = getattr(self.text_cfg.hf_config, "hidden_size",
                    self.text_cfg.hidden_size)
        t = transpose2d

        def vstk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(
                f"vision.layers.{path}", (L, *shape), spec,
                V_PREFIX + "encoder.layers.{i}." + hf_key,
                stacked=True, transform=transform)

        def qstk(path, shape, hf_key, transform=t):
            return ParamSpec(f"qformer.layers.{path}", (Lq, *shape),
                             P(*([None] * (len(shape) + 1))),
                             Q_PREFIX + hf_key, stacked=True,
                             transform=transform,
                             fill_missing=0.0)

        specs = [
            ParamSpec("query_tokens", (1, self.num_query, Dq),
                      P(None, None, None), "query_tokens",
                      transform=None),
            ParamSpec("vision.class_embedding", (1, 1, D),
                      P(None, None, None),
                      V_PREFIX + "embeddings.class_embedding",
                      transform=None),
            ParamSpec("vision.patch_embedding",
                      (D, 3, self.patch, self.patch),
                      P(None, None, None, None),
                      V_PREFIX + "embeddings.patch_embedding.weight",
                      transform=None),
            ParamSpec("vision.patch_bias", (D, ), P(),
                      V_PREFIX + "embeddings.patch_embedding.bias",
                      transform=None),
            ParamSpec("vision.position_embedding",
                      (1, self.num_patches + 1, D),
                      P(None, None, None),
                      V_PREFIX + "embeddings.position_embedding",
                      transform=None),
            ParamSpec("vision.post_norm", (D, ), P(),
                      V_PREFIX + "post_layernorm.weight",
                      transform=None),
            ParamSpec("vision.post_norm_bias", (D, ), P(),
                      V_PREFIX + "post_layernorm.bias",
                      transform=None),
            ParamSpec("qformer.input_norm", (Dq, ), P(),
                      "qformer.layernorm.weight", transform=None),
            ParamSpec("qformer.input_norm_bias", (Dq, ), P(),
                      "qformer.layernorm.bias", transform=None),
            ParamSpec("projector.weight", (Dq, H), P(None, None),
                      "language_projection.weight", transform=t),
            ParamSpec("projector.bias", (H, ), P(),
                      "language_projection.bias", transform=None),
        ]
        for name in ("layer_norm1", "layer_norm2"):
            specs += [
                vstk(name, (D, ), P(None, None), f"{name}.weight",
                     transform=None),
                vstk(f"{name}_bias", (D, ), P(None, None),
                     f"{name}.bias", transform=None),
            ]
        specs += [
            vstk("qkv", (D, 3 * D), P(None, None, None),
                 "self_attn.qkv.weight"),
            vstk("qkv_bias", (3 * D, ), P(None, None),
                 "self_attn.qkv.bias", transform=None),
            vstk("projection", (D, D), P(None, None, None),
                 "self_attn.projection.weight"),
            vstk("projection_bias", (D, ), P(None, None),
                 "self_attn.projection.bias", transform=None),
            vstk("fc1", (D, I), P(None, None, None), "mlp.fc1.weight"),
            vstk("fc1_bias", (I, ), P(None, None), "mlp.fc1.bias",
                 transform=None),
            vstk("fc2", (I, D), P(None, None, None), "mlp.fc2.weight"),
            vstk("fc2_bias", (D, ), P(None, None), "mlp.fc2.bias",
                 transform=None),
        ]
        # Q-Former: self-attention on every layer; cross-attention
        # weights only exist on layers where i % x_freq == 0 —
        # fill_missing zero-fills the others (they are never read:
        # the layer gate below skips cross-attention there)
        for mod, dk in (("attention", Dq), ("crossattention", D)):
            for nm in ("query", "key", "value"):
                din = Dq if nm == "query" else dk
                specs += [
                    qstk(f"{mod}.{nm}", (din, Dq),
                         f"{mod}.attention.{nm}.weight"),
                    qstk(f"{mod}.{nm}_bias", (Dq, ),
                         f"{mod}.attention.{nm}.bias",
                         transform=None),
                ]
            specs += [
                qstk(f"{mod}.dense", (Dq, Dq),
                     f"{mod}.output.dense.weight"),
                qstk(f"{mod}.dense_bias", (Dq, ),
                     f"{mod}.output.dense.bias", transform=None),
                qstk(f"{mod}.norm", (Dq, ),
                     f"{mod}.output.LayerNorm.weight",
                     transform=None),
                qstk(f"{mod}.norm_bias", (Dq, ),
                     f"{mod}.output.LayerNorm.bias", transform=None),
            ]
        specs += [
            qstk("intermediate_query", (Dq, Iq),
                 "intermediate_query.dense.weight"),
            qstk("intermediate_query_bias", (Iq, ),
                 "intermediate_query.dense.bias", transform=None),
            qstk("output_query", (Iq, Dq),
                 "output_query.dense.weight"),
            qstk("output_query_bias", (Dq, ),
                 "output_query.dense.bias", transform=None),
            qstk("output_query_norm", (Dq, ),
                 "output_query.LayerNorm.weight", transform=None),
            qstk("output_query_norm_bias", (Dq, ),
                 "output_query.LayerNorm.bias", transform=None),
        ]
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def _vision(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] → [N, P+1, D] (post-layernormed)."""
        v = params["vision"]
        n = pixel_values.shape[0]
        x = jax.lax.conv_general_dilated(
            pixel_values.astype(jnp.float32),
            v["patch_embedding"].astype(jnp.float32),
            window_strides=(self.patch, self.patch), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + v["patch_bias"].astype(jnp.float32).reshape(1, -1, 1,
                                                            1)
        x = x.reshape(n, self.v_hidden, self.num_patches)
        x = jnp.transpose(x, (0, 2, 1))
        cls = jnp.broadcast_to(
            v["class_embedding"].astype(jnp.float32),
            (n, 1, self.v_hidden))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + v["position_embedding"].astype(jnp.float32)

        layers = v["layers"]

        def layer_fn(l, x):
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = layer_norm(x, w["layer_norm1"], w["layer_norm1_bias"],
                           self.v_eps)
            t = h.shape[1]
            qkv = (h @ w["qkv"] + w["qkv_bias"]).reshape(
                n, t, 3, self.v_heads, self.v_head_dim)
            q, k, val = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_head_dim**-0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", probs, val)
            x = res + (o.reshape(n, t, -1) @ w["projection"] +
                       w["projection_bias"])
            res = x
            h = layer_norm(x, w["layer_norm2"], w["layer_norm2_bias"],
                           self.v_eps)
            h = jax.nn.gelu(h @ w["fc1"] + w["fc1_bias"],
                            approximate=False)
            return res + (h @ w["fc2"] + w["fc2_bias"])

        x = jax.lax.fori_loop(0, self.v_layers, layer_fn, x)
        return layer_norm(x, v["post_norm"], v["post_norm_bias"],
                          self.v_eps)

    def _qformer(self, params, image_embeds: jax.Array) -> jax.Array:
        """Learned queries → [N, num_query, Dq]."""
        qf = params["qformer"]
        n = image_embeds.shape[0]
        x = jnp.broadcast_to(
            params["query_tokens"],
            (n, self.num_query, self.q_hidden)).astype(jnp.float32)
        x = layer_norm(x, qf["input_norm"], qf["input_norm_bias"],
                       self.q_eps)
        return qformer_forward(qf["layers"], x, image_embeds,
                               self.q_layers, self.q_heads,
                               self.q_head_dim, self.x_freq,
                               self.q_eps)

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N, num_query_tokens, H_text]."""
        img = self._vision(params, pixel_values)
        q = self._qformer(params, img)
        p = params["projector"]
        return q @ p["weight"] + p["bias"]

    # ------------------------------------------------------------------

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None):
        lm_params = params["language_model"]
        x = self.language_model.embed(lm_params, input_ids) \
            if hasattr(self.language_model, "embed") else \
            jnp.take(lm_params["embed_tokens"], input_ids, axis=0)
        if mm_embeds is not None:
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds.astype(x.dtype), mode="drop")
        return self.language_model(lm_params, input_ids, positions,
                                   kv_caches, attn_meta,
                                   use_pallas=use_pallas,
                                   inputs_embeds=x)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(
            params["language_model"], hidden)
