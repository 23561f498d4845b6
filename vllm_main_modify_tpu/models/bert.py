"""BERT-family encoder-only models: embeddings + cross-encoder
classification (BERT, RoBERTa, XLM-RoBERTa).

Reference parity: vllm/model_executor/models/bert.py + roberta.py.
TPU-native shape: encoder-only models have NO KV cache (the scheduler
runs them through a NullGroupManager and the whole prompt lands in one
step — chunked prefill is disabled, since bidirectional attention
cannot be computed incrementally). Attention is full self-attention
within each packed segment, masked by the ragged geometry the step
already carries. Pooling (CLS / sentence-transformers mean) happens in
the fused step; classification heads project the pooled vector via the
runner's ``score`` path.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d


def _st_mean_pooling(model_dir: str) -> bool:
    """sentence-transformers checkpoints declare their pooling in
    1_Pooling/config.json (reference: vllm pooler config resolution)."""
    path = os.path.join(model_dir, "1_Pooling", "config.json")
    try:
        with open(path) as f:
            cfg = json.load(f)
        return bool(cfg.get("pooling_mode_mean_tokens"))
    except OSError:
        return False


class BertEmbeddingModel:
    """Arch "BertModel" — embedding encoder, CLS (or ST-mean)
    pooling."""

    PREFIX = ""  # checkpoint key prefix
    is_encoder_only = True
    position_offset = 0

    def __init__(self, config: ModelConfig):
        self.cfg = config
        config.is_pooling_model = True
        hf = config.hf_config
        self.hidden = config.hidden_size
        self.inter = config.intermediate_size
        self.L = config.num_layers
        self.num_heads = config.num_attention_heads
        self.head_dim = self.hidden // self.num_heads
        self.sm_scale = self.head_dim**-0.5
        self.eps = getattr(hf, "layer_norm_eps", 1e-12)
        self.max_pos = hf.max_position_embeddings
        self.num_types = getattr(hf, "type_vocab_size", 2)
        self.sep_token_id = getattr(hf, "sep_token_id", None) or 102
        self.pooling_type = ("mean" if _st_mean_pooling(config.model)
                             else "cls")

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, I, V, L = self.hidden, self.inter, c.vocab_size, self.L
        t = transpose2d
        pre = self.PREFIX

        def stk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"layers.{path}", (L, *shape), spec,
                             pre + "encoder.layer.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("word_embeddings", (V, H), P("model", None),
                      pre + "embeddings.word_embeddings.weight",
                      transform=None),
            ParamSpec("position_embeddings", (self.max_pos, H),
                      P(None, None),
                      pre + "embeddings.position_embeddings.weight",
                      transform=None),
            ParamSpec("token_type_embeddings", (self.num_types, H),
                      P(None, None),
                      pre + "embeddings.token_type_embeddings.weight",
                      transform=None),
            ParamSpec("embed_norm", (H, ), P(),
                      pre + "embeddings.LayerNorm.weight",
                      transform=None),
            ParamSpec("embed_norm_bias", (H, ), P(),
                      pre + "embeddings.LayerNorm.bias",
                      transform=None),
        ]
        for name, key in (("q", "attention.self.query"),
                          ("k", "attention.self.key"),
                          ("v", "attention.self.value")):
            specs += [
                stk(f"{name}_proj", (H, H), P(None, None, "model"),
                    key + ".weight"),
                stk(f"{name}_bias", (H, ), P(None, "model"),
                    key + ".bias", transform=None),
            ]
        specs += [
            stk("o_proj", (H, H), P(None, "model", None),
                "attention.output.dense.weight"),
            stk("o_bias", (H, ), P(None, None),
                "attention.output.dense.bias", transform=None),
            stk("attn_norm", (H, ), P(None, None),
                "attention.output.LayerNorm.weight", transform=None),
            stk("attn_norm_bias", (H, ), P(None, None),
                "attention.output.LayerNorm.bias", transform=None),
            stk("fc_in", (H, I), P(None, None, "model"),
                "intermediate.dense.weight"),
            stk("fc_in_bias", (I, ), P(None, "model"),
                "intermediate.dense.bias", transform=None),
            stk("fc_out", (I, H), P(None, "model", None),
                "output.dense.weight"),
            stk("fc_out_bias", (H, ), P(None, None),
                "output.dense.bias", transform=None),
            stk("out_norm", (H, ), P(None, None),
                "output.LayerNorm.weight", transform=None),
            stk("out_norm_bias", (H, ), P(None, None),
                "output.LayerNorm.bias", transform=None),
        ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return 0, 0, 0  # encoder-only: no KV cache

    def kv_cache_groups(self):
        from vllm_main_modify_tpu.core.kv_cache_interface import \
            KVCacheGroupSpec

        return [KVCacheGroupSpec(kind="full", layer_ids=(),
                                 kv_heads=1, head_dim=1)]

    # ------------------------------------------------------------------

    def _token_types(self, input_ids, seg_start):
        """Pair encoding: tokens after the FIRST [SEP] of their
        segment get type 1 ([CLS] a.. [SEP]=0, b.. [SEP]=1)."""
        is_sep = (input_ids == self.sep_token_id).astype(jnp.int32)
        inc = jnp.cumsum(is_sep)
        excl = inc - is_sep  # seps strictly before t
        base = jnp.take(excl, seg_start)  # value at segment start
        return ((excl - base) >= 1).astype(jnp.int32)

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        t = input_ids.shape[0]
        qsl = attn_meta.query_start_loc
        r = qsl.shape[0] - 1
        tt = jnp.arange(t, dtype=jnp.int32)
        row_of = (jnp.searchsorted(qsl, tt, side="right").astype(
            jnp.int32) - 1).clip(0, r - 1)
        seg_start = qsl[row_of]
        total = qsl[jnp.minimum(attn_meta.num_seqs[0], r)]
        valid = tt < total

        types = self._token_types(input_ids, seg_start)
        pos = jnp.clip(positions + self.position_offset, 0,
                       self.max_pos - 1)
        x = (jnp.take(params["word_embeddings"], input_ids, axis=0) +
             jnp.take(params["position_embeddings"], pos, axis=0) +
             jnp.take(params["token_type_embeddings"], types, axis=0))
        x = layer_norm(x, params["embed_norm"],
                       params["embed_norm_bias"], self.eps)

        # bidirectional attention within each packed segment
        mask = (row_of[:, None] == row_of[None, :]) & \
            valid[:, None] & valid[None, :]
        neg = jnp.asarray(-1e9, jnp.float32)
        layers = params["layers"]

        def layer_fn(l, x):
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            q = (x @ w["q_proj"] + w["q_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            k = (x @ w["k_proj"] + w["k_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            v = (x @ w["v_proj"] + w["v_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            scores = jnp.einsum("qhd,khd->hqk", q, k).astype(
                jnp.float32) * self.sm_scale
            scores = jnp.where(mask[None], scores, neg)
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            o = jnp.einsum("hqk,khd->qhd", probs, v).reshape(t, -1)
            x = layer_norm(x + (o @ w["o_proj"] + w["o_bias"]),
                           w["attn_norm"], w["attn_norm_bias"],
                           self.eps)
            h = jax.nn.gelu(x @ w["fc_in"] + w["fc_in_bias"],
                            approximate=False)
            h = h @ w["fc_out"] + w["fc_out_bias"]
            return layer_norm(x + h, w["out_norm"],
                              w["out_norm_bias"], self.eps)

        x = jax.lax.fori_loop(0, self.L, layer_fn, x)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        # encoder-only models never emit tokens; the step's sampler
        # still traces through this — give it a harmless projection
        return (hidden.astype(jnp.float32) @
                params["word_embeddings"].T.astype(jnp.float32))


class RobertaEmbeddingModel(BertEmbeddingModel):
    """Archs RobertaModel / XLMRobertaModel / RobertaForMaskedLM —
    positions offset by padding_idx + 1 (HF Roberta quirk). The
    "roberta." key prefix resolves for bare checkpoints through the
    loader's prefix-strip fallback."""

    PREFIX = "roberta."

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        pad = getattr(config.hf_config, "pad_token_id", 1)
        self.position_offset = (pad if pad is not None else 1) + 1


class BertForSequenceClassification(BertEmbeddingModel):
    """Cross-encoder scoring (reference: bert.py
    BertForSequenceClassification): pooler tanh over CLS + classifier
    — served through the runner's ``score``/classify path."""

    PREFIX = "bert."

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.pooling_type = "cls"
        self.num_labels = getattr(config.hf_config, "num_labels", 1)

    def param_specs(self) -> list[ParamSpec]:
        H = self.hidden
        t = transpose2d
        specs = super().param_specs()
        specs += [
            ParamSpec("pooler_dense", (H, H), P(None, None),
                      self.PREFIX + "pooler.dense.weight",
                      transform=t),
            ParamSpec("pooler_bias", (H, ), P(),
                      self.PREFIX + "pooler.dense.bias",
                      transform=None),
            ParamSpec("score", (H, self.num_labels), P(None, None),
                      "classifier.weight", transform=t),
            ParamSpec("score_bias", (self.num_labels, ), P(),
                      "classifier.bias", transform=None),
        ]
        return specs

    def pool_projection(self, params, pooled):
        """tanh pooler applied in the fused step before the runner's
        score head."""
        return jnp.tanh(pooled @ params["pooler_dense"].astype(
            pooled.dtype) + params["pooler_bias"].astype(pooled.dtype))

    def classify_logits(self, params, pooled_hidden):
        return pooled_hidden  # score head applied by the runner


class BertForTokenClassification(BertEmbeddingModel):
    """Per-token classification (reference: bert.py
    BertForTokenClassification): encoder hidden states, one
    ``classifier`` projection per token — the runner's token-level
    ("all") pooling path slices each request's rows out of the packed
    batch and applies the score head host-side."""

    PREFIX = "bert."

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.pooling_type = "all"
        self.num_labels = getattr(config.hf_config, "num_labels", 2)

    def param_specs(self) -> list[ParamSpec]:
        specs = super().param_specs()
        specs += [
            ParamSpec("score", (self.hidden, self.num_labels),
                      P(None, None), "classifier.weight",
                      transform=transpose2d),
            ParamSpec("score_bias", (self.num_labels, ), P(),
                      "classifier.bias", transform=None),
        ]
        return specs

    def classify_logits(self, params, pooled_hidden):
        return pooled_hidden  # score head applied by the runner


class RobertaForSequenceClassification(BertForSequenceClassification):
    """RobertaClassificationHead: dense+tanh over CLS, then
    out_proj."""

    PREFIX = "roberta."

    def param_specs(self) -> list[ParamSpec]:
        H = self.hidden
        t = transpose2d
        specs = BertEmbeddingModel.param_specs(self)
        specs += [
            ParamSpec("pooler_dense", (H, H), P(None, None),
                      "classifier.dense.weight", transform=t),
            ParamSpec("pooler_bias", (H, ), P(),
                      "classifier.dense.bias", transform=None),
            ParamSpec("score", (H, self.num_labels), P(None, None),
                      "classifier.out_proj.weight", transform=t),
            ParamSpec("score_bias", (self.num_labels, ), P(),
                      "classifier.out_proj.bias", transform=None),
        ]
        return specs
