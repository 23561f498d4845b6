"""ModernBERT encoder (embeddings + sequence classification).

Reference: vllm/model_executor/models/modernbert.py. Pre-norm
encoder with rope (NO absolute position embeddings), alternating
global/local attention — every ``global_attn_every_n_layers``-th layer
is global, the rest see a bidirectional window of
``local_attention // 2`` tokens each side with a SEPARATE rope theta —
fused Wqkv, GeGLU MLP (Wi chunks into input|gate, act(input)·gate),
and an Identity attention norm on layer 0 (HF ModernBertEncoderLayer).

TPU design mirrors models/bert.py: encoder-only models run dense
O(T²) attention over the packed ragged batch with a segment mask —
no KV cache, one jitted body for all layers (the layer-0 identity
norm and global/local switches fold into ``jnp.where`` on the layer
index)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.models.bert import _st_mean_pooling
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d


def _rows_t(lo: int, hi: int):
    def f(x):
        return np.ascontiguousarray(x[lo:hi].T)

    return f


class ModernBertModel:
    """Arch "ModernBertModel" — embedding encoder."""

    PREFIX = "model."  # classification checkpoints; bare ones strip
    is_encoder_only = True

    def __init__(self, config: ModelConfig):
        self.cfg = config
        config.is_pooling_model = True
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self.hidden = config.hidden_size
        self.inter = config.intermediate_size
        self.L = config.num_layers
        self.num_heads = config.num_attention_heads
        self.head_dim = self.hidden // self.num_heads
        self.sm_scale = self.head_dim**-0.5
        self.eps = g("norm_eps", 1e-5)
        self.norm_bias = bool(g("norm_bias", False))
        self.every = g("global_attn_every_n_layers", 3)
        self.window = int(g("local_attention", 128)) // 2
        from vllm_main_modify_tpu.layers.rotary import compute_inv_freq

        self.inv_freq_global = jnp.asarray(
            compute_inv_freq(self.head_dim,
                             g("global_rope_theta", 160000.0), None))
        self.inv_freq_local = jnp.asarray(
            compute_inv_freq(self.head_dim,
                             g("local_rope_theta", 10000.0), None))
        self.pooling_type = ("mean" if _st_mean_pooling(config.model)
                             or g("classifier_pooling") == "mean"
                             else "cls")

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, I, V, L = self.hidden, self.inter, c.vocab_size, self.L
        pre = self.PREFIX

        def stk(path, shape, spec, hf_key, transform=transpose2d,
                layer_ids=None):
            n = L if layer_ids is None else len(layer_ids)
            return ParamSpec(f"layers.{path}", (n, *shape), spec,
                             pre + "layers.{i}." + hf_key,
                             stacked=True, transform=transform,
                             layer_ids=layer_ids)

        specs = [
            ParamSpec("word_embeddings", (V, H), P("model", None),
                      pre + "embeddings.tok_embeddings.weight",
                      transform=None),
            ParamSpec("embed_norm", (H, ), P(),
                      pre + "embeddings.norm.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(),
                      pre + "final_norm.weight", transform=None),
            # layer 0's attn_norm is Identity (HF) — stack layers 1..
            stk("attn_norm", (H, ), P(None, None), "attn_norm.weight",
                transform=None, layer_ids=tuple(range(1, L))),
            stk("q_proj", (H, H), P(None, None, "model"),
                "attn.Wqkv.weight", transform=_rows_t(0, H)),
            stk("k_proj", (H, H), P(None, None, "model"),
                "attn.Wqkv.weight", transform=_rows_t(H, 2 * H)),
            stk("v_proj", (H, H), P(None, None, "model"),
                "attn.Wqkv.weight", transform=_rows_t(2 * H, 3 * H)),
            stk("o_proj", (H, H), P(None, "model", None),
                "attn.Wo.weight"),
            stk("mlp_norm", (H, ), P(None, None), "mlp_norm.weight",
                transform=None),
            stk("fc_in", (H, I), P(None, None, "model"),
                "mlp.Wi.weight", transform=_rows_t(0, I)),
            stk("fc_gate", (H, I), P(None, None, "model"),
                "mlp.Wi.weight", transform=_rows_t(I, 2 * I)),
            stk("fc_out", (I, H), P(None, "model", None),
                "mlp.Wo.weight"),
        ]
        if self.norm_bias:
            for s in list(specs):
                if s.path.endswith("norm"):
                    specs.append(
                        ParamSpec(s.path + "_bias", s.shape,
                                  s.sharding,
                                  s.hf_key.replace(".weight", ".bias"),
                                  stacked=s.stacked, transform=None,
                                  layer_ids=s.layer_ids))
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return 0, 0, 0

    def kv_cache_groups(self):
        from vllm_main_modify_tpu.core.kv_cache_interface import \
            single_full_group

        return single_full_group(0, 0, 0)

    # ------------------------------------------------------------------

    def _norm(self, x, w, b=None):
        return layer_norm(x, w, b, self.eps)

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        t = input_ids.shape[0]
        qsl = attn_meta.query_start_loc
        r = qsl.shape[0] - 1
        tt = jnp.arange(t, dtype=jnp.int32)
        row_of = (jnp.searchsorted(qsl, tt, side="right").astype(
            jnp.int32) - 1).clip(0, r - 1)
        total = qsl[jnp.minimum(attn_meta.num_seqs[0], r)]
        valid = tt < total

        x = jnp.take(params["word_embeddings"], input_ids, axis=0)
        x = self._norm(x, params["embed_norm"],
                       params.get("embed_norm_bias"))

        seg_mask = (row_of[:, None] == row_of[None, :]) & \
            valid[:, None] & valid[None, :]
        # |pos_i - pos_j| <= window, within-request (positions are
        # per-request token indices)
        dist = jnp.abs(positions[:, None] - positions[None, :])
        local_mask = seg_mask & (dist <= self.window)
        neg = jnp.asarray(-1e9, jnp.float32)
        layers = params["layers"]
        is_global = jnp.asarray(
            [l % self.every == 0 for l in range(self.L)], bool)

        def rope(qk, inv_freq):
            angles = positions[:, None].astype(jnp.float32) * \
                inv_freq[None, :]
            cos = jnp.cos(angles)[:, None, :]
            sin = jnp.sin(angles)[:, None, :]
            d2 = qk.shape[-1] // 2
            x1 = qk[..., :d2].astype(jnp.float32)
            x2 = qk[..., d2:].astype(jnp.float32)
            return jnp.concatenate(
                [x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                axis=-1).astype(qk.dtype)

        def layer_fn(l, x):
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False),
                {k: v for k, v in layers.items()
                 if k not in ("attn_norm", "attn_norm_bias")})
            # layer 0: Identity attn norm (stacked over layers 1..)
            an = jax.lax.dynamic_index_in_dim(
                layers["attn_norm"], jnp.maximum(l - 1, 0), 0,
                keepdims=False)
            anb = None
            if "attn_norm_bias" in layers:
                anb = jax.lax.dynamic_index_in_dim(
                    layers["attn_norm_bias"], jnp.maximum(l - 1, 0),
                    0, keepdims=False)
            h = jnp.where(l == 0, x, self._norm(x, an, anb))
            q = (h @ w["q_proj"]).reshape(t, self.num_heads,
                                          self.head_dim)
            k = (h @ w["k_proj"]).reshape(t, self.num_heads,
                                          self.head_dim)
            v = (h @ w["v_proj"]).reshape(t, self.num_heads,
                                          self.head_dim)
            glob = is_global[l]
            inv_freq = jnp.where(glob, self.inv_freq_global,
                                 self.inv_freq_local)
            q, k = rope(q, inv_freq), rope(k, inv_freq)
            mask = jnp.where(glob, seg_mask, local_mask)
            scores = jnp.einsum("qhd,khd->hqk", q, k).astype(
                jnp.float32) * self.sm_scale
            scores = jnp.where(mask[None], scores, neg)
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            o = jnp.einsum("hqk,khd->qhd", probs, v).reshape(t, -1)
            x = x + o @ w["o_proj"]
            h = self._norm(x, w["mlp_norm"], w.get("mlp_norm_bias"))
            h = jax.nn.gelu(h @ w["fc_in"], approximate=False) * \
                (h @ w["fc_gate"])
            return x + h @ w["fc_out"]

        x = jax.lax.fori_loop(0, self.L, layer_fn, x)
        x = self._norm(x, params["final_norm"],
                       params.get("final_norm_bias"))
        return x, kv_caches

    def compute_logits(self, params, hidden):
        return (hidden.astype(jnp.float32) @
                params["word_embeddings"].T.astype(jnp.float32))


class ModernBertForSequenceClassification(ModernBertModel):
    """Cross-encoder / classifier: pooled hidden → head.dense →
    GELU → head.norm → classifier (reference: modernbert.py
    ModernBertPredictionHead + classifier)."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.pooling_type = "mean" if getattr(
            config.hf_config, "classifier_pooling", "cls") == "mean" \
            else "cls"
        self.num_labels = getattr(config.hf_config, "num_labels", 2)

    def param_specs(self) -> list[ParamSpec]:
        H = self.hidden
        specs = super().param_specs()
        specs += [
            ParamSpec("head_dense", (H, H), P(None, None),
                      "head.dense.weight", transform=transpose2d),
            ParamSpec("head_norm", (H, ), P(), "head.norm.weight",
                      transform=None),
            ParamSpec("score", (H, self.num_labels), P(None, None),
                      "classifier.weight", transform=transpose2d),
            ParamSpec("score_bias", (self.num_labels, ), P(),
                      "classifier.bias", transform=None),
        ]
        return specs

    def pool_projection(self, params, pooled):
        h = pooled @ params["head_dense"].astype(pooled.dtype)
        h = jax.nn.gelu(h, approximate=False)
        return layer_norm(h, params["head_norm"], None, self.eps)

    def classify_logits(self, params, pooled_hidden):
        return pooled_hidden  # score head applied by the runner
