"""Rope-BERT embedding family: GTE-new (Alibaba), Snowflake Arctic
Embed v2, Nomic-BERT.

Reference: vllm/model_executor/models/bert_with_rope.py + the config
normalizers in vllm/model_executor/models/config.py
(GteNewModelConfig / NomicBertModelConfig / SnowflakeGteNewModelConfig).
Post-LN encoder blocks with ROTARY positions (no absolute position
embeddings):

    x = attn_ln(x + attn(x));  x = mlp_ln(x + mlp(x))

- GTE-new: fused biased qkv_proj, geglu MLP whose fused
  ``up_gate_proj`` stores [up | gate] with NO bias, keys under
  ``new.encoder.layer.{i}.`` ("new." absent in the Snowflake export);
- Nomic-BERT: GPT-2-style config names (n_embd/n_layer/n_inner,
  rotary_emb_fraction/base), ``attn.Wqkv`` fused qkv, swiglu MLP as
  separate fc11 (up) / fc12 (gate) / fc2 (down), norms ``norm1`` /
  ``norm2``, embeddings LayerNorm named ``emb_ln``.

TPU design follows models/bert.py: encoder-only dense O(T²) attention
over the packed ragged batch with a segment mask — no KV cache."""

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


def _rows_t(lo, hi):
    def f(x):
        return np.ascontiguousarray(x[lo:hi].T)

    return f


def _rows(lo, hi):
    def f(x):
        return np.ascontiguousarray(x[lo:hi])

    return f


class _BertWithRope:
    """Shared scaffold; subclasses define key templates + flags."""

    PREFIX = ""  # checkpoint key prefix before "encoder..."
    LAYER = "encoder.layer.{i}."
    EMB_WORD = "embeddings.word_embeddings.weight"
    EMB_TYPE = "embeddings.token_type_embeddings.weight"
    EMB_LN = "embeddings.LayerNorm"
    ATTN_LN = "attn_ln"
    MLP_LN = "mlp_ln"
    QKV = "attention.qkv_proj"
    O = "attention.o_proj"
    gated = True
    act = "gelu"  # geglu (gte) | silu (nomic swiglu) | gelu plain
    qkv_bias = True
    o_bias = True
    mlp_bias = False  # gate/up bias
    down_bias = True
    fused_up_gate = True  # [up | gate] single tensor
    is_encoder_only = True

    def __init__(self, config: ModelConfig):
        self.cfg = config
        config.is_pooling_model = True
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self._normalize(config, hf)
        self.hidden = config.hidden_size
        self.inter = config.intermediate_size
        self.L = config.num_layers
        self.num_heads = config.num_attention_heads
        self.head_dim = self.hidden // self.num_heads
        self.sm_scale = self.head_dim**-0.5
        self.eps = g("layer_norm_eps", None) or \
            g("layer_norm_epsilon", 1e-12) or 1e-12
        self.num_types = int(g("type_vocab_size", 0) or 0)
        self.rot_dim = self.head_dim
        theta = g("rope_theta", None) or g("rotary_emb_base", 10000.0)
        frac = g("rotary_emb_fraction", None)
        if frac:
            self.rot_dim = int(self.head_dim * float(frac))
        from vllm_main_modify_tpu.layers.rotary import compute_inv_freq

        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.rot_dim, float(theta),
                             getattr(config, "rope_scaling", None)))
        self.pooling_type = ("mean" if _st_mean_pooling(config.model)
                             else "cls")

    def _normalize(self, config: ModelConfig, hf) -> None:
        pass  # nomic remaps GPT-2 style names

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, I, V, L = self.hidden, self.inter, c.vocab_size, self.L
        pre = self.PREFIX
        lk = pre + self.LAYER

        def stk(path, shape, spec, hf_key, transform=transpose2d):
            return ParamSpec(f"layers.{path}", (L, *shape), spec,
                             lk + hf_key, stacked=True,
                             transform=transform)

        specs = [
            ParamSpec("word_embeddings", (V, H), P("model", None),
                      pre + self.EMB_WORD, transform=None),
            ParamSpec("embed_norm", (H, ), P(),
                      pre + self.EMB_LN + ".weight", transform=None),
            ParamSpec("embed_norm_bias", (H, ), P(),
                      pre + self.EMB_LN + ".bias", transform=None),
        ]
        if self.num_types > 0:
            specs.append(
                ParamSpec("token_type_embeddings",
                          (self.num_types, H), P(None, None),
                          pre + self.EMB_TYPE, transform=None))
        for n in (self.ATTN_LN, self.MLP_LN):
            tag = "attn_norm" if n is self.ATTN_LN else "mlp_norm"
            specs += [
                stk(tag, (H, ), P(None, None), f"{n}.weight",
                    transform=None),
                stk(f"{tag}_bias", (H, ), P(None, None), f"{n}.bias",
                    transform=None),
            ]
        specs += [
            stk("q_proj", (H, H), P(None, None, "model"),
                self.QKV + ".weight", transform=_rows_t(0, H)),
            stk("k_proj", (H, H), P(None, None, "model"),
                self.QKV + ".weight", transform=_rows_t(H, 2 * H)),
            stk("v_proj", (H, H), P(None, None, "model"),
                self.QKV + ".weight", transform=_rows_t(2 * H, 3 * H)),
            stk("o_proj", (H, H), P(None, "model", None),
                self.O + ".weight"),
        ]
        if self.qkv_bias:
            specs += [
                stk("q_bias", (H, ), P(None, "model"),
                    self.QKV + ".bias", transform=_rows(0, H)),
                stk("k_bias", (H, ), P(None, "model"),
                    self.QKV + ".bias", transform=_rows(H, 2 * H)),
                stk("v_bias", (H, ), P(None, "model"),
                    self.QKV + ".bias", transform=_rows(2 * H, 3 * H)),
            ]
        if self.o_bias:
            specs.append(stk("o_proj_bias", (H, ), P(None, None),
                             self.O + ".bias", transform=None))
        if self.gated:
            if self.fused_up_gate:
                specs += [
                    stk("up_proj", (H, I), P(None, None, "model"),
                        "mlp.up_gate_proj.weight",
                        transform=_rows_t(0, I)),
                    stk("gate_proj", (H, I), P(None, None, "model"),
                        "mlp.up_gate_proj.weight",
                        transform=_rows_t(I, 2 * I)),
                ]
            else:
                specs += [
                    stk("up_proj", (H, I), P(None, None, "model"),
                        "mlp.fc11.weight"),
                    stk("gate_proj", (H, I), P(None, None, "model"),
                        "mlp.fc12.weight"),
                ]
        else:
            specs.append(stk("up_proj", (H, I),
                             P(None, None, "model"),
                             "mlp.fc1.weight"))
        dkey = "mlp.down_proj.weight" if self.fused_up_gate else \
            "mlp.fc2.weight"
        specs.append(stk("down_proj", (I, H), P(None, "model", None),
                         dkey))
        if self.down_bias:
            specs.append(
                stk("down_bias", (H, ), P(None, None),
                    dkey.replace(".weight", ".bias"), transform=None))
        if self.mlp_bias:
            if not self.gated:
                specs.append(stk("up_bias", (I, ), P(None, "model"),
                                 "mlp.fc1.bias", transform=None))
            elif self.fused_up_gate:
                specs += [
                    stk("up_bias", (I, ), P(None, "model"),
                        "mlp.up_gate_proj.bias", transform=_rows(0, I)),
                    stk("gate_bias", (I, ), P(None, "model"),
                        "mlp.up_gate_proj.bias",
                        transform=_rows(I, 2 * I)),
                ]
            else:
                specs += [
                    stk("up_bias", (I, ), P(None, "model"),
                        "mlp.fc11.bias", transform=None),
                    stk("gate_bias", (I, ), P(None, "model"),
                        "mlp.fc12.bias", transform=None),
                ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return 0, 0, 0

    def kv_cache_groups(self):
        from vllm_main_modify_tpu.core.kv_cache_interface import \
            single_full_group

        return single_full_group(0, 0, 0)

    # ------------------------------------------------------------------

    def _act_mul(self, gate, up):
        if self.act == "silu":
            return jax.nn.silu(gate) * up
        return jax.nn.gelu(gate, approximate=False) * up

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
        if "token_type_embeddings" in params:
            x = x + params["token_type_embeddings"][0]
        x = layer_norm(x, params["embed_norm"],
                       params["embed_norm_bias"], self.eps)

        seg_mask = (row_of[:, None] == row_of[None, :]) & \
            valid[:, None] & valid[None, :]
        neg = jnp.asarray(-1e9, jnp.float32)
        layers = params["layers"]

        def rope(qk):
            angles = positions[:, None].astype(jnp.float32) * \
                self.inv_freq[None, :]
            cos = jnp.cos(angles)[:, None, :]
            sin = jnp.sin(angles)[:, None, :]
            xr, xp = qk[..., :self.rot_dim], qk[..., self.rot_dim:]
            d2 = self.rot_dim // 2
            x1 = xr[..., :d2].astype(jnp.float32)
            x2 = xr[..., d2:].astype(jnp.float32)
            out = jnp.concatenate(
                [x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                axis=-1).astype(qk.dtype)
            return jnp.concatenate([out, xp], axis=-1)

        def layer_fn(l, x):
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            q = x @ w["q_proj"]
            k = x @ w["k_proj"]
            v = x @ w["v_proj"]
            if "q_bias" in w:
                q, k, v = q + w["q_bias"], k + w["k_bias"], \
                    v + w["v_bias"]
            q = rope(q.reshape(t, self.num_heads, self.head_dim))
            k = rope(k.reshape(t, self.num_heads, self.head_dim))
            v = v.reshape(t, self.num_heads, self.head_dim)
            s = jnp.einsum("qhd,khd->hqk", q, k).astype(
                jnp.float32) * self.sm_scale
            s = jnp.where(seg_mask[None], s, neg)
            p_ = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            o = jnp.einsum("hqk,khd->qhd", p_, v).reshape(t, -1)
            o = o @ w["o_proj"]
            if "o_proj_bias" in w:
                o = o + w["o_proj_bias"]
            x = layer_norm(x + o, w["attn_norm"], w["attn_norm_bias"],
                           self.eps)
            if self.gated:
                gate = x @ w["gate_proj"]
                up = x @ w["up_proj"]
                if "gate_bias" in w:
                    gate = gate + w["gate_bias"]
                if "up_bias" in w:
                    up = up + w["up_bias"]
                h = self._act_mul(gate, up)
            else:
                h = x @ w["up_proj"]
                if "up_bias" in w:
                    h = h + w["up_bias"]
                h = jax.nn.gelu(h, approximate=False) if \
                    self.act != "silu" else jax.nn.silu(h)
            h = h @ w["down_proj"]
            if "down_bias" in w:
                h = h + w["down_bias"]
            return layer_norm(x + h, w["mlp_norm"],
                              w["mlp_norm_bias"], self.eps)

        x = jax.lax.fori_loop(0, self.L, layer_fn, x)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        return (hidden.astype(jnp.float32) @
                params["word_embeddings"].T.astype(jnp.float32))


class GteNewModel(_BertWithRope):
    """Alibaba-NLP gte-multilingual / new-impl: keys under ``new.``,
    geglu MLP (config hidden_act 'gelu' means geglu — reference
    GteNewModelConfig)."""

    PREFIX = "new."
    act = "geglu"


class SnowflakeGteNewModel(_BertWithRope):
    """Snowflake arctic-embed-m-v2.0: GteNew without the ``new.``
    prefix."""

    PREFIX = ""
    act = "geglu"


class NomicBertModel(_BertWithRope):
    """nomic-ai/nomic-bert-2048 (reference NomicBertModelConfig):
    GPT-2-style config names, fused attn.Wqkv, separate
    fc11 (up) / fc12 (gate) / fc2 (down), norm1/norm2, emb_ln."""

    LAYER = "encoder.layers.{i}."
    EMB_LN = "emb_ln"
    ATTN_LN = "norm1"
    MLP_LN = "norm2"
    QKV = "attn.Wqkv"
    O = "attn.out_proj"
    fused_up_gate = False

    def _normalize(self, config: ModelConfig, hf) -> None:
        g = lambda k, d=None: getattr(hf, k, d)
        if g("n_embd"):
            config.hidden_size = g("n_embd")
            config.num_layers = g("n_layer")
            config.intermediate_size = g("n_inner")
        if getattr(hf, "moe_every_n_layers", 0):
            raise NotImplementedError(
                "nomic-embed MoE variants are not supported yet")
        act = g("activation_function", "swiglu")
        self.act = "silu" if act == "swiglu" else "gelu"
        self.gated = act == "swiglu"
        bias = bool(g("qkv_proj_bias", True))
        self.qkv_bias = self.o_bias = self.down_bias = bias
        self.mlp_bias = bias and self.gated


class GteNewForSequenceClassification(GteNewModel):
    """GTE-multilingual reranker (reference:
    bert_with_rope.py GteNewForSequenceClassification): CLS pooling →
    tanh pooler dense → classifier, served through the runner's
    classify/score path (LLM.score cross-encoding)."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.pooling_type = "cls"
        self.num_labels = getattr(config.hf_config, "num_labels", 1)

    def param_specs(self) -> list[ParamSpec]:
        H = self.hidden
        specs = super().param_specs()
        specs += [
            ParamSpec("pooler_dense", (H, H), P(None, None),
                      self.PREFIX + "pooler.dense.weight",
                      transform=transpose2d),
            ParamSpec("pooler_bias", (H, ), P(),
                      self.PREFIX + "pooler.dense.bias",
                      transform=None),
            ParamSpec("score", (H, self.num_labels), P(None, None),
                      "classifier.weight", transform=transpose2d),
            ParamSpec("score_bias", (self.num_labels, ), P(),
                      "classifier.bias", transform=None),
        ]
        return specs

    def pool_projection(self, params, pooled):
        return jnp.tanh(pooled @ params["pooler_dense"].astype(
            pooled.dtype) + params["pooler_bias"].astype(pooled.dtype))

    def classify_logits(self, params, pooled_hidden):
        return pooled_hidden  # score head applied by the runner
