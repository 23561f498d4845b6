"""LFM2 (Liquid AI): gated-short-conv + attention hybrid.

Reference: vllm/model_executor/models/lfm2.py + HF modeling_lfm2.
Layer kinds come from config ``layer_types`` ("conv" /
"full_attention"):

- conv layers: in_proj → chunk(B, C, x) → depthwise causal conv of
  width ``conv_L_cache`` over B·x (NO activation) → C·conv_out →
  out_proj (HF Lfm2ShortConv.slow_forward);
- attention layers: GQA with per-head RMS q/k norm then rope,
  ``out_proj`` output name;
- every layer: w1/w3/w2 silu MLP whose width follows the
  block_auto_adjust_ff_dim recipe (HF Lfm2MLP);
- final norm is ``embedding_norm``; embeddings tied.

TPU design: conv tails ride a mamba-kind KV group — state slots of
shape (L_cache-1, H) per request, reusing the segmented conv
machinery of layers/mamba.py (causal_conv1d_ragged /
update_conv_state)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.mamba import (build_seg_info,
                                               causal_conv1d_ragged,
                                               update_conv_state)
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.quantization.weights import matmul


def _lfm2_ff_dim(hf) -> int:
    """HF Lfm2MLP width recipe."""
    inter = hf.intermediate_size
    if getattr(hf, "block_ff_dim", None):
        inter = hf.block_ff_dim
    if getattr(hf, "block_auto_adjust_ff_dim", False):
        inter = int(2 * inter / 3)
        mult = getattr(hf, "block_ffn_dim_multiplier", None)
        if mult is not None:
            inter = int(mult * inter)
            mof = getattr(hf, "block_multiple_of", 256)
            inter = mof * ((inter + mof - 1) // mof)
    return inter


def _conv_2d(x):
    """torch depthwise conv weight [H, 1, K] → [K, H]."""
    return np.ascontiguousarray(x[:, 0, :].T)


class Lfm2ForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self.hidden = config.hidden_size
        self.inter = _lfm2_ff_dim(hf)
        self.L = config.num_layers
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = config.head_dim
        self.sm_scale = self.head_dim**-0.5
        self.eps = g("norm_eps", 1e-5)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta,
                             config.rope_scaling))
        self.d_conv = int(g("conv_L_cache", 3))
        self.conv_bias = bool(g("conv_bias", False))
        lt = list(g("layer_types", None) or [])
        self.attn_ids = tuple(i for i, k in enumerate(lt)
                              if k == "full_attention")
        self.conv_ids = tuple(i for i, k in enumerate(lt)
                              if k != "full_attention")
        self.tie_embeddings = config.tie_word_embeddings

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V, I = self.hidden, c.vocab_size, self.inter
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        t = transpose2d

        def stk(group, ids, path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"{group}.{path}", (len(ids), *shape),
                             spec, "model.layers.{i}." + hf_key,
                             stacked=True, layer_ids=tuple(ids),
                             transform=transform)

        all_ids = tuple(range(self.L))
        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(),
                      "model.embedding_norm.weight", transform=None),
            stk("layers", all_ids, "operator_norm", (H, ),
                P(None, None), "operator_norm.weight",
                transform=None),
            stk("layers", all_ids, "ffn_norm", (H, ), P(None, None),
                "ffn_norm.weight", transform=None),
            stk("layers", all_ids, "w1", (H, I),
                P(None, None, "model"), "feed_forward.w1.weight"),
            stk("layers", all_ids, "w3", (H, I),
                P(None, None, "model"), "feed_forward.w3.weight"),
            stk("layers", all_ids, "w2", (I, H),
                P(None, "model", None), "feed_forward.w2.weight"),
        ]
        if not self.tie_embeddings:
            specs.append(ParamSpec("lm_head", (H, V), P(None, "model"),
                                   "lm_head.weight", transform=t))
        if self.attn_ids:
            specs += [
                stk("attn", self.attn_ids, "q_proj", (H, qd),
                    P(None, None, "model"), "self_attn.q_proj.weight"),
                stk("attn", self.attn_ids, "k_proj", (H, kd),
                    P(None, None, "model"), "self_attn.k_proj.weight"),
                stk("attn", self.attn_ids, "v_proj", (H, kd),
                    P(None, None, "model"), "self_attn.v_proj.weight"),
                stk("attn", self.attn_ids, "o_proj", (qd, H),
                    P(None, "model", None),
                    "self_attn.out_proj.weight"),
                stk("attn", self.attn_ids, "q_norm", (self.head_dim, ),
                    P(None, None), "self_attn.q_layernorm.weight",
                    transform=None),
                stk("attn", self.attn_ids, "k_norm", (self.head_dim, ),
                    P(None, None), "self_attn.k_layernorm.weight",
                    transform=None),
            ]
        if self.conv_ids:
            specs += [
                stk("conv", self.conv_ids, "in_proj", (H, 3 * H),
                    P(None, None, "model"), "conv.in_proj.weight"),
                stk("conv", self.conv_ids, "conv_w",
                    (self.d_conv, H), P(None, None, "model"),
                    "conv.conv.weight", transform=_conv_2d),
                stk("conv", self.conv_ids, "out_proj", (H, H),
                    P(None, "model", None), "conv.out_proj.weight"),
            ]
            if self.conv_bias:
                specs += [
                    stk("conv", self.conv_ids, "in_bias", (3 * H, ),
                        P(None, "model"), "conv.in_proj.bias",
                        transform=None),
                    stk("conv", self.conv_ids, "conv_b", (H, ),
                        P(None, "model"), "conv.conv.bias",
                        transform=None),
                    stk("conv", self.conv_ids, "out_bias", (H, ),
                        P(None, None), "conv.out_proj.bias",
                        transform=None),
                ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, len(self.attn_ids)

    def kv_cache_groups(self):
        from vllm_main_modify_tpu.core.kv_cache_interface import \
            KVCacheGroupSpec

        return [
            KVCacheGroupSpec(kind="full", layer_ids=self.attn_ids,
                             kv_heads=self.num_kv,
                             head_dim=self.head_dim),
            KVCacheGroupSpec(
                kind="mamba", layer_ids=self.conv_ids,
                state_shapes=(
                    ((self.d_conv - 1, self.hidden), "float32"), )),
        ]

    # ------------------------------------------------------------------

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        kv0, states = kv_caches
        (conv_all, ) = states
        slots = attn_meta.groups[0].state_slots
        seg = build_seg_info(attn_meta.query_start_loc,
                             attn_meta.num_seqs, t, slots,
                             fresh_req=attn_meta.groups[0].state_fresh)
        common = params["layers"]

        def idx_map(ids):
            m = np.zeros(self.L, dtype=np.int32)
            for i, l in enumerate(ids):
                m[l] = i
            return jnp.asarray(m)

        attn_map = idx_map(self.attn_ids)
        conv_map = idx_map(self.conv_ids)
        is_attn = jnp.asarray(
            [l in set(self.attn_ids) for l in range(self.L)], bool)

        def pick(group, gl):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, gl, 0, keepdims=False), params[group])

        def attn_branch(l, h, kv0, conv_all):
            w = pick("attn", attn_map[l])
            q = matmul(h, w["q_proj"]).reshape(t, self.num_q,
                                               self.head_dim)
            k = matmul(h, w["k_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            v = matmul(h, w["v_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            q = rms_norm(q, w["q_norm"], self.eps)
            k = rms_norm(k, w["k_norm"], self.eps)
            q, k = apply_rope(q, k, positions, self.inv_freq)
            o, kv0 = attention(q, k, v, kv0, attn_map[l], attn_meta,
                               self.sm_scale, use_pallas=use_pallas)
            return matmul(o.reshape(t, -1), w["o_proj"]), kv0, conv_all

        def conv_branch(l, h, kv0, conv_all):
            gl = conv_map[l]
            w = pick("conv", gl)
            bcx = matmul(h, w["in_proj"])
            if "in_bias" in w:
                bcx = bcx + w["in_bias"]
            b, c, xg = jnp.split(bcx, 3, axis=-1)
            bx = b * xg
            cs = conv_all[gl]
            y = causal_conv1d_ragged(bx, w["conv_w"],
                                     w.get("conv_b"), cs, seg)
            cs = update_conv_state(bx, cs, seg)
            conv_all = jax.lax.dynamic_update_index_in_dim(
                conv_all, cs, gl, 0)
            out = matmul((c * y).astype(h.dtype), w["out_proj"])
            if "out_bias" in w:
                out = out + w["out_bias"]
            return out, kv0, conv_all

        def layer_fn(l, carry):
            x, kv0, conv_all = carry
            wc = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), common)
            h = rms_norm(x, wc["operator_norm"], self.eps)
            if not self.conv_ids:
                mix, kv0, conv_all = attn_branch(l, h, kv0, conv_all)
            elif not self.attn_ids:
                mix, kv0, conv_all = conv_branch(l, h, kv0, conv_all)
            else:
                mix, kv0, conv_all = jax.lax.cond(
                    is_attn[l], attn_branch, conv_branch, l, h, kv0,
                    conv_all)
            x = x + mix
            h = rms_norm(x, wc["ffn_norm"], self.eps)
            y = matmul(
                (jax.nn.silu(matmul(h, wc["w1"]).astype(jnp.float32))
                 * matmul(h, wc["w3"]).astype(jnp.float32)).astype(
                     x.dtype), wc["w2"])
            return x + y, kv0, conv_all

        x, kv0, conv_all = jax.lax.fori_loop(
            0, self.L, layer_fn, (x, kv0, conv_all))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, (kv0, (conv_all, ))

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)
