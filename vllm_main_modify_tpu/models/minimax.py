"""MiniMax-Text-01 / MiniMax-M1: lightning-attention + full-attention
hybrid with Mixtral-style MoE.

Reference: vllm/model_executor/models/minimax_text_01.py + HF
modeling_minimax. Per config ``layer_types``:

- linear_attention: fused silu(qkv_proj) heads, per-head static decay
  λ_h = (2^(-8/H))^(h+1) · (1 − l/(L−1+ε) + ε) (HF get_slope_rate),
  the exponentially-decayed linear recurrence
  (layers/deltanet.py lightning_attention_ragged), full-width RMS
  norm, sigmoid output gate from the layer input, out_proj — NO rope;
- full_attention: plain bias-free GQA with rope;
- every layer: Mixtral MoE (block_sparse_moe.{gate,experts.{e}.w1/3/2});
- residual wiring takes the NORMED input as the residual, weighted by
  alpha/beta factors:  x = norm(x); x = x·α + mix(x)·β.

Lightning states ride a mamba-kind KV group: one [H, D, D] recurrent
matrix per request slot (no conv)."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.activation import silu_and_mul
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.deltanet import \
    lightning_attention_ragged
from vllm_main_modify_tpu.layers.mamba import build_seg_info
from vllm_main_modify_tpu.layers.moe import moe_ffn
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d


def _texpert(x):
    return np.ascontiguousarray(x.T)


def _slope_rates(num_heads: int, layer_idx: int,
                 num_layers: int) -> np.ndarray:
    """HF MiniMaxLightningAttention.get_slope_rate."""
    base = 1.0 / (2.0**(8.0 / num_heads))
    rate = base**(np.arange(num_heads, dtype=np.float64) + 1)
    factor = 1.0 - layer_idx / (num_layers - 1 + 1e-5) + 1e-5
    return (rate * factor).astype(np.float32)


class MiniMaxText01ForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = config.head_dim
        self.qd = self.num_q * self.head_dim
        self.sm_scale = self.head_dim**-0.5
        self.eps = g("rms_norm_eps", 1e-5)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta,
                             config.rope_scaling))
        self.E = g("num_local_experts", None) or config.num_experts
        self.top_k = config.num_experts_per_tok
        self.moe_inter = g("intermediate_size",
                           config.intermediate_size)
        lt = list(g("layer_types", None) or [])
        if not lt:
            # remote-code minimax_text01 spells the pattern as
            # attn_type_list (0 = lightning/linear, 1 = full)
            atl = g("attn_type_list", None)
            if atl is not None:
                lt = ["full_attention" if int(x) else
                      "linear_attention" for x in atl]
        self.attn_ids = tuple(i for i, kk in enumerate(lt)
                              if kk == "full_attention")
        self.linear_ids = tuple(i for i, kk in enumerate(lt)
                                if kk == "linear_attention")
        self.alphas = {
            "attn": float(g("full_attn_alpha_factor", 1) or 1),
            "attn_b": float(g("full_attn_beta_factor", 1) or 1),
            "lin": float(g("linear_attn_alpha_factor", 1) or 1),
            "lin_b": float(g("linear_attn_beta_factor", 1) or 1),
            "mlp": float(g("mlp_alpha_factor", 1) or 1),
            "mlp_b": float(g("mlp_beta_factor", 1) or 1),
        }
        # per-linear-layer per-head decay λ = exp(-slope)
        self.decay = jnp.asarray(np.stack([
            np.exp(-_slope_rates(self.num_q, l, self.L))
            for l in self.linear_ids]) if self.linear_ids else
            np.zeros((0, self.num_q), np.float32))
        self.tie_embeddings = config.tie_word_embeddings

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V, E = self.hidden, c.vocab_size, self.E
        qd = self.qd
        kd = self.num_kv * self.head_dim
        mi = self.moe_inter
        t = transpose2d

        def stk(group, ids, path, shape, spec, hf_key, transform=t,
                experts=0):
            return ParamSpec(f"{group}.{path}", (len(ids), *shape),
                             spec, "model.layers.{i}." + hf_key,
                             stacked=True, layer_ids=tuple(ids),
                             num_experts=experts, transform=transform)

        all_ids = tuple(range(self.L))
        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
            stk("layers", all_ids, "input_layernorm", (H, ),
                P(None, None), "input_layernorm.weight",
                transform=None),
            stk("layers", all_ids, "post_attention_layernorm", (H, ),
                P(None, None), "post_attention_layernorm.weight",
                transform=None),
            stk("layers", all_ids, "router", (H, E),
                P(None, None, None), "block_sparse_moe.gate.weight"),
            stk("layers", all_ids, "w_gate", (E, H, mi),
                P(None, None, None, "model"),
                "block_sparse_moe.experts.{e}.w1.weight", experts=E,
                transform=_texpert),
            stk("layers", all_ids, "w_up", (E, H, mi),
                P(None, None, None, "model"),
                "block_sparse_moe.experts.{e}.w3.weight", experts=E,
                transform=_texpert),
            stk("layers", all_ids, "w_down", (E, mi, H),
                P(None, None, "model", None),
                "block_sparse_moe.experts.{e}.w2.weight", experts=E,
                transform=_texpert),
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
                    P(None, "model", None), "self_attn.o_proj.weight"),
            ]
        if self.linear_ids:
            specs += [
                stk("linear", self.linear_ids, "qkv_proj",
                    (H, 3 * qd), P(None, None, "model"),
                    "self_attn.qkv_proj.weight"),
                stk("linear", self.linear_ids, "norm", (qd, ),
                    P(None, "model"), "self_attn.norm.weight",
                    transform=None),
                stk("linear", self.linear_ids, "output_gate",
                    (H, qd), P(None, None, "model"),
                    "self_attn.output_gate.weight"),
                stk("linear", self.linear_ids, "out_proj", (qd, H),
                    P(None, "model", None),
                    "self_attn.out_proj.weight"),
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
                kind="mamba", layer_ids=self.linear_ids,
                state_shapes=(
                    ((self.num_q, self.head_dim, self.head_dim),
                     "float32"), )),
        ]

    # ------------------------------------------------------------------

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        kv0, states = kv_caches
        (ssm_all, ) = states
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
        lin_map = idx_map(self.linear_ids)
        is_attn = jnp.asarray(
            [l in set(self.attn_ids) for l in range(self.L)], bool)
        a = self.alphas

        def attn_branch(l, h, kv0, ssm_all):
            w = jax.tree.map(
                lambda arr: jax.lax.dynamic_index_in_dim(
                    arr, attn_map[l], 0, keepdims=False),
                params["attn"])
            q = (h @ w["q_proj"]).reshape(t, self.num_q,
                                          self.head_dim)
            k = (h @ w["k_proj"]).reshape(t, self.num_kv,
                                          self.head_dim)
            v = (h @ w["v_proj"]).reshape(t, self.num_kv,
                                          self.head_dim)
            q, k = apply_rope(q, k, positions, self.inv_freq)
            o, kv0 = attention(q, k, v, kv0, attn_map[l], attn_meta,
                               self.sm_scale, use_pallas=use_pallas)
            o = o.reshape(t, -1) @ w["o_proj"]
            return h * a["attn"] + o * a["attn_b"], kv0, ssm_all

        def linear_branch(l, h, kv0, ssm_all):
            gl = lin_map[l]
            w = jax.tree.map(
                lambda arr: jax.lax.dynamic_index_in_dim(
                    arr, gl, 0, keepdims=False), params["linear"])
            qkv = jax.nn.silu((h @ w["qkv_proj"]).astype(jnp.float32))
            qkv = qkv.reshape(t, self.num_q, 3 * self.head_dim)
            q = qkv[..., :self.head_dim]
            k = qkv[..., self.head_dim:2 * self.head_dim]
            v = qkv[..., 2 * self.head_dim:]
            ss = ssm_all[gl]
            out, ss = lightning_attention_ragged(
                q, k, v, self.decay[gl], ss, seg)
            ssm_all = jax.lax.dynamic_update_index_in_dim(
                ssm_all, ss, gl, 0)
            out = out.reshape(t, -1)
            # HF constructs this norm WITHOUT the config eps (1e-6)
            out = rms_norm(out, w["norm"], 1e-6)
            gate = jax.nn.sigmoid(
                (h @ w["output_gate"]).astype(jnp.float32))
            out = (out.astype(jnp.float32) * gate).astype(h.dtype)
            out = out @ w["out_proj"]
            return h * a["lin"] + out * a["lin_b"], kv0, ssm_all

        def layer_fn(l, carry):
            x, kv0, ssm_all = carry
            wc = jax.tree.map(
                lambda arr: jax.lax.dynamic_index_in_dim(
                    arr, l, 0, keepdims=False), common)
            # residual = the NORMED input (HF MiniMaxDecoderLayer)
            h = rms_norm(x, wc["input_layernorm"], self.eps)
            if not self.linear_ids:
                x, kv0, ssm_all = attn_branch(l, h, kv0, ssm_all)
            elif not self.attn_ids:
                x, kv0, ssm_all = linear_branch(l, h, kv0, ssm_all)
            else:
                x, kv0, ssm_all = jax.lax.cond(
                    is_attn[l], attn_branch, linear_branch, l, h, kv0,
                    ssm_all)
            h = rms_norm(x, wc["post_attention_layernorm"], self.eps)
            y = moe_ffn(h, wc["router"], wc["w_gate"], wc["w_up"],
                        wc["w_down"], self.top_k, silu_and_mul,
                        renormalize=True)
            return h * a["mlp"] + y * a["mlp_b"], kv0, ssm_all

        x, kv0, ssm_all = jax.lax.fori_loop(
            0, self.L, layer_fn, (x, kv0, ssm_all))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, (kv0, (ssm_all, ))

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)
