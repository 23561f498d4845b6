"""Qwen3-Next: gated-DeltaNet linear attention + gated full attention
hybrid with Qwen2-MoE-style experts.

Reference: vllm/model_executor/models/qwen3_next.py + HF
modeling_qwen3_next. Per config ``layer_types``:

- full_attention: q_proj emits per-head [q | gate] (2x head_dim), the
  attention output is multiplied by sigmoid(gate) before o_proj;
  zero-centered per-head RMS q/k norms, partial rotary 0.25;
- linear_attention (GatedDeltaNet): fused in_proj_qkvz grouped per
  KEY head (q,k: Dk; v,z: ratio x Dv), in_proj_ba (beta, a), a silu
  causal conv over [q|k|v], decay g = -exp(A_log)·softplus(a+dt_bias),
  beta = sigmoid(b), the delta-rule recurrence
  (layers/deltanet.py), then per-head gated RMS norm with silu(z);
- every layer: Qwen2-MoE MLP (softmax top-k + always-on shared expert
  behind a sigmoid gate), zero-centered RMS layernorms throughout.

States ride a mamba-kind KV group: conv tails (K-1, conv_dim) and the
recurrent S [Hv, Dk, Dv] per request slot."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.activation import silu_and_mul
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.deltanet import gated_delta_rule_ragged
from vllm_main_modify_tpu.layers.mamba import (build_seg_info,
                                               causal_conv1d_ragged,
                                               update_conv_state)
from vllm_main_modify_tpu.layers.moe import moe_ffn
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import compute_inv_freq
from vllm_main_modify_tpu.models.gemma import gemma_rms_norm
from vllm_main_modify_tpu.models.gpt_neox import apply_rope_partial
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d


def _texpert(x):
    return np.ascontiguousarray(x.T)


def _qkvz_slice(part: str, num_k: int, hk: int, hv: int, ratio: int):
    """HF fix_query_key_value_ordering: rows grouped per key head as
    [q(hk), k(hk), v(ratio*hv), z(ratio*hv)]."""
    block = 2 * hk + 2 * ratio * hv

    def f(x):  # [num_k*block, H]
        xs = x.reshape(num_k, block, -1)
        if part == "q":
            y = xs[:, :hk]
        elif part == "k":
            y = xs[:, hk:2 * hk]
        elif part == "v":
            y = xs[:, 2 * hk:2 * hk + ratio * hv]
        else:
            y = xs[:, 2 * hk + ratio * hv:]
        return np.ascontiguousarray(y.reshape(-1, x.shape[-1]).T)

    return f


def _ba_slice(part: str, num_k: int, ratio: int):
    def f(x):  # [num_k*2*ratio, H]
        xs = x.reshape(num_k, 2 * ratio, -1)
        y = xs[:, :ratio] if part == "b" else xs[:, ratio:]
        return np.ascontiguousarray(y.reshape(-1, x.shape[-1]).T)

    return f


def _qgate_slice(part: str, heads: int, hd: int):
    """q_proj [2*qd, H]: per-head [q(hd) | gate(hd)]."""

    def f(x):
        xs = x.reshape(heads, 2 * hd, -1)
        y = xs[:, :hd] if part == "q" else xs[:, hd:]
        return np.ascontiguousarray(y.reshape(-1, x.shape[-1]).T)

    return f


def _conv_kd(x):
    return np.ascontiguousarray(x[:, 0, :].T)


class Qwen3NextForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = config.head_dim
        self.sm_scale = self.head_dim**-0.5
        self.eps = g("rms_norm_eps", 1e-6)
        self.rot_dim = int(self.head_dim *
                           (g("partial_rotary_factor", 0.25) or 0.25))
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.rot_dim, config.rope_theta,
                             config.rope_scaling))
        # deltanet dims
        self.hv = g("linear_num_value_heads", 32)
        self.hk = g("linear_num_key_heads", 16)
        self.dk = g("linear_key_head_dim", 128)
        self.dv = g("linear_value_head_dim", 128)
        self.ratio = self.hv // self.hk
        self.key_dim = self.dk * self.hk
        self.value_dim = self.dv * self.hv
        self.conv_dim = 2 * self.key_dim + self.value_dim
        self.d_conv = g("linear_conv_kernel_dim", 4)
        # MoE
        self.E = g("num_experts", 0)
        self.top_k = g("num_experts_per_tok", 2)
        self.moe_inter = g("moe_intermediate_size",
                           config.intermediate_size)
        self.shared_inter = g("shared_expert_intermediate_size", 0)
        self.renormalize = bool(g("norm_topk_prob", True))
        lt = list(g("layer_types", None) or [])
        self.attn_ids = tuple(i for i, k in enumerate(lt)
                              if k == "full_attention")
        self.linear_ids = tuple(i for i, k in enumerate(lt)
                                if k == "linear_attention")
        self.tie_embeddings = config.tie_word_embeddings

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V, E = self.hidden, c.vocab_size, self.E
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        mi, si = self.moe_inter, self.shared_inter
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
            # MoE on every layer (decoder_sparse_step=1)
            stk("layers", all_ids, "router", (H, E),
                P(None, None, None), "mlp.gate.weight"),
            stk("layers", all_ids, "w_gate", (E, H, mi),
                P(None, None, None, "model"),
                "mlp.experts.{e}.gate_proj.weight", experts=E,
                transform=_texpert),
            stk("layers", all_ids, "w_up", (E, H, mi),
                P(None, None, None, "model"),
                "mlp.experts.{e}.up_proj.weight", experts=E,
                transform=_texpert),
            stk("layers", all_ids, "w_down", (E, mi, H),
                P(None, None, "model", None),
                "mlp.experts.{e}.down_proj.weight", experts=E,
                transform=_texpert),
            stk("layers", all_ids, "shared_gate_proj", (H, si),
                P(None, None, "model"),
                "mlp.shared_expert.gate_proj.weight"),
            stk("layers", all_ids, "shared_up_proj", (H, si),
                P(None, None, "model"),
                "mlp.shared_expert.up_proj.weight"),
            stk("layers", all_ids, "shared_down_proj", (si, H),
                P(None, "model", None),
                "mlp.shared_expert.down_proj.weight"),
            stk("layers", all_ids, "shared_expert_gate", (H, 1),
                P(None, None, None), "mlp.shared_expert_gate.weight"),
        ]
        if not self.tie_embeddings:
            specs.append(ParamSpec("lm_head", (H, V), P(None, "model"),
                                   "lm_head.weight", transform=t))
        if self.attn_ids:
            specs += [
                stk("attn", self.attn_ids, "q_proj", (H, qd),
                    P(None, None, "model"), "self_attn.q_proj.weight",
                    transform=_qgate_slice("q", self.num_q,
                                           self.head_dim)),
                stk("attn", self.attn_ids, "gate_proj", (H, qd),
                    P(None, None, "model"), "self_attn.q_proj.weight",
                    transform=_qgate_slice("g", self.num_q,
                                           self.head_dim)),
                stk("attn", self.attn_ids, "k_proj", (H, kd),
                    P(None, None, "model"), "self_attn.k_proj.weight"),
                stk("attn", self.attn_ids, "v_proj", (H, kd),
                    P(None, None, "model"), "self_attn.v_proj.weight"),
                stk("attn", self.attn_ids, "o_proj", (qd, H),
                    P(None, "model", None), "self_attn.o_proj.weight"),
                stk("attn", self.attn_ids, "q_norm", (self.head_dim, ),
                    P(None, None), "self_attn.q_norm.weight",
                    transform=None),
                stk("attn", self.attn_ids, "k_norm", (self.head_dim, ),
                    P(None, None), "self_attn.k_norm.weight",
                    transform=None),
            ]
        if self.linear_ids:
            hk, hv, r = self.dk, self.dv, self.ratio
            specs += [
                stk("linear", self.linear_ids, "q_proj",
                    (H, self.key_dim), P(None, None, "model"),
                    "linear_attn.in_proj_qkvz.weight",
                    transform=_qkvz_slice("q", self.hk, hk, hv, r)),
                stk("linear", self.linear_ids, "k_proj",
                    (H, self.key_dim), P(None, None, "model"),
                    "linear_attn.in_proj_qkvz.weight",
                    transform=_qkvz_slice("k", self.hk, hk, hv, r)),
                stk("linear", self.linear_ids, "v_proj",
                    (H, self.value_dim), P(None, None, "model"),
                    "linear_attn.in_proj_qkvz.weight",
                    transform=_qkvz_slice("v", self.hk, hk, hv, r)),
                stk("linear", self.linear_ids, "z_proj",
                    (H, self.value_dim), P(None, None, "model"),
                    "linear_attn.in_proj_qkvz.weight",
                    transform=_qkvz_slice("z", self.hk, hk, hv, r)),
                stk("linear", self.linear_ids, "b_proj",
                    (H, self.hv), P(None, None, "model"),
                    "linear_attn.in_proj_ba.weight",
                    transform=_ba_slice("b", self.hk, r)),
                stk("linear", self.linear_ids, "a_proj",
                    (H, self.hv), P(None, None, "model"),
                    "linear_attn.in_proj_ba.weight",
                    transform=_ba_slice("a", self.hk, r)),
                stk("linear", self.linear_ids, "conv_w",
                    (self.d_conv, self.conv_dim),
                    P(None, None, "model"),
                    "linear_attn.conv1d.weight", transform=_conv_kd),
                stk("linear", self.linear_ids, "A_log", (self.hv, ),
                    P(None, "model"), "linear_attn.A_log",
                    transform=None),
                stk("linear", self.linear_ids, "dt_bias", (self.hv, ),
                    P(None, "model"), "linear_attn.dt_bias",
                    transform=None),
                stk("linear", self.linear_ids, "norm", (self.dv, ),
                    P(None, None), "linear_attn.norm.weight",
                    transform=None),
                stk("linear", self.linear_ids, "out_proj",
                    (self.value_dim, H), P(None, "model", None),
                    "linear_attn.out_proj.weight"),
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
                    ((self.d_conv - 1, self.conv_dim), "float32"),
                    ((self.hv, self.dk, self.dv), "float32"),
                )),
        ]

    # ------------------------------------------------------------------

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        kv0, states = kv_caches
        conv_all, ssm_all = states
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

        def pick(group, gl):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, gl, 0, keepdims=False), params[group])

        def attn_branch(l, h, kv0, conv_all, ssm_all):
            w = pick("attn", attn_map[l])
            q = (h @ w["q_proj"]).reshape(t, self.num_q,
                                          self.head_dim)
            gate = h @ w["gate_proj"]  # [t, qd]
            k = (h @ w["k_proj"]).reshape(t, self.num_kv,
                                          self.head_dim)
            v = (h @ w["v_proj"]).reshape(t, self.num_kv,
                                          self.head_dim)
            q = gemma_rms_norm(q, w["q_norm"], self.eps)
            k = gemma_rms_norm(k, w["k_norm"], self.eps)
            q, k = apply_rope_partial(q, k, positions, self.inv_freq,
                                      self.rot_dim)
            o, kv0 = attention(q, k, v, kv0, attn_map[l], attn_meta,
                               self.sm_scale, use_pallas=use_pallas)
            o = o.reshape(t, -1) * jax.nn.sigmoid(
                gate.astype(jnp.float32)).astype(o.dtype)
            return o @ w["o_proj"], kv0, conv_all, ssm_all

        def linear_branch(l, h, kv0, conv_all, ssm_all):
            gl = lin_map[l]
            w = pick("linear", gl)
            q = h @ w["q_proj"]
            k = h @ w["k_proj"]
            v = h @ w["v_proj"]
            z = h @ w["z_proj"]
            b = h @ w["b_proj"]
            a = h @ w["a_proj"]
            qkv = jnp.concatenate([q, k, v], axis=-1)  # [t, conv_dim]
            cs = conv_all[gl]
            qkv = causal_conv1d_ragged(qkv, w["conv_w"], None, cs,
                                       seg)
            cs = update_conv_state(
                jnp.concatenate([q, k, v], axis=-1), cs, seg)
            conv_all = jax.lax.dynamic_update_index_in_dim(
                conv_all, cs, gl, 0)
            qkv = jax.nn.silu(qkv.astype(jnp.float32))
            qc = qkv[:, :self.key_dim].reshape(t, self.hk, self.dk)
            kc = qkv[:, self.key_dim:2 * self.key_dim].reshape(
                t, self.hk, self.dk)
            vc = qkv[:, 2 * self.key_dim:].reshape(t, self.hv,
                                                   self.dv)
            if self.ratio > 1:
                qc = jnp.repeat(qc, self.ratio, axis=1)
                kc = jnp.repeat(kc, self.ratio, axis=1)
            beta = jax.nn.sigmoid(b.astype(jnp.float32))
            g = -jnp.exp(w["A_log"].astype(jnp.float32)) * \
                jax.nn.softplus(a.astype(jnp.float32) +
                                w["dt_bias"].astype(jnp.float32))
            ss = ssm_all[gl]
            out, ss = gated_delta_rule_ragged(qc, kc, vc, g, beta,
                                              ss, seg)
            ssm_all = jax.lax.dynamic_update_index_in_dim(
                ssm_all, ss, gl, 0)
            # gated RMS norm per value head dim, silu(z) gate
            zc = z.reshape(t, self.hv, self.dv).astype(jnp.float32)
            out = rms_norm(out, w["norm"], self.eps)
            out = out * jax.nn.silu(zc)
            out = out.reshape(t, -1).astype(h.dtype) @ w["out_proj"]
            return out, kv0, conv_all, ssm_all

        def layer_fn(l, carry):
            x, kv0, conv_all, ssm_all = carry
            wc = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), common)
            res = x
            h = gemma_rms_norm(x, wc["input_layernorm"], self.eps)
            mix, kv0, conv_all, ssm_all = jax.lax.cond(
                is_attn[l], attn_branch, linear_branch, l, h, kv0,
                conv_all, ssm_all)
            x = res + mix
            res = x
            h = gemma_rms_norm(x, wc["post_attention_layernorm"],
                               self.eps)
            y = moe_ffn(h, wc["router"], wc["w_gate"], wc["w_up"],
                        wc["w_down"], self.top_k, silu_and_mul,
                        renormalize=self.renormalize)
            sh = silu_and_mul(h @ wc["shared_gate_proj"],
                              h @ wc["shared_up_proj"]) @ \
                wc["shared_down_proj"]
            gate = jax.nn.sigmoid(
                (h @ wc["shared_expert_gate"]).astype(jnp.float32))
            y = y + (sh.astype(jnp.float32) * gate).astype(y.dtype)
            return res + y, kv0, conv_all, ssm_all

        x, kv0, conv_all, ssm_all = jax.lax.fori_loop(
            0, self.L, layer_fn, (x, kv0, conv_all, ssm_all))
        x = gemma_rms_norm(x, params["final_norm"], self.eps)
        return x, (kv0, (conv_all, ssm_all))

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)
