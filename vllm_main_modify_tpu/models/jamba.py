"""Jamba: hybrid Mamba + attention + MoE decoder (AI21).

Reference parity: vllm/model_executor/models/jamba.py. Layer l's token
mixer is attention iff ``l % attn_layer_period == attn_layer_offset``
(else a Mamba-1 mixer with weighted dt/B/C RMS norms), and its MLP is
MoE iff ``l % expert_layer_period == expert_layer_offset``. Attention
layers have NO rope (positions come from the SSM layers).

TPU-native layout: four weight stacks (common norms over all L;
attention weights over the attention layers; mamba weights over the
SSM layers; dense vs MoE MLPs over theirs) indexed through group-local
maps, dispatched by ``lax.cond`` inside one ``fori_loop`` — the same
shape the Gemma-2 sliding/full alternation uses. Attention KV lives in
group 0 (only the attention layers' pages), Mamba states in group 1.
"""

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
from vllm_main_modify_tpu.layers.mamba import (build_seg_info,
                                               mamba1_mixer)
from vllm_main_modify_tpu.layers.moe import moe_ffn
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.mamba import _conv_kd
from vllm_main_modify_tpu.quantization.weights import matmul


def _t_expert(x):
    return np.ascontiguousarray(x.T)


class JambaForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self.hidden = config.hidden_size
        self.inter = config.intermediate_size
        self.L = config.num_layers
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = config.head_dim
        self.sm_scale = self.head_dim**-0.5
        self.eps = g("rms_norm_eps", 1e-6)
        # mamba dims
        self.d_state = g("mamba_d_state", 16)
        self.d_conv = g("mamba_d_conv", 4)
        self.d_inner = g("mamba_expand", 2) * self.hidden
        dt_rank = g("mamba_dt_rank", "auto")
        self.dt_rank = (-(-self.hidden // 16) if dt_rank == "auto"
                        else int(dt_rank))
        self.conv_bias = bool(g("mamba_conv_bias", True))
        self.proj_bias = bool(g("mamba_proj_bias", False))
        # layer pattern
        ap, ao = g("attn_layer_period", 8), g("attn_layer_offset", 4)
        ep, eo = g("expert_layer_period", 2), g("expert_layer_offset",
                                                1)
        self.E = g("num_experts", 16)
        self.top_k = g("num_experts_per_tok", 2)
        self.attn_ids = tuple(l for l in range(self.L)
                              if l % ap == ao)
        self.mamba_ids = tuple(l for l in range(self.L)
                               if l % ap != ao)
        self.moe_ids = tuple(l for l in range(self.L)
                             if self.E > 1 and l % ep == eo)
        self.dense_ids = tuple(l for l in range(self.L)
                               if l not in set(self.moe_ids))
        self.tie_embeddings = config.tie_word_embeddings

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V, I = self.hidden, c.vocab_size, self.inter
        di, ds, dr = self.d_inner, self.d_state, self.dt_rank
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        t = transpose2d
        La, Lm = len(self.attn_ids), len(self.mamba_ids)
        Le, Ld = len(self.moe_ids), len(self.dense_ids)

        def stk(group, ids, path, shape, spec, hf_key, transform=t,
                num_experts=0):
            return ParamSpec(f"{group}.{path}",
                             (len(ids), *shape), spec,
                             "model.layers.{i}." + hf_key,
                             stacked=True, layer_ids=tuple(ids),
                             num_experts=num_experts,
                             transform=transform)

        all_ids = tuple(range(self.L))
        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(),
                      "model.final_layernorm.weight", transform=None),
            stk("layers", all_ids, "input_layernorm", (H, ),
                P(None, None), "input_layernorm.weight",
                transform=None),
            stk("layers", all_ids, "pre_ff_layernorm", (H, ),
                P(None, None), "pre_ff_layernorm.weight",
                transform=None),
        ]
        if not self.tie_embeddings:
            specs.append(
                ParamSpec("lm_head", (H, V), P(None, "model"),
                          "lm_head.weight", transform=t))
        # attention stack
        if La:
            specs += [
                stk("attn", self.attn_ids, "q_proj", (H, qd),
                    P(None, None, "model"),
                    "self_attn.q_proj.weight"),
                stk("attn", self.attn_ids, "k_proj", (H, kd),
                    P(None, None, "model"),
                    "self_attn.k_proj.weight"),
                stk("attn", self.attn_ids, "v_proj", (H, kd),
                    P(None, None, "model"),
                    "self_attn.v_proj.weight"),
                stk("attn", self.attn_ids, "o_proj", (qd, H),
                    P(None, "model", None),
                    "self_attn.o_proj.weight"),
            ]
        # mamba stack
        if Lm:
            specs += [
                stk("mamba", self.mamba_ids, "in_proj", (H, 2 * di),
                    P(None, None, "model"), "mamba.in_proj.weight"),
                stk("mamba", self.mamba_ids, "conv_w",
                    (self.d_conv, di), P(None, None, "model"),
                    "mamba.conv1d.weight", transform=_conv_kd),
                stk("mamba", self.mamba_ids, "x_proj",
                    (di, dr + 2 * ds), P(None, "model", None),
                    "mamba.x_proj.weight"),
                stk("mamba", self.mamba_ids, "dt_proj", (dr, di),
                    P(None, None, "model"), "mamba.dt_proj.weight"),
                stk("mamba", self.mamba_ids, "dt_bias", (di, ),
                    P(None, "model"), "mamba.dt_proj.bias",
                    transform=None),
                stk("mamba", self.mamba_ids, "A_log", (di, ds),
                    P(None, "model", None), "mamba.A_log",
                    transform=None),
                stk("mamba", self.mamba_ids, "D", (di, ),
                    P(None, "model"), "mamba.D", transform=None),
                stk("mamba", self.mamba_ids, "out_proj", (di, H),
                    P(None, "model", None), "mamba.out_proj.weight"),
                stk("mamba", self.mamba_ids, "dt_norm", (dr, ),
                    P(None, None), "mamba.dt_layernorm.weight",
                    transform=None),
                stk("mamba", self.mamba_ids, "b_norm", (ds, ),
                    P(None, None), "mamba.b_layernorm.weight",
                    transform=None),
                stk("mamba", self.mamba_ids, "c_norm", (ds, ),
                    P(None, None), "mamba.c_layernorm.weight",
                    transform=None),
            ]
            if self.conv_bias:
                specs.append(
                    stk("mamba", self.mamba_ids, "conv_b", (di, ),
                        P(None, "model"), "mamba.conv1d.bias",
                        transform=None))
            if self.proj_bias:
                specs += [
                    stk("mamba", self.mamba_ids, "in_bias",
                        (2 * di, ), P(None, "model"),
                        "mamba.in_proj.bias", transform=None),
                    stk("mamba", self.mamba_ids, "out_bias", (H, ),
                        P(None, None), "mamba.out_proj.bias",
                        transform=None),
                ]
        # dense MLP stack
        if Ld:
            specs += [
                stk("dense", self.dense_ids, "gate_proj", (H, I),
                    P(None, None, "model"),
                    "feed_forward.gate_proj.weight"),
                stk("dense", self.dense_ids, "up_proj", (H, I),
                    P(None, None, "model"),
                    "feed_forward.up_proj.weight"),
                stk("dense", self.dense_ids, "down_proj", (I, H),
                    P(None, "model", None),
                    "feed_forward.down_proj.weight"),
            ]
        # MoE stack
        if Le:
            specs += [
                stk("moe", self.moe_ids, "router", (H, self.E),
                    P(None, None, None), "feed_forward.router.weight"),
                stk("moe", self.moe_ids, "w_gate", (self.E, H, I),
                    P(None, None, None, "model"),
                    "feed_forward.experts.{e}.gate_proj.weight",
                    num_experts=self.E, transform=_t_expert),
                stk("moe", self.moe_ids, "w_up", (self.E, H, I),
                    P(None, None, None, "model"),
                    "feed_forward.experts.{e}.up_proj.weight",
                    num_experts=self.E, transform=_t_expert),
                stk("moe", self.moe_ids, "w_down", (self.E, I, H),
                    P(None, None, "model", None),
                    "feed_forward.experts.{e}.down_proj.weight",
                    num_experts=self.E, transform=_t_expert),
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
                kind="mamba", layer_ids=self.mamba_ids,
                state_shapes=(
                    ((self.d_conv - 1, self.d_inner), "float32"),
                    ((self.d_inner, self.d_state), "float32"),
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
        mamba_map = idx_map(self.mamba_ids)
        moe_map = idx_map(self.moe_ids)
        dense_map = idx_map(self.dense_ids)
        is_attn = jnp.asarray(
            [l in set(self.attn_ids) for l in range(self.L)], bool)
        is_moe = jnp.asarray(
            [l in set(self.moe_ids) for l in range(self.L)], bool)

        def pick(group, gl):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, gl, 0, keepdims=False), params[group])

        def attn_branch(l, h, kv0, conv_all, ssm_all):
            w = pick("attn", attn_map[l])
            q = matmul(h, w["q_proj"]).reshape(t, self.num_q,
                                               self.head_dim)
            k = matmul(h, w["k_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            v = matmul(h, w["v_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            # NO rope: Jamba attention is position-encoding-free
            o, kv0 = attention(q, k, v, kv0, attn_map[l], attn_meta,
                               self.sm_scale, use_pallas=use_pallas)
            return matmul(o.reshape(t, -1),
                          w["o_proj"]), kv0, conv_all, ssm_all

        def mamba_branch(l, h, kv0, conv_all, ssm_all):
            gl = mamba_map[l]
            w = pick("mamba", gl)
            out, cs, ss = mamba1_mixer(h, w, conv_all[gl], ssm_all[gl],
                                       seg, self.dt_rank, self.d_state,
                                       rms_eps=self.eps)
            conv_all = jax.lax.dynamic_update_index_in_dim(
                conv_all, cs, gl, 0)
            ssm_all = jax.lax.dynamic_update_index_in_dim(
                ssm_all, ss, gl, 0)
            return out, kv0, conv_all, ssm_all

        def layer_fn(l, carry):
            x, kv0, conv_all, ssm_all = carry
            wc = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), common)
            res = x
            h = rms_norm(x, wc["input_layernorm"], self.eps)
            mix, kv0, conv_all, ssm_all = jax.lax.cond(
                is_attn[l], attn_branch, mamba_branch, l, h, kv0,
                conv_all, ssm_all)
            x = res + mix

            res = x
            h = rms_norm(x, wc["pre_ff_layernorm"], self.eps)

            def moe_branch(h):
                w = pick("moe", moe_map[l])
                # HF Jamba: softmax-then-topk WITHOUT renormalization
                return moe_ffn(h, w["router"], w["w_gate"], w["w_up"],
                               w["w_down"], self.top_k,
                               lambda g, u: jax.nn.silu(g) * u,
                               renormalize=False)

            def dense_branch(h):
                w = pick("dense", dense_map[l])
                return matmul(
                    silu_and_mul(matmul(h, w["gate_proj"]),
                                 matmul(h, w["up_proj"])),
                    w["down_proj"])

            if not self.moe_ids:
                y = dense_branch(h)
            elif not self.dense_ids:
                y = moe_branch(h)
            else:
                y = jax.lax.cond(is_moe[l], moe_branch, dense_branch,
                                 h)
            return res + y, kv0, conv_all, ssm_all

        x, kv0, conv_all, ssm_all = jax.lax.fori_loop(
            0, self.L, layer_fn, (x, kv0, conv_all, ssm_all))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, (kv0, (conv_all, ssm_all))

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)


class JambaForSequenceClassification(JambaForCausalLM):
    """Reference: jamba.py:559 — Jamba backbone + a score head
    [H, num_labels] (optional bias), last-token pooling through the
    runner's classify path (Jamba reward models)."""

    def __init__(self, config: ModelConfig):
        config.is_pooling_model = True
        super().__init__(config)
        hf = config.hf_config
        self.num_labels = getattr(hf, "num_labels", 2)
        self.score_bias = bool(getattr(hf, "score_bias", False))

    def param_specs(self) -> list[ParamSpec]:
        from vllm_main_modify_tpu.models.interface import transpose2d

        specs = [s for s in super().param_specs()
                 if s.path != "lm_head"]
        specs.append(
            ParamSpec("score", (self.hidden, self.num_labels),
                      P(None, None), "score.weight",
                      transform=transpose2d))
        if self.score_bias:
            specs.append(
                ParamSpec("score_bias", (self.num_labels, ), P(),
                          "score.bias", transform=None))
        return specs

    def classify_logits(self, params, pooled_hidden):
        return pooled_hidden  # score head applied by the runner

    def compute_logits(self, params, hidden):
        # pooling model: no lm_head — the sampler still traces
        # through this; give it a harmless projection
        import jax.numpy as jnp

        return (hidden.astype(jnp.float32) @
                params["embed_tokens"].T.astype(jnp.float32))
