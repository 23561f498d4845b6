"""Bamba (IBM): Mamba-2 + attention hybrid decoder.

Reference parity: vllm/model_executor/models/bamba.py. Jamba-style
layout (models/jamba.py) with the Mamba-2 SSD mixer
(layers/mamba.py mamba2_mixer), dense SwiGLU MLPs on every layer, and
partial-rotary attention on ``attn_layer_indices``. Attention KV =
group 0 (attention layers only), Mamba-2 states = group 1.
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
                                               mamba2_mixer)
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import compute_inv_freq
from vllm_main_modify_tpu.models.gpt_neox import apply_rope_partial
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.mamba import _conv_kd
from vllm_main_modify_tpu.quantization.weights import matmul


class BambaForCausalLM:

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
        self.eps = g("rms_norm_eps", 1e-5)
        self.rot_dim = int(self.head_dim *
                           (g("partial_rotary_factor", 0.5) or 0.5))
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.rot_dim, config.rope_theta,
                             config.rope_scaling))
        # mamba2 dims
        self.m_heads = g("mamba_n_heads", 128)
        self.m_head_dim = g("mamba_d_head",
                            g("mamba_expand", 2) * self.hidden //
                            max(g("mamba_n_heads", 128), 1))
        self.d_inner = self.m_heads * self.m_head_dim
        self.d_state = g("mamba_d_state", 128)
        self.d_conv = g("mamba_d_conv", 4)
        self.n_groups = g("mamba_n_groups", 1)
        self.gn = self.n_groups * self.d_state
        self.conv_dim = self.d_inner + 2 * self.gn
        self.conv_bias = bool(g("mamba_conv_bias", True))
        self.proj_bias = bool(g("mamba_proj_bias", False))
        attn_ids = g("attn_layer_indices", None) or []
        self.attn_ids = tuple(sorted(attn_ids))
        self.mamba_ids = tuple(l for l in range(self.L)
                               if l not in set(self.attn_ids))
        self.tie_embeddings = config.tie_word_embeddings

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V, I = self.hidden, c.vocab_size, self.inter
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        di, cd, nh = self.d_inner, self.conv_dim, self.m_heads
        proj_out = di + cd + nh
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
                      "model.final_layernorm.weight", transform=None),
            stk("layers", all_ids, "input_layernorm", (H, ),
                P(None, None), "input_layernorm.weight",
                transform=None),
            stk("layers", all_ids, "pre_ff_layernorm", (H, ),
                P(None, None), "pre_ff_layernorm.weight",
                transform=None),
            stk("layers", all_ids, "gate_proj", (H, I),
                P(None, None, "model"),
                "feed_forward.gate_proj.weight"),
            stk("layers", all_ids, "up_proj", (H, I),
                P(None, None, "model"), "feed_forward.up_proj.weight"),
            stk("layers", all_ids, "down_proj", (I, H),
                P(None, "model", None),
                "feed_forward.down_proj.weight"),
        ]
        if not self.tie_embeddings:
            specs.append(
                ParamSpec("lm_head", (H, V), P(None, "model"),
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
        if self.mamba_ids:
            specs += [
                stk("mamba", self.mamba_ids, "in_proj", (H, proj_out),
                    P(None, None, "model"), "mamba.in_proj.weight"),
                stk("mamba", self.mamba_ids, "conv_w",
                    (self.d_conv, cd), P(None, None, "model"),
                    "mamba.conv1d.weight", transform=_conv_kd),
                stk("mamba", self.mamba_ids, "dt_bias", (nh, ),
                    P(None, "model"), "mamba.dt_bias",
                    transform=None),
                stk("mamba", self.mamba_ids, "A_log", (nh, ),
                    P(None, "model"), "mamba.A_log", transform=None),
                stk("mamba", self.mamba_ids, "D", (nh, ),
                    P(None, "model"), "mamba.D", transform=None),
                stk("mamba", self.mamba_ids, "norm", (di, ),
                    P(None, "model"), "mamba.norm.weight",
                    transform=None),
                stk("mamba", self.mamba_ids, "out_proj", (di, H),
                    P(None, "model", None), "mamba.out_proj.weight"),
            ]
            if self.conv_bias:
                specs.append(
                    stk("mamba", self.mamba_ids, "conv_b", (cd, ),
                        P(None, "model"), "mamba.conv1d.bias",
                        transform=None))
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
                    ((self.d_conv - 1, self.conv_dim), "float32"),
                    ((self.m_heads, self.m_head_dim, self.d_state),
                     "float32"),
                )),
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
        is_attn = jnp.asarray(
            [l in set(self.attn_ids) for l in range(self.L)], bool)

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
            q, k = apply_rope_partial(q, k, positions, self.inv_freq,
                                      self.rot_dim)
            o, kv0 = attention(q, k, v, kv0, attn_map[l], attn_meta,
                               self.sm_scale, use_pallas=use_pallas)
            return matmul(o.reshape(t, -1),
                          w["o_proj"]), kv0, conv_all, ssm_all

        def mamba_branch(l, h, kv0, conv_all, ssm_all):
            gl = mamba_map[l]
            w = pick("mamba", gl)
            out, cs, ss = mamba2_mixer(
                h, w, conv_all[gl], ssm_all[gl], seg, self.m_heads,
                self.m_head_dim, self.n_groups, self.d_state,
                self.eps)
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
            if not self.attn_ids:
                mix, kv0, conv_all, ssm_all = mamba_branch(
                    l, h, kv0, conv_all, ssm_all)
            elif not self.mamba_ids:
                mix, kv0, conv_all, ssm_all = attn_branch(
                    l, h, kv0, conv_all, ssm_all)
            else:
                mix, kv0, conv_all, ssm_all = jax.lax.cond(
                    is_attn[l], attn_branch, mamba_branch, l, h, kv0,
                    conv_all, ssm_all)
            x = res + mix
            res = x
            h = rms_norm(x, wc["pre_ff_layernorm"], self.eps)
            y = matmul(
                silu_and_mul(matmul(h, wc["gate_proj"]),
                             matmul(h, wc["up_proj"])),
                wc["down_proj"])
            return res + y, kv0, conv_all, ssm_all

        x, kv0, conv_all, ssm_all = jax.lax.fori_loop(
            0, self.L, layer_fn, (x, kv0, conv_all, ssm_all))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, (kv0, (conv_all, ssm_all))

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)


class GraniteMoeHybridForCausalLM(BambaForCausalLM):
    """Granite 4.0 (reference: granitemoehybrid.py): Bamba-style
    mamba2/attention hybrid with GraniteMoe FUSED-expert MoE + an
    always-on fused shared MLP, Granite scalar multipliers, and NO
    positional encoding on the attention layers."""

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        # hybrid layer pattern comes as layer_types "mamba"/"attention"
        lt = list(getattr(hf, "layer_types", None) or [])
        hf.attn_layer_indices = [i for i, k in enumerate(lt)
                                 if k == "attention"]
        super().__init__(config)
        g = lambda k, d=None: getattr(hf, k, d)
        self.use_rope = g("position_embedding_type", None) == "rope"
        self.embed_mult = g("embedding_multiplier", 1.0)
        self.residual_mult = g("residual_multiplier", 1.0)
        self.logits_div = g("logits_scaling", 1.0)
        am = g("attention_multiplier", None)
        if am:
            self.sm_scale = am
        self.E = g("num_local_experts", 0)
        self.top_k = g("num_experts_per_tok", 2)
        self.moe_inter = g("intermediate_size", self.inter)
        self.shared_inter = g("shared_intermediate_size", 0)

    def param_specs(self) -> list[ParamSpec]:
        H = self.hidden
        mi, si, E = self.moe_inter, self.shared_inter, self.E
        all_ids = tuple(range(self.L))

        def gslice(lo, hi):
            def f(x):
                y = x[:, lo:hi, :] if hi is not None else x
                return np.ascontiguousarray(y.transpose(0, 2, 1))

            return f

        def stk(path, shape, spec, hf_key, transform=transpose2d):
            return ParamSpec(f"layers.{path}", (self.L, *shape), spec,
                             "model.layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = []
        for s in super().param_specs():
            # drop Bamba's dense MLP specs; norms/attn/mamba keep
            if s.path.split(".")[-1] in ("gate_proj", "up_proj",
                                         "down_proj"):
                continue
            if s.path == "layers.pre_ff_layernorm":
                s.hf_key = ("model.layers.{i}."
                            "post_attention_layernorm.weight")
            if s.path == "final_norm":
                s.hf_key = "model.norm.weight"
            specs.append(s)
        base = "model.layers.{i}.block_sparse_moe."
        specs += [
            stk("router", (H, E), P(None, None, None),
                base.split("{i}.")[1] + "router.layer.weight"),
            ParamSpec("layers.w_gate", (self.L, E, H, mi),
                      P(None, None, None, "model"),
                      base + "input_linear.weight",
                      stacked=True, transform=gslice(0, mi)),
            ParamSpec("layers.w_up", (self.L, E, H, mi),
                      P(None, None, None, "model"),
                      base + "input_linear.weight",
                      stacked=True, transform=gslice(mi, 2 * mi)),
            ParamSpec("layers.w_down", (self.L, E, mi, H),
                      P(None, None, "model", None),
                      base + "output_linear.weight",
                      stacked=True, transform=gslice(0, None)),
            ParamSpec("layers.shared_gate", (self.L, H, si),
                      P(None, None, "model"),
                      "model.layers.{i}.shared_mlp"
                      ".input_linear.weight", stacked=True,
                      transform=lambda x: np.ascontiguousarray(
                          x[:si].T)),
            ParamSpec("layers.shared_up", (self.L, H, si),
                      P(None, None, "model"),
                      "model.layers.{i}.shared_mlp"
                      ".input_linear.weight", stacked=True,
                      transform=lambda x: np.ascontiguousarray(
                          x[si:2 * si].T)),
            ParamSpec("layers.shared_down", (self.L, si, H),
                      P(None, "model", None),
                      "model.layers.{i}.shared_mlp"
                      ".output_linear.weight", stacked=True,
                      transform=transpose2d),
        ]
        return specs

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        from vllm_main_modify_tpu.layers.moe import moe_ffn

        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        if self.embed_mult != 1.0:
            x = x * jnp.asarray(self.embed_mult, dtype=x.dtype)
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
        is_attn = jnp.asarray(
            [l in set(self.attn_ids) for l in range(self.L)], bool)

        def pick(group, gl):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, gl, 0, keepdims=False), params[group])

        rmul = jnp.asarray(self.residual_mult, dtype=x.dtype) \
            if self.residual_mult != 1.0 else None

        def attn_branch(l, h, kv0, conv_all, ssm_all):
            w = pick("attn", attn_map[l])
            q = matmul(h, w["q_proj"]).reshape(t, self.num_q,
                                               self.head_dim)
            k = matmul(h, w["k_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            v = matmul(h, w["v_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            if self.use_rope:
                q, k = apply_rope_partial(q, k, positions,
                                          self.inv_freq, self.rot_dim)
            o, kv0 = attention(q, k, v, kv0, attn_map[l], attn_meta,
                               self.sm_scale, use_pallas=use_pallas)
            return matmul(o.reshape(t, -1),
                          w["o_proj"]), kv0, conv_all, ssm_all

        def mamba_branch(l, h, kv0, conv_all, ssm_all):
            gl = mamba_map[l]
            w = pick("mamba", gl)
            out, cs, ss = mamba2_mixer(
                h, w, conv_all[gl], ssm_all[gl], seg, self.m_heads,
                self.m_head_dim, self.n_groups, self.d_state,
                self.eps)
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
            if not self.attn_ids:
                mix, kv0, conv_all, ssm_all = mamba_branch(
                    l, h, kv0, conv_all, ssm_all)
            else:
                mix, kv0, conv_all, ssm_all = jax.lax.cond(
                    is_attn[l], attn_branch, mamba_branch, l, h, kv0,
                    conv_all, ssm_all)
            if rmul is not None:
                mix = mix * rmul
            x = res + mix
            res = x
            h = rms_norm(x, wc["pre_ff_layernorm"], self.eps)
            y = moe_ffn(h, wc["router"], wc["w_gate"], wc["w_up"],
                        wc["w_down"], self.top_k,
                        lambda g, u: jax.nn.silu(g) * u,
                        renormalize=True)
            sh = jax.nn.silu(matmul(h, wc["shared_gate"])) * \
                matmul(h, wc["shared_up"])
            y = y + matmul(sh, wc["shared_down"])
            if rmul is not None:
                y = y * rmul
            return res + y, kv0, conv_all, ssm_all

        x, kv0, conv_all, ssm_all = jax.lax.fori_loop(
            0, self.L, layer_fn, (x, kv0, conv_all, ssm_all))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, (kv0, (conv_all, ssm_all))

    def compute_logits(self, params, hidden):
        logits = super().compute_logits(params, hidden)
        if self.logits_div != 1.0:
            logits = logits / self.logits_div
        return logits


class FalconH1ForCausalLM(BambaForCausalLM):
    """Falcon-H1 (reference: falcon_h1.py): EVERY layer runs attention
    and a Mamba-2 mixer IN PARALLEL from one pre-norm, with µP
    multipliers throughout (embedding, attn in/out, key, ssm in/out,
    zxbcdt chunks, MLP gate/down, lm_head). Supported for the
    mamba_d_ssm == expand*hidden layout (no extra z0/x0 chunks).
    Attention KV and SSM states each form a group covering ALL
    layers."""

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        hf.attn_layer_indices = []  # base class: mamba dims etc.
        super().__init__(config)
        g = lambda k, d=None: getattr(hf, k, d)
        d_ssm = g("mamba_d_ssm", None)
        if d_ssm is not None and d_ssm != self.d_inner:
            raise NotImplementedError(
                "FalconH1 with mamba_d_ssm != expand*hidden_size "
                "(extra z0/x0 mixer chunks) is not supported yet")
        self.attn_ids = tuple(range(self.L))
        self.mamba_ids = tuple(range(self.L))
        # full rotary (no partial factor in FalconH1)
        self.rot_dim = self.head_dim
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta,
                             config.rope_scaling))
        self.embed_mult = g("embedding_multiplier", 1.0)
        self.attn_in_mult = g("attention_in_multiplier", 1.0)
        self.attn_out_mult = g("attention_out_multiplier", 1.0)
        self.key_mult = g("key_multiplier", 1.0)
        self.ssm_in_mult = g("ssm_in_multiplier", 1.0)
        self.ssm_out_mult = g("ssm_out_multiplier", 1.0)
        self.zxbcdt = tuple(g("ssm_multipliers",
                              (1.0, ) * 5) or (1.0, ) * 5)
        self.mlp_mults = tuple(g("mlp_multipliers", (1.0, 1.0))
                               or (1.0, 1.0))
        self.lm_head_mult = g("lm_head_multiplier", 1.0)
        self.rms_norm_gate = bool(g("mamba_rms_norm", False))

    def param_specs(self) -> list[ParamSpec]:
        specs = []
        for s in super().param_specs():
            tail = s.path.split(".")[-1]
            if s.path.startswith("mamba.") and tail == "norm" and \
                    not self.rms_norm_gate:
                continue  # ungated variant has no norm weight
            specs.append(s)
        return specs

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        if self.embed_mult != 1.0:
            x = x * jnp.asarray(self.embed_mult, dtype=x.dtype)
        t = x.shape[0]
        kv0, states = kv_caches
        conv_all, ssm_all = states
        slots = attn_meta.groups[0].state_slots
        seg = build_seg_info(attn_meta.query_start_loc,
                             attn_meta.num_seqs, t, slots,
                             fresh_req=attn_meta.groups[0].state_fresh)
        common = params["layers"]

        def pick(group, gl):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, gl, 0, keepdims=False), params[group])

        def layer_fn(l, carry):
            x, kv0, conv_all, ssm_all = carry
            wc = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), common)
            res = x
            h = rms_norm(x, wc["input_layernorm"], self.eps)

            # attention branch
            wa = pick("attn", l)
            ha = h * self.attn_in_mult if self.attn_in_mult != 1.0 \
                else h
            q = matmul(ha, wa["q_proj"]).reshape(t, self.num_q,
                                                 self.head_dim)
            k = matmul(ha, wa["k_proj"]).reshape(t, self.num_kv,
                                                 self.head_dim)
            if self.key_mult != 1.0:
                k = k * self.key_mult
            v = matmul(ha, wa["v_proj"]).reshape(t, self.num_kv,
                                                 self.head_dim)
            q, k = apply_rope_partial(q, k, positions, self.inv_freq,
                                      self.rot_dim)
            o, kv0 = attention(q, k, v, kv0, l, attn_meta,
                               self.sm_scale, use_pallas=use_pallas)
            attn_out = matmul(o.reshape(t, -1), wa["o_proj"])
            if self.attn_out_mult != 1.0:
                attn_out = attn_out * self.attn_out_mult

            # mamba branch (parallel, same pre-norm input)
            wm = pick("mamba", l)
            hm = h * self.ssm_in_mult if self.ssm_in_mult != 1.0 \
                else h
            m_out, cs, ss = mamba2_mixer(
                hm, wm, conv_all[l], ssm_all[l], seg, self.m_heads,
                self.m_head_dim, self.n_groups, self.d_state,
                self.eps, zxbcdt_multipliers=self.zxbcdt)
            conv_all = jax.lax.dynamic_update_index_in_dim(
                conv_all, cs, l, 0)
            ssm_all = jax.lax.dynamic_update_index_in_dim(
                ssm_all, ss, l, 0)
            if self.ssm_out_mult != 1.0:
                m_out = m_out * self.ssm_out_mult
            x = res + attn_out + m_out

            res = x
            h = rms_norm(x, wc["pre_ff_layernorm"], self.eps)
            gm, dm = self.mlp_mults
            y = matmul(h, wc["up_proj"]) * jax.nn.silu(
                matmul(h, wc["gate_proj"]) * gm)
            y = matmul(y.astype(x.dtype), wc["down_proj"]) * dm
            return res + y, kv0, conv_all, ssm_all

        x, kv0, conv_all, ssm_all = jax.lax.fori_loop(
            0, self.L, layer_fn, (x, kv0, conv_all, ssm_all))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, (kv0, (conv_all, ssm_all))

    def compute_logits(self, params, hidden):
        logits = super().compute_logits(params, hidden)
        if self.lm_head_mult != 1.0:
            logits = logits * self.lm_head_mult
        return logits


class NemotronHForCausalLM(BambaForCausalLM):
    """Nemotron-H (reference: nemotron_h.py): every layer is ONE mixer
    — Mamba-2 ("M"), attention ("*"), or a relu²-MLP ("-") per the
    ``hybrid_override_pattern`` string — wrapped as
    x = x + mixer(norm(x)) (nemotron_h.py:100-300). Attention has NO
    positional encoding; checkpoint keys live under ``backbone.``."""

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        pattern = getattr(hf, "hybrid_override_pattern", "")
        if isinstance(getattr(hf, "intermediate_size", 0), (list,
                                                            tuple)):
            sizes = set(hf.intermediate_size)
            if len(sizes) > 1:
                raise NotImplementedError(
                    "heterogeneous per-layer MLP sizes (NAS'd "
                    "Nemotron variants) are not supported yet")
            hf.intermediate_size = next(iter(sizes))
        hf.attn_layer_indices = [i for i, c in enumerate(pattern)
                                 if c == "*"]
        # base-class mamba dims come from different config names
        hf.mamba_n_heads = getattr(hf, "mamba_num_heads", 128)
        hf.mamba_d_head = getattr(hf, "mamba_head_dim", 64)
        hf.mamba_d_state = getattr(hf, "ssm_state_size", 128)
        hf.mamba_d_conv = getattr(hf, "conv_kernel", 4)
        hf.mamba_n_groups = getattr(hf, "n_groups", 8)
        hf.mamba_conv_bias = getattr(hf, "use_conv_bias", True)
        hf.mamba_proj_bias = getattr(hf, "use_bias", False)
        super().__init__(config)
        self.d_inner = self.m_heads * self.m_head_dim
        self.conv_dim = self.d_inner + 2 * self.gn
        self.mlp_ids = tuple(i for i, c in enumerate(pattern)
                             if c == "-")
        self.mamba_ids = tuple(i for i, c in enumerate(pattern)
                               if c == "M")
        self.mlp_bias = bool(getattr(hf, "mlp_bias", False))

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V, I = self.hidden, c.vocab_size, self.inter
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        di, cd, nh = self.d_inner, self.conv_dim, self.m_heads
        proj_out = 2 * di + 2 * self.gn + nh
        t = transpose2d

        def stk(group, ids, path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"{group}.{path}", (len(ids), *shape),
                             spec, "backbone.layers.{i}." + hf_key,
                             stacked=True, layer_ids=tuple(ids),
                             transform=transform)

        all_ids = tuple(range(self.L))
        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "backbone.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(),
                      "backbone.norm_f.weight", transform=None),
            stk("layers", all_ids, "norm", (H, ), P(None, None),
                "norm.weight", transform=None),
        ]
        if not self.tie_embeddings:
            specs.append(ParamSpec("lm_head", (H, V), P(None, "model"),
                                   "lm_head.weight", transform=t))
        if self.attn_ids:
            for n, width in (("q", qd), ("k", kd), ("v", kd)):
                specs.append(
                    stk("attn", self.attn_ids, f"{n}_proj", (H, width),
                        P(None, None, "model"),
                        f"mixer.{n}_proj.weight"))
            specs.append(
                stk("attn", self.attn_ids, "o_proj", (qd, H),
                    P(None, "model", None), "mixer.o_proj.weight"))
        if self.mlp_ids:
            specs += [
                stk("mlp", self.mlp_ids, "up_proj", (H, I),
                    P(None, None, "model"), "mixer.up_proj.weight"),
                stk("mlp", self.mlp_ids, "down_proj", (I, H),
                    P(None, "model", None), "mixer.down_proj.weight"),
            ]
            if self.mlp_bias:
                specs += [
                    stk("mlp", self.mlp_ids, "up_bias", (I, ),
                        P(None, "model"), "mixer.up_proj.bias",
                        transform=None),
                    stk("mlp", self.mlp_ids, "down_bias", (H, ),
                        P(None, None), "mixer.down_proj.bias",
                        transform=None),
                ]
        if self.mamba_ids:
            specs += [
                stk("mamba", self.mamba_ids, "in_proj",
                    (H, proj_out), P(None, None, "model"),
                    "mixer.in_proj.weight"),
                stk("mamba", self.mamba_ids, "conv_w",
                    (self.d_conv, cd), P(None, None, "model"),
                    "mixer.conv1d.weight", transform=_conv_kd),
                stk("mamba", self.mamba_ids, "dt_bias", (nh, ),
                    P(None, "model"), "mixer.dt_bias",
                    transform=None),
                stk("mamba", self.mamba_ids, "A_log", (nh, ),
                    P(None, "model"), "mixer.A_log", transform=None),
                stk("mamba", self.mamba_ids, "D", (nh, ),
                    P(None, "model"), "mixer.D", transform=None),
                stk("mamba", self.mamba_ids, "norm", (di, ),
                    P(None, "model"), "mixer.norm.weight",
                    transform=None),
                stk("mamba", self.mamba_ids, "out_proj", (di, H),
                    P(None, "model", None), "mixer.out_proj.weight"),
            ]
            if self.conv_bias:
                specs.append(
                    stk("mamba", self.mamba_ids, "conv_b", (cd, ),
                        P(None, "model"), "mixer.conv1d.bias",
                        transform=None))
        return specs

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids, axis=0)
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
        mlp_map = idx_map(self.mlp_ids)
        kind = np.zeros(self.L, dtype=np.int32)  # 0=attn 1=mamba 2=mlp
        for l in self.mamba_ids:
            kind[l] = 1
        for l in self.mlp_ids:
            kind[l] = 2
        kind = jnp.asarray(kind)

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
            # NoPE: Nemotron-H attention has no rotary embedding
            o, kv0 = attention(q, k, v, kv0, attn_map[l], attn_meta,
                               self.sm_scale, use_pallas=use_pallas)
            return matmul(o.reshape(t, -1),
                          w["o_proj"]), kv0, conv_all, ssm_all

        def mamba_branch(l, h, kv0, conv_all, ssm_all):
            gl = mamba_map[l]
            w = pick("mamba", gl)
            out, cs, ss = mamba2_mixer(
                h, w, conv_all[gl], ssm_all[gl], seg, self.m_heads,
                self.m_head_dim, self.n_groups, self.d_state,
                self.eps)
            conv_all = jax.lax.dynamic_update_index_in_dim(
                conv_all, cs, gl, 0)
            ssm_all = jax.lax.dynamic_update_index_in_dim(
                ssm_all, ss, gl, 0)
            return out, kv0, conv_all, ssm_all

        def mlp_branch(l, h, kv0, conv_all, ssm_all):
            w = pick("mlp", mlp_map[l])
            y = matmul(h, w["up_proj"])
            if "up_bias" in w:
                y = y + w["up_bias"]
            y = jnp.square(jax.nn.relu(y))  # relu²
            y = matmul(y.astype(h.dtype), w["down_proj"])
            if "down_bias" in w:
                y = y + w["down_bias"]
            return y, kv0, conv_all, ssm_all

        branches = [attn_branch, mamba_branch, mlp_branch]

        def layer_fn(l, carry):
            x, kv0, conv_all, ssm_all = carry
            wc = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), common)
            h = rms_norm(x, wc["norm"], self.eps)
            mix, kv0, conv_all, ssm_all = jax.lax.switch(
                kind[l], branches, l, h, kv0, conv_all, ssm_all)
            return x + mix, kv0, conv_all, ssm_all

        x, kv0, conv_all, ssm_all = jax.lax.fori_loop(
            0, self.L, layer_fn, (x, kv0, conv_all, ssm_all))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, (kv0, (conv_all, ssm_all))
