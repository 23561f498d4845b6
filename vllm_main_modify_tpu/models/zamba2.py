"""Zamba2 (Zyphra): Mamba-2 backbone with cyclically-shared "memory"
transformer blocks.

Reference parity: vllm/model_executor/models/zamba2.py. Every decoder
layer is a Mamba-2 mixer; at the ``hybrid`` positions a shared
transformer block (one of ``num_mem_blocks``, cycled over the hybrid
layers) runs first on ``concat(hidden, embeddings)`` — a 2H-wide
stream — and its output, passed through a per-layer linear, is added
to the mamba branch input *inside* the pre-mamba RMSNorm only (the
residual stream skips it, eq. 6 of the Zamba paper). The tied blocks
carry per-use LoRA-style adapters on the qkv projections (optional,
``use_shared_attention_adapter``) and always on the fused gate_up
projection; the attention softmax scale is ``(head_dim/2)**-0.5``
because the inputs are 2H wide, and rope applies only when
``use_mem_rope``. Checkpoints store each tied block once, under the
block's FIRST hybrid-layer path (HF dedups aliased tensors), which is
also where the reference's ``named_parameters`` finds them
(zamba2.py:768 load_weights skips alias keys).

TPU design: block weights are stacked ``[M, ...]`` and the per-hybrid
adapters/linears ``[G, ...]``; a single fori_loop dispatches per layer
with ``lax.cond`` on hybridness, gathering the right block/adapter row
with dynamic indexing. Attention KV group 0 covers the hybrid layers;
mamba state group 1 covers ALL layers (hybrid layers hold both).
"""

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
                                               mamba2_mixer)
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.mamba import _conv_kd
from vllm_main_modify_tpu.quantization.weights import matmul


class Zamba2ForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self.hidden = hf.hidden_size
        self.inter = hf.intermediate_size
        self.L = hf.num_hidden_layers
        self.M = g("num_mem_blocks", 1)
        self.hyb_ids = tuple(
            i for i, k in enumerate(hf.layers_block_type)
            if k == "hybrid")
        self.G = len(self.hyb_ids)
        self.num_q = hf.num_attention_heads
        self.num_kv = g("num_key_value_heads") or self.num_q
        self.attn_hidden = g("attention_hidden_size", 2 * self.hidden)
        self.head_dim = g("attention_head_dim",
                          self.attn_hidden // self.num_q)
        # 2H-wide inputs: HF scales by sqrt(2/head_dim)
        self.sm_scale = (self.head_dim / 2)**-0.5
        self.eps = g("rms_norm_eps", 1e-5)
        self.use_rope = bool(g("use_mem_rope", False))
        self.use_attn_adapter = bool(
            g("use_shared_attention_adapter", False))
        self.adapter_rank = g("adapter_rank", 128)
        self.act = g("hidden_act", "gelu")
        if self.use_rope:
            self.inv_freq = jnp.asarray(
                compute_inv_freq(self.head_dim, g("rope_theta", 10000.0),
                                 None))
        # mamba2 dims
        self.d_state = g("mamba_d_state", 64)
        self.d_conv = g("mamba_d_conv", 4)
        self.d_inner = int(g("mamba_expand", 2) * self.hidden)
        self.n_groups = g("mamba_ngroups", 1)
        self.m_heads = g("n_mamba_heads", 8)
        self.m_head_dim = g("mamba_headdim",
                            self.d_inner // self.m_heads)
        self.gn = self.n_groups * self.d_state
        self.conv_dim = self.d_inner + 2 * self.gn
        self.conv_bias = bool(g("use_conv_bias", True))
        tsl = g("time_step_limit", None)
        self.time_step_limit = (tuple(float(v) for v in tsl)
                                if tsl else (0.0, float("inf")))
        self.tie_embeddings = config.tie_word_embeddings

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V, I = self.hidden, c.vocab_size, self.inter
        AH, r = self.attn_hidden, self.adapter_rank
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        di, cd, nh = self.d_inner, self.conv_dim, self.m_heads
        proj_out = di + cd + nh
        t = transpose2d
        hyb = self.hyb_ids

        # tied block b is serialized at its first-usage hybrid layer
        first_of = lambda b: hyb[b]
        blk_ids = tuple(first_of(b) for b in range(self.M))

        def stk(group, ids, path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"{group}.{path}", (len(ids), *shape),
                             spec, "model.layers.{i}." + hf_key,
                             stacked=True, layer_ids=tuple(ids),
                             transform=transform)

        def per_layer(group, path, shape, spec, keys, transform=t):
            return ParamSpec(f"{group}.{path}", (len(keys), *shape),
                             spec, "", stacked=True,
                             hf_key_per_layer=tuple(keys),
                             transform=transform)

        # mamba prefixes differ between pure ("mamba.") and hybrid
        # ("mamba_decoder.mamba.") layers; ditto the pre-mamba LN
        def mkeys(suffix, ln=False):
            out = []
            for i in range(self.L):
                h = i in set(hyb)
                base = f"model.layers.{i}."
                if ln:
                    out.append(base + ("mamba_decoder." if h else "") +
                               suffix)
                else:
                    out.append(base +
                               ("mamba_decoder.mamba." if h else
                                "mamba.") + suffix)
            return out

        # adapter g lives under block (g % M)'s first-usage path, at
        # list index g
        def akeys(name):
            return [(f"model.layers.{first_of(g_ % self.M)}."
                     f"shared_transformer.{name}_list.{g_}")
                    for g_ in range(self.G)]

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(),
                      "model.final_layernorm.weight", transform=None),
            # ---- shared transformer blocks, stacked [M, ...] ----
            stk("blocks", blk_ids, "q_proj", (AH, qd),
                P(None, None, "model"),
                "shared_transformer.self_attn.q_proj.weight"),
            stk("blocks", blk_ids, "k_proj", (AH, kd),
                P(None, None, "model"),
                "shared_transformer.self_attn.k_proj.weight"),
            stk("blocks", blk_ids, "v_proj", (AH, kd),
                P(None, None, "model"),
                "shared_transformer.self_attn.v_proj.weight"),
            stk("blocks", blk_ids, "o_proj", (qd, H),
                P(None, "model", None),
                "shared_transformer.self_attn.o_proj.weight"),
            stk("blocks", blk_ids, "gate_up", (H, 2 * I),
                P(None, None, "model"),
                "shared_transformer.feed_forward.gate_up_proj.weight"),
            stk("blocks", blk_ids, "down_proj", (I, H),
                P(None, "model", None),
                "shared_transformer.feed_forward.down_proj.weight"),
            stk("blocks", blk_ids, "input_ln", (AH, ), P(None, None),
                "shared_transformer.input_layernorm.weight",
                transform=None),
            stk("blocks", blk_ids, "pre_ff_ln", (H, ), P(None, None),
                "shared_transformer.pre_ff_layernorm.weight",
                transform=None),
            # ---- per-hybrid-layer pieces, stacked [G, ...] ----
            stk("hyb", hyb, "linear", (H, H), P(None, None, "model"),
                "linear.weight"),
            per_layer("hyb", "gu_ad_down", (H, r), P(None, None, None),
                      [k + ".0.weight" for k in
                       akeys("feed_forward.gate_up_proj_adapter")]),
            per_layer("hyb", "gu_ad_up", (r, 2 * I),
                      P(None, None, "model"),
                      [k + ".1.weight" for k in
                       akeys("feed_forward.gate_up_proj_adapter")]),
            # ---- mamba mixers, stacked over ALL layers ----
            per_layer("mamba", "input_layernorm", (H, ), P(None, None),
                      mkeys("input_layernorm.weight", ln=True),
                      transform=None),
            per_layer("mamba", "in_proj", (H, proj_out),
                      P(None, None, "model"), mkeys("in_proj.weight")),
            per_layer("mamba", "conv_w", (self.d_conv, cd),
                      P(None, None, "model"), mkeys("conv1d.weight"),
                      transform=_conv_kd),
            per_layer("mamba", "dt_bias", (nh, ), P(None, "model"),
                      mkeys("dt_bias"), transform=None),
            per_layer("mamba", "A_log", (nh, ), P(None, "model"),
                      mkeys("A_log"), transform=None),
            per_layer("mamba", "D", (nh, ), P(None, "model"),
                      mkeys("D"), transform=None),
            per_layer("mamba", "norm", (di, ), P(None, "model"),
                      mkeys("norm.weight"), transform=None),
            per_layer("mamba", "out_proj", (di, H),
                      P(None, "model", None), mkeys("out_proj.weight")),
        ]
        if self.conv_bias:
            specs.append(
                per_layer("mamba", "conv_b", (cd, ), P(None, "model"),
                          mkeys("conv1d.bias"), transform=None))
        if self.use_attn_adapter:
            for n in ("q", "k", "v"):
                ak = akeys(f"self_attn.linear_{n}_adapter")
                specs += [
                    per_layer("hyb", f"{n}_ad_down", (AH, r),
                              P(None, None, None),
                              [k + ".0.weight" for k in ak]),
                    per_layer("hyb", f"{n}_ad_up",
                              (r, qd if n == "q" else kd),
                              P(None, None, "model"),
                              [k + ".1.weight" for k in ak]),
                ]
        if not self.tie_embeddings:
            specs.append(
                ParamSpec("lm_head", (H, V), P(None, "model"),
                          "lm_head.weight", transform=t))
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.G

    def kv_cache_groups(self):
        from vllm_main_modify_tpu.core.kv_cache_interface import \
            KVCacheGroupSpec

        return [
            KVCacheGroupSpec(kind="full", layer_ids=self.hyb_ids,
                             kv_heads=self.num_kv,
                             head_dim=self.head_dim),
            KVCacheGroupSpec(
                kind="mamba", layer_ids=tuple(range(self.L)),
                state_shapes=(
                    ((self.d_conv - 1, self.conv_dim), "float32"),
                    ((self.m_heads, self.m_head_dim, self.d_state),
                     "float32"),
                )),
        ]

    # ------------------------------------------------------------------

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        orig = x
        t = x.shape[0]
        kv0, states = kv_caches
        conv_all, ssm_all = states
        gm = attn_meta.groups[0]
        seg = build_seg_info(attn_meta.query_start_loc,
                             attn_meta.num_seqs, t, gm.state_slots,
                             fresh_req=gm.state_fresh)

        is_hyb = jnp.asarray(
            [l in set(self.hyb_ids) for l in range(self.L)], bool)
        hyb_pos_np = np.zeros(self.L, dtype=np.int32)
        for g_, l in enumerate(self.hyb_ids):
            hyb_pos_np[l] = g_
        hyb_pos = jnp.asarray(hyb_pos_np)
        blk_of = jnp.asarray(hyb_pos_np % max(self.M, 1))

        def pick(group, gl):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, gl, 0, keepdims=False), params[group])

        def act_fn(a):
            if self.act in ("gelu", "gelu_new", "gelu_pytorch_tanh"):
                return jax.nn.gelu(
                    a, approximate=self.act != "gelu")
            return jax.nn.silu(a)

        def block_branch(l, h, kv0):
            """Shared transformer block → per-layer linear."""
            g_ = hyb_pos[l]
            blk = pick("blocks", blk_of[l])
            ad = pick("hyb", g_)
            cat = jnp.concatenate([h, orig], axis=-1)  # [T, 2H]
            hn = rms_norm(cat, blk["input_ln"], self.eps)
            q = matmul(hn, blk["q_proj"])
            k = matmul(hn, blk["k_proj"])
            v = matmul(hn, blk["v_proj"])
            if self.use_attn_adapter:
                q = q + (hn @ ad["q_ad_down"]) @ ad["q_ad_up"]
                k = k + (hn @ ad["k_ad_down"]) @ ad["k_ad_up"]
                v = v + (hn @ ad["v_ad_down"]) @ ad["v_ad_up"]
            q = q.reshape(t, self.num_q, self.head_dim)
            k = k.reshape(t, self.num_kv, self.head_dim)
            v = v.reshape(t, self.num_kv, self.head_dim)
            if self.use_rope:
                q, k = apply_rope(q, k, positions, self.inv_freq)
            o, kv0 = attention(q, k, v, kv0, g_, attn_meta,
                               self.sm_scale, use_pallas=use_pallas)
            o = matmul(o.reshape(t, -1), blk["o_proj"])
            # NOTE: no residuals inside the block (zamba2.py
            # Zamba2AttentionDecoderLayer)
            y = rms_norm(o, blk["pre_ff_ln"], self.eps)
            gu = matmul(y, blk["gate_up"]) + \
                (y @ ad["gu_ad_down"]) @ ad["gu_ad_up"]
            mlp = act_fn(gu[:, :self.inter]) * gu[:, self.inter:]
            mlp = matmul(mlp, blk["down_proj"])
            return matmul(mlp, ad["linear"]), kv0

        def layer_fn(l, carry):
            x, kv0, conv_all, ssm_all = carry
            if self.G:
                t_out, kv0 = jax.lax.cond(
                    is_hyb[l], block_branch,
                    lambda l, h, kv0: (jnp.zeros_like(h), kv0),
                    l, x, kv0)
            else:
                t_out = jnp.zeros_like(x)
            w = pick("mamba", l)
            # transformer output feeds ONLY the normed mamba input;
            # the residual stream skips it (Zamba2MambaDecoderLayer)
            h = rms_norm(x + t_out, w["input_layernorm"], self.eps)
            mw = {k_: v_ for k_, v_ in w.items()
                  if k_ != "input_layernorm"}
            out, cs, ss = mamba2_mixer(
                h, mw, conv_all[l], ssm_all[l], seg, self.m_heads,
                self.m_head_dim, self.n_groups, self.d_state,
                1e-5,  # Zamba2RMSNormGated hardcodes eps=1e-5
                time_step_limit=self.time_step_limit,
                norm_groups=self.n_groups)
            conv_all = jax.lax.dynamic_update_index_in_dim(
                conv_all, cs, l, 0)
            ssm_all = jax.lax.dynamic_update_index_in_dim(
                ssm_all, ss, l, 0)
            return x + out, kv0, conv_all, ssm_all

        x, kv0, conv_all, ssm_all = jax.lax.fori_loop(
            0, self.L, layer_fn, (x, kv0, conv_all, ssm_all))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, (kv0, (conv_all, ssm_all))

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)
