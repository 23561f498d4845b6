"""DeepSeek-V2/V3 family: MLA attention + DeepSeek-MoE.

Reference parity: vllm/model_executor/models/deepseek_v2.py and the
MLA backend family (vllm/v1/attention/backends/mla/common.py).
TPU-native strategy: **latent KV cache with matrix absorption** —
exactly the reference's decode math, applied uniformly:

- the cache stores ONE "head" per token: K = [c_kv | k_pe]
  (kv_lora_rank + qk_rope wide), V = [c_kv | 0-pad] — ~2*(rank+rope)
  elements/token instead of the decompressed 2*nh*(nope+rope)
  (~21x less KV HBM and decode bandwidth for DeepSeek-V2);
- W_UK is absorbed into the query (q_latent[h] = q_nope[h] @ W_UK[h],
  scores = q_latent . c_kv + q_pe . k_pe) and W_UV into the output
  (o[h] = ctx_latent[h] @ W_UV[h]), so attention becomes MQA with a
  single wide kv head and runs on the unchanged ragged paged kernel
  (group = num_heads); the absorption is an exact algebraic identity,
  so HF logit parity holds to float tolerance.

The reference decompresses for prefill (compute-bound) and absorbs
for decode (bandwidth-bound); this build absorbs everywhere — chunked
prefill scores cost more FLOPs (rank+rope vs nope per pair) but every
token's KV is written and read once in latent form, and serving is
dominated by decode bandwidth.

MoE (reference: fused_moe grouped_topk + deepseek_v2.py
DeepseekV2MoE): softmax-over-all-experts routing, greedy or
group-limited-greedy top-k, ``routed_scaling_factor`` on the routed
path, plus always-on shared experts. The first
``first_k_dense_replace`` layers use a dense SwiGLU MLP; dense and
MoE layers run as two separately-stacked ``fori_loop``s with the KV
cache threaded through as carry.

RoPE is the interleaved (GPT-J pair) convention applied only to the
rope sub-dims, with YaRN scaling + mscale softmax correction for
long-context checkpoints.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.activation import silu_and_mul
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.moe import (deepseek_v3_routing,
                                             moe_apply, moe_ffn)
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                apply_rope_interleaved,
                                                compute_inv_freq,
                                                yarn_get_mscale)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.quantization.weights import matmul


class DeepseekV2ForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_heads = config.num_attention_heads
        self.qk_nope = g("qk_nope_head_dim", 128)
        self.qk_rope = g("qk_rope_head_dim", 64)
        self.v_head = g("v_head_dim", 128)
        self.qk_head = self.qk_nope + self.qk_rope
        self.q_lora_rank = g("q_lora_rank")
        self.kv_lora_rank = g("kv_lora_rank", 512)
        self.inter = config.intermediate_size
        # MoE structure
        self.n_routed = g("n_routed_experts") or 0
        self.n_shared = g("n_shared_experts") or 0
        self.top_k = g("num_experts_per_tok") or 0
        self.moe_inter = g("moe_intermediate_size") or 0
        self.first_dense = g("first_k_dense_replace", 0) or 0
        self.routed_scale = g("routed_scaling_factor", 1.0) or 1.0
        self.renormalize = bool(g("norm_topk_prob", False))
        self.topk_method = g("topk_method", "greedy") or "greedy"
        self.n_group = g("n_group", 1) or 1
        self.topk_group = g("topk_group", 1) or 1
        # V3 "noaux_tc" router: sigmoid scoring + e_score_correction
        # bias (HF hardcodes it in DeepseekV3Config; remote-code
        # checkpoints carry scoring_func/topk_method)
        self.v3_router = (type(hf).__name__ == "DeepseekV3Config"
                          or g("scoring_func") == "sigmoid"
                          or self.topk_method == "noaux_tc")
        if (self.topk_method != "group_limited_greedy"
                and not self.v3_router):
            self.n_group = 1
        if self.n_routed == 0:
            self.first_dense = self.L
        self.n_moe = self.L - self.first_dense
        assert (g("moe_layer_freq", 1) or 1) == 1, \
            "moe_layer_freq > 1 not supported"
        assert not g("attention_bias", False), \
            "DeepseekV2 attention_bias not supported"

        scale = self.qk_head**-0.5
        self.rope_mscale = 1.0
        rs = config.rope_scaling
        if rs and rs.get("rope_type", rs.get("type")) == "yarn":
            # softmax-scale correction (reference deepseek_v2.py:
            # scaling *= yarn_get_mscale(factor, mscale_all_dim)^2) and
            # cos/sin magnitude ratio (deepseek_scaling_rope mscale /
            # mscale_all_dim attention factor)
            factor = rs.get("factor", 1.0)
            m_all = float(rs.get("mscale_all_dim", 0) or 0)
            m = float(rs.get("mscale", 1.0) or 1.0)
            if m_all:
                ms = yarn_get_mscale(factor, m_all)
                scale = scale * ms * ms
                self.rope_mscale = (yarn_get_mscale(factor, m) /
                                    yarn_get_mscale(factor, m_all))
            else:
                self.rope_mscale = yarn_get_mscale(factor, m)
        self.sm_scale = scale
        # DeepSeek checkpoints use interleaved (GPT-J pair) rope by
        # convention; V3 configs can opt out via rope_interleave
        self.rope_interleave = bool(g("rope_interleave", True))
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.qk_rope, config.rope_theta, rs))
        self.tie_embeddings = config.tie_word_embeddings

    # ------------------------------------------------------------------

    def _attn_specs(self, prefix: str, n: int, offset: int):
        H, nh = self.hidden, self.num_heads
        t = transpose2d

        def stk(path, shape, spec, hf_w, transform=t):
            return ParamSpec(
                f"{prefix}.{path}", (n, *shape), spec,
                "model.layers.{i}." + hf_w, stacked=True,
                transform=transform, layer_offset=offset)

        out = [
            stk("input_layernorm", (H, ), P(None, None),
                "input_layernorm.weight", transform=None),
            stk("post_attention_layernorm", (H, ), P(None, None),
                "post_attention_layernorm.weight", transform=None),
            stk("kv_a_proj", (H, self.kv_lora_rank + self.qk_rope),
                P(None, None, None),
                "self_attn.kv_a_proj_with_mqa.weight"),
            stk("kv_a_norm", (self.kv_lora_rank, ), P(None, None),
                "self_attn.kv_a_layernorm.weight", transform=None),
            stk("kv_b_proj",
                (self.kv_lora_rank, nh * (self.qk_nope + self.v_head)),
                P(None, None, "model"), "self_attn.kv_b_proj.weight"),
            stk("o_proj", (nh * self.v_head, H),
                P(None, "model", None), "self_attn.o_proj.weight"),
        ]
        if self.q_lora_rank:
            out += [
                stk("q_a_proj", (H, self.q_lora_rank),
                    P(None, None, None), "self_attn.q_a_proj.weight"),
                stk("q_a_norm", (self.q_lora_rank, ), P(None, None),
                    "self_attn.q_a_layernorm.weight", transform=None),
                stk("q_b_proj", (self.q_lora_rank, nh * self.qk_head),
                    P(None, None, "model"),
                    "self_attn.q_b_proj.weight"),
            ]
        else:
            out.append(
                stk("q_proj", (H, nh * self.qk_head),
                    P(None, None, "model"), "self_attn.q_proj.weight"))
        return out

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V = self.hidden, c.vocab_size
        t = transpose2d

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
            ParamSpec("lm_head", (H, V), P(None, "model"),
                      "lm_head.weight", transform=t),
        ]

        if self.first_dense > 0:
            n = self.first_dense
            specs += self._attn_specs("dense_layers", n, 0)
            for name, shape, spec in (
                ("gate_proj", (H, self.inter), P(None, None, "model")),
                ("up_proj", (H, self.inter), P(None, None, "model")),
                ("down_proj", (self.inter, H), P(None, "model", None)),
            ):
                specs.append(
                    ParamSpec(f"dense_layers.{name}", (n, *shape), spec,
                              "model.layers.{i}.mlp." + name + ".weight",
                              stacked=True, transform=t))

        if self.n_moe > 0:
            n, off = self.n_moe, self.first_dense
            specs += self._attn_specs("moe_layers", n, off)
            E, mi = self.n_routed, self.moe_inter
            si = self.moe_inter * self.n_shared

            def stk(path, shape, spec, hf_w, transform=t, experts=0):
                return ParamSpec(
                    f"moe_layers.{path}", (n, *shape), spec,
                    "model.layers.{i}.mlp." + hf_w, stacked=True,
                    transform=transform, layer_offset=off,
                    num_experts=experts)

            if self.v3_router:
                specs.append(
                    stk("router_bias", (E, ), P(None, None),
                        "gate.e_score_correction_bias",
                        transform=None))
            specs += [
                stk("router", (H, E), P(None, None, None),
                    "gate.weight"),
                stk("w_gate", (E, H, mi), P(None, None, None, "model"),
                    "experts.{e}.gate_proj.weight", experts=E),
                stk("w_up", (E, H, mi), P(None, None, None, "model"),
                    "experts.{e}.up_proj.weight", experts=E),
                stk("w_down", (E, mi, H), P(None, None, "model", None),
                    "experts.{e}.down_proj.weight", experts=E),
                stk("shared_gate_proj", (H, si),
                    P(None, None, "model"),
                    "shared_experts.gate_proj.weight"),
                stk("shared_up_proj", (H, si), P(None, None, "model"),
                    "shared_experts.up_proj.weight"),
                stk("shared_down_proj", (si, H),
                    P(None, "model", None),
                    "shared_experts.down_proj.weight"),
            ]
        return specs

    @property
    def latent_width(self) -> int:
        # [c_kv | k_pe] padded to a lane multiple: Mosaic cannot
        # lane-split reshapes on non-128-multiple head dims (e.g.
        # 512+64=576 → 640); zero pad dims are exact no-ops in the
        # score/value math
        return -(-(self.kv_lora_rank + self.qk_rope) // 128) * 128

    def kv_cache_spec(self) -> tuple[int, int, int]:
        # latent cache: one wide MQA head of [c_kv | k_pe | pad]
        return 1, self.latent_width, self.L

    # ------------------------------------------------------------------

    def _mla_attention(self, w, h, positions, kv_caches, layer_idx,
                       attn_meta, use_pallas):
        cfg = self.cfg
        t = h.shape[0]
        nh = self.num_heads
        rank = self.kv_lora_rank

        if self.q_lora_rank:
            q = matmul(
                rms_norm(matmul(h, w["q_a_proj"]), w["q_a_norm"],
                         cfg.rms_norm_eps), w["q_b_proj"])
        else:
            q = matmul(h, w["q_proj"])
        q = q.reshape(t, nh, self.qk_head)
        q_nope, q_pe = q[..., :self.qk_nope], q[..., self.qk_nope:]

        kv_a = matmul(h, w["kv_a_proj"])
        c_kv = rms_norm(kv_a[:, :rank], w["kv_a_norm"],
                        cfg.rms_norm_eps)
        k_pe = kv_a[:, rank:].reshape(t, 1, self.qk_rope)

        if self.rope_interleave:
            q_pe, k_pe = apply_rope_interleaved(q_pe, k_pe, positions,
                                                self.inv_freq,
                                                self.rope_mscale)
        else:
            q_pe, k_pe = apply_rope(q_pe, k_pe, positions,
                                    self.inv_freq)

        # matrix absorption (reference: mla/common.py W_UK/W_UV):
        # kv_b_proj [rank, nh*(nope+v)] → per-head up-projections
        w_kv_b = w["kv_b_proj"].reshape(rank, nh,
                                        self.qk_nope + self.v_head)
        w_uk = w_kv_b[..., :self.qk_nope]  # [rank, nh, nope]
        w_uv = w_kv_b[..., self.qk_nope:]  # [rank, nh, v]
        q_lat = jnp.einsum("thd,rhd->thr", q_nope, w_uk)

        pad = self.latent_width - rank - self.qk_rope
        q_full = jnp.pad(
            jnp.concatenate([q_lat, q_pe], axis=-1),
            ((0, 0), (0, 0), (0, pad)))
        k_tok = jnp.pad(
            jnp.concatenate([c_kv, k_pe[:, 0, :]], axis=-1),
            ((0, 0), (0, pad)))[:, None, :]  # [T, 1, W]
        v_tok = jnp.pad(
            c_kv, ((0, 0), (0, self.qk_rope + pad)))[:, None, :]

        o, kv_caches = attention(q_full, k_tok, v_tok, kv_caches,
                                 layer_idx, attn_meta, self.sm_scale,
                                 use_pallas=use_pallas)
        ctx_lat = o[..., :rank]  # [T, nh, rank] (pad region is zero)
        o = jnp.einsum("thr,rhd->thd", ctx_lat, w_uv)
        return matmul(o.reshape(t, nh * self.v_head), w["o_proj"]), \
            kv_caches

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        cfg = self.cfg
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids, axis=0)

        def pick(tree, i):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, i, 0, keepdims=False), tree)

        def dense_body(l, carry):
            x, kv = carry
            w = pick(params["dense_layers"], l)
            res = x
            h = rms_norm(x, w["input_layernorm"], cfg.rms_norm_eps)
            o, kv = self._mla_attention(w, h, positions, kv, l,
                                        attn_meta, use_pallas)
            x = res + o
            res = x
            h = rms_norm(x, w["post_attention_layernorm"],
                         cfg.rms_norm_eps)
            h = silu_and_mul(matmul(h, w["gate_proj"]),
                             matmul(h, w["up_proj"]))
            return res + matmul(h, w["down_proj"]), kv

        def moe_body(i, carry):
            x, kv = carry
            w = pick(params["moe_layers"], i)
            res = x
            h = rms_norm(x, w["input_layernorm"], cfg.rms_norm_eps)
            o, kv = self._mla_attention(w, h, positions, kv,
                                        i + self.first_dense,
                                        attn_meta, use_pallas)
            x = res + o
            res = x
            h = rms_norm(x, w["post_attention_layernorm"],
                         cfg.rms_norm_eps)
            if self.v3_router:
                weights, experts = deepseek_v3_routing(
                    h, w["router"], w["router_bias"], self.top_k,
                    self.n_group, self.topk_group, self.renormalize,
                    self.routed_scale)
                y = moe_apply(h, weights, experts, w["w_gate"],
                              w["w_up"], w["w_down"],
                              silu_and_mul).astype(jnp.float32)
            else:
                y = moe_ffn(h, w["router"], w["w_gate"], w["w_up"],
                            w["w_down"], self.top_k, silu_and_mul,
                            renormalize=self.renormalize,
                            n_group=self.n_group,
                            topk_group=self.topk_group)
                y = y.astype(jnp.float32) * self.routed_scale
            sh = silu_and_mul(matmul(h, w["shared_gate_proj"]),
                              matmul(h, w["shared_up_proj"]))
            y = (y + matmul(sh, w["shared_down_proj"]).astype(
                jnp.float32)).astype(x.dtype)
            return res + y, kv

        if self.first_dense > 0:
            x, kv_caches = jax.lax.fori_loop(0, self.first_dense,
                                             dense_body,
                                             (x, kv_caches))
        if self.n_moe > 0:
            x, kv_caches = jax.lax.fori_loop(0, self.n_moe, moe_body,
                                             (x, kv_caches))
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)


# DeepSeek-V3 shares the decoder graph; the sigmoid+bias ("noaux_tc")
# router is selected by config in __init__ (v3_router).
DeepseekV3ForCausalLM = DeepseekV2ForCausalLM


class MiniCPM3ForCausalLM(DeepseekV2ForCausalLM):
    """MiniCPM3-4B (reference: vllm minicpm3.py): the DeepSeek-V2 MLA
    attention graph (same q_a/q_b/kv_a/kv_b checkpoint keys) with a
    dense MLP, NEOX-style rope on the rope sub-dims, and MiniCPM µP
    scalars. The scalars are ABSORBED into weights at load — embed
    rows x scale_emb, o_proj/down_proj x scale_depth/sqrt(L), lm_head
    / (hidden/dim_model_base) — so the runtime graph is unchanged."""

    def __init__(self, config):
        import math

        hf = config.hf_config
        # MiniCPM3 applies standard (rotate-halves) rope, unlike
        # DeepSeek's interleaved convention
        hf.rope_interleave = bool(getattr(hf, "rope_interleave",
                                          False))
        super().__init__(config)
        assert not self.tie_embeddings, \
            "MiniCPM3 scalar absorption requires untied embeddings"
        g = lambda k, d=None: getattr(hf, k, d)
        self._scale_emb = float(g("scale_emb", 1.0) or 1.0)
        depth = g("scale_depth", None)
        self._res_mult = (float(depth) / math.sqrt(self.L)) \
            if depth else 1.0
        dmb = g("dim_model_base", None)
        self._logits_div = (self.hidden / float(dmb)) if dmb else 1.0

    def param_specs(self):
        import numpy as np

        def scaled(transform, mult):
            def f(x):
                y = x if transform is None else transform(x)
                return np.ascontiguousarray(
                    np.asarray(y) * np.float32(mult))

            return f

        specs = super().param_specs()
        for s in specs:
            tail = s.path.split(".")[-1]
            if s.path == "embed_tokens" and self._scale_emb != 1.0:
                s.transform = scaled(s.transform, self._scale_emb)
            elif tail in ("o_proj", "down_proj", "shared_down_proj",
                          "w_down") and self._res_mult != 1.0:
                s.transform = scaled(s.transform, self._res_mult)
            elif s.path == "lm_head" and self._logits_div != 1.0:
                s.transform = scaled(s.transform,
                                     1.0 / self._logits_div)
        return specs
