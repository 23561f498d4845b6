"""LongCat-Flash (LongcatFlashForCausalLM).

Reference: vllm/model_executor/models/longcat_flash.py — the
"shortcut-connected MoE" architecture: each checkpoint layer holds TWO
MLA attention sublayers and TWO dense SwiGLU MLPs; the MoE branch is
computed from the FIRST half's post-attention hidden state and added
after the SECOND half (so expert all-to-all overlaps the dense path).
Router (HF LongcatFlashTopkRouter): softmax scores over
n_routed + zero_expert_num logits; top-k selected on bias-shifted
scores, combine weights are the UNBIASED scores × routed_scaling, no
renormalisation; "zero experts" are identities (y += w · h).

TPU design: reuses the DeepSeek-V2 latent-MLA attention (matrix
absorption into a single wide MQA head, models/deepseek_v2.py) with
TWO cache layers per checkpoint layer (kv layer = 2·l + j); the MoE
rides the shared ragged_dot machinery with zero-experts folded in as
masked-weight slots plus an identity term.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.layers.moe import moe_apply
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.models.deepseek_v2 import \
    DeepseekV2ForCausalLM
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.quantization.weights import matmul


class LongcatFlashForCausalLM(DeepseekV2ForCausalLM):

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        # field map: HF LongcatFlashConfig → DeepSeek-style names the
        # parent reads (num_layers counts CHECKPOINT layers, each with
        # 2 attention sublayers; HF also reports num_hidden_layers=2L)
        self.ckpt_layers = g("num_layers") or \
            config.num_layers // 2
        hf.num_hidden_layers = self.ckpt_layers
        config.num_layers = self.ckpt_layers
        hf.intermediate_size = g("ffn_hidden_size",
                                 g("intermediate_size"))
        hf.moe_intermediate_size = g("expert_ffn_hidden_size")
        hf.num_experts_per_tok = g("moe_topk")
        hf.first_k_dense_replace = 0
        hf.norm_topk_prob = False
        config.intermediate_size = hf.intermediate_size
        super().__init__(config)
        self.zero_experts = g("zero_expert_num", 0) or 0
        assert (g("zero_expert_type", "identity")
                or "identity") == "identity", \
            "only identity zero experts are supported"
        self.router_bias = bool(g("router_bias", False))
        self.E_total = self.n_routed + self.zero_experts

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return 1, self.latent_width, 2 * self.L

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V, L = self.hidden, c.vocab_size, self.L
        I, E, mi = self.inter, self.n_routed, self.moe_inter
        t = transpose2d

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
            ParamSpec("lm_head", (H, V), P(None, "model"),
                      "lm_head.weight", transform=t),
        ]
        # LongCat MLA applies lora-rank compensation scales (HF
        # LongcatFlashMLA: mla_scale_q_lora on q_pass+q_rot,
        # mla_scale_kv_lora on the normed latent before kv_b_proj).
        # Both are bias-free linears, so fold the scales into the
        # q_b/kv_b weights at load time.
        q_scale = (H / self.q_lora_rank) ** 0.5
        kv_scale = (H / self.kv_lora_rank) ** 0.5

        def scaled(transform, scale):
            return lambda w: transform(w) * scale

        for j in (0, 1):
            attn = self._attn_specs(f"layers.a{j}", L, 0)
            for s in attn:
                # the sublayer index lives INSIDE the checkpoint key:
                # self_attn.{j}.*, input_layernorm.{j}.weight
                s.hf_key = s.hf_key.replace(
                    "self_attn.", f"self_attn.{j}.").replace(
                    "input_layernorm.weight",
                    f"input_layernorm.{j}.weight").replace(
                    "post_attention_layernorm.weight",
                    f"post_attention_layernorm.{j}.weight")
                if s.path.endswith("q_b_proj"):
                    s.transform = scaled(s.transform, q_scale)
                elif s.path.endswith("kv_b_proj"):
                    s.transform = scaled(s.transform, kv_scale)
            specs += attn
            for name, shape, spec in (
                ("gate_proj", (H, I), P(None, None, "model")),
                ("up_proj", (H, I), P(None, None, "model")),
                ("down_proj", (I, H), P(None, "model", None)),
            ):
                specs.append(
                    ParamSpec(f"layers.mlp{j}.{name}", (L, *shape),
                              spec,
                              "model.layers.{i}.mlps." + str(j) +
                              "." + name + ".weight",
                              stacked=True, transform=t))

        def moe(path, shape, spec, hf_w, transform=t, experts=0):
            return ParamSpec(f"layers.moe.{path}", (L, *shape), spec,
                             "model.layers.{i}.mlp." + hf_w,
                             stacked=True, transform=transform,
                             num_experts=experts)

        specs += [
            moe("router", (H, self.E_total), P(None, None, None),
                "router.classifier.weight"),
            moe("router_bias", (self.E_total, ), P(None, None),
                "router.e_score_correction_bias", transform=None),
            moe("w_gate", (E, H, mi), P(None, None, None, "model"),
                "experts.{e}.gate_proj.weight", experts=E),
            moe("w_up", (E, H, mi), P(None, None, None, "model"),
                "experts.{e}.up_proj.weight", experts=E),
            moe("w_down", (E, mi, H), P(None, None, "model", None),
                "experts.{e}.down_proj.weight", experts=E),
        ]
        return specs

    # ------------------------------------------------------------------

    def _longcat_moe(self, w, h):
        logits = h.astype(jnp.float32) @ \
            w["router"].astype(jnp.float32)
        scores = jax.nn.softmax(logits, axis=-1)
        choice = scores + w["router_bias"].astype(jnp.float32)[None]
        _, experts = jax.lax.top_k(choice, self.top_k)
        weights = jnp.take_along_axis(scores, experts, axis=1)
        weights = weights * self.routed_scale
        is_zero = experts >= self.n_routed
        routed_w = jnp.where(is_zero, 0.0, weights)
        routed_e = jnp.where(is_zero, 0, experts)
        y = moe_apply(h, routed_w, routed_e, w["w_gate"], w["w_up"],
                      w["w_down"], lambda g, u: jax.nn.silu(g) * u)
        zero_w = jnp.sum(jnp.where(is_zero, weights, 0.0), axis=-1,
                         keepdims=True)
        return y + (zero_w * h.astype(jnp.float32)).astype(y.dtype)

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        cfg = self.cfg
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids, axis=0)
        layers = params["layers"]

        def swiglu(w, h):
            return matmul(
                jax.nn.silu(matmul(h, w["gate_proj"])) *
                matmul(h, w["up_proj"]), w["down_proj"])

        def layer_fn(l, carry):
            x, kv = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            a0, a1 = w["a0"], w["a1"]
            r = x
            h = rms_norm(x, a0["input_layernorm"], cfg.rms_norm_eps)
            o0, kv = self._mla_attention(a0, h, positions, kv, 2 * l,
                                         attn_meta, use_pallas)
            r = r + o0
            h = rms_norm(r, a0["post_attention_layernorm"],
                         cfg.rms_norm_eps)
            moe_out = self._longcat_moe(w["moe"], h)
            r = r + swiglu(w["mlp0"], h)
            h = rms_norm(r, a1["input_layernorm"], cfg.rms_norm_eps)
            o1, kv = self._mla_attention(a1, h, positions, kv,
                                         2 * l + 1, attn_meta,
                                         use_pallas)
            r = r + o1
            h = rms_norm(r, a1["post_attention_layernorm"],
                         cfg.rms_norm_eps)
            x = r + swiglu(w["mlp1"], h) + moe_out
            return x, kv

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, kv_caches
