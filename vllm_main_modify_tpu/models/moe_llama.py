"""MoE decoder families: Mixtral and Qwen2-MoE (Qwen1.5-MoE-A2.7B).

Reference parity: vllm/model_executor/models/mixtral.py + qwen2_moe.py
with the fused-MoE layer (vllm/model_executor/layers/fused_moe/).
TPU-native: expert weights stacked [L, E, H, I], routed through
``layers/moe.py`` (jax.lax.ragged_dot grouped matmul); lax.scan over
layers as in models/llama.py.

Family deltas carried by config:
- Mixtral: 8 experts top-2, renormalize=True, no bias, no shared expert
- Qwen2-MoE: 60 experts top-4, renormalize=False (norm_topk_prob),
  qkv bias, plus a always-on shared expert gated by sigmoid(x @ g)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.activation import ACT2FN
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.moe import moe_ffn
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.quantization.weights import matmul


def _transpose_expert(x):
    import numpy as np

    return np.ascontiguousarray(x.T)


class MoeDecoderBase:
    """Shared scaffold; subclasses define expert hf-key templates and
    deltas via class attrs."""

    qkv_bias = False
    renormalize = True
    has_shared_expert = False
    qk_norm = False  # OLMoE: full-width RMS on q/k pre-split
    # hf key templates ({i}=layer, {e}=expert)
    ROUTER_KEY = ""
    GATE_KEY = ""
    UP_KEY = ""
    DOWN_KEY = ""

    def __init__(self, config: ModelConfig):
        self.cfg = config
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = config.head_dim
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.E = config.num_experts
        self.top_k = config.num_experts_per_tok
        self.moe_inter = config.moe_intermediate_size
        self.shared_inter = config.shared_expert_intermediate_size
        self.sm_scale = self.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta,
                             config.rope_scaling))
        self.act_fn = ACT2FN["silu"]
        self.tie_embeddings = config.tie_word_embeddings
        # Granite-style scalar multipliers (1.0 = elided from graph)
        self.embed_mult = 1.0
        self.residual_mult = 1.0
        self.logits_div = 1.0

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        L, H, V, E = self.L, self.hidden, c.vocab_size, self.E
        mi = self.moe_inter
        t = transpose2d

        def stk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(path, (L, *shape), spec, hf_key,
                             stacked=True, transform=transform)

        def expert(path, shape, spec, hf_key):
            return ParamSpec(path, (L, E, *shape), spec, hf_key,
                             stacked=True, num_experts=E,
                             transform=_transpose_expert)

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
            ParamSpec("lm_head", (H, V), P(None, "model"),
                      "lm_head.weight", transform=t),
            stk("layers.input_layernorm", (H, ), P(None, None),
                "model.layers.{i}.input_layernorm.weight",
                transform=None),
            stk("layers.q_proj", (H, qd), P(None, None, "model"),
                "model.layers.{i}.self_attn.q_proj.weight"),
            stk("layers.k_proj", (H, kd), P(None, None, "model"),
                "model.layers.{i}.self_attn.k_proj.weight"),
            stk("layers.v_proj", (H, kd), P(None, None, "model"),
                "model.layers.{i}.self_attn.v_proj.weight"),
            stk("layers.o_proj", (qd, H), P(None, "model", None),
                "model.layers.{i}.self_attn.o_proj.weight"),
            stk("layers.post_attention_layernorm", (H, ), P(None, None),
                "model.layers.{i}.post_attention_layernorm.weight",
                transform=None),
            stk("layers.router", (H, E), P(None, None, None),
                self.ROUTER_KEY),
            expert("layers.w_gate", (H, mi),
                   P(None, None, None, "model"), self.GATE_KEY),
            expert("layers.w_up", (H, mi),
                   P(None, None, None, "model"), self.UP_KEY),
            expert("layers.w_down", (mi, H),
                   P(None, None, "model", None), self.DOWN_KEY),
        ]
        if self.qkv_bias:
            specs += [
                stk("layers.q_bias", (qd, ), P(None, "model"),
                    "model.layers.{i}.self_attn.q_proj.bias",
                    transform=None),
                stk("layers.k_bias", (kd, ), P(None, "model"),
                    "model.layers.{i}.self_attn.k_proj.bias",
                    transform=None),
                stk("layers.v_bias", (kd, ), P(None, "model"),
                    "model.layers.{i}.self_attn.v_proj.bias",
                    transform=None),
            ]
        if self.qk_norm:
            specs += [
                stk("layers.q_norm", (qd, ), P(None, None),
                    "model.layers.{i}.self_attn.q_norm.weight",
                    transform=None),
                stk("layers.k_norm", (kd, ), P(None, None),
                    "model.layers.{i}.self_attn.k_norm.weight",
                    transform=None),
            ]
        if self.has_shared_expert:
            si = self.shared_inter
            specs += [
                stk("layers.shared_gate_proj", (H, si),
                    P(None, None, "model"),
                    "model.layers.{i}.mlp.shared_expert.gate_proj.weight"),
                stk("layers.shared_up_proj", (H, si),
                    P(None, None, "model"),
                    "model.layers.{i}.mlp.shared_expert.up_proj.weight"),
                stk("layers.shared_down_proj", (si, H),
                    P(None, "model", None),
                    "model.layers.{i}.mlp.shared_expert.down_proj.weight"),
                stk("layers.shared_expert_gate", (H, 1),
                    P(None, None, None),
                    "model.layers.{i}.mlp.shared_expert_gate.weight"),
            ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    # EPLB (set by the runner): collect per-layer logical expert-load
    # histograms and return them as a third output [L, E] int32
    eplb_collect = False

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        cfg = self.cfg
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids, axis=0)
        if self.embed_mult != 1.0:
            x = x * jnp.asarray(self.embed_mult, dtype=x.dtype)
        t = x.shape[0]

        layers = params["layers"]
        eplb = self.eplb_collect

        def layer_fn(l, carry):
            x, kv_caches, counts = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = rms_norm(x, w["input_layernorm"], cfg.rms_norm_eps)
            q = matmul(h, w["q_proj"])
            k = matmul(h, w["k_proj"])
            v = matmul(h, w["v_proj"])
            if self.qkv_bias:
                q = q + w["q_bias"]
                k = k + w["k_bias"]
                v = v + w["v_bias"]
            if self.qk_norm:
                q = rms_norm(q, w["q_norm"], cfg.rms_norm_eps)
                k = rms_norm(k, w["k_norm"], cfg.rms_norm_eps)
            q = q.reshape(t, self.num_q, self.head_dim)
            k = k.reshape(t, self.num_kv, self.head_dim)
            v = v.reshape(t, self.num_kv, self.head_dim)
            q, k = apply_rope(q, k, positions, self.inv_freq)
            o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                     self.sm_scale,
                                     use_pallas=use_pallas)
            attn_out = matmul(o.reshape(t, -1), w["o_proj"])
            if self.residual_mult != 1.0:
                attn_out = attn_out * jnp.asarray(
                    self.residual_mult, dtype=attn_out.dtype)
            x = res + attn_out

            res = x
            h = rms_norm(x, w["post_attention_layernorm"],
                         cfg.rms_norm_eps)
            y = moe_ffn(h, w["router"], w["w_gate"], w["w_up"],
                        w["w_down"], self.top_k, self.act_fn,
                        renormalize=self.renormalize,
                        return_counts=eplb)
            if eplb:
                y, cnt = y
                counts = jax.lax.dynamic_update_index_in_dim(
                    counts, cnt, l, 0)
            if self.has_shared_expert:
                sh = self.act_fn(matmul(h, w["shared_gate_proj"]),
                                 matmul(h, w["shared_up_proj"]))
                sh = matmul(sh, w["shared_down_proj"])
                if "shared_expert_gate" in w:
                    gate = jax.nn.sigmoid(
                        (h @ w["shared_expert_gate"]).astype(
                            jnp.float32))
                    sh = (sh.astype(jnp.float32) * gate).astype(
                        y.dtype)
                y = y + sh
            if self.residual_mult != 1.0:
                y = y * jnp.asarray(self.residual_mult, dtype=y.dtype)
            x = res + y
            return x, kv_caches, counts

        # fori_loop with the KV cache as carry: in-place page updates.
        # (a lax.scan emitting per-layer KV would allocate a SECOND
        # full-size KV buffer for the stacked outputs — 2x HBM)
        counts0 = jnp.zeros((self.L, self.E), jnp.int32) if eplb \
            else jnp.zeros((), jnp.int32)
        x, kv_caches, counts = jax.lax.fori_loop(
            0, self.L, layer_fn, (x, kv_caches, counts0))
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        if eplb:
            return x, kv_caches, counts
        return x, kv_caches

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        logits = hidden.astype(jnp.float32) @ w.astype(jnp.float32)
        if self.logits_div != 1.0:
            logits = logits / self.logits_div
        return logits


class MixtralForCausalLM(MoeDecoderBase):
    """Reference: vllm/model_executor/models/mixtral.py."""

    renormalize = True
    ROUTER_KEY = "model.layers.{i}.block_sparse_moe.gate.weight"
    GATE_KEY = "model.layers.{i}.block_sparse_moe.experts.{e}.w1.weight"
    UP_KEY = "model.layers.{i}.block_sparse_moe.experts.{e}.w3.weight"
    DOWN_KEY = "model.layers.{i}.block_sparse_moe.experts.{e}.w2.weight"

    def __init__(self, config: ModelConfig):
        # Mixtral's moe_intermediate_size == intermediate_size
        if not config.moe_intermediate_size:
            config.moe_intermediate_size = config.intermediate_size
        super().__init__(config)


class OlmoeForCausalLM(MoeDecoderBase):
    """Reference: vllm/model_executor/models/olmoe.py — OLMoE-1B-7B:
    every layer MoE (64 experts top-8), full-width RMS q/k norm, no
    biases, norm_topk_prob-driven renormalize."""

    qk_norm = True
    renormalize = False
    ROUTER_KEY = "model.layers.{i}.mlp.gate.weight"
    GATE_KEY = "model.layers.{i}.mlp.experts.{e}.gate_proj.weight"
    UP_KEY = "model.layers.{i}.mlp.experts.{e}.up_proj.weight"
    DOWN_KEY = "model.layers.{i}.mlp.experts.{e}.down_proj.weight"

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        if getattr(config.hf_config, "norm_topk_prob", False):
            self.renormalize = True


def _gmoe_slice(lo, hi, transpose_to_in_out=True):
    """GraniteMoe fused [E, out, in] expert tensor → [E, in, out]."""
    import numpy as np

    def f(x):
        y = x[:, lo:hi, :] if hi is not None else x
        return np.ascontiguousarray(y.transpose(0, 2, 1))

    return f


class GraniteMoeForCausalLM(MoeDecoderBase):
    """Reference: vllm/model_executor/models/granitemoe.py — Granite
    3.x MoE: Granite scalar multipliers + experts stored FUSED per
    layer (input_linear [E, 2*mi, H] = gate|up, output_linear
    [E, H, mi]), router key ``block_sparse_moe.router.layer``.
    Top-k softmax over selected logits == renormalize=True."""

    renormalize = True

    def __init__(self, config: ModelConfig):
        if not config.moe_intermediate_size:
            config.moe_intermediate_size = config.intermediate_size
        super().__init__(config)
        hf = config.hf_config
        self.embed_mult = getattr(hf, "embedding_multiplier", 1.0)
        self.residual_mult = getattr(hf, "residual_multiplier", 1.0)
        self.logits_div = getattr(hf, "logits_scaling", 1.0)
        am = getattr(hf, "attention_multiplier", None)
        if am:
            self.sm_scale = am

    def param_specs(self) -> list[ParamSpec]:
        mi = self.moe_inter
        specs = super().param_specs()
        base = "model.layers.{i}.block_sparse_moe."
        remap = {
            "layers.router": (base + "router.layer.weight",
                              transpose2d),
            "layers.w_gate": (base + "input_linear.weight",
                              _gmoe_slice(0, mi)),
            "layers.w_up": (base + "input_linear.weight",
                            _gmoe_slice(mi, 2 * mi)),
            "layers.w_down": (base + "output_linear.weight",
                              _gmoe_slice(0, None)),
        }
        for s in specs:
            if s.path in remap:
                s.hf_key, s.transform = remap[s.path]
                s.num_experts = 0  # fused: no {e} expansion
        return specs


class GraniteMoeSharedForCausalLM(GraniteMoeForCausalLM):
    """Reference: vllm/model_executor/models/granitemoeshared.py —
    GraniteMoe plus an always-on fused shared MLP per layer
    (shared_mlp.input_linear [2*si, H], output_linear [H, si])."""

    has_shared_expert = True

    def __init__(self, config: ModelConfig):
        config.shared_expert_intermediate_size = getattr(
            config.hf_config, "shared_intermediate_size", 0)
        super().__init__(config)

    def param_specs(self) -> list[ParamSpec]:
        import numpy as np

        si = self.shared_inter
        base = "model.layers.{i}.shared_mlp."
        remap = {
            "layers.shared_gate_proj":
            (base + "input_linear.weight",
             lambda x: np.ascontiguousarray(x[:si].T)),
            "layers.shared_up_proj":
            (base + "input_linear.weight",
             lambda x: np.ascontiguousarray(x[si:2 * si].T)),
            "layers.shared_down_proj": (base + "output_linear.weight",
                                        transpose2d),
        }
        specs = []
        for s in super().param_specs():
            if s.path == "layers.shared_expert_gate":
                continue  # no sigmoid gate: shared MLP is always-on
            if s.path in remap:
                s.hf_key, s.transform = remap[s.path]
            specs.append(s)
        return specs


class Qwen2MoeForCausalLM(MoeDecoderBase):
    """Reference: vllm/model_executor/models/qwen2_moe.py (also serves
    Qwen1.5-MoE-A2.7B)."""

    qkv_bias = True
    renormalize = False  # HF norm_topk_prob=False for Qwen1.5-MoE
    has_shared_expert = True
    ROUTER_KEY = "model.layers.{i}.mlp.gate.weight"
    GATE_KEY = "model.layers.{i}.mlp.experts.{e}.gate_proj.weight"
    UP_KEY = "model.layers.{i}.mlp.experts.{e}.up_proj.weight"
    DOWN_KEY = "model.layers.{i}.mlp.experts.{e}.down_proj.weight"

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        if hf is not None and getattr(hf, "norm_topk_prob", False):
            self.renormalize = True


class DeepseekForCausalLM(MoeDecoderBase):
    """DeepSeek-MoE v1 (reference: vllm/model_executor/models/
    deepseek.py). Llama GQA attention; a layer is MoE when
    ``l >= first_k_dense_replace and l % moe_layer_freq == 0``
    (deepseek.py:296), otherwise a dense SwiGLU MLP of
    ``intermediate_size``. MoE = softmax top-k over n_routed_experts
    (renormalize per norm_topk_prob) plus UNGATED shared experts of
    width ``moe_intermediate_size * n_shared_experts``
    (deepseek.py:128-162,179)."""

    ROUTER_KEY = "model.layers.{i}.mlp.gate.weight"
    GATE_KEY = "model.layers.{i}.mlp.experts.{e}.gate_proj.weight"
    UP_KEY = "model.layers.{i}.mlp.experts.{e}.up_proj.weight"
    DOWN_KEY = "model.layers.{i}.mlp.experts.{e}.down_proj.weight"

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        config.num_experts = g("n_routed_experts", 0) or 0
        config.moe_intermediate_size = g("moe_intermediate_size", 0)
        super().__init__(config)
        self.renormalize = bool(g("norm_topk_prob", False))
        self.n_shared = g("n_shared_experts", 0) or 0
        fkd = g("first_k_dense_replace", 0) or 0
        freq = g("moe_layer_freq", 1) or 1
        self.moe_ids = tuple(l for l in range(self.L)
                             if l >= fkd and l % freq == 0)
        self.dense_ids = tuple(l for l in range(self.L)
                               if l not in set(self.moe_ids))

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        L, H, V, E = self.L, self.hidden, c.vocab_size, self.E
        mi, I = self.moe_inter, c.intermediate_size
        t = transpose2d

        def stk(path, shape, spec, hf_key, ids=None, transform=t):
            return ParamSpec(
                path, ((L if ids is None else len(ids)), *shape),
                spec, hf_key, stacked=True,
                layer_ids=(tuple(ids) if ids is not None else None),
                transform=transform)

        def expert(path, shape, spec, hf_key):
            return ParamSpec(path, (len(self.moe_ids), E, *shape),
                             spec, hf_key, stacked=True,
                             num_experts=E, layer_ids=self.moe_ids,
                             transform=_transpose_expert)

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
            ParamSpec("lm_head", (H, V), P(None, "model"),
                      "lm_head.weight", transform=t),
            stk("layers.input_layernorm", (H, ), P(None, None),
                "model.layers.{i}.input_layernorm.weight",
                transform=None),
            stk("layers.q_proj", (H, qd), P(None, None, "model"),
                "model.layers.{i}.self_attn.q_proj.weight"),
            stk("layers.k_proj", (H, kd), P(None, None, "model"),
                "model.layers.{i}.self_attn.k_proj.weight"),
            stk("layers.v_proj", (H, kd), P(None, None, "model"),
                "model.layers.{i}.self_attn.v_proj.weight"),
            stk("layers.o_proj", (qd, H), P(None, "model", None),
                "model.layers.{i}.self_attn.o_proj.weight"),
            stk("layers.post_attention_layernorm", (H, ),
                P(None, None),
                "model.layers.{i}.post_attention_layernorm.weight",
                transform=None),
            stk("moe.router", (H, E), P(None, None, None),
                self.ROUTER_KEY, ids=self.moe_ids),
            expert("moe.w_gate", (H, mi),
                   P(None, None, None, "model"), self.GATE_KEY),
            expert("moe.w_up", (H, mi),
                   P(None, None, None, "model"), self.UP_KEY),
            expert("moe.w_down", (mi, H),
                   P(None, None, "model", None), self.DOWN_KEY),
        ]
        if self.n_shared:
            si = mi * self.n_shared
            for name, shape, spec in (
                    ("shared_gate_proj", (H, si),
                     P(None, None, "model")),
                    ("shared_up_proj", (H, si),
                     P(None, None, "model")),
                    ("shared_down_proj", (si, H),
                     P(None, "model", None))):
                hf_name = name.replace("shared_", "")
                specs.append(
                    stk(f"moe.{name}", shape, spec,
                        "model.layers.{i}.mlp.shared_experts." +
                        hf_name + ".weight", ids=self.moe_ids))
        if self.dense_ids:
            specs += [
                stk("dense.gate_proj", (H, I),
                    P(None, None, "model"),
                    "model.layers.{i}.mlp.gate_proj.weight",
                    ids=self.dense_ids),
                stk("dense.up_proj", (H, I), P(None, None, "model"),
                    "model.layers.{i}.mlp.up_proj.weight",
                    ids=self.dense_ids),
                stk("dense.down_proj", (I, H),
                    P(None, "model", None),
                    "model.layers.{i}.mlp.down_proj.weight",
                    ids=self.dense_ids),
            ]
        return specs

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        import numpy as np

        cfg = self.cfg
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        layers = params["layers"]

        def idx_map(ids):
            m = np.zeros(self.L, dtype=np.int32)
            for i, l in enumerate(ids):
                m[l] = i
            return jnp.asarray(m)

        moe_map = idx_map(self.moe_ids)
        dense_map = idx_map(self.dense_ids)
        is_moe = jnp.asarray(
            [l in set(self.moe_ids) for l in range(self.L)], bool)

        def pick(group, gl):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, gl, 0, keepdims=False), params[group])

        def moe_branch(l, h):
            w = pick("moe", moe_map[l])
            y = moe_ffn(h, w["router"], w["w_gate"], w["w_up"],
                        w["w_down"], self.top_k, self.act_fn,
                        renormalize=self.renormalize)
            if self.n_shared:
                sh = self.act_fn(matmul(h, w["shared_gate_proj"]),
                                 matmul(h, w["shared_up_proj"]))
                y = y + matmul(sh, w["shared_down_proj"])
            return y

        def dense_branch(l, h):
            w = pick("dense", dense_map[l])
            return matmul(
                self.act_fn(matmul(h, w["gate_proj"]),
                            matmul(h, w["up_proj"])), w["down_proj"])

        def layer_fn(l, carry):
            x, kv_caches = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = rms_norm(x, w["input_layernorm"], cfg.rms_norm_eps)
            q = matmul(h, w["q_proj"]).reshape(t, self.num_q,
                                               self.head_dim)
            k = matmul(h, w["k_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            v = matmul(h, w["v_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            q, k = apply_rope(q, k, positions, self.inv_freq)
            o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                     self.sm_scale,
                                     use_pallas=use_pallas)
            x = res + matmul(o.reshape(t, -1), w["o_proj"])
            res = x
            h = rms_norm(x, w["post_attention_layernorm"],
                         cfg.rms_norm_eps)
            if not self.dense_ids:
                y = moe_branch(l, h)
            elif not self.moe_ids:
                y = dense_branch(l, h)
            else:
                y = jax.lax.cond(is_moe[l], moe_branch, dense_branch,
                                 l, h)
            return res + y, kv_caches

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, kv_caches
