"""Step3 text decoder (Step3TextForCausalLM): MFA low-rank shared-q
MQA attention + shared-expert MoE.

Reference parity: vllm/model_executor/models/step3_text.py (upstream
is remote-code-only). Per layer:

- attention: one fused ``qkv_proj`` emits a low-rank q
  (``share_q_dim``) plus ONE 256-wide k and v head; q is RMS-normed
  (``inter_norm``) then expanded to all heads by ``wq`` — multi-query
  attention over the single cached KV head;
- MoE layers (``moe_layers_enum``, default all but layer 0): experts
  ship STACKED ([E, inter, H] ``moe.gate_proj/up_proj/down_proj``)
  with a ``moe.gate`` router (softmax top-k, renormalize per
  ``norm_expert_weight``) plus a dense ``share_expert`` MLP summed in;
- dense layers: plain silu MLP.

The layer loop is a static Python loop — dense/moe routing and the
stacked-array index per layer are compile-time constants.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
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


def _t_experts(x):
    return np.ascontiguousarray(np.swapaxes(x, -1, -2))


class Step3TextForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_q = config.num_attention_heads
        self.head_dim = int(getattr(hf, "head_dim", 256))
        self.share_q = int(getattr(hf, "share_q_dim",
                                   self.head_dim))
        self.inter = config.intermediate_size
        self.E = int(getattr(hf, "moe_num_experts", 0))
        self.top_k = int(getattr(hf, "moe_top_k", 1))
        self.moe_inter = int(getattr(hf, "moe_intermediate_size", 0))
        self.share_inter = int(getattr(hf, "share_expert_dim",
                                       self.inter))
        self.renorm = bool(getattr(hf, "norm_expert_weight", False))
        enum = getattr(hf, "moe_layers_enum", None)
        if enum is not None:
            self.moe_ids = [int(i) for i in
                            str(enum).strip().split(",")]
        else:
            self.moe_ids = list(range(1, self.L))
        self.dense_ids = [i for i in range(self.L)
                          if i not in set(self.moe_ids)]
        self.sm_scale = self.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta,
                             config.rope_scaling))
        self.act_fn = ACT2FN["silu"]
        self.tie_embeddings = config.tie_word_embeddings

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, Dh = self.hidden, self.head_dim
        qd = self.num_q * Dh
        t = transpose2d
        specs = [
            ParamSpec("embed_tokens", (c.vocab_size, H),
                      P("model", None), "model.embed_tokens.weight",
                      transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
        ]
        if not self.tie_embeddings:
            specs.append(
                ParamSpec("lm_head", (H, c.vocab_size),
                          P(None, "model"), "lm_head.weight",
                          transform=t))

        def stk(tag, ids, path, shape, hf_key, transform=t):
            return ParamSpec(f"{tag}.{path}", (len(ids), *shape),
                             P(*([None] * (len(shape) + 1))),
                             "model.layers.{i}." + hf_key,
                             stacked=True, layer_ids=tuple(ids),
                             transform=transform)

        all_ids = list(range(self.L))
        specs += [
            stk("layers", all_ids, "input_layernorm", (H, ),
                "input_layernorm.weight", transform=None),
            stk("layers", all_ids, "post_attention_layernorm", (H, ),
                "post_attention_layernorm.weight", transform=None),
            stk("layers", all_ids, "q_proj", (H, self.share_q),
                "self_attn.q_proj.weight"),
            stk("layers", all_ids, "k_proj", (H, Dh),
                "self_attn.k_proj.weight"),
            stk("layers", all_ids, "v_proj", (H, Dh),
                "self_attn.v_proj.weight"),
            stk("layers", all_ids, "inter_norm", (self.share_q, ),
                "self_attn.inter_norm.weight", transform=None),
            stk("layers", all_ids, "wq", (self.share_q, qd),
                "self_attn.wq.weight"),
            stk("layers", all_ids, "o_proj", (qd, H),
                "self_attn.o_proj.weight"),
        ]
        if self.dense_ids:
            specs += [
                stk("dense", self.dense_ids, "gate_proj",
                    (H, self.inter), "mlp.gate_proj.weight"),
                stk("dense", self.dense_ids, "up_proj",
                    (H, self.inter), "mlp.up_proj.weight"),
                stk("dense", self.dense_ids, "down_proj",
                    (self.inter, H), "mlp.down_proj.weight"),
            ]
        if self.moe_ids:
            mi = self.moe_inter
            specs += [
                stk("moe", self.moe_ids, "router", (H, self.E),
                    "moe.gate.weight"),
                stk("moe", self.moe_ids, "w_gate",
                    (self.E, H, mi), "moe.gate_proj.weight",
                    transform=_t_experts),
                stk("moe", self.moe_ids, "w_up",
                    (self.E, H, mi), "moe.up_proj.weight",
                    transform=_t_experts),
                stk("moe", self.moe_ids, "w_down",
                    (self.E, mi, H), "moe.down_proj.weight",
                    transform=_t_experts),
                stk("moe", self.moe_ids, "share_gate",
                    (H, self.share_inter),
                    "share_expert.gate_proj.weight"),
                stk("moe", self.moe_ids, "share_up",
                    (H, self.share_inter),
                    "share_expert.up_proj.weight"),
                stk("moe", self.moe_ids, "share_down",
                    (self.share_inter, H),
                    "share_expert.down_proj.weight"),
            ]
        return specs

    def kv_cache_spec(self):
        return 1, self.head_dim, self.L

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        cfg = self.cfg
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        dense_pos = {l: j for j, l in enumerate(self.dense_ids)}
        moe_pos = {l: j for j, l in enumerate(self.moe_ids)}
        for li in range(self.L):
            w = jax.tree.map(lambda a, li=li: a[li],
                             params["layers"])
            res = x
            h = rms_norm(x, w["input_layernorm"], cfg.rms_norm_eps)
            qlow = rms_norm(h @ w["q_proj"], w["inter_norm"],
                            cfg.rms_norm_eps)
            q = (qlow @ w["wq"]).reshape(t, self.num_q,
                                         self.head_dim)
            k = (h @ w["k_proj"]).reshape(t, 1, self.head_dim)
            v = (h @ w["v_proj"]).reshape(t, 1, self.head_dim)
            q, k = apply_rope(q, k, positions, self.inv_freq)
            o, kv_caches = attention(q, k, v, kv_caches, li,
                                     attn_meta, self.sm_scale,
                                     use_pallas=use_pallas)
            x = res + o.reshape(t, -1) @ w["o_proj"]
            res = x
            h = rms_norm(x, w["post_attention_layernorm"],
                         cfg.rms_norm_eps)
            if li in moe_pos:
                mw = jax.tree.map(lambda a, j=moe_pos[li]: a[j],
                                  params["moe"])
                share = self.act_fn(h @ mw["share_gate"],
                                    h @ mw["share_up"]) @ \
                    mw["share_down"]
                moe = moe_ffn(h, mw["router"], mw["w_gate"],
                              mw["w_up"], mw["w_down"], self.top_k,
                              self.act_fn, renormalize=self.renorm)
                x = res + share + moe
            else:
                dw = jax.tree.map(lambda a, j=dense_pos[li]: a[j],
                                  params["dense"])
                h = self.act_fn(h @ dw["gate_proj"],
                                h @ dw["up_proj"])
                x = res + h @ dw["down_proj"]
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)
