"""InternLM2 and Baichuan: trust-remote-code families the reference
serves natively (vllm/model_executor/models/internlm2.py +
baichuan.py). Both are the Llama computation graph with renamed /
fused checkpoint tensors:

- InternLM2: fused ``attention.wqkv`` with PER-KV-HEAD interleaving
  (view [kv_heads, groups+2, head_dim, H]; q = the first ``groups``
  rows of each kv head), wo / w1 / w3 / w2, attention_norm / ffn_norm,
  tok_embeddings, output (lm_head).
- Baichuan: fused ``W_pack`` = [q; k; v]; the 7B variants use rope
  ("BaiChuan" spelling), the 13B variants use ALiBi and no rope
  ("Baichuan"), matching the reference's two classes.
"""

from __future__ import annotations

import numpy as np

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.models.bloom import get_alibi_slopes
from vllm_main_modify_tpu.models.interface import (ParamSpec,
                                                   transpose2d)
from vllm_main_modify_tpu.models.llama import LlamaForCausalLM


def _internlm2_qkv(kv_heads: int, groups: int, head_dim: int,
                   part: str):
    """wqkv.weight [(kvh*(g+2)*hd), H] → q/k/v slice, transposed."""

    def f(x):
        y = x.reshape(kv_heads, groups + 2, head_dim, -1)
        if part == "q":
            y = y[:, :groups]
        elif part == "k":
            y = y[:, groups:groups + 1]
        else:
            y = y[:, groups + 1:]
        return np.ascontiguousarray(
            y.reshape(-1, x.shape[-1]).T)

    return f


class InternLM2ForCausalLM(LlamaForCausalLM):

    def param_specs(self) -> list[ParamSpec]:
        groups = self.num_q // self.num_kv
        remap_sliced = {
            "layers.q_proj": _internlm2_qkv(self.num_kv, groups,
                                            self.head_dim, "q"),
            "layers.k_proj": _internlm2_qkv(self.num_kv, groups,
                                            self.head_dim, "k"),
            "layers.v_proj": _internlm2_qkv(self.num_kv, groups,
                                            self.head_dim, "v"),
        }
        rename = {
            "embed_tokens": "model.tok_embeddings.weight",
            "final_norm": "model.norm.weight",
            "lm_head": "output.weight",
            "layers.input_layernorm":
            "model.layers.{i}.attention_norm.weight",
            "layers.post_attention_layernorm":
            "model.layers.{i}.ffn_norm.weight",
            "layers.o_proj": "model.layers.{i}.attention.wo.weight",
            "layers.gate_proj":
            "model.layers.{i}.feed_forward.w1.weight",
            "layers.up_proj":
            "model.layers.{i}.feed_forward.w3.weight",
            "layers.down_proj":
            "model.layers.{i}.feed_forward.w2.weight",
        }
        specs = []
        for s in super().param_specs():
            if s.path in remap_sliced:
                s.hf_key = "model.layers.{i}.attention.wqkv.weight"
                s.transform = remap_sliced[s.path]
            elif s.path in rename:
                s.hf_key = rename[s.path]
            specs.append(s)
        return specs


def _wpack_slice(lo: int, hi: int):
    return lambda x: np.ascontiguousarray(x[lo:hi].T)


class BaiChuanForCausalLM(LlamaForCausalLM):
    """Baichuan-7B / Baichuan2-7B: rope + fused W_pack."""

    use_alibi = False

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        if self.use_alibi:
            self.alibi_slopes = get_alibi_slopes(self.num_q)

    def param_specs(self) -> list[ParamSpec]:
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        slices = {
            "layers.q_proj": _wpack_slice(0, qd),
            "layers.k_proj": _wpack_slice(qd, qd + kd),
            "layers.v_proj": _wpack_slice(qd + kd, qd + 2 * kd),
        }
        specs = []
        for s in super().param_specs():
            if s.path in slices:
                s.hf_key = "model.layers.{i}.self_attn.W_pack.weight"
                s.transform = slices[s.path]
            specs.append(s)
        return specs


class BaichuanForCausalLM(BaiChuanForCausalLM):
    """Baichuan-13B / Baichuan2-13B: ALiBi, no rope (reference:
    baichuan.py position_embedding='ALIBI')."""

    use_alibi = True


class ExaoneForCausalLM(LlamaForCausalLM):
    """EXAONE v1 (reference: exaone.py) — Llama graph, GPT-2-style
    key names under transformer.h.{i} with RMS norms ln_1/ln_2 and
    c_fc_0 (gate) / c_fc_1 (up) / c_proj (down)."""

    RENAME = {
        "embed_tokens": "transformer.wte.weight",
        "final_norm": "transformer.ln_f.weight",
        "layers.input_layernorm": "transformer.h.{i}.ln_1.weight",
        "layers.post_attention_layernorm":
        "transformer.h.{i}.ln_2.weight",
        "layers.q_proj":
        "transformer.h.{i}.attn.attention.q_proj.weight",
        "layers.k_proj":
        "transformer.h.{i}.attn.attention.k_proj.weight",
        "layers.v_proj":
        "transformer.h.{i}.attn.attention.v_proj.weight",
        "layers.o_proj":
        "transformer.h.{i}.attn.attention.out_proj.weight",
        "layers.gate_proj": "transformer.h.{i}.mlp.c_fc_0.weight",
        "layers.up_proj": "transformer.h.{i}.mlp.c_fc_1.weight",
        "layers.down_proj": "transformer.h.{i}.mlp.c_proj.weight",
    }

    def param_specs(self) -> list[ParamSpec]:
        specs = []
        for s in super().param_specs():
            if s.path in self.RENAME:
                s.hf_key = self.RENAME[s.path]
            specs.append(s)
        return specs


def _qwen_v1_bias_slice(lo: int, hi: int):
    return lambda x: np.ascontiguousarray(x[lo:hi])


class QWenLMHeadModel(LlamaForCausalLM):
    """Qwen v1 (reference: qwen.py) — Llama graph with GPT-2-style
    keys, fused biased c_attn, and mlp w2 (gate) / w1 (up) /
    c_proj (down)."""

    def __init__(self, config: ModelConfig):
        config.attention_bias = True  # c_attn always has bias
        super().__init__(config)

    def param_specs(self) -> list[ParamSpec]:
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        c_attn = "transformer.h.{i}.attn.c_attn"
        w_slices = {
            "layers.q_proj": _wpack_slice(0, qd),
            "layers.k_proj": _wpack_slice(qd, qd + kd),
            "layers.v_proj": _wpack_slice(qd + kd, qd + 2 * kd),
        }
        b_slices = {
            "layers.q_bias": _qwen_v1_bias_slice(0, qd),
            "layers.k_bias": _qwen_v1_bias_slice(qd, qd + kd),
            "layers.v_bias": _qwen_v1_bias_slice(qd + kd,
                                                 qd + 2 * kd),
        }
        rename = {
            "embed_tokens": "transformer.wte.weight",
            "final_norm": "transformer.ln_f.weight",
            "layers.input_layernorm": "transformer.h.{i}.ln_1.weight",
            "layers.post_attention_layernorm":
            "transformer.h.{i}.ln_2.weight",
            "layers.o_proj": "transformer.h.{i}.attn.c_proj.weight",
            "layers.gate_proj": "transformer.h.{i}.mlp.w2.weight",
            "layers.up_proj": "transformer.h.{i}.mlp.w1.weight",
            "layers.down_proj": "transformer.h.{i}.mlp.c_proj.weight",
        }
        specs = []
        for s in super().param_specs():
            if s.path in w_slices:
                s.hf_key = c_attn + ".weight"
                s.transform = w_slices[s.path]
            elif s.path in b_slices:
                s.hf_key = c_attn + ".bias"
                s.transform = b_slices[s.path]
            elif s.path in rename:
                s.hf_key = rename[s.path]
            specs.append(s)
        return specs


class InternLM2ForRewardModel(InternLM2ForCausalLM):
    """Reference: internlm2.py:404 — InternLM2 backbone with the
    ``output`` head replaced by a bias-free ``v_head`` [H, 1], served
    through the runner's reward/pooling path (last-token pooling)."""

    def __init__(self, config: ModelConfig):
        config.is_pooling_model = True
        super().__init__(config)
        self.num_labels = 1

    def param_specs(self) -> list[ParamSpec]:
        from jax.sharding import PartitionSpec as P

        specs = [s for s in super().param_specs()
                 if s.path != "lm_head"]
        specs.append(
            ParamSpec("score", (self.hidden, 1), P(None, None),
                      "v_head.weight", transform=transpose2d))
        return specs

    def classify_logits(self, params, pooled_hidden):
        return pooled_hidden  # score head applied by the runner
