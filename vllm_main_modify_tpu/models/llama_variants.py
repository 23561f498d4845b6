"""Llama-graph variants: Solar, TeleFLM, TeleChat2, MiniCPM, MiMo.

Reference parity:
- vllm/model_executor/models/solar.py (Solar Pro backbone skip
  connections, solar.py:327-348)
- vllm/model_executor/models/teleflm.py (µP input/output multipliers,
  teleflm.py:56-79)
- vllm/model_executor/models/telechat2.py (TeleChat2 checkpoint layout:
  ``transformer.h.{i}.self_attention.{query,key_value,dense}`` with
  o/down biases, telechat2.py:37-63,122-135)
- vllm/model_executor/models/minicpm.py (scale_emb / scale_depth
  residual scaling / dim_model_base logit scaling, minicpm.py:346-353,
  406,573; MoE layers minicpm.py:64-156)
- vllm/model_executor/models/mimo.py (Qwen2 graph; ``mtp_layers``
  checkpoint tensors ignored at load, mimo.py:103)

All reuse the stacked-layer ``lax.fori_loop`` body of models/llama.py
(``LlamaForCausalLM._layer_step``); deltas are scalar multipliers,
ParamSpec key remaps, or — for Solar — extra skip-state carries.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.models.interface import ParamSpec
from vllm_main_modify_tpu.models.llama import LlamaForCausalLM
from vllm_main_modify_tpu.models.moe_llama import MoeDecoderBase


class SolarForCausalLM(LlamaForCausalLM):
    """Upstage Solar. Plain Llama graph unless the config carries
    backbone-skip-connection (bskcn) lists — Solar Pro blends saved
    activations back in at later layers with inference weight
    ``bskcn_tv[1]`` (reference: solar.py:327-348).

    TPU design: the skip state rides the ``fori_loop`` carry as two
    extra [T, H] buffers; save/blend are ``jnp.where`` on static
    per-layer masks, so the loop keeps a single compiled body."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.bskcn = None
        if getattr(hf, "bskcn_1", None) is not None:
            L = self.L
            masks = []
            for attr in ("bskcn_1", "bskcn_2", "bskcn_3", "bskcn_4"):
                ids = set(getattr(hf, attr, []) or [])
                masks.append(
                    jnp.asarray([i in ids for i in range(L)],
                                dtype=bool))
            tv = getattr(hf, "bskcn_tv", [0.9, 0.8])[1]
            self.bskcn = (*masks, float(tv))

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta, use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        if self.bskcn is None:
            return super().__call__(params, input_ids, positions,
                                    kv_caches, attn_meta,
                                    use_pallas=use_pallas,
                                    inputs_embeds=inputs_embeds)
        cfg = self.cfg
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        layers = params["layers"]
        save1, save2, blend1, blend2, tv = self.bskcn
        tv = jnp.asarray(tv, dtype=x.dtype)

        def layer_fn(l, carry):
            x, s1, s2, kv_caches = carry
            # save/blend BEFORE the layer body (reference loop head,
            # solar.py:335-348)
            x = jnp.where(blend1[l], tv * s1 + (1 - tv) * x, x)
            x = jnp.where(blend2[l], tv * s2 + (1 - tv) * x, x)
            s1 = jnp.where(save1[l], x, s1)
            s2 = jnp.where(save2[l], x, s2)
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            x, kv_caches = self._layer_step(w, x, kv_caches, l,
                                            positions, attn_meta,
                                            params, use_pallas, t)
            return x, s1, s2, kv_caches

        x, _, _, kv_caches = jax.lax.fori_loop(
            0, self.L, layer_fn, (x, x, x, kv_caches))
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, kv_caches


class TeleFLMForCausalLM(LlamaForCausalLM):
    """TeleFLM / FLM-2: Llama graph with µP multipliers — embeddings
    scaled by ``input_mult``, logits by ``output_mult /
    mup_scale_factor`` (reference: teleflm.py:56-79)."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        if getattr(hf, "use_mup", False):
            self.embed_mult = float(getattr(hf, "input_mult", 1.0))
            out_mult = float(getattr(hf, "output_mult", 1.0)) / \
                float(getattr(hf, "mup_scale_factor", 1.0))
            if out_mult:
                self.logits_div = 1.0 / out_mult


def _tc2_kv_slice(kv_heads: int, head_dim: int, want_v: bool):
    """TeleChat2 ``key_value.weight`` [(kvh*2*hd), H]: per-head k then
    v interleaved (telechat2.py:76-92) → one of k/v, transposed."""

    def f(x):
        y = x.reshape(kv_heads, 2, head_dim, -1)[:, 1 if want_v else 0]
        return np.ascontiguousarray(y.reshape(-1, x.shape[-1]).T)

    return f


class TeleChat2ForCausalLM(LlamaForCausalLM):
    """TeleChat2: Llama graph, silu-gated MLP, biases ONLY on the
    attention dense (o_proj) and mlp down_proj; checkpoint uses
    BLOOM-ish naming under ``transformer.h.{i}.`` with q as ``query``
    and k/v packed per-head in ``key_value``
    (reference: telechat2.py:37-63 + WeightsMapper :122-135)."""

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        # telechat config uses bloom-style attribute names
        for src, dst in (("n_layer", "num_layers"),
                         ("n_head", "num_attention_heads"),
                         ("ffn_hidden_size", "intermediate_size"),
                         ("layer_norm_epsilon", "rms_norm_eps")):
            v = getattr(hf, src, None)
            if v is not None:
                setattr(config, dst, v)
        if getattr(hf, "n_head", None):
            config.num_kv_heads = getattr(hf, "num_key_value_heads",
                                          None) or hf.n_head
            config.head_dim = config.hidden_size // \
                config.num_attention_heads
        config.attention_bias = False
        super().__init__(config)

    def param_specs(self) -> list[ParamSpec]:
        from vllm_main_modify_tpu.models.interface import transpose2d

        H = self.hidden
        base = "transformer.h.{i}."
        remap = {
            "embed_tokens": "transformer.word_embeddings.weight",
            "final_norm": "transformer.ln_f.weight",
            "layers.input_layernorm": base + "input_layernorm.weight",
            "layers.q_proj": base + "self_attention.query.weight",
            "layers.o_proj": base + "self_attention.dense.weight",
            "layers.post_attention_layernorm":
            base + "post_attention_layernorm.weight",
            "layers.gate_proj": base + "mlp.gate_proj.weight",
            "layers.up_proj": base + "mlp.up_proj.weight",
            "layers.down_proj": base + "mlp.down_proj.weight",
        }
        specs = []
        for s in super().param_specs():
            if s.path in remap:
                s.hf_key = remap[s.path]
            elif s.path == "layers.k_proj":
                s.hf_key = base + "self_attention.key_value.weight"
                s.transform = _tc2_kv_slice(self.num_kv,
                                            self.head_dim, False)
            elif s.path == "layers.v_proj":
                s.hf_key = base + "self_attention.key_value.weight"
                s.transform = _tc2_kv_slice(self.num_kv,
                                            self.head_dim, True)
            specs.append(s)
        L = self.L
        specs += [
            ParamSpec("layers.o_bias", (L, H), P(None, None),
                      base + "self_attention.dense.bias",
                      stacked=True, transform=None),
            ParamSpec("layers.down_bias", (L, H), P(None, None),
                      base + "mlp.down_proj.bias",
                      stacked=True, transform=None),
        ]
        return specs


def _minicpm_scalars(model, hf):
    model.embed_mult = float(getattr(hf, "scale_emb", 1.0) or 1.0)
    depth = getattr(hf, "scale_depth", None)
    if depth:
        model.residual_mult = float(depth) / math.sqrt(model.L)
    dmb = getattr(hf, "dim_model_base", None)
    if dmb:
        model.logits_div = model.hidden / float(dmb)


class MiniCPMForCausalLM(LlamaForCausalLM):
    """MiniCPM 1/2 dense: Llama graph + µP-style scalars — embeddings
    x scale_emb, residual branches x scale_depth/sqrt(L), logits
    / (hidden_size/dim_model_base) (reference: minicpm.py:346-353,
    406,573). MoE checkpoints route to :class:`MiniCPMMoEForCausalLM`
    via the registry factory."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        _minicpm_scalars(self, config.hf_config)


class MiniCPMMoEForCausalLM(MoeDecoderBase):
    """MiniCPM-MoE-8x2B: MiniCPM scalars + Mixtral-style per-expert
    w1/w3/w2 under ``mlp.experts.{e}.``, softmax top-k renormalized
    (reference: minicpm.py:64-156 MiniCPMMoE, fused_topk
    renormalize=True)."""

    renormalize = True
    ROUTER_KEY = "model.layers.{i}.mlp.gate.weight"
    GATE_KEY = "model.layers.{i}.mlp.experts.{e}.w1.weight"
    UP_KEY = "model.layers.{i}.mlp.experts.{e}.w3.weight"
    DOWN_KEY = "model.layers.{i}.mlp.experts.{e}.w2.weight"

    def __init__(self, config: ModelConfig):
        if not config.moe_intermediate_size:
            config.moe_intermediate_size = config.intermediate_size
        super().__init__(config)
        _minicpm_scalars(self, config.hf_config)


def _qkv_slice_t(lo: int, hi: int):
    def f(x):
        return np.ascontiguousarray(x[lo:hi].T)

    return f


def _bias_slice(lo: int, hi: int):
    def f(x):
        return np.ascontiguousarray(x[lo:hi])

    return f


class ChatGLMForCausalLM(LlamaForCausalLM):
    """ChatGLM 2/3 & GLM-4 legacy layout (reference:
    vllm/model_executor/models/chatglm.py): Llama graph with

    - packed ``query_key_value`` (+bias per ``add_qkv_bias``), dense
      o_proj, fused ``dense_h_to_4h`` = gate|up halves, swiglu;
    - rope over HALF the head dim in adjacent-pair (interleaved)
      convention (chatglm.py:93-100), theta scaled by ``rope_ratio``;
    - keys under ``transformer.encoder.layers.{i}.`` with
      ``transformer.embedding.word_embeddings`` /
      ``transformer.output_layer``."""

    def __init__(self, config: ModelConfig):
        from vllm_main_modify_tpu.layers.rotary import compute_inv_freq

        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        for src, dst in (("num_layers", "num_layers"),
                         ("padded_vocab_size", "vocab_size"),
                         ("ffn_hidden_size", "intermediate_size"),
                         ("layernorm_epsilon", "rms_norm_eps")):
            v = g(src)
            if v is not None:
                setattr(config, dst, v)
        if g("kv_channels"):
            config.head_dim = g("kv_channels")
        if g("multi_query_attention", False):
            config.num_kv_heads = g("multi_query_group_num", 2)
        else:
            config.num_kv_heads = config.num_attention_heads
        config.attention_bias = bool(g("add_qkv_bias", False)
                                     or g("add_bias_linear", False))
        config.tie_word_embeddings = bool(g("tie_word_embeddings",
                                            False))
        super().__init__(config)
        self.rot_dim = self.head_dim // 2
        theta = 10000.0 * float(g("rope_ratio", 1.0) or 1.0)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.rot_dim, theta, None))
        # original_rope=True (GLM-2/3 checkpoints) => interleaved pairs
        self.rope_interleaved = bool(g("original_rope", True))

    def _apply_rope(self, q, k, positions):
        from vllm_main_modify_tpu.layers.rotary import \
            apply_rope_partial_interleaved
        from vllm_main_modify_tpu.models.gpt_neox import \
            apply_rope_partial

        if self.rope_interleaved:
            return apply_rope_partial_interleaved(
                q, k, positions, self.inv_freq, self.rot_dim)
        return apply_rope_partial(q, k, positions, self.inv_freq,
                                  self.rot_dim)

    def param_specs(self) -> list[ParamSpec]:
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        I = self.inter
        base = "transformer.encoder.layers.{i}."
        qkv = base + "self_attention.query_key_value."
        remap = {
            "embed_tokens":
            ("transformer.embedding.word_embeddings.weight", None),
            "final_norm":
            ("transformer.encoder.final_layernorm.weight", None),
            "lm_head": ("transformer.output_layer.weight", None),
        }
        specs = []
        for s in super().param_specs():
            if s.path == "embed_tokens":
                s.hf_key = remap["embed_tokens"][0]
            elif s.path == "final_norm":
                s.hf_key = remap["final_norm"][0]
            elif s.path == "lm_head":
                s.hf_key = "transformer.output_layer.weight"
            elif s.path == "layers.input_layernorm":
                s.hf_key = base + "input_layernorm.weight"
            elif s.path == "layers.post_attention_layernorm":
                s.hf_key = base + "post_attention_layernorm.weight"
            elif s.path == "layers.q_proj":
                s.hf_key = qkv + "weight"
                s.transform = _qkv_slice_t(0, qd)
            elif s.path == "layers.k_proj":
                s.hf_key = qkv + "weight"
                s.transform = _qkv_slice_t(qd, qd + kd)
            elif s.path == "layers.v_proj":
                s.hf_key = qkv + "weight"
                s.transform = _qkv_slice_t(qd + kd, qd + 2 * kd)
            elif s.path == "layers.q_bias":
                s.hf_key = qkv + "bias"
                s.transform = _bias_slice(0, qd)
            elif s.path == "layers.k_bias":
                s.hf_key = qkv + "bias"
                s.transform = _bias_slice(qd, qd + kd)
            elif s.path == "layers.v_bias":
                s.hf_key = qkv + "bias"
                s.transform = _bias_slice(qd + kd, qd + 2 * kd)
            elif s.path == "layers.o_proj":
                s.hf_key = base + "self_attention.dense.weight"
            elif s.path == "layers.gate_proj":
                s.hf_key = base + "mlp.dense_h_to_4h.weight"
                s.transform = _qkv_slice_t(0, I)
            elif s.path == "layers.up_proj":
                s.hf_key = base + "mlp.dense_h_to_4h.weight"
                s.transform = _qkv_slice_t(I, 2 * I)
            elif s.path == "layers.down_proj":
                s.hf_key = base + "mlp.dense_4h_to_h.weight"
            specs.append(s)
        return specs


_FS2_RENAMES = [
    # fairseq2 checkpoint layout → HF llama keys, reversed from the
    # reference's WeightsMapper (fairseq2_llama.py:58-73)
    ("model.embed_tokens.", "decoder_frontend.embed."),
    (".input_layernorm.", ".self_attn_layer_norm."),
    (".post_attention_layernorm.", ".ffn_layer_norm."),
    (".self_attn.o_proj.", ".self_attn.output_proj."),
    (".mlp.gate_proj.", ".ffn.gate_proj."),
    (".mlp.up_proj.", ".ffn.inner_proj."),
    (".mlp.down_proj.", ".ffn.output_proj."),
    ("model.norm.", "decoder.layer_norm."),
    ("lm_head.", "final_proj."),
    ("model.layers.", "decoder.layers."),
]


def _fs2_permute(n_heads: int, head_dim: int):
    """fairseq2 stores q/k rows in interleaved-rope order; convert to
    the HF half-split layout (reference fairseq2_llama.py:108-119),
    then apply the usual torch→jax transpose."""

    def f(w: np.ndarray) -> np.ndarray:
        out = w.reshape(n_heads, head_dim // 2, 2, -1)
        out = out.swapaxes(1, 2).reshape(n_heads * head_dim, -1)
        return np.ascontiguousarray(out.T)

    return f


class Fairseq2LlamaForCausalLM(LlamaForCausalLM):
    """Llama trained/serialized with fairseq2 (reference:
    fairseq2_llama.py): torch ``model.pt`` checkpoint (the loader's
    ``_pt_state_dict`` unwraps the model_key envelope), fairseq2 key
    names, and interleaved-rope q/k rows that must be permuted to the
    HF layout at load."""

    def param_specs(self) -> list[ParamSpec]:
        specs = super().param_specs()
        for s in specs:
            for new, old in _FS2_RENAMES:
                s.hf_key = s.hf_key.replace(new, old)
            tail = s.path.rsplit(".", 1)[-1]
            if tail == "q_proj":
                s.transform = _fs2_permute(self.num_q, self.head_dim)
            elif tail == "k_proj":
                s.transform = _fs2_permute(self.num_kv, self.head_dim)
        return specs


def _deci_ffn_size(ffn_mult: float, hidden: int) -> int:
    """DeciLM intermediate sizing (reference:
    nemotron_nas.py:55-66): int(2*mult*H/3) rounded up to 256."""
    i = int(2 * ffn_mult * hidden / 3)
    return i if i % 256 == 0 else i + 256 - i % 256


def _kv_repeat(max_rows: int, head_dim: int):
    """Expand a layer's kv projection to the stack-wide max kv-head
    count by repeating heads (repeat_interleave semantics keep the
    GQA q→kv mapping exact), then torch→jax transpose."""

    def f(x: np.ndarray) -> np.ndarray:
        if x.shape[0] < max_rows:
            rep = max_rows // x.shape[0]
            x = np.repeat(x.reshape(-1, head_dim, x.shape[-1]), rep,
                          axis=0).reshape(max_rows, -1)
        return np.ascontiguousarray(x.T)

    return f


def _pad_rows_t(max_rows: int):
    def f(x: np.ndarray) -> np.ndarray:
        if x.shape[0] < max_rows:
            x = np.pad(x, ((0, max_rows - x.shape[0]), (0, 0)))
        return np.ascontiguousarray(x.T)

    return f


def _pad_cols_t(max_cols: int):
    def f(x: np.ndarray) -> np.ndarray:
        if x.shape[1] < max_cols:
            x = np.pad(x, ((0, 0), (0, max_cols - x.shape[1])))
        return np.ascontiguousarray(x.T)

    return f


class DeciLMForCausalLM(LlamaForCausalLM):
    """DeciLM / Nemotron-NAS (reference: nemotron_nas.py): a Llama
    graph whose per-layer ``block_configs`` vary the GQA group size,
    the FFN width, or skip the attention/FFN sub-block entirely
    (no_op, nemotron_nas.py:122-123,187,202). TPU-first mapping: the
    stacked ``lax.fori_loop`` layer body needs uniform shapes, so kv
    heads are expanded to the stack max by head repetition (exact
    under GQA), FFN widths zero-padded to the max, and no-op blocks
    load all-zero weights — a zero o_proj/down_proj makes the
    residual branch an exact no-op with no per-layer Python
    branching in the jitted graph."""

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        blocks = getattr(hf, "block_configs", None)
        if blocks is None:
            raise ValueError(
                "DeciLMForCausalLM requires block_configs "
                "(nemotron-nas checkpoints)")

        def d(b):
            return b if isinstance(b, dict) else b.__dict__

        H = config.hidden_size
        NH = config.num_attention_heads
        self.kv_per_layer, self.inter_per_layer = [], []
        for b in blocks:
            attn, ffn = d(b)["attention"], d(b)["ffn"]
            attn, ffn = d(attn), d(ffn)
            if attn.get("no_op") or attn.get("replace_with_linear"):
                if attn.get("replace_with_linear"):
                    raise ValueError(
                        "DeciLM replace_with_linear blocks are not "
                        "supported")
                self.kv_per_layer.append(0)
            else:
                self.kv_per_layer.append(
                    NH // attn["n_heads_in_group"])
            self.inter_per_layer.append(
                0 if ffn.get("no_op") else
                _deci_ffn_size(ffn["ffn_mult"], H))
        config.num_kv_heads = max(self.kv_per_layer)
        config.intermediate_size = max(self.inter_per_layer)
        super().__init__(config)
        assert not self.qkv_bias, "DeciLM attention bias unsupported"

    def param_specs(self) -> list[ParamSpec]:
        specs = super().param_specs()
        kd = self.num_kv * self.head_dim
        for s in specs:
            tail = s.path.rsplit(".", 1)[-1]
            if tail in ("q_proj", "k_proj", "v_proj", "o_proj",
                        "input_layernorm"):
                s.fill_missing = 0.0
            if tail in ("k_proj", "v_proj"):
                s.transform = _kv_repeat(kd, self.head_dim)
            if tail in ("gate_proj", "up_proj",
                        "post_attention_layernorm"):
                s.fill_missing = 0.0
            if tail in ("gate_proj", "up_proj"):
                s.transform = _pad_rows_t(self.inter)
            if tail == "down_proj":
                s.fill_missing = 0.0
                s.transform = _pad_cols_t(self.inter)
        return specs
