"""Llama-family decoder (Llama 2/3, Mistral, Qwen2/2.5, TinyLlama).

Reference parity: vllm/model_executor/models/llama.py + qwen2.py. The
TPU-native design differs structurally:

- per-layer weights are **stacked** on a leading layer axis and the
  decoder runs as one ``lax.scan`` — one compiled layer body instead of
  N inlined layers (faster compiles, identical runtime: XLA unrolls the
  HBM weight streaming per iteration);
- tensor parallelism is GSPMD PartitionSpecs on the stacked weights
  (column-parallel: shard last axis; row-parallel: shard input axis),
  replacing the reference's ColumnParallelLinear/RowParallelLinear rank
  classes (vllm/model_executor/layers/linear.py:405,1197);
- the KV cache is one array per model, [L, pages, page, 2*Hk, D],
  scanned alongside the layers.
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
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.quantization.weights import (
    index_layer_weights, matmul)


class LlamaForCausalLM:

    # Qwen2 has attention biases; flag is picked up from the HF config.
    def __init__(self, config: ModelConfig):
        self.cfg = config
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = config.head_dim
        self.hidden = config.hidden_size
        self.inter = config.intermediate_size
        self.L = config.num_layers
        self.sm_scale = self.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta,
                             config.rope_scaling))
        act = getattr(config.hf_config, "hidden_act", "silu") \
            if config.hf_config is not None else "silu"
        self.act_fn = ACT2FN[act]
        self.qkv_bias = bool(config.attention_bias)
        self.tie_embeddings = config.tie_word_embeddings
        # Granite-style scalar multipliers (1.0 = plain Llama; the
        # multiplies are elided from the graph when unset)
        self.embed_mult = 1.0
        self.residual_mult = 1.0
        self.logits_div = 1.0
        # SmolLM3-style per-layer rope gating (None = rope everywhere)
        self.rope_layer_mask = None
        # Baichuan-13B-style ALiBi (tuple of slopes disables rope)
        self.alibi_slopes = None
        # optional per-head q/k norm hook: (w, q3d, k3d) -> (q, k)
        self.qk_headnorm = None
        # EAGLE-3 aux taps: layer ids whose INPUT hidden state is
        # collected for the draft's fc (set by the runner; when set,
        # __call__ returns (hidden, kv, aux[T, 3H]))
        self.aux_hidden_ids = None

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        d = c.jax_dtype
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        L, H, I, V = self.L, self.hidden, self.inter, c.vocab_size
        t = transpose2d

        def stk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(path, (L, *shape), spec, hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
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
            stk("layers.gate_proj", (H, I), P(None, None, "model"),
                "model.layers.{i}.mlp.gate_proj.weight"),
            stk("layers.up_proj", (H, I), P(None, None, "model"),
                "model.layers.{i}.mlp.up_proj.weight"),
            stk("layers.down_proj", (I, H), P(None, "model", None),
                "model.layers.{i}.mlp.down_proj.weight"),
        ]
        if not self.tie_embeddings and not self.cfg.is_pooling_model:
            specs.append(
                ParamSpec("lm_head", (H, V), P(None, "model"),
                          "lm_head.weight", transform=t))
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
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    def _apply_rope(self, q, k, positions):
        """Hook: subclasses substitute mrope (Qwen2-VL) etc."""
        return apply_rope(q, k, positions, self.inv_freq)

    # ------------------------------------------------------------------

    def __call__(
        self,
        params: dict,
        input_ids: jax.Array,  # [T]
        positions: jax.Array,  # [T]
        kv_caches: jax.Array,  # [L, P, page, 2*Hk, D]
        attn_meta: AttentionMetadata,
        use_pallas: Optional[bool] = None,
        inputs_embeds: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        # multimodal wrappers (models/llava.py) pass merged embeddings
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids,
                     axis=0)  # [T, H]
        if self.embed_mult != 1.0:
            x = x * jnp.asarray(self.embed_mult, dtype=x.dtype)
        t = x.shape[0]

        layers = params["layers"]
        aux_ids = self.aux_hidden_ids

        if getattr(self, "pp_stages", 0) and self.pp_stages > 1:
            # pipeline parallelism: stage-sharded layer slabs, ring
            # ppermute schedule (parallel/pp.py)
            assert aux_ids is None, (
                "EAGLE-3 aux taps are not supported with pipeline "
                "parallelism")
            from vllm_main_modify_tpu.parallel.pp import \
                pipeline_forward

            def layer_body(w, xx, kv, local_l, global_l, pos, meta):
                return self._layer_step(w, xx, kv, local_l, pos, meta,
                                        {}, use_pallas, t,
                                        rope_l=global_l)

            x, kv_caches = pipeline_forward(
                self.pp_mesh, self.pp_axis, self.pp_stages, layers,
                kv_caches, x, positions, attn_meta, layer_body,
                self.L)
            x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
            return x, kv_caches

        if aux_ids is None:
            def layer_fn(l, carry):
                x, kv_caches = carry
                # keeps Pallas-consumed quantized weights stacked
                # (kernel block-indexes the layer axis; a sliced
                # custom-call operand would be a materialized copy)
                w = index_layer_weights(layers, l)
                return self._layer_step(w, x, kv_caches, l, positions,
                                        attn_meta, params, use_pallas,
                                        t)

            # fori_loop with the KV cache as carry: in-place page
            # updates. (a lax.scan emitting per-layer KV would
            # allocate a SECOND full-size KV buffer — 2x HBM)
            x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                             (x, kv_caches))
            x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
            return x, kv_caches

        # EAGLE-3: collect the INPUT hidden state of each tap layer
        # (reference: llama.py aux_hidden_state_layers collection)
        def layer_fn_aux(l, carry):
            x, kv_caches, aux = carry
            for j, al in enumerate(aux_ids):
                aux = aux.at[j].set(jnp.where(l == al, x, aux[j]))
            w = index_layer_weights(layers, l)
            x, kv_caches = self._layer_step(w, x, kv_caches, l,
                                            positions, attn_meta,
                                            params, use_pallas, t)
            return x, kv_caches, aux

        aux0 = jnp.zeros((len(aux_ids), t, x.shape[-1]), x.dtype)
        x, kv_caches, aux = jax.lax.fori_loop(
            0, self.L, layer_fn_aux, (x, kv_caches, aux0))
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        aux = jnp.transpose(aux, (1, 0, 2)).reshape(t, -1)  # [T, 3H]
        return x, kv_caches, aux

    def _layer_step(self, w, x, kv_caches, l, positions, attn_meta,
                    params, use_pallas, t, rope_l=None):
        """One decoder layer on already-indexed per-layer weights ``w``
        (factored out so variants — Solar's backbone skip connections,
        TeleChat2's extra biases — reuse the exact body). ``rope_l``:
        GLOBAL layer id for per-layer rope gating when ``l`` is a
        stage-local index (pipeline parallelism)."""
        cfg = self.cfg
        res = x
        h = rms_norm(x, w["input_layernorm"], cfg.rms_norm_eps)
        # LoRA rides the matmul() seam: the runner wraps targeted
        # weights in LoraWeight and opens a lora_context around the
        # forward, so no per-model adapter code is needed
        q = matmul(h, w["q_proj"])
        k = matmul(h, w["k_proj"])
        v = matmul(h, w["v_proj"])
        if self.qkv_bias:
            q = q + w["q_bias"]
            k = k + w["k_bias"]
            v = v + w["v_bias"]
        q = q.reshape(t, self.num_q, self.head_dim)
        k = k.reshape(t, self.num_kv, self.head_dim)
        v = v.reshape(t, self.num_kv, self.head_dim)
        if self.qk_headnorm is not None:
            # per-head q/k normalization hook (Chameleon: LayerNorm
            # stats over head_dim with per-head affine)
            q, k = self.qk_headnorm(w, q, k)
        if self.alibi_slopes is not None:
            pass  # ALiBi replaces rope entirely
        elif self.rope_layer_mask is None:
            q, k = self._apply_rope(q, k, positions)
        else:
            # SmolLM3 nope layers: every Nth layer skips rope
            qr, kr = self._apply_rope(q, k, positions)
            use = self.rope_layer_mask[l if rope_l is None else rope_l]
            q = jnp.where(use, qr, q)
            k = jnp.where(use, kr, k)
        o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                 self.sm_scale,
                                 sliding_window=cfg.sliding_window,
                                 alibi_slopes=self.alibi_slopes,
                                 use_pallas=use_pallas)
        o_flat = o.reshape(t, -1)
        attn_out = matmul(o_flat, w["o_proj"])
        if "o_bias" in w:  # TeleChat2-style dense bias
            attn_out = attn_out + w["o_bias"]
        if self.residual_mult != 1.0:
            attn_out = attn_out * jnp.asarray(
                self.residual_mult, dtype=attn_out.dtype)
        x = res + attn_out

        res = x
        h = rms_norm(x, w["post_attention_layernorm"],
                     cfg.rms_norm_eps)
        h = self.act_fn(matmul(h, w["gate_proj"]),
                        matmul(h, w["up_proj"]))
        mlp_out = matmul(h, w["down_proj"])
        if "down_bias" in w:
            mlp_out = mlp_out + w["down_bias"]
        if self.residual_mult != 1.0:
            mlp_out = mlp_out * jnp.asarray(
                self.residual_mult, dtype=mlp_out.dtype)
        x = res + mlp_out
        return x, kv_caches


    def compute_logits(self, params: dict,
                       hidden: jax.Array) -> jax.Array:
        if self.tie_embeddings or self.cfg.is_pooling_model:
            w = params["embed_tokens"].T
        else:
            w = params["lm_head"]
        logits = hidden.astype(jnp.float32) @ w.astype(jnp.float32)
        if self.logits_div != 1.0:
            logits = logits / self.logits_div
        if self.cfg.logit_softcap:
            cap = self.cfg.logit_softcap
            logits = jnp.tanh(logits / cap) * cap
        return logits


# Qwen2/2.5 and Mistral share the Llama computation graph; the HF config
# (attention_bias / sliding_window / tied embeddings) carries the deltas.
Qwen2ForCausalLM = LlamaForCausalLM
MistralForCausalLM = LlamaForCausalLM
TinyLlamaForCausalLM = LlamaForCausalLM


def _slice_rows_t(lo: int, hi: int):
    """Torch [out, in] fused weight → [in, hi-lo] slice."""
    import numpy as np

    return lambda x: np.ascontiguousarray(x[lo:hi].T)


class Phi3ForCausalLM(LlamaForCausalLM):
    """Reference: vllm/model_executor/models/phi3.py — Llama graph
    with fused qkv_proj / gate_up_proj checkpoint tensors, sliced into
    the standard q/k/v/gate/up ParamSpecs at load."""

    def param_specs(self) -> list[ParamSpec]:
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        I = self.inter
        remap = {
            "layers.q_proj": ("self_attn.qkv_proj.weight", 0, qd),
            "layers.k_proj": ("self_attn.qkv_proj.weight", qd,
                              qd + kd),
            "layers.v_proj": ("self_attn.qkv_proj.weight", qd + kd,
                              qd + 2 * kd),
            "layers.gate_proj": ("mlp.gate_up_proj.weight", 0, I),
            "layers.up_proj": ("mlp.gate_up_proj.weight", I, 2 * I),
        }
        specs = super().param_specs()
        for s in specs:
            if s.path in remap:
                key, lo, hi = remap[s.path]
                s.hf_key = "model.layers.{i}." + key
                s.transform = _slice_rows_t(lo, hi)
        return specs


class LlamaForSequenceClassification(LlamaForCausalLM):
    """Reference: classification pooling models (vllm pooler 'classify'
    + HF GenericForSequenceClassification): decoder backbone,
    last-token pooling, a bias-free score head [H, num_labels]."""

    def __init__(self, config: ModelConfig):
        config.is_pooling_model = True
        super().__init__(config)
        self.num_labels = getattr(config.hf_config, "num_labels", 2)

    def param_specs(self) -> list[ParamSpec]:
        specs = super().param_specs()
        specs.append(
            ParamSpec("score", (self.hidden, self.num_labels),
                      P(None, None), "score.weight",
                      transform=transpose2d))
        return specs

    def classify_logits(self, params, pooled_hidden):
        """[N, H] last-token hidden → [N, num_labels] logits."""
        return pooled_hidden.astype(jnp.float32) @ \
            params["score"].astype(jnp.float32)


class Qwen2ForRewardModel(LlamaForCausalLM):
    """Reference: vllm/model_executor/models/qwen2_rm.py — Qwen2
    backbone + two-layer reward head (Linear→ReLU→Linear, keys
    score.0 / score.2), last-token pooling. The first layer runs as
    an in-step pool projection; the runner applies the final score
    column."""

    def __init__(self, config: ModelConfig):
        config.attention_bias = True
        config.is_pooling_model = True
        super().__init__(config)
        self.num_labels = getattr(config.hf_config, "num_labels", 1)

    def param_specs(self) -> list[ParamSpec]:
        H = self.hidden
        specs = super().param_specs()
        specs += [
            ParamSpec("reward_fc", (H, H), P(None, None),
                      "score.0.weight", transform=transpose2d),
            ParamSpec("reward_fc_bias", (H, ), P(), "score.0.bias",
                      transform=None),
            ParamSpec("score", (H, self.num_labels), P(None, None),
                      "score.2.weight", transform=transpose2d),
        ]
        return specs

    def pool_projection(self, params, pooled):
        h = pooled @ params["reward_fc"].astype(pooled.dtype) + \
            params["reward_fc_bias"].astype(pooled.dtype)
        return jax.nn.relu(h)

    def classify_logits(self, params, pooled_hidden):
        return pooled_hidden  # score head applied by the runner


class SmolLM3ForCausalLM(LlamaForCausalLM):
    """Reference: vllm/model_executor/models/smollm3.py — Llama graph
    with rope disabled on every ``no_rope_layer_interval``-th layer
    (config no_rope_layers: 1 = rope, 0 = nope)."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        mask = getattr(hf, "no_rope_layers", None)
        if mask is not None:
            self.rope_layer_mask = jnp.asarray(
                [bool(m) for m in mask], dtype=bool)


class GraniteForCausalLM(LlamaForCausalLM):
    """Reference: vllm/model_executor/models/granite.py — Llama graph
    with scalar multipliers on embeddings, residual branches, the
    attention scale, and the logits."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.embed_mult = getattr(hf, "embedding_multiplier", 1.0)
        self.residual_mult = getattr(hf, "residual_multiplier", 1.0)
        self.logits_div = getattr(hf, "logits_scaling", 1.0)
        am = getattr(hf, "attention_multiplier", None)
        if am:
            self.sm_scale = am
