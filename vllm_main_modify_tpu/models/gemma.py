"""Gemma 1 / Gemma 2 decoders.

Reference parity: vllm/model_executor/models/gemma.py + gemma2.py.
Family deltas vs Llama:
- embeddings scaled by sqrt(hidden); always-tied lm_head
- "zero-centered" RMSNorm: scale by (1 + w)
- gelu_pytorch_tanh gated MLP
Gemma 2 additionally:
- sandwich norms (pre/post attention AND pre/post feedforward)
- attention logit softcapping + final logit softcapping
- query_pre_attn_scalar-based sm_scale
- sliding-window attention on even layers, global on odd — realised as
  a lax.scan over layer PAIRS so each attention call keeps a static
  sliding_window (the kernel specializes on it).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.activation import gelu_tanh_and_mul
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.quantization.weights import matmul


def gemma_rms_norm(x: jax.Array, weight: jax.Array,
                   eps: float) -> jax.Array:
    """RMSNorm with (1 + w) scaling (HF GemmaRMSNorm)."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * (1.0 + weight.astype(jnp.float32))).astype(orig)


class GemmaForCausalLM:

    is_gemma2 = False
    is_gemma3 = False

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = config.head_dim
        self.hidden = config.hidden_size
        self.inter = config.intermediate_size
        self.L = config.num_layers
        if self.is_gemma2 and hf is not None:
            scalar = getattr(hf, "query_pre_attn_scalar", self.head_dim)
            self.sm_scale = scalar**-0.5
            self.attn_softcap = getattr(hf, "attn_logit_softcapping",
                                        50.0)
            self.final_softcap = getattr(hf, "final_logit_softcapping",
                                         30.0)
        else:
            self.sm_scale = self.head_dim**-0.5
            self.attn_softcap = None
            self.final_softcap = config.logit_softcap
        self.sliding_window = config.sliding_window
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta,
                             config.rope_scaling))
        self.embed_scale = float(self.hidden)**0.5

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
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
        if self.is_gemma2:
            specs += [
                stk("layers.pre_feedforward_layernorm", (H, ),
                    P(None, None),
                    "model.layers.{i}.pre_feedforward_layernorm.weight",
                    transform=None),
                stk("layers.post_feedforward_layernorm", (H, ),
                    P(None, None),
                    "model.layers.{i}.post_feedforward_layernorm.weight",
                    transform=None),
            ]
        if self.is_gemma3:
            specs += [
                stk("layers.q_norm", (self.head_dim, ), P(None, None),
                    "model.layers.{i}.self_attn.q_norm.weight",
                    transform=None),
                stk("layers.k_norm", (self.head_dim, ), P(None, None),
                    "model.layers.{i}.self_attn.k_norm.weight",
                    transform=None),
            ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    def _sliding_layer_ids(self) -> list[int]:
        """Model layers using windowed attention (Gemma2: even
        layers; Gemma3 overrides via config layer_types)."""
        if not (self.is_gemma2 and self.sliding_window):
            return []
        return [l for l in range(self.L) if l % 2 == 0]

    def kv_cache_groups(self):
        """Hybrid KV groups: window layers allocate window-sized page
        chains (reference: SlidingWindowSpec,
        vllm/v1/kv_cache_interface.py:215). Group 0 = full attention."""
        from vllm_main_modify_tpu.core.kv_cache_interface import (
            KVCacheGroupSpec, single_full_group)

        sliding = self._sliding_layer_ids()
        if not sliding:
            return single_full_group(self.num_kv, self.head_dim, self.L)
        full = [l for l in range(self.L) if l not in set(sliding)]
        return [
            KVCacheGroupSpec(kind="full", layer_ids=tuple(full),
                             kv_heads=self.num_kv,
                             head_dim=self.head_dim),
            KVCacheGroupSpec(kind="window", layer_ids=tuple(sliding),
                             kv_heads=self.num_kv,
                             head_dim=self.head_dim,
                             window=self.sliding_window),
        ]

    def _group_local_idx(self):
        """[L] arrays mapping model layer -> index inside its group's
        stacked array (valid only for layers of that group)."""
        import numpy as np

        groups = self.kv_cache_groups()
        full_map = np.zeros(self.L, dtype=np.int32)
        win_map = np.zeros(self.L, dtype=np.int32)
        for i, l in enumerate(groups[0].layer_ids):
            full_map[l] = i
        if len(groups) > 1:
            for i, l in enumerate(groups[1].layer_ids):
                win_map[l] = i
        return jnp.asarray(full_map), jnp.asarray(win_map)

    # ------------------------------------------------------------------

    def _attn(self, w, x, positions, kv_caches, layer_idx, attn_meta,
              use_pallas, sliding_window, inv_freq=None):
        t = x.shape[0]
        cfg = self.cfg
        res = x
        h = gemma_rms_norm(x, w["input_layernorm"], cfg.rms_norm_eps)
        q = matmul(h, w["q_proj"]).reshape(t, self.num_q,
                                           self.head_dim)
        k = matmul(h, w["k_proj"]).reshape(t, self.num_kv,
                                           self.head_dim)
        v = matmul(h, w["v_proj"]).reshape(t, self.num_kv,
                                           self.head_dim)
        if self.is_gemma3:
            # per-head zero-centered q/k RMSNorm (the Gemma3 delta)
            q = gemma_rms_norm(q, w["q_norm"], cfg.rms_norm_eps)
            k = gemma_rms_norm(k, w["k_norm"], cfg.rms_norm_eps)
        q, k = apply_rope(q, k, positions,
                          self.inv_freq if inv_freq is None
                          else inv_freq)
        o, kv_caches = attention(q, k, v, kv_caches, layer_idx,
                                 attn_meta, self.sm_scale,
                                 sliding_window=sliding_window,
                                 logit_softcap=self.attn_softcap,
                                 use_pallas=use_pallas)
        o = matmul(o.reshape(t, -1), w["o_proj"])
        if self.is_gemma2:
            o = gemma_rms_norm(o, w["post_attention_layernorm"],
                               cfg.rms_norm_eps)
            x = res + o
            res = x
            h = gemma_rms_norm(x, w["pre_feedforward_layernorm"],
                               cfg.rms_norm_eps)
            h = gelu_tanh_and_mul(matmul(h, w["gate_proj"]),
                                  matmul(h, w["up_proj"]))
            h = matmul(h, w["down_proj"])
            h = gemma_rms_norm(h, w["post_feedforward_layernorm"],
                               cfg.rms_norm_eps)
            return res + h, kv_caches
        x = res + o
        res = x
        h = gemma_rms_norm(x, w["post_attention_layernorm"],
                           cfg.rms_norm_eps)
        h = gelu_tanh_and_mul(matmul(h, w["gate_proj"]),
                              matmul(h, w["up_proj"]))
        return res + matmul(h, w["down_proj"]), kv_caches

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        cfg = self.cfg
        if inputs_embeds is not None:
            # multimodal wrappers pass already-scaled text embeddings
            # with UNscaled image features merged in (HF Gemma3
            # convention: scaling lives in the embedding layer)
            x = inputs_embeds
        else:
            x = jnp.take(params["embed_tokens"], input_ids, axis=0)
            x = x * jnp.asarray(self.embed_scale, dtype=x.dtype)

        layers = params["layers"]
        sliding = (self.sliding_window
                   if self.is_gemma2 and self.sliding_window else None)
        # hybrid KV groups: the runner hands a (full, window) tuple of
        # caches; each cond branch touches only its group's array via
        # a precomputed model-layer -> group-local index map
        hybrid = isinstance(kv_caches, tuple)
        if hybrid:
            full_map, win_map = self._group_local_idx()
            meta_full = attn_meta.for_group(0)
            meta_win = attn_meta.for_group(1)

        # fori_loop with the KV cache as carry: in-place page updates
        # (a scan emitting per-layer KV would double KV HBM). Gemma2
        # alternates sliding/global per layer parity via lax.cond —
        # two attention variants, each with a static sliding_window.
        def layer_fn(l, carry):
            x, kv = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            if sliding is None:
                return self._attn(w, x, positions, kv, l, attn_meta,
                                  use_pallas, None)
            if hybrid:
                def win_branch(x, kv):
                    kv0, kv1 = kv
                    x, kv1 = self._attn(w, x, positions, kv1,
                                        win_map[l], meta_win,
                                        use_pallas, sliding)
                    return x, (kv0, kv1)

                def full_branch(x, kv):
                    kv0, kv1 = kv
                    x, kv0 = self._attn(w, x, positions, kv0,
                                        full_map[l], meta_full,
                                        use_pallas, None)
                    return x, (kv0, kv1)

                return jax.lax.cond(l % 2 == 0, win_branch,
                                    full_branch, x, kv)
            return jax.lax.cond(
                l % 2 == 0,
                lambda x, kv: self._attn(w, x, positions, kv, l,
                                         attn_meta, use_pallas,
                                         sliding),
                lambda x, kv: self._attn(w, x, positions, kv, l,
                                         attn_meta, use_pallas, None),
                x, kv)

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = gemma_rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        logits = hidden.astype(jnp.float32) @ \
            params["embed_tokens"].T.astype(jnp.float32)
        if self.final_softcap:
            cap = self.final_softcap
            logits = jnp.tanh(logits / cap) * cap
        return logits


class Gemma2ForCausalLM(GemmaForCausalLM):
    is_gemma2 = True


class Gemma3ForCausalLM(GemmaForCausalLM):
    """Reference: vllm/model_executor/models/gemma3.py. Gemma2's
    sandwich-norm block plus: per-head q/k RMSNorm, no softcaps,
    config-driven sliding/full layer pattern (5:1), and DUAL rope —
    global layers use rope_theta (+linear scaling), sliding layers use
    rope_local_base_freq unscaled."""

    is_gemma2 = True
    is_gemma3 = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.attn_softcap = getattr(hf, "attn_logit_softcapping",
                                    None)
        self.final_softcap = getattr(hf, "final_logit_softcapping",
                                     None)
        self.sliding_window = getattr(hf, "sliding_window", None)
        layer_types = getattr(hf, "layer_types", None)
        if layer_types is None:
            pattern = getattr(hf, "sliding_window_pattern", 6)
            layer_types = [
                "sliding_attention" if (i + 1) % pattern else
                "full_attention" for i in range(self.L)
            ]
        self._layer_types = layer_types
        self._is_sliding = jnp.asarray(
            [lt == "sliding_attention" for lt in layer_types],
            dtype=jnp.bool_)
        local_theta = getattr(hf, "rope_local_base_freq", 10000.0)
        self.inv_freq_local = jnp.asarray(
            compute_inv_freq(self.head_dim, local_theta, None))

    def _sliding_layer_ids(self) -> list[int]:
        if not self.sliding_window:
            return []
        return [
            l for l, lt in enumerate(self._layer_types)
            if lt == "sliding_attention"
        ]

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        cfg = self.cfg
        if inputs_embeds is not None:
            # multimodal wrappers pass already-scaled text embeddings
            # with UNscaled image features merged in (HF Gemma3
            # convention: scaling lives in the embedding layer)
            x = inputs_embeds
        else:
            x = jnp.take(params["embed_tokens"], input_ids, axis=0)
            x = x * jnp.asarray(self.embed_scale, dtype=x.dtype)
        layers = params["layers"]
        hybrid = isinstance(kv_caches, tuple)
        if hybrid:
            full_map, win_map = self._group_local_idx()
            meta_full = attn_meta.for_group(0)
            meta_win = attn_meta.for_group(1)

        def layer_fn(l, carry):
            x, kv = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            if hybrid:
                def win_branch(x, kv):
                    kv0, kv1 = kv
                    x, kv1 = self._attn(w, x, positions, kv1,
                                        win_map[l], meta_win,
                                        use_pallas,
                                        self.sliding_window,
                                        self.inv_freq_local)
                    return x, (kv0, kv1)

                def full_branch(x, kv):
                    kv0, kv1 = kv
                    x, kv0 = self._attn(w, x, positions, kv0,
                                        full_map[l], meta_full,
                                        use_pallas, None,
                                        self.inv_freq)
                    return x, (kv0, kv1)

                return jax.lax.cond(self._is_sliding[l], win_branch,
                                    full_branch, x, kv)
            return jax.lax.cond(
                self._is_sliding[l],
                lambda x, kv: self._attn(w, x, positions, kv, l,
                                         attn_meta, use_pallas,
                                         self.sliding_window,
                                         self.inv_freq_local),
                lambda x, kv: self._attn(w, x, positions, kv, l,
                                         attn_meta, use_pallas, None,
                                         self.inv_freq),
                x, kv)

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = gemma_rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, kv_caches
