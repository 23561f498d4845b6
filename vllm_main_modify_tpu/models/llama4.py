"""Llama 4 (Scout / Maverick) text decoder.

Reference: vllm/model_executor/models/llama4.py. Per-layer structure:

- rope layers (``no_rope_layers[l] == 1``): interleaved rope (HF
  complex freqs_cis convention), weightless per-head RMS q/k norm
  AFTER rope (llama4.py:176-254), CHUNKED local attention of
  ``attention_chunk_size`` tokens (chunked_local_attention.py) — the
  KV rides a window-sized hybrid group since a chunk always lies
  within the trailing ``chunk_size`` tokens;
- NoPE layers (``no_rope_layers[l] == 0``): global attention, no rope,
  no qk norm, inference-time temperature tuning
  q *= log1p(floor((pos+1)/floor_scale))*attn_scale + 1
  (llama4.py:230-266);
- MLP: dense ``intermediate_size_mlp`` silu on non-MoE layers; on
  ``moe_layers``, top-k router → sigmoid(top logits) applied to the
  expert INPUT (llama4.py:50-110 custom_routing_function +
  apply_router_weight_on_input) + an always-on shared expert. Expert
  tensors are fused [E, H, 2I] gate|up halves (NOT interleaved).
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
from vllm_main_modify_tpu.layers.moe import moe_apply
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope_interleaved,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d


def _fused_half(start_frac: int, transpose: bool = False):
    """[E, H, 2I] gate|up contiguous halves."""

    def f(x):
        half = x.shape[-1] // 2
        y = x[..., start_frac * half:(start_frac + 1) * half]
        return np.ascontiguousarray(y)

    return f


class Llama4ForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = config.head_dim
        self.sm_scale = self.head_dim**-0.5
        self.eps = g("rms_norm_eps", 1e-5)
        self.inter_mlp = g("intermediate_size_mlp",
                           config.intermediate_size)
        self.inter_moe = config.intermediate_size
        self.E = g("num_local_experts", 0)
        self.top_k = g("num_experts_per_tok", 1)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta,
                             config.rope_scaling))
        nrl = list(g("no_rope_layers", None) or [1] * self.L)
        self.rope_ids = tuple(i for i, v in enumerate(nrl) if v)
        self.nope_ids = tuple(i for i, v in enumerate(nrl) if not v)
        self.moe_ids = tuple(g("moe_layers", None) or [])
        self.dense_ids = tuple(l for l in range(self.L)
                               if l not in set(self.moe_ids))
        self.chunk = int(g("attention_chunk_size", 0) or 0) or None
        self.use_qk_norm = bool(g("use_qk_norm", False))
        self.temp_tuning = bool(g("attn_temperature_tuning", False))
        self.floor_scale = float(g("floor_scale", 8192.0))
        self.attn_scale = float(g("attn_scale", 0.1))
        self.tie_embeddings = config.tie_word_embeddings

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V, E = self.hidden, c.vocab_size, self.E
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        im, ie = self.inter_mlp, self.inter_moe
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
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
            stk("layers", all_ids, "input_layernorm", (H, ),
                P(None, None), "input_layernorm.weight",
                transform=None),
            stk("layers", all_ids, "post_attention_layernorm", (H, ),
                P(None, None), "post_attention_layernorm.weight",
                transform=None),
            stk("layers", all_ids, "q_proj", (H, qd),
                P(None, None, "model"), "self_attn.q_proj.weight"),
            stk("layers", all_ids, "k_proj", (H, kd),
                P(None, None, "model"), "self_attn.k_proj.weight"),
            stk("layers", all_ids, "v_proj", (H, kd),
                P(None, None, "model"), "self_attn.v_proj.weight"),
            stk("layers", all_ids, "o_proj", (qd, H),
                P(None, "model", None), "self_attn.o_proj.weight"),
        ]
        if not self.tie_embeddings:
            specs.append(ParamSpec("lm_head", (H, V), P(None, "model"),
                                   "lm_head.weight", transform=t))
        if self.dense_ids:
            specs += [
                stk("dense", self.dense_ids, "gate_proj", (H, im),
                    P(None, None, "model"),
                    "feed_forward.gate_proj.weight"),
                stk("dense", self.dense_ids, "up_proj", (H, im),
                    P(None, None, "model"),
                    "feed_forward.up_proj.weight"),
                stk("dense", self.dense_ids, "down_proj", (im, H),
                    P(None, "model", None),
                    "feed_forward.down_proj.weight"),
            ]
        if self.moe_ids:
            specs += [
                stk("moe", self.moe_ids, "router", (H, E),
                    P(None, None, None), "feed_forward.router.weight"),
                stk("moe", self.moe_ids, "w_gate", (E, H, ie),
                    P(None, None, None, "model"),
                    "feed_forward.experts.gate_up_proj",
                    transform=_fused_half(0)),
                stk("moe", self.moe_ids, "w_up", (E, H, ie),
                    P(None, None, None, "model"),
                    "feed_forward.experts.gate_up_proj",
                    transform=_fused_half(1)),
                stk("moe", self.moe_ids, "w_down", (E, ie, H),
                    P(None, None, "model", None),
                    "feed_forward.experts.down_proj",
                    transform=lambda x: np.ascontiguousarray(x)),
                stk("moe", self.moe_ids, "shared_gate", (H, ie),
                    P(None, None, "model"),
                    "feed_forward.shared_expert.gate_proj.weight"),
                stk("moe", self.moe_ids, "shared_up", (H, ie),
                    P(None, None, "model"),
                    "feed_forward.shared_expert.up_proj.weight"),
                stk("moe", self.moe_ids, "shared_down", (ie, H),
                    P(None, "model", None),
                    "feed_forward.shared_expert.down_proj.weight"),
            ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    def kv_cache_groups(self):
        from vllm_main_modify_tpu.core.kv_cache_interface import (
            KVCacheGroupSpec, single_full_group)

        if not self.chunk or not self.rope_ids or not self.nope_ids:
            return single_full_group(self.num_kv, self.head_dim,
                                     self.L)
        # a token's chunk always lies within the trailing chunk_size
        # positions, so a window pool of that size is safe for the
        # chunked layers
        return [
            KVCacheGroupSpec(kind="full", layer_ids=self.nope_ids,
                             kv_heads=self.num_kv,
                             head_dim=self.head_dim),
            KVCacheGroupSpec(kind="window", layer_ids=self.rope_ids,
                             kv_heads=self.num_kv,
                             head_dim=self.head_dim,
                             window=self.chunk),
        ]

    # ------------------------------------------------------------------

    def _attn(self, w, h, positions, kv, l, meta, use_pallas,
              is_rope: bool, t):
        q = (h @ w["q_proj"]).reshape(t, self.num_q, self.head_dim)
        k = (h @ w["k_proj"]).reshape(t, self.num_kv, self.head_dim)
        v = (h @ w["v_proj"]).reshape(t, self.num_kv, self.head_dim)
        if is_rope:
            q, k = apply_rope_interleaved(q, k, positions,
                                          self.inv_freq)
            if self.use_qk_norm:
                # weightless per-head RMS in f32 (llama4.py:178-183)
                ones = jnp.ones((self.head_dim, ), jnp.float32)
                q = rms_norm(q, ones, self.eps)
                k = rms_norm(k, ones, self.eps)
            o, kv = attention(q, k, v, kv, l, meta, self.sm_scale,
                              use_pallas=use_pallas,
                              chunk_size=self.chunk)
        else:
            if self.temp_tuning:
                scale = jnp.log1p(
                    jnp.floor((positions.astype(jnp.float32) + 1.0) /
                              self.floor_scale)) * self.attn_scale + 1.0
                q = (q.astype(jnp.float32) *
                     scale[:, None, None]).astype(q.dtype)
            o, kv = attention(q, k, v, kv, l, meta, self.sm_scale,
                              use_pallas=use_pallas)
        return o.reshape(t, -1) @ w["o_proj"], kv

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        layers = params["layers"]
        hybrid = isinstance(kv_caches, tuple)

        def idx_map(ids):
            m = np.zeros(self.L, dtype=np.int32)
            for i, l in enumerate(ids):
                m[l] = i
            return jnp.asarray(m)

        dense_map = idx_map(self.dense_ids)
        moe_map = idx_map(self.moe_ids)
        is_moe = jnp.asarray(
            [l in set(self.moe_ids) for l in range(self.L)], bool)
        is_rope = jnp.asarray(
            [l in set(self.rope_ids) for l in range(self.L)], bool)
        if hybrid:
            nope_map = idx_map(self.nope_ids)
            rope_map = idx_map(self.rope_ids)
            metas = [attn_meta.for_group(0), attn_meta.for_group(1)]

        def pick(group, gl):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, gl, 0, keepdims=False), params[group])

        def dense_branch(l, h):
            w = pick("dense", dense_map[l])
            return silu_and_mul(h @ w["gate_proj"],
                                h @ w["up_proj"]) @ w["down_proj"]

        def moe_branch(l, h):
            w = pick("moe", moe_map[l])
            logits = (h.astype(jnp.float32) @
                      w["router"].astype(jnp.float32))
            top_vals, experts = jax.lax.top_k(logits, self.top_k)
            weights = jax.nn.sigmoid(top_vals)
            y = moe_apply(h, weights, experts, w["w_gate"], w["w_up"],
                          w["w_down"], silu_and_mul,
                          apply_weight_on_input=True)
            sh = silu_and_mul(h @ w["shared_gate"],
                              h @ w["shared_up"]) @ w["shared_down"]
            return y + sh

        def layer_fn(l, carry):
            x, kv_caches = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = rms_norm(x, w["input_layernorm"], self.eps)
            if hybrid:
                def rope_branch(h, kv):
                    kv0, kv1 = kv
                    o, kv1 = self._attn(w, h, positions, kv1,
                                        rope_map[l], metas[1],
                                        use_pallas, True, t)
                    return o, (kv0, kv1)

                def nope_branch(h, kv):
                    kv0, kv1 = kv
                    o, kv0 = self._attn(w, h, positions, kv0,
                                        nope_map[l], metas[0],
                                        use_pallas, False, t)
                    return o, (kv0, kv1)

                attn_out, kv_caches = jax.lax.cond(
                    is_rope[l], rope_branch, nope_branch, h, kv_caches)
            elif not self.nope_ids:
                attn_out, kv_caches = self._attn(
                    w, h, positions, kv_caches, l, attn_meta,
                    use_pallas, True, t)
            elif not self.rope_ids:
                attn_out, kv_caches = self._attn(
                    w, h, positions, kv_caches, l, attn_meta,
                    use_pallas, False, t)
            else:
                attn_out, kv_caches = jax.lax.cond(
                    is_rope[l],
                    lambda h, kv: self._attn(w, h, positions, kv, l,
                                             attn_meta, use_pallas,
                                             True, t),
                    lambda h, kv: self._attn(w, h, positions, kv, l,
                                             attn_meta, use_pallas,
                                             False, t),
                    h, kv_caches)
            x = res + attn_out

            res = x
            h = rms_norm(x, w["post_attention_layernorm"], self.eps)
            if not self.moe_ids:
                y = dense_branch(l, h)
            elif not self.dense_ids:
                y = moe_branch(l, h)
            else:
                y = jax.lax.cond(is_moe[l], moe_branch, dense_branch,
                                 l, h)
            return res + y, kv_caches

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)
