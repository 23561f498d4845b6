"""Gemma3n (Gemma 3 nano, MatFormer family): AltUp multi-stream
residuals, Laurel low-rank adapters, per-layer input embeddings,
activation sparsity, and KV sharing.

Reference parity: vllm/model_executor/models/gemma3n.py (HF
modeling_gemma3n.py is the oracle). Text-decoder deltas vs Gemma3:

- **AltUp**: the residual stream is ``altup_num_inputs`` (4) parallel
  [T, H] streams. Each layer *predicts* all streams from a routed
  mixing matrix, runs the transformer block on stream 0, then
  *corrects* every stream with the block's innovation.
- **Laurel**: a per-layer rank-``laurel_rank`` adapter on the normed
  attention input, averaged into the residual at 1/sqrt(2).
- **Per-layer embeddings**: a second [vocab_pl, L*256] table plus a
  projection of the token embedding inject a per-layer 256-dim signal
  gated by gelu into streams 1..3 after correction.
- **KV sharing**: the last ``num_kv_shared_layers`` layers compute no
  K/V — each READS the pages of the last non-shared layer of its own
  attention type (the paged pool only allocates the non-shared
  layers; attention(write_kv=False) reuses the source layer's pages,
  which were written earlier in the same forward).
- Attention: q/k RMS-normed per head, v RMS-normed WITHOUT scale,
  softmax scale 1.0, local rope (rope_local_base_freq) on sliding
  layers, global rope on full layers.
- MLP: gelu_tanh with optional gaussian-top-k activation sparsity
  (relu above the mean + ppf(sparsity) * std cutoff).

The layer loop is a static Python loop: every layer's group routing,
KV-share source, rope selection, and sparsity constant are static.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import (ParamSpec,
                                                   transpose2d)


def _rms_noscale(x, eps):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                 keepdims=True)
    return (x.astype(jnp.float32) *
            jax.lax.rsqrt(v + eps)).astype(x.dtype)


class Gemma3nForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        txt = getattr(hf, "text_config", None) or hf
        self.txt = txt
        self.num_q = txt.num_attention_heads
        self.num_kv = txt.num_key_value_heads
        self.head_dim = txt.head_dim
        self.hidden = txt.hidden_size
        inter = txt.intermediate_size
        self.inter = inter[0] if isinstance(inter, (list, tuple)) \
            else inter
        if isinstance(inter, (list, tuple)):
            assert all(i == inter[0] for i in inter), \
                "per-layer intermediate sizes must be uniform"
        self.L = txt.num_hidden_layers
        self.layer_types = list(txt.layer_types)
        self.window = txt.sliding_window
        self.eps = txt.rms_norm_eps
        self.n_altup = txt.altup_num_inputs
        self.active = txt.altup_active_idx
        self.correct_scale = txt.altup_correct_scale
        self.laurel_rank = txt.laurel_rank
        self.h_pl = txt.hidden_size_per_layer_input
        self.vocab_pl = txt.vocab_size_per_layer_input
        self.sparsity = list(txt.activation_sparsity_pattern)
        # std multiplier per layer: norm.ppf(target_sparsity)
        from scipy.stats import norm as _norm  # scipy ships with jax
        self._std_mult = [float(_norm.ppf(s)) if s > 0 else 0.0
                          for s in self.sparsity]
        self.inv_freq_global = jnp.asarray(
            compute_inv_freq(self.head_dim, txt.rope_theta,
                             getattr(txt, "rope_scaling", None)))
        self.inv_freq_local = jnp.asarray(
            compute_inv_freq(self.head_dim,
                             txt.rope_local_base_freq, None))
        # KV sharing: layers >= first_shared read the pages of the
        # last non-shared layer of the same type
        n_shared = txt.num_kv_shared_layers
        self.first_shared = self.L - n_shared
        prev = self.layer_types[:self.first_shared]
        self.kv_source = []
        for i in range(self.L):
            if n_shared > 0 and i >= self.first_shared:
                ty = self.layer_types[i]
                self.kv_source.append(
                    len(prev) - 1 - prev[::-1].index(ty))
            else:
                self.kv_source.append(i)
        config.num_layers = self.first_shared

    # ------------------------------------------------------------------

    def kv_cache_spec(self):
        return self.num_kv, self.head_dim, self.first_shared

    def kv_cache_groups(self):
        from vllm_main_modify_tpu.core.kv_cache_interface import \
            KVCacheGroupSpec

        owned = list(range(self.first_shared))
        full = [l for l in owned
                if self.layer_types[l] == "full_attention"]
        win = [l for l in owned if l not in set(full)]
        groups = [
            KVCacheGroupSpec(kind="full", layer_ids=tuple(full),
                             kv_heads=self.num_kv,
                             head_dim=self.head_dim)
        ]
        if win:
            groups.append(
                KVCacheGroupSpec(kind="window", layer_ids=tuple(win),
                                 kv_heads=self.num_kv,
                                 head_dim=self.head_dim,
                                 window=self.window))
        return groups

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, Dh, I = self.hidden, self.head_dim, self.inter
        L = self.L
        V = c.vocab_size
        t = transpose2d
        qd, kd = self.num_q * Dh, self.num_kv * Dh
        # Gemma3nForCausalLM serializes the text stack under
        # model.language_model. (matching the multimodal export)
        pfx = "model.language_model."

        def stk(path, shape, hf_key, transform=t):
            return ParamSpec(f"layers.{path}", (L, *shape),
                             P(*([None] * (len(shape) + 1))),
                             pfx + "layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        def norm(path, hf_key, dim=H):
            return stk(path, (dim, ), hf_key, transform=None)

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      pfx + "embed_tokens.weight", transform=None),
            ParamSpec("embed_per_layer",
                      (self.vocab_pl, L * self.h_pl), P(None, None),
                      pfx + "embed_tokens_per_layer.weight",
                      transform=None),
            ParamSpec("per_layer_model_projection",
                      (H, L * self.h_pl), P(None, None),
                      pfx + "per_layer_model_projection.weight",
                      transform=t),
            ParamSpec("per_layer_projection_norm", (self.h_pl, ), P(),
                      pfx + "per_layer_projection_norm.weight",
                      transform=None),
            ParamSpec("final_norm", (H, ), P(),
                      pfx + "norm.weight", transform=None),
        ]
        for i in range(1, self.n_altup):
            specs += [
                ParamSpec(f"altup_proj_{i - 1}", (H, H), P(None, None),
                          pfx + f"altup_projections.{i - 1}.weight",
                          transform=t),
                ParamSpec(f"altup_unembed_{i - 1}", (H, H),
                          P(None, None),
                          pfx + f"altup_unembed_projections."
                          f"{i - 1}.weight", transform=t),
            ]
        A = self.n_altup
        specs += [
            stk("q_proj", (H, qd), "self_attn.q_proj.weight"),
            stk("k_proj", (H, kd), "self_attn.k_proj.weight"),
            stk("v_proj", (H, kd), "self_attn.v_proj.weight"),
            stk("o_proj", (qd, H), "self_attn.o_proj.weight"),
            norm("q_norm", "self_attn.q_norm.weight", Dh),
            norm("k_norm", "self_attn.k_norm.weight", Dh),
            norm("input_layernorm", "input_layernorm.weight"),
            norm("post_attention_layernorm",
                 "post_attention_layernorm.weight"),
            norm("pre_feedforward_layernorm",
                 "pre_feedforward_layernorm.weight"),
            norm("post_feedforward_layernorm",
                 "post_feedforward_layernorm.weight"),
            stk("gate_proj", (H, I), "mlp.gate_proj.weight"),
            stk("up_proj", (H, I), "mlp.up_proj.weight"),
            stk("down_proj", (I, H), "mlp.down_proj.weight"),
            # laurel
            stk("laurel_left", (H, self.laurel_rank),
                "laurel.linear_left.weight"),
            stk("laurel_right", (self.laurel_rank, H),
                "laurel.linear_right.weight"),
            norm("post_laurel_norm", "laurel.post_laurel_norm.weight"),
            # altup per layer
            stk("altup_correct_coefs", (A, A),
                "altup.correction_coefs.weight"),
            stk("altup_predict_coefs", (A, A * A),
                "altup.prediction_coefs.weight"),
            stk("altup_router", (H, A),
                "altup.modality_router.weight"),
            norm("altup_router_norm", "altup.router_norm.weight"),
            norm("altup_correct_output_scale",
                 "altup.correct_output_scale"),
            # per-layer input mixing
            stk("per_layer_input_gate", (H, self.h_pl),
                "per_layer_input_gate.weight"),
            stk("per_layer_projection", (self.h_pl, H),
                "per_layer_projection.weight"),
            norm("post_per_layer_input_norm",
                 "post_per_layer_input_norm.weight"),
        ]
        return specs

    # ------------------------------------------------------------------

    def _altup_predict(self, w, hs):
        """hs: [A, T, H] → predictions [A, T, H]."""
        act = hs[self.active]
        r = rms_norm(act, w["altup_router_norm"], self.eps) * (
            1.0 / self.hidden)
        modalities = jnp.tanh(
            (r @ w["altup_router"]).astype(jnp.float32)).astype(
                hs.dtype)  # [T, A]
        A = self.n_altup
        # nn.Linear: m @ W.T; reshape [T, A, A]; transpose last two
        coefs = (modalities @ w["altup_predict_coefs"]).reshape(
            -1, A, A).transpose(0, 2, 1)
        pred = jnp.einsum("ath,tab->bth", hs, coefs)
        return pred + hs

    def _altup_correct(self, w, pred, activated):
        r = rms_norm(activated, w["altup_router_norm"], self.eps) * (
            1.0 / self.hidden)
        modalities = jnp.tanh(
            (r @ w["altup_router"]).astype(jnp.float32)).astype(
                activated.dtype)
        innovation = activated - pred[self.active]  # [T, H]
        coefs = modalities @ w["altup_correct_coefs"] + 1.0  # [T, A]
        return pred + innovation[None] * \
            coefs.T[:, :, None]  # [A, T, H]

    def _mlp(self, w, x, li):
        g = x @ w["gate_proj"]
        if self.sparsity[li] > 0:
            mu = jnp.mean(g, axis=-1, keepdims=True)
            std = jnp.std(g, axis=-1, keepdims=True)
            cutoff = mu + std * jnp.asarray(self._std_mult[li],
                                            g.dtype)
            g = jax.nn.relu(g - cutoff)
        h = jax.nn.gelu(g, approximate=True) * (x @ w["up_proj"])
        return h @ w["down_proj"]

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        eps = self.eps
        x0 = inputs_embeds if inputs_embeds is not None else (
            jnp.take(params["embed_tokens"], input_ids, axis=0) *
            jnp.asarray(self.hidden**0.5,
                        dtype=params["embed_tokens"].dtype))
        t = x0.shape[0]

        # per-layer inputs: [T, L, h_pl]
        pl_ids = jnp.where(input_ids < self.vocab_pl, input_ids, 0)
        pl_emb = jnp.take(params["embed_per_layer"], pl_ids,
                          axis=0).reshape(t, self.L, self.h_pl) * \
            jnp.asarray(self.h_pl**0.5, x0.dtype)
        pl_proj = (x0 @ params["per_layer_model_projection"]) * \
            jnp.asarray(self.hidden**-0.5, x0.dtype)
        pl_proj = rms_norm(
            pl_proj.reshape(t, self.L, self.h_pl),
            params["per_layer_projection_norm"], eps)
        per_layer = (pl_proj + pl_emb) * jnp.asarray(
            2.0**-0.5, x0.dtype)

        # altup stream init: magnitude-matched projections of x0
        target = jnp.sqrt(
            jnp.mean(jnp.square(x0), axis=-1, keepdims=True))
        streams = [x0]
        for i in range(1, self.n_altup):
            p = x0 @ params[f"altup_proj_{i - 1}"]
            mag = jnp.sqrt(jnp.maximum(
                jnp.mean(jnp.square(p), axis=-1, keepdims=True),
                1e-5))
            streams.append(p * target / mag)
        hs = jnp.stack(streams)  # [A, T, H]

        # static per-layer group routing (hybrid runner hands a tuple)
        groups = self.kv_cache_groups()
        hybrid = isinstance(kv_caches, tuple)
        local_idx = {}
        group_of = {}
        for gi, g in enumerate(groups):
            for j, l in enumerate(g.layer_ids):
                local_idx[l] = j
                group_of[l] = gi

        layers = params["layers"]
        for li in range(self.L):
            w = jax.tree.map(lambda a, li=li: a[li], layers)
            pred = self._altup_predict(w, hs)
            act = pred[self.active]
            normed = rms_norm(act, w["input_layernorm"], eps)
            # laurel on the NORMED activation
            lo = normed @ w["laurel_left"] @ w["laurel_right"]
            laurel = normed + rms_norm(lo, w["post_laurel_norm"], eps)

            sliding = self.layer_types[li] == "sliding_attention"
            q = (normed @ w["q_proj"]).reshape(t, self.num_q,
                                               self.head_dim)
            q = rms_norm(q, w["q_norm"], eps)
            src = self.kv_source[li]
            shared = src != li
            k = (normed @ w["k_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            k = rms_norm(k, w["k_norm"], eps)
            v = (normed @ w["v_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            v = _rms_noscale(v, eps)
            inv = self.inv_freq_local if sliding else \
                self.inv_freq_global
            q, k = apply_rope(q, k, positions, inv)
            gi = group_of[src]
            kv = kv_caches[gi] if hybrid else kv_caches
            pool_l = local_idx[src] if hybrid else src
            o, kv = attention(
                q, k, v, kv, pool_l, attn_meta.for_group(gi)
                if hybrid else attn_meta, 1.0,
                sliding_window=self.window if sliding else None,
                use_pallas=use_pallas, write_kv=not shared)
            if hybrid:
                kv_caches = tuple(kv if i == gi else c
                                  for i, c in enumerate(kv_caches))
            else:
                kv_caches = kv
            attn = (o.reshape(t, -1)) @ w["o_proj"]
            attn = rms_norm(attn, w["post_attention_layernorm"], eps)
            attn_laurel = (act + attn + laurel) * jnp.asarray(
                1.0 / math.sqrt(2), x0.dtype)
            h = rms_norm(attn_laurel, w["pre_feedforward_layernorm"],
                         eps)
            ffw = self._mlp(w, h, li)
            ffw = rms_norm(ffw, w["post_feedforward_layernorm"], eps)
            out = attn_laurel + ffw
            corrected = self._altup_correct(w, pred, out)
            first = corrected[self.active]
            if self.correct_scale:
                first = first * w["altup_correct_output_scale"]
            gate = jax.nn.gelu(first @ w["per_layer_input_gate"],
                               approximate=True)
            gate = gate * per_layer[:, li]
            gate = rms_norm(gate @ w["per_layer_projection"],
                            w["post_per_layer_input_norm"], eps)
            corrected = corrected.at[1:].add(gate[None])
            hs = corrected

        # unembed: magnitude-matched mean over streams
        target = jnp.sqrt(
            jnp.mean(jnp.square(hs[0]), axis=-1, keepdims=True))
        outs = [hs[0]]
        for i in range(1, self.n_altup):
            p = hs[i] @ params[f"altup_unembed_{i - 1}"]
            mag = jnp.sqrt(jnp.maximum(
                jnp.mean(jnp.square(p), axis=-1, keepdims=True),
                1e-5))
            outs.append(p * target / mag)
        x = jnp.mean(jnp.stack(outs), axis=0)
        x = rms_norm(x, params["final_norm"], eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        logits = hidden.astype(jnp.float32) @ \
            params["embed_tokens"].T.astype(jnp.float32)
        cap = self.cfg.logit_softcap
        if cap:
            logits = jnp.tanh(logits / cap) * cap
        return logits
