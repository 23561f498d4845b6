"""GPT-J, GPT-Neo, and GPT-BigCode (StarCoder-1) decoders.

Reference parity: vllm/model_executor/models/gpt_j.py, gpt_bigcode.py
(GPT-Neo is served via the transformers fallback in the reference;
here it is native). Family deltas vs GPT-2:

- GPT-J: no position embeddings — partial INTERLEAVED rotary over
  ``rotary_dim``; parallel attention+MLP from one LayerNorm; separate
  (bias-free) q/k/v/out projections; untied lm_head WITH bias.
- GPT-Neo: learned positions like GPT-2 but separate bias-free
  q/k/v Linears, UNSCALED attention logits (HF quirk: no 1/sqrt(d)),
  and alternating global/local (sliding-window) layers.
- GPT-BigCode: GPT-2 skeleton with multi-query attention — fused
  ``c_attn`` is [H + 2*head_dim, H] (Linear, not Conv1D).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope_interleaved,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.gpt2 import GPT2LMHeadModel
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.quantization.weights import matmul


class GPTJForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_heads = config.num_attention_heads
        self.head_dim = self.hidden // self.num_heads
        self.inter = getattr(hf, "n_inner", None) or 4 * self.hidden
        self.ln_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.sm_scale = self.head_dim**-0.5
        self.rot_dim = getattr(hf, "rotary_dim", None) or self.head_dim
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.rot_dim, config.rope_theta,
                             config.rope_scaling))

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, I, V, L = self.hidden, self.inter, c.vocab_size, self.L
        t = transpose2d

        def stk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"layers.{path}", (L, *shape), spec,
                             "transformer.h.{i}." + hf_key,
                             stacked=True, transform=transform)

        return [
            ParamSpec("wte", (V, H), P("model", None),
                      "transformer.wte.weight", transform=None),
            ParamSpec("ln_f", (H, ), P(), "transformer.ln_f.weight",
                      transform=None),
            ParamSpec("ln_f_bias", (H, ), P(), "transformer.ln_f.bias",
                      transform=None),
            ParamSpec("lm_head", (H, V), P(None, "model"),
                      "lm_head.weight", transform=t),
            ParamSpec("lm_head_bias", (V, ), P("model"),
                      "lm_head.bias", transform=None),
            stk("ln_1", (H, ), P(None, None), "ln_1.weight",
                transform=None),
            stk("ln_1_bias", (H, ), P(None, None), "ln_1.bias",
                transform=None),
            stk("q_proj", (H, H), P(None, None, "model"),
                "attn.q_proj.weight"),
            stk("k_proj", (H, H), P(None, None, "model"),
                "attn.k_proj.weight"),
            stk("v_proj", (H, H), P(None, None, "model"),
                "attn.v_proj.weight"),
            stk("o_proj", (H, H), P(None, "model", None),
                "attn.out_proj.weight"),
            stk("fc_in", (H, I), P(None, None, "model"),
                "mlp.fc_in.weight"),
            stk("fc_in_bias", (I, ), P(None, "model"),
                "mlp.fc_in.bias", transform=None),
            stk("fc_out", (I, H), P(None, "model", None),
                "mlp.fc_out.weight"),
            stk("fc_out_bias", (H, ), P(None, None), "mlp.fc_out.bias",
                transform=None),
        ]

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_heads, self.head_dim, self.L

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = jnp.take(params["wte"], input_ids, axis=0)
        t = x.shape[0]
        layers = params["layers"]
        rd = self.rot_dim

        def layer_fn(l, carry):
            x, kv = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            h = layer_norm(x, w["ln_1"], w["ln_1_bias"], self.ln_eps)
            q = matmul(h, w["q_proj"]).reshape(t, self.num_heads,
                                               self.head_dim)
            k = matmul(h, w["k_proj"]).reshape(t, self.num_heads,
                                               self.head_dim)
            v = matmul(h, w["v_proj"]).reshape(t, self.num_heads,
                                               self.head_dim)
            # GPT-J rope: interleaved pairs over the first rotary_dim
            q_rot, k_rot = apply_rope_interleaved(
                q[..., :rd], k[..., :rd], positions, self.inv_freq)
            q = jnp.concatenate([q_rot, q[..., rd:]], axis=-1)
            k = jnp.concatenate([k_rot, k[..., rd:]], axis=-1)
            o, kv = attention(q, k, v, kv, l, attn_meta, self.sm_scale,
                              use_pallas=use_pallas)
            attn_out = matmul(o.reshape(t, -1), w["o_proj"])
            mlp = jax.nn.gelu(matmul(h, w["fc_in"]) + w["fc_in_bias"],
                              approximate=True)
            mlp = matmul(mlp, w["fc_out"]) + w["fc_out_bias"]
            return x + attn_out + mlp, kv

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = layer_norm(x, params["ln_f"], params["ln_f_bias"],
                       self.ln_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        logits = hidden.astype(jnp.float32) @ \
            params["lm_head"].astype(jnp.float32)
        return logits + params["lm_head_bias"].astype(jnp.float32)


class GPTNeoForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_heads = config.num_attention_heads
        self.head_dim = self.hidden // self.num_heads
        self.inter = getattr(hf, "intermediate_size", None) \
            or 4 * self.hidden
        self.max_pos = hf.max_position_embeddings
        self.ln_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        # HF GPTNeoSelfAttention never scales the attention logits
        self.sm_scale = 1.0
        self.window = getattr(hf, "window_size", 256)
        # per-layer "global" / "local" list (config.attention_layers)
        self.attn_types = list(getattr(hf, "attention_layers",
                                       ["global"] * self.L))

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, I, V, L = self.hidden, self.inter, c.vocab_size, self.L
        t = transpose2d

        def stk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"layers.{path}", (L, *shape), spec,
                             "transformer.h.{i}." + hf_key,
                             stacked=True, transform=transform)

        return [
            ParamSpec("wte", (V, H), P("model", None),
                      "transformer.wte.weight", transform=None),
            ParamSpec("wpe", (self.max_pos, H), P(None, None),
                      "transformer.wpe.weight", transform=None),
            ParamSpec("ln_f", (H, ), P(), "transformer.ln_f.weight",
                      transform=None),
            ParamSpec("ln_f_bias", (H, ), P(), "transformer.ln_f.bias",
                      transform=None),
            stk("ln_1", (H, ), P(None, None), "ln_1.weight",
                transform=None),
            stk("ln_1_bias", (H, ), P(None, None), "ln_1.bias",
                transform=None),
            stk("ln_2", (H, ), P(None, None), "ln_2.weight",
                transform=None),
            stk("ln_2_bias", (H, ), P(None, None), "ln_2.bias",
                transform=None),
            stk("q_proj", (H, H), P(None, None, "model"),
                "attn.attention.q_proj.weight"),
            stk("k_proj", (H, H), P(None, None, "model"),
                "attn.attention.k_proj.weight"),
            stk("v_proj", (H, H), P(None, None, "model"),
                "attn.attention.v_proj.weight"),
            stk("o_proj", (H, H), P(None, "model", None),
                "attn.attention.out_proj.weight"),
            stk("o_bias", (H, ), P(None, None),
                "attn.attention.out_proj.bias", transform=None),
            stk("fc_in", (H, I), P(None, None, "model"),
                "mlp.c_fc.weight"),
            stk("fc_in_bias", (I, ), P(None, "model"),
                "mlp.c_fc.bias", transform=None),
            stk("fc_out", (I, H), P(None, "model", None),
                "mlp.c_proj.weight"),
            stk("fc_out_bias", (H, ), P(None, None), "mlp.c_proj.bias",
                transform=None),
        ]

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_heads, self.head_dim, self.L

    def _local_layer_ids(self) -> list[int]:
        return [l for l in range(self.L)
                if self.attn_types[l] == "local"]

    def kv_cache_groups(self):
        """Local layers allocate window-sized page chains (reference
        capability: SlidingWindowSpec, vllm/v1/kv_cache_interface.py)."""
        from vllm_main_modify_tpu.core.kv_cache_interface import (
            KVCacheGroupSpec, single_full_group)

        local = self._local_layer_ids()
        if not local or len(local) == self.L:
            g = single_full_group(self.num_heads, self.head_dim,
                                  self.L)
            if local:  # all layers local: one window group
                g[0] = KVCacheGroupSpec(kind="window",
                                        layer_ids=g[0].layer_ids,
                                        kv_heads=self.num_heads,
                                        head_dim=self.head_dim,
                                        window=self.window)
            return g
        full = [l for l in range(self.L) if l not in set(local)]
        return [
            KVCacheGroupSpec(kind="full", layer_ids=tuple(full),
                             kv_heads=self.num_heads,
                             head_dim=self.head_dim),
            KVCacheGroupSpec(kind="window", layer_ids=tuple(local),
                             kv_heads=self.num_heads,
                             head_dim=self.head_dim,
                             window=self.window),
        ]

    def _attn_block(self, w, x, kv, layer_idx, attn_meta, use_pallas,
                    window):
        t = x.shape[0]
        h = layer_norm(x, w["ln_1"], w["ln_1_bias"], self.ln_eps)
        q = matmul(h, w["q_proj"]).reshape(t, self.num_heads,
                                           self.head_dim)
        k = matmul(h, w["k_proj"]).reshape(t, self.num_heads,
                                           self.head_dim)
        v = matmul(h, w["v_proj"]).reshape(t, self.num_heads,
                                           self.head_dim)
        o, kv = attention(q, k, v, kv, layer_idx, attn_meta,
                          self.sm_scale, sliding_window=window,
                          use_pallas=use_pallas)
        x = x + matmul(o.reshape(t, -1), w["o_proj"]) + w["o_bias"]
        h = layer_norm(x, w["ln_2"], w["ln_2_bias"], self.ln_eps)
        h = jax.nn.gelu(matmul(h, w["fc_in"]) + w["fc_in_bias"],
                        approximate=True)
        return x + matmul(h, w["fc_out"]) + w["fc_out_bias"], kv

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = (jnp.take(params["wte"], input_ids, axis=0) +
             jnp.take(params["wpe"], positions, axis=0))
        layers = params["layers"]
        local = self._local_layer_ids()
        hybrid = isinstance(kv_caches, tuple)
        if hybrid:
            groups = self.kv_cache_groups()
            gmaps, metas = [], []
            for gi, g in enumerate(groups):
                m = np.zeros(self.L, dtype=np.int32)
                for i, l in enumerate(g.layer_ids):
                    m[l] = i
                gmaps.append(jnp.asarray(m))
                metas.append(attn_meta.for_group(gi))
        local_mask = jnp.asarray(
            [self.attn_types[l] == "local" for l in range(self.L)],
            dtype=bool)

        def layer_fn(l, carry):
            x, kv = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            if not local:
                return self._attn_block(w, x, kv, l, attn_meta,
                                        use_pallas, None)
            if len(local) == self.L:
                return self._attn_block(w, x, kv, l, attn_meta,
                                        use_pallas, self.window)
            if hybrid:
                def local_branch(x, kv):
                    kv0, kv1 = kv
                    x, kv1 = self._attn_block(w, x, kv1, gmaps[1][l],
                                              metas[1], use_pallas,
                                              self.window)
                    return x, (kv0, kv1)

                def full_branch(x, kv):
                    kv0, kv1 = kv
                    x, kv0 = self._attn_block(w, x, kv0, gmaps[0][l],
                                              metas[0], use_pallas,
                                              None)
                    return x, (kv0, kv1)

                return jax.lax.cond(local_mask[l], local_branch,
                                    full_branch, x, kv)
            return jax.lax.cond(
                local_mask[l],
                lambda x, kv: self._attn_block(w, x, kv, l, attn_meta,
                                               use_pallas,
                                               self.window),
                lambda x, kv: self._attn_block(w, x, kv, l, attn_meta,
                                               use_pallas, None),
                x, kv)

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = layer_norm(x, params["ln_f"], params["ln_f_bias"],
                       self.ln_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        # GPT-Neo ties lm_head to wte
        return hidden.astype(jnp.float32) @ \
            params["wte"].T.astype(jnp.float32)


def _slice_rows_t(lo: int, hi: int):
    """Torch Linear [out, in] → [in, hi-lo] column block."""
    return lambda x: np.ascontiguousarray(x[lo:hi].T)


def _slice_rows(lo: int, hi: int):
    return lambda x: np.ascontiguousarray(x[lo:hi])


class GPTBigCodeForCausalLM(GPT2LMHeadModel):
    """Reference: vllm/model_executor/models/gpt_bigcode.py —
    StarCoder-1/SantaCoder. GPT-2 skeleton; ``c_attn`` is a Linear
    [H + 2*kv_dim, H] (multi-query: kv_dim = head_dim)."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.multi_query = bool(getattr(hf, "multi_query", True))
        self.num_kv = 1 if self.multi_query else self.num_heads
        self.kv_dim = self.num_kv * self.head_dim

    def param_specs(self) -> list[ParamSpec]:
        H, kd = self.hidden, self.kv_dim
        specs = super().param_specs()
        # c_attn is a Linear here (not Conv1D): rows are outputs
        slices = {"q": (0, H), "k": (H, H + kd),
                  "v": (H + kd, H + 2 * kd)}
        out = []
        for s in specs:
            tail = s.path.split(".")[-1]
            name = tail.split("_")[0]
            if tail.endswith("_proj") and name in slices:
                lo, hi = slices[name]
                s.shape = (self.L, H, hi - lo)
                s.transform = _slice_rows_t(lo, hi)
            elif tail.endswith("_bias") and name in slices:
                lo, hi = slices[name]
                s.shape = (self.L, hi - lo)
                s.transform = _slice_rows(lo, hi)
            elif tail in ("o_proj", "fc_in", "fc_out"):
                s.transform = transpose2d  # Linear, not Conv1D
            out.append(s)
        return out

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = (jnp.take(params["wte"], input_ids, axis=0) +
             jnp.take(params["wpe"], positions, axis=0))
        t = x.shape[0]
        layers = params["layers"]

        def layer_fn(l, carry):
            x, kv = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = layer_norm(x, w["ln_1"], w["ln_1_bias"], self.ln_eps)
            q = (matmul(h, w["q_proj"]) + w["q_bias"]).reshape(
                t, self.num_heads, self.head_dim)
            k = (matmul(h, w["k_proj"]) + w["k_bias"]).reshape(
                t, self.num_kv, self.head_dim)
            v = (matmul(h, w["v_proj"]) + w["v_bias"]).reshape(
                t, self.num_kv, self.head_dim)
            o, kv = attention(q, k, v, kv, l, attn_meta, self.sm_scale,
                              use_pallas=use_pallas)
            x = res + matmul(o.reshape(t, -1), w["o_proj"]) + \
                w["o_bias"]
            res = x
            h = layer_norm(x, w["ln_2"], w["ln_2_bias"], self.ln_eps)
            h = jax.nn.gelu(matmul(h, w["fc_in"]) + w["fc_in_bias"],
                            approximate=True)
            x = res + matmul(h, w["fc_out"]) + w["fc_out_bias"]
            return x, kv

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = layer_norm(x, params["ln_f"], params["ln_f_bias"],
                       self.ln_eps)
        return x, kv_caches
