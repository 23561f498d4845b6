"""Mamba-1 state-space decoders: Mamba, FalconMamba.

Reference parity: vllm/model_executor/models/mamba.py (+
falcon_mamba via the same class, mixer RMS flag). Pure-SSM models have
NO attention KV — their per-request memory is two fixed-size state
slots per layer (conv tail + SSM state), managed by the "mamba"
KV-cache group (core/kv_cache_interface.py MambaSpec analogue). Group
0 is an empty full-attention group so the paged-meta plumbing keeps
its invariants; group 1 carries the states.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.layers.mamba import (build_seg_info,
                                               mamba1_mixer)
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d


def _conv_kd(x: np.ndarray) -> np.ndarray:
    """HF conv1d weight [d_inner, 1, K] → [K, d_inner]."""
    return np.ascontiguousarray(x[:, 0, :].T)


class MambaForCausalLM:

    mixer_key = "mixer"
    is_falcon_mamba = False

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.d_inner = getattr(hf, "intermediate_size", 2 * self.hidden)
        self.d_state = getattr(hf, "state_size", 16)
        self.d_conv = getattr(hf, "conv_kernel", 4)
        dt_rank = getattr(hf, "time_step_rank", "auto")
        self.dt_rank = (math.ceil(self.hidden / 16)
                        if dt_rank == "auto" else int(dt_rank))
        self.eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.use_conv_bias = bool(getattr(hf, "use_conv_bias", True))
        self.use_bias = bool(getattr(hf, "use_bias", False))
        self.tie_embeddings = getattr(hf, "tie_word_embeddings", True)
        self.mixer_rms_eps = (
            getattr(hf, "mixer_rms_eps", 1e-6)
            if self.is_falcon_mamba else None)

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, L, V = self.hidden, self.L, c.vocab_size
        di, ds, dr = self.d_inner, self.d_state, self.dt_rank
        t = transpose2d
        mk = self.mixer_key

        def stk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"layers.{path}", (L, *shape), spec,
                             "backbone.layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "backbone.embeddings.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(),
                      "backbone.norm_f.weight", transform=None),
            stk("norm", (H, ), P(None, None), "norm.weight",
                transform=None),
            stk("in_proj", (H, 2 * di), P(None, None, "model"),
                f"{mk}.in_proj.weight"),
            stk("conv_w", (self.d_conv, di), P(None, None, "model"),
                f"{mk}.conv1d.weight", transform=_conv_kd),
            stk("x_proj", (di, dr + 2 * ds), P(None, "model", None),
                f"{mk}.x_proj.weight"),
            stk("dt_proj", (dr, di), P(None, None, "model"),
                f"{mk}.dt_proj.weight"),
            stk("dt_bias", (di, ), P(None, "model"),
                f"{mk}.dt_proj.bias", transform=None),
            stk("A_log", (di, ds), P(None, "model", None),
                f"{mk}.A_log", transform=None),
            stk("D", (di, ), P(None, "model"), f"{mk}.D",
                transform=None),
            stk("out_proj", (di, H), P(None, "model", None),
                f"{mk}.out_proj.weight"),
        ]
        if self.use_conv_bias:
            specs.append(
                stk("conv_b", (di, ), P(None, "model"),
                    f"{mk}.conv1d.bias", transform=None))
        if self.use_bias:
            specs += [
                stk("in_bias", (2 * di, ), P(None, "model"),
                    f"{mk}.in_proj.bias", transform=None),
                stk("out_bias", (H, ), P(None, None),
                    f"{mk}.out_proj.bias", transform=None),
            ]
        if not self.tie_embeddings:
            specs.append(
                ParamSpec("lm_head", (H, V), P(None, "model"),
                          "lm_head.weight", transform=t))
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        # no attention KV; states live in the mamba group
        return 0, 0, self.L

    def kv_cache_groups(self):
        from vllm_main_modify_tpu.core.kv_cache_interface import \
            KVCacheGroupSpec

        return [
            KVCacheGroupSpec(kind="full", layer_ids=(), kv_heads=1,
                             head_dim=1),
            KVCacheGroupSpec(
                kind="mamba", layer_ids=tuple(range(self.L)),
                state_shapes=(
                    ((self.d_conv - 1, self.d_inner), "float32"),
                    ((self.d_inner, self.d_state), "float32"),
                )),
        ]

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        kv0, states = kv_caches
        conv_all, ssm_all = states
        slots = attn_meta.groups[0].state_slots
        seg = build_seg_info(attn_meta.query_start_loc,
                             attn_meta.num_seqs, x.shape[0], slots,
                             fresh_req=attn_meta.groups[0].state_fresh)
        layers = params["layers"]

        def layer_fn(l, carry):
            x, conv_all, ssm_all = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            h = rms_norm(x, w["norm"], self.eps)
            out, cs, ss = mamba1_mixer(
                h, w, conv_all[l], ssm_all[l], seg, self.dt_rank,
                self.d_state, mixer_rms_eps=self.mixer_rms_eps)
            conv_all = jax.lax.dynamic_update_index_in_dim(
                conv_all, cs, l, 0)
            ssm_all = jax.lax.dynamic_update_index_in_dim(
                ssm_all, ss, l, 0)
            return x + out, conv_all, ssm_all

        x, conv_all, ssm_all = jax.lax.fori_loop(
            0, self.L, layer_fn, (x, conv_all, ssm_all))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, (kv0, (conv_all, ssm_all))

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)


class FalconMambaForCausalLM(MambaForCausalLM):
    """Reference: vllm/model_executor/models/mamba.py falcon path —
    Mamba-1 with parameterless RMS normalization of B/C/dt inside the
    mixer (HF FalconMambaMixer)."""

    is_falcon_mamba = True


class Mamba2ForCausalLM:
    """Reference: vllm/model_executor/models/mamba2.py — Mamba-2
    (SSD): per-head scalar decay, grouped B/C through the shared
    causal conv, gated RMSNorm output (layers/mamba.py
    mamba2_mixer). Serves Mamba2 + Codestral-Mamba checkpoints."""

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_heads = g("num_heads", 128)
        self.head_dim_m = g("head_dim", 64)
        self.d_inner = self.num_heads * self.head_dim_m
        self.d_state = g("state_size", 128)
        self.d_conv = g("conv_kernel", 4)
        self.n_groups = g("n_groups", 8)
        self.gn = self.n_groups * self.d_state
        self.conv_dim = self.d_inner + 2 * self.gn
        self.eps = g("layer_norm_epsilon", 1e-5)
        self.use_conv_bias = bool(g("use_conv_bias", True))
        self.use_bias = bool(g("use_bias", False))
        self.time_step_limit = tuple(g("time_step_limit",
                                       (0.0, float("inf"))))
        self.tie_embeddings = g("tie_word_embeddings", False)

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, L, V = self.hidden, self.L, c.vocab_size
        di, cd, nh = self.d_inner, self.conv_dim, self.num_heads
        proj_out = di + cd + nh
        t = transpose2d

        def stk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"layers.{path}", (L, *shape), spec,
                             "backbone.layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "backbone.embeddings.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(),
                      "backbone.norm_f.weight", transform=None),
            stk("norm", (H, ), P(None, None), "norm.weight",
                transform=None),
            stk("in_proj", (H, proj_out), P(None, None, "model"),
                "mixer.in_proj.weight"),
            stk("conv_w", (self.d_conv, cd), P(None, None, "model"),
                "mixer.conv1d.weight", transform=_conv_kd),
            stk("dt_bias", (nh, ), P(None, "model"), "mixer.dt_bias",
                transform=None),
            stk("A_log", (nh, ), P(None, "model"), "mixer.A_log",
                transform=None),
            stk("D", (nh, ), P(None, "model"), "mixer.D",
                transform=None),
            stk("norm_gate", (di, ), P(None, "model"),
                "mixer.norm.weight", transform=None),
            stk("out_proj", (di, H), P(None, "model", None),
                "mixer.out_proj.weight"),
        ]
        if self.use_conv_bias:
            specs.append(
                stk("conv_b", (cd, ), P(None, "model"),
                    "mixer.conv1d.bias", transform=None))
        if self.use_bias:
            specs += [
                stk("in_bias", (proj_out, ), P(None, "model"),
                    "mixer.in_proj.bias", transform=None),
                stk("out_bias", (H, ), P(None, None),
                    "mixer.out_proj.bias", transform=None),
            ]
        if not self.tie_embeddings:
            specs.append(
                ParamSpec("lm_head", (H, V), P(None, "model"),
                          "lm_head.weight", transform=t))
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return 0, 0, self.L

    def kv_cache_groups(self):
        from vllm_main_modify_tpu.core.kv_cache_interface import \
            KVCacheGroupSpec

        return [
            KVCacheGroupSpec(kind="full", layer_ids=(), kv_heads=1,
                             head_dim=1),
            KVCacheGroupSpec(
                kind="mamba", layer_ids=tuple(range(self.L)),
                state_shapes=(
                    ((self.d_conv - 1, self.conv_dim), "float32"),
                    ((self.num_heads, self.head_dim_m, self.d_state),
                     "float32"),
                )),
        ]

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        from vllm_main_modify_tpu.layers.mamba import mamba2_mixer

        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        kv0, states = kv_caches
        conv_all, ssm_all = states
        slots = attn_meta.groups[0].state_slots
        seg = build_seg_info(attn_meta.query_start_loc,
                             attn_meta.num_seqs, x.shape[0], slots,
                             fresh_req=attn_meta.groups[0].state_fresh)
        layers = params["layers"]

        def layer_fn(l, carry):
            x, conv_all, ssm_all = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            h = rms_norm(x, w["norm"], self.eps)
            w2 = dict(w)
            w2["norm"] = w["norm_gate"]
            out, cs, ss = mamba2_mixer(
                h, w2, conv_all[l], ssm_all[l], seg, self.num_heads,
                self.head_dim_m, self.n_groups, self.d_state,
                self.eps, self.time_step_limit)
            conv_all = jax.lax.dynamic_update_index_in_dim(
                conv_all, cs, l, 0)
            ssm_all = jax.lax.dynamic_update_index_in_dim(
                ssm_all, ss, l, 0)
            return x + out, conv_all, ssm_all

        x, conv_all, ssm_all = jax.lax.fori_loop(
            0, self.L, layer_fn, (x, conv_all, ssm_all))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, (kv0, (conv_all, ssm_all))

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)
