"""MLP-speculator draft heads (IBM "Accelerating Production LLMs with
Combined Token/Embedding Speculators", arXiv:2404.19124).

Reference: vllm/model_executor/models/mlp_speculator.py. Sequential
per-head recurrence over the target hidden state — NO attention, NO
draft KV:

    state = hidden  (optionally LN0-normalized / sqrt(2))
    for head i:  s = proj_i(state) + emb_i[tok] * (emb_w / state_w)
                 state = gelu(LN_i(s));  tok = argmax(head_i(state))

The LN is the "safety" variant: RMS scaling (no mean subtraction)
with learned weight+bias. Like Medusa, the propose runs inside the
target's fused jitted step.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d


def make_mlp_spec_config(draft_dir: str,
                         target_cfg: ModelConfig) -> ModelConfig:
    import json
    import os
    import types

    cfg = dataclasses.replace(target_cfg, model=draft_dir)
    path = os.path.join(draft_dir, "config.json")
    if os.path.isfile(path):
        with open(path) as f:
            cfg.hf_config = types.SimpleNamespace(**json.load(f))
    return cfg


def _mlpspec_ln(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1,
                                     keepdims=True) + eps)
    return w * xf + b


class MLPSpeculatorHeads:
    """Weight layout stacked over heads: emb.{h}.weight [V, D],
    proj.{h}.weight (head 0: [D, emb_dim], rest [D, D]),
    head.{h}.weight [V, D], ln.{h}.{weight,bias} [D]. tie_weights
    checkpoints repeat head 0's tensors for every stage."""

    def __init__(self, cfg: ModelConfig,
                 target_cfg: ModelConfig) -> None:
        self.cfg = cfg
        hf = cfg.hf_config
        g = lambda k, d=None: getattr(hf, k, d) if hf is not None \
            else d
        self.n_predict = int(g("n_predict", 3) or 3)
        self.emb_dim = int(g("emb_dim", target_cfg.hidden_size)
                           or target_cfg.hidden_size)
        inner = int(g("inner_dim", 0) or 0)
        self.inner = inner if inner else self.emb_dim
        self.vocab_size = int(g("vocab_size", target_cfg.vocab_size)
                              or target_cfg.vocab_size)
        self.tie_weights = bool(g("tie_weights", False))
        self.scale_input = bool(g("scale_input", False))
        self.state_weight = 0.5**(0.5 / self.n_predict)
        self.emb_weight = math.sqrt(
            (1 - self.state_weight**2) * (self.inner / 2))
        self.num_heads = self.n_predict  # runner draft-count cap

    def param_specs(self) -> list[ParamSpec]:
        D, E, V = self.inner, self.emb_dim, self.vocab_size
        n = 1 if self.tie_weights else self.n_predict
        t = transpose2d

        def stk(path, shape, hf_key, transform=t):
            return ParamSpec(path, (n, *shape), P(None, None, None)
                             if len(shape) == 2 else P(None, None),
                             hf_key, stacked=True,
                             transform=transform)

        specs = [
            stk("emb", (V, D), "emb.{i}.weight", transform=None),
            stk("head", (D, V), "head.{i}.weight"),
            stk("ln_w", (D, ), "ln.{i}.weight", transform=None),
            stk("ln_b", (D, ), "ln.{i}.bias", transform=None),
            ParamSpec("proj0", (E, D), P(None, None),
                      "proj.0.weight", transform=t),
        ]
        if self.n_predict > 1:
            # stages 1.. project D -> D (tied checkpoints share
            # stage 1's tensor)
            n_rest = 1 if self.tie_weights else self.n_predict - 1
            specs.append(
                ParamSpec("proj_rest", (n_rest, D, D),
                          P(None, None, None), "proj.{i}.weight",
                          stacked=True, transform=t, layer_offset=1))
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return 0, 0, 0

    def propose(self, params: dict, hidden: jax.Array,
                last_tok: jax.Array, k: int) -> jax.Array:
        """[R, emb_dim] target hidden + [R] last emitted token →
        [R, k] draft tokens."""
        state = hidden.astype(jnp.float32)
        if self.scale_input:
            ln0 = _mlpspec_ln(state, 1.0, 0.0)
            state = ln0 / math.sqrt(2)
        tok = last_tok
        drafts = []
        alpha = self.emb_weight / self.state_weight
        for i in range(k):
            j = 0 if self.tie_weights else i
            z = jnp.take(params["emb"][j], tok, axis=0)
            if i == 0:
                s = state @ params["proj0"].astype(jnp.float32)
            else:
                jr = 0 if self.tie_weights else i - 1
                s = state @ params["proj_rest"][jr].astype(
                    jnp.float32)
            s = s + z.astype(jnp.float32) * alpha
            state = jax.nn.gelu(
                _mlpspec_ln(s, params["ln_w"][j].astype(jnp.float32),
                            params["ln_b"][j].astype(jnp.float32)),
                approximate=False)
            logits = state @ params["head"][j].astype(jnp.float32)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            drafts.append(tok)
        return jnp.stack(drafts, axis=1)
