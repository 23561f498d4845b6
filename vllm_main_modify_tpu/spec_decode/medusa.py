"""Medusa speculative-decoding heads.

Reference: vllm/v1/spec_decode/medusa.py (MedusaProposer) +
vllm/model_executor/models/medusa.py. Medusa is the stateless cousin
of EAGLE: K independent heads (SiLU residual blocks + per-head
lm_head) read the TARGET's hidden state at each row's final emitted
position and produce the K draft tokens in ONE forward — no draft KV,
no autoregression. TPU-native: the propose runs inside the target's
fused jitted step (zero extra dispatches), vectorized over heads with
one einsum per block depth.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d


def make_medusa_config(draft_dir: str,
                       target_cfg: ModelConfig) -> ModelConfig:
    """Medusa checkpoints carry a bare config.json (model_type
    "medusa") that AutoConfig can't parse — read it raw; all tensor
    dims come from the target anyway."""
    import json
    import os
    import types

    cfg = dataclasses.replace(target_cfg, model=draft_dir)
    path = os.path.join(draft_dir, "config.json")
    if os.path.isfile(path):
        with open(path) as f:
            cfg.hf_config = types.SimpleNamespace(**json.load(f))
    return cfg


class MedusaHeads:
    """Weight layout: stacked over HEADS (the loader's layer axis) —
    blocks.{h}.layers.{j}.weight [H, H] (+optional bias) and
    lm_heads.{h}.weight [V, H] (vLLM-converted medusa checkpoints)."""

    def __init__(self, cfg: ModelConfig,
                 target_cfg: ModelConfig) -> None:
        self.cfg = cfg
        hf = cfg.hf_config
        g = lambda k, d=None: getattr(hf, k, d) if hf is not None \
            else d
        self.num_heads = g("medusa_num_heads",
                           g("num_heads", 4)) or 4
        self.num_layers = g("medusa_num_layers",
                            g("num_hidden_layers", 1)) or 1
        self.hidden = target_cfg.hidden_size
        self.vocab_size = target_cfg.vocab_size
        self.fc_bias = bool(g("medusa_fc_bias", False))
        assert (cfg.hidden_size in (0, self.hidden)
                or cfg.hf_config is None), (
            "medusa head width must match the target hidden size")

    def param_specs(self) -> list[ParamSpec]:
        K, H, V = self.num_heads, self.hidden, self.vocab_size
        specs = []
        for j in range(self.num_layers):
            specs.append(
                ParamSpec(f"block_{j}", (K, H, H),
                          P(None, None, "model"),
                          "blocks.{i}.layers." + str(j) + ".weight",
                          stacked=True, transform=transpose2d))
            if self.fc_bias:
                specs.append(
                    ParamSpec(f"block_{j}_bias", (K, H),
                              P(None, "model"),
                              "blocks.{i}.layers." + str(j) + ".bias",
                              stacked=True, transform=None))
        specs.append(
            ParamSpec("lm_heads", (K, H, V), P(None, None, "model"),
                      "lm_heads.{i}.weight", stacked=True,
                      transform=transpose2d))
        return specs

    def propose(self, params: dict, hidden: jax.Array) -> jax.Array:
        """[R, H] final-position target hidden → [R, K] greedy draft
        tokens (reference: MedusaProposer.propose — top-1 per head)."""
        x = jnp.broadcast_to(hidden[:, None, :],
                             (hidden.shape[0], self.num_heads,
                              self.hidden))
        for j in range(self.num_layers):
            y = jnp.einsum("rkh,khi->rki", x, params[f"block_{j}"])
            if self.fc_bias:
                y = y + params[f"block_{j}_bias"][None]
            x = x + jax.nn.silu(y)
        logits = jnp.einsum("rkh,khv->rkv", x.astype(jnp.float32),
                            params["lm_heads"].astype(jnp.float32))
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
