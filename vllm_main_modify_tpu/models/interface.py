"""Model protocol + weight-spec plumbing.

The reference's model contract is ``forward(input_ids, positions,
intermediate_tensors)`` + ``compute_logits`` + ``load_weights`` with
per-parameter TP-aware loaders (vllm/model_executor/models/interfaces.py
and e.g. llama.py load_weights). TPU-native: a model is a *pure
function* over an explicit param pytree; sharding is declared once as
``PartitionSpec`` per parameter and applied by the loader via GSPMD —
there are no rank-local shards to stitch in Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np
from jax.sharding import PartitionSpec


@dataclass
class ParamSpec:
    """One parameter of the model's param pytree.

    ``path``: pytree path, dot-separated ("layers.q_proj").
    ``shape``: full (unsharded) shape; stacked params lead with the
    layer axis.
    ``sharding``: GSPMD PartitionSpec over the mesh axes
    ('data', 'model').
    ``hf_key``: HF safetensors name template; "{i}" expands to the layer
    index for stacked params.
    ``transform``: applied to the raw HF numpy tensor before placement
    (default for 2-D weights: transpose, torch [out,in] → jax [in,out]).
    """

    path: str
    shape: tuple
    sharding: PartitionSpec
    hf_key: str
    stacked: bool = False
    # MoE: "{e}" in hf_key expands over a second (expert) axis after
    # the layer axis; shape is [L, E, ...]
    num_experts: int = 0
    # expert banks whose HF numbering starts past 0 (Ernie4.5-VL
    # vision experts live at mlp.experts.{E_text + e}): "{e}" expands
    # to e + expert_offset
    expert_offset: int = 0
    transform: Optional[Callable[[np.ndarray], np.ndarray]] = None
    # stacked params whose HF layer numbering starts past 0 (e.g.
    # DeepSeek MoE layers begin at first_k_dense_replace): "{i}"
    # expands to i + layer_offset
    layer_offset: int = 0
    # stacked params over NON-contiguous HF layers (Jamba attention
    # layers at 2, 6, 10...): "{i}" expands to layer_ids[i] and
    # layer_offset is ignored
    layer_ids: Optional[tuple] = None
    # stacked params whose HF names don't fit one template (Zamba2:
    # pure-mamba layers say "mamba.*", hybrid layers say
    # "mamba_decoder.mamba.*"): fully-formed key per stacked row,
    # overrides hf_key
    hf_key_per_layer: Optional[tuple] = None
    # heterogeneous stacks (DeciLM/nemotron-nas no-op blocks,
    # reference nemotron_nas.py:122-123): layers whose HF tensor is
    # absent load as this constant instead of raising; zero weights
    # make the skipped sub-block an exact no-op under the residual
    fill_missing: Optional[float] = None


def transpose2d(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


class Model:
    """Protocol (duck-typed): every model family implements

    - ``param_specs() -> list[ParamSpec]``
    - ``__call__(params, input_ids, positions, kv_caches, attn_meta,
       use_pallas) -> (hidden, new_kv_caches)``
    - ``compute_logits(params, hidden) -> logits``
    - ``kv_cache_spec() -> (num_kv_heads, head_dim, num_layers)``
    """
