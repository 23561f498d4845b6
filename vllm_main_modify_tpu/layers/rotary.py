"""Rotary position embeddings.

Reference capability: vllm/model_executor/layers/rotary_embedding/
(14 variants) + csrc/pos_encoding_kernels.cu. On TPU the angles are
computed inline from the position ids — cheap VPU work that XLA fuses,
no table in HBM, no kernel.

Supports the base (Llama/neox "rotate-halves") style and the llama3
frequency-scaling variant; further variants (yarn, mrope) plug in by
transforming ``inv_freq``.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def compute_inv_freq(head_dim: int, rope_theta: float,
                     rope_scaling: Optional[dict] = None) -> np.ndarray:
    inv_freq = 1.0 / (rope_theta**(
        np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    if rope_scaling:
        rtype = rope_scaling.get("rope_type",
                                 rope_scaling.get("type", ""))
        if rtype == "llama3":
            inv_freq = _llama3_scale(inv_freq, rope_scaling)
        elif rtype == "linear":
            inv_freq = inv_freq / rope_scaling["factor"]
        elif rtype in ("default", "", None):
            pass
        # yarn/dynamic/mrope: added with the model families that use them
    return inv_freq.astype(np.float32)


def _llama3_scale(inv_freq: np.ndarray, cfg: dict) -> np.ndarray:
    factor = cfg["factor"]
    lo = cfg.get("low_freq_factor", 1.0)
    hi = cfg.get("high_freq_factor", 4.0)
    orig_ctx = cfg.get("original_max_position_embeddings", 8192)
    wavelen = 2 * math.pi / inv_freq
    lo_wl = orig_ctx / lo
    hi_wl = orig_ctx / hi
    scaled = inv_freq / factor
    smooth = (orig_ctx / wavelen - lo) / (hi - lo)
    mid = (1 - smooth) * scaled + smooth * inv_freq
    out = np.where(wavelen > lo_wl, scaled,
                   np.where(wavelen < hi_wl, inv_freq, mid))
    return out


def apply_rope(
    q: jax.Array,  # [T, Hq, D]
    k: jax.Array,  # [T, Hk, D]
    positions: jax.Array,  # [T] int32
    inv_freq: jax.Array,  # [D/2] f32
) -> tuple[jax.Array, jax.Array]:
    """Neox-style (rotate halves) RoPE, matching HF Llama."""
    angles = positions[:, None].astype(jnp.float32) * inv_freq[None, :]
    cos = jnp.cos(angles)[:, None, :]  # [T, 1, D/2]
    sin = jnp.sin(angles)[:, None, :]

    def rot(x):
        d2 = x.shape[-1] // 2
        x1, x2 = x[..., :d2], x[..., d2:]
        xf1 = x1.astype(jnp.float32)
        xf2 = x2.astype(jnp.float32)
        o1 = xf1 * cos - xf2 * sin
        o2 = xf2 * cos + xf1 * sin
        return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)

    return rot(q), rot(k)
