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
        elif rtype == "yarn":
            inv_freq = _yarn_scale(inv_freq, head_dim, rope_theta,
                                   rope_scaling)
        elif rtype in ("default", "", None, "mrope"):
            # mrope (Qwen2-VL) keeps the base frequencies; its
            # sections only change how angles are SELECTED per dim
            # (apply_mrope below)
            pass
        else:
            # dynamic/mrope/longrope land with the families that use
            # them; silently ignoring a scaling type would produce
            # wrong positions, so fail loudly
            raise ValueError(
                f"rope scaling type {rtype!r} not supported")
    return inv_freq.astype(np.float32)


def yarn_get_mscale(scale: float, mscale: float = 1.0) -> float:
    """Attention-magnitude correction for yarn-extended context
    (reference: rotary_embedding/yarn.py yarn_get_mscale)."""
    if scale <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def yarn_attention_factor(cfg: dict) -> float:
    """cos/sin post-scale for yarn rope (HF
    modeling_rope_utils._compute_yarn_parameters attention_factor
    resolution)."""
    af = cfg.get("attention_factor")
    if af is not None:
        return float(af)
    factor = cfg.get("factor", 1.0)
    mscale = cfg.get("mscale")
    mscale_all = cfg.get("mscale_all_dim")
    if mscale and mscale_all:
        return yarn_get_mscale(factor, mscale) / \
            yarn_get_mscale(factor, mscale_all)
    return yarn_get_mscale(factor)


def _yarn_scale(inv_freq: np.ndarray, head_dim: int, base: float,
                cfg: dict) -> np.ndarray:
    """NTK-by-parts interpolation (YaRN): high-frequency dims keep the
    original freqs, low-frequency dims interpolate by 1/factor, with a
    linear ramp between (reference: rotary_embedding/yarn.py +
    deepseek_scaling_rope)."""
    factor = cfg.get("factor", 1.0)
    orig_max = cfg.get("original_max_position_embeddings", 4096)
    beta_fast = cfg.get("beta_fast", 32)
    beta_slow = cfg.get("beta_slow", 1)
    truncate = cfg.get("truncate", True)

    def correction_dim(num_rot):
        return (head_dim *
                math.log(orig_max / (num_rot * 2 * math.pi)) /
                (2 * math.log(base)))

    low, high = correction_dim(beta_fast), correction_dim(beta_slow)
    if truncate:  # GPT-OSS ships truncate=False (no floor/ceil)
        low, high = math.floor(low), math.ceil(high)
    low = max(low, 0)
    high = min(high, head_dim - 1)
    ramp = np.clip(
        (np.arange(head_dim // 2, dtype=np.float64) - low) /
        max(high - low, 0.001), 0, 1)
    extrap_mask = 1 - ramp
    return (inv_freq / factor) * (1 - extrap_mask) + \
        inv_freq * extrap_mask


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


def _rot_halves(q, k, cos, sin):
    def rot(x):
        d2 = x.shape[-1] // 2
        x1, x2 = x[..., :d2], x[..., d2:]
        xf1 = x1.astype(jnp.float32)
        xf2 = x2.astype(jnp.float32)
        o1 = xf1 * cos - xf2 * sin
        o2 = xf2 * cos + xf1 * sin
        return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)

    return rot(q), rot(k)


def apply_mrope(
    q: jax.Array,  # [T, Hq, D]
    k: jax.Array,  # [T, Hk, D]
    positions: jax.Array,  # [3, T] int32 (temporal, height, width)
    inv_freq: jax.Array,  # [D/2] f32
    sections: tuple,  # ints summing to D/2
) -> tuple[jax.Array, jax.Array]:
    """Multimodal RoPE (Qwen2-VL; reference:
    rotary_embedding/mrope.py): frequency dim i takes its angle from
    position stream sections-index(i) — text tokens carry identical
    t/h/w positions, so mrope == rope for them."""
    d2 = inv_freq.shape[0]
    sec_idx = jnp.asarray(np.repeat(np.arange(3), sections),
                          dtype=jnp.int32)
    angles3 = positions[:, :, None].astype(jnp.float32) * \
        inv_freq[None, None, :]  # [3, T, D/2]
    angles = angles3[sec_idx, :, jnp.arange(d2)]  # [D/2, T]
    angles = angles.T  # [T, D/2]
    cos = jnp.cos(angles)[:, None, :]
    sin = jnp.sin(angles)[:, None, :]
    return _rot_halves(q, k, cos, sin)


def apply_mrope_interleaved(
    q: jax.Array,  # [T, Hq, D]
    k: jax.Array,  # [T, Hk, D]
    positions: jax.Array,  # [3, T] int32
    inv_freq: jax.Array,  # [D/2] f32
    sections: tuple,  # (t, h, w) counts
) -> tuple[jax.Array, jax.Array]:
    """Qwen3-VL interleaved mrope (qwen3_vl.py
    apply_interleaved_mrope): the frequency layout is
    [T H W T H W ... T T] — index 3i+1 takes H for i < sections[1],
    3i+2 takes W for i < sections[2], everything else T. Preserves
    frequency continuity across the three streams."""
    d2 = inv_freq.shape[0]
    sel = np.zeros(d2, dtype=np.int32)
    sel[1:3 * sections[1]:3] = 1
    sel[2:3 * sections[2]:3] = 2
    pos_sel = positions[jnp.asarray(sel)]  # [D/2, T]
    angles = pos_sel.T.astype(jnp.float32) * inv_freq[None, :]
    cos = jnp.cos(angles)[:, None, :]
    sin = jnp.sin(angles)[:, None, :]
    return _rot_halves(q, k, cos, sin)


def apply_mrope_glm(
    q: jax.Array,  # [T, Hq, D]  (D = rotary dim)
    k: jax.Array,  # [T, Hk, D]
    positions: jax.Array,  # [3, T] int32
    inv_freq: jax.Array,  # [D/2] f32
    sections: tuple,  # ints summing to D/2
) -> tuple[jax.Array, jax.Array]:
    """GLM-4.1V multimodal rope (HF modeling_glm4v
    apply_multimodal_rotary_pos_emb): Qwen2-VL-style section-chunk
    stream selection over the frequency dim, but GLM's INTERLEAVED
    pair rotation ((x[2i], x[2i+1]) share angle i)."""
    d2 = inv_freq.shape[0]
    assert sum(sections) == d2, (
        f"mrope_section {sections} must sum to rotary_dim/2 = {d2}")
    sec_idx = jnp.asarray(np.repeat(np.arange(3), sections),
                          dtype=jnp.int32)
    angles3 = positions[:, :, None].astype(jnp.float32) * \
        inv_freq[None, None, :]  # [3, T, D/2]
    angles = angles3[sec_idx, :, jnp.arange(d2)].T  # [T, D/2]
    cos = jnp.cos(angles)[:, None, :]
    sin = jnp.sin(angles)[:, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        return jnp.stack([o1, o2],
                         axis=-1).reshape(x.shape).astype(x.dtype)

    return rot(q), rot(k)


def apply_rope(
    q: jax.Array,  # [T, Hq, D]
    k: jax.Array,  # [T, Hk, D]
    positions: jax.Array,  # [T] int32
    inv_freq: jax.Array,  # [D/2] f32
    mscale: float = 1.0,  # yarn attention_scaling on cos/sin
) -> tuple[jax.Array, jax.Array]:
    """Neox-style (rotate halves) RoPE, matching HF Llama."""
    angles = positions[:, None].astype(jnp.float32) * inv_freq[None, :]
    cos = jnp.cos(angles)[:, None, :] * mscale  # [T, 1, D/2]
    sin = jnp.sin(angles)[:, None, :] * mscale

    def rot(x):
        d2 = x.shape[-1] // 2
        x1, x2 = x[..., :d2], x[..., d2:]
        xf1 = x1.astype(jnp.float32)
        xf2 = x2.astype(jnp.float32)
        o1 = xf1 * cos - xf2 * sin
        o2 = xf2 * cos + xf1 * sin
        return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)

    return rot(q), rot(k)


def apply_rope_interleaved(
    q: jax.Array,  # [T, Hq, D]
    k: jax.Array,  # [T, Hk, D]
    positions: jax.Array,  # [T] int32
    inv_freq: jax.Array,  # [D/2] f32
    scale: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """GPT-J-style RoPE over adjacent pairs (x[2i], x[2i+1]) — the
    DeepSeek-V2/V3 convention (reference: rotary_embedding with
    is_neox_style=False; HF DeepseekV2 apply_rotary_emb via complex
    multiply). ``scale`` is the yarn attention factor applied to
    cos/sin (HF attention_scaling)."""
    angles = positions[:, None].astype(jnp.float32) * inv_freq[None, :]
    cos = (jnp.cos(angles) * scale)[:, None, :]  # [T, 1, D/2]
    sin = (jnp.sin(angles) * scale)[:, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        return jnp.stack([o1, o2],
                         axis=-1).reshape(x.shape).astype(x.dtype)

    return rot(q), rot(k)


def apply_rope_partial_interleaved(
    q: jax.Array,  # [T, H, D]
    k: jax.Array,
    positions: jax.Array,  # [T]
    inv_freq: jax.Array,  # [rot_dim/2]
    rot_dim: int,
) -> tuple[jax.Array, jax.Array]:
    """ChatGLM-2/3 convention (reference: chatglm.py:93-100 —
    rotary_dim = head_dim // 2 with is_neox_style=False): adjacent-pair
    rotation over the FIRST ``rot_dim`` dims, the rest pass through."""
    angles = positions[:, None].astype(jnp.float32) * inv_freq[None, :]
    cos = jnp.cos(angles)[:, None, :]
    sin = jnp.sin(angles)[:, None, :]

    def rot(x):
        xr, xp = x[..., :rot_dim], x[..., rot_dim:]
        xf = xr.astype(jnp.float32)
        x1, x2 = xf[..., 0::2], xf[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], axis=-1).reshape(xr.shape)
        return jnp.concatenate([out.astype(x.dtype), xp], axis=-1)

    return rot(q), rot(k)
