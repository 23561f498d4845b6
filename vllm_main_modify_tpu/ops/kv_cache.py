"""Paged KV-cache write (token scatter into pages).

KV-cache layout (shared with the attention kernels, and chosen for the
same reasons as the reference's Pallas backend layout
vllm/v1/attention/backends/pallas.py:100-108):

    kv_cache: [num_pages, page_size, 2 * num_kv_heads, head_dim]

K and V are interleaved per head on axis 2 — K of head h at ``2*h``,
V at ``2*h + 1`` — so one page DMA fetches both, and a contiguous
shard of axis 2 (GSPMD 'model' axis) always contains whole (K, V)
pairs.

``slot_mapping`` maps each new token to its flat slot
``page_id * page_size + offset``; padded tokens carry slot 0 of the
null page combined with a mask. The XLA path is a plain scatter; the
page-RMW path (``kv_cache_update_paged`` below) rewrites whole pages.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# int8 symmetric quantization: full signed range minus -128 (symmetric)
INT8_QMAX = 127.0
# scale floor: avoids div-by-zero on all-zero tokens without denormals
SCALE_EPS = 2.0**-24


class QuantizedKV(NamedTuple):
    """INT8 paged KV cache with per-token scales.

    Reference capability: the TPU Pallas backend's int8 KV-cache mode
    (vllm/v1/attention/backends/pallas.py:29,335-343) — there with one
    STATIC per-layer k_scale/v_scale pair from the checkpoint. This
    design is TPU-first: dynamic per-TOKEN symmetric scales, written
    once when the token's K/V rows are produced (no calibration, no
    requantization, strictly finer granularity), and applied in the
    attention kernel to the [rows, kv] score/probability planes — two
    tiny VPU multiplies — instead of the streamed KV block. int8→bf16
    upcasts are native VPU converts, unlike Mosaic's ~35 cyc/lane-elem
    e4m3→bf16 path (docs/perf_v5e.md gap #1).

    data:   int8 ``[L, P, page, 2*Hk*D]`` (same width layout as the
            bf16/fp8 cache).
    scales: f32 ``[L, P, page, 2]`` token-major — lane 0 holds each
            token's K scale, lane 1 its V scale. Row-major like the
            data pages, so the kernel DMAs a page's scales with the
            same row-sliced pattern as its KV rows, and the in-kernel
            [kvb, 2] block turns into [1, kvb] scale columns with one
            supported f32 transpose (Mosaic rejects sublane→lane
            reshape merges, measured on v5e).
    """

    data: jax.Array
    scales: jax.Array


def quantize_kv_rows(key: jax.Array, value: jax.Array):
    """Per-token symmetric int8 quantization of new K/V rows.

    Returns (kv_int8 [T, 2*Hk*D] head-interleaved, k_scale [T] f32,
    v_scale [T] f32) with x ≈ int8 * scale.
    """
    t, num_kv_heads, head_dim = key.shape
    kf = key.astype(jnp.float32)
    vf = value.astype(jnp.float32)
    k_scale = jnp.maximum(
        jnp.max(jnp.abs(kf), axis=(1, 2)) / INT8_QMAX, SCALE_EPS)
    v_scale = jnp.maximum(
        jnp.max(jnp.abs(vf), axis=(1, 2)) / INT8_QMAX, SCALE_EPS)
    kq = jnp.clip(jnp.round(kf / k_scale[:, None, None]), -INT8_QMAX,
                  INT8_QMAX).astype(jnp.int8)
    vq = jnp.clip(jnp.round(vf / v_scale[:, None, None]), -INT8_QMAX,
                  INT8_QMAX).astype(jnp.int8)
    kv = jnp.stack([kq, vq], axis=2).reshape(
        t, 2 * num_kv_heads * head_dim)
    return kv, k_scale, v_scale


def dequantize_kv_pages(data: jax.Array, scales: jax.Array,
                        num_kv_heads: int, head_dim: int,
                        out_dtype=jnp.bfloat16) -> jax.Array:
    """data [..., page, 2*Hk*D] int8 + scales [..., page, 2] f32 →
    [..., page, 2*Hk*D] out_dtype."""
    *lead, page, width = data.shape
    d = data.astype(jnp.float32).reshape(*lead, page, num_kv_heads, 2,
                                         head_dim)
    sc = scales[..., :, None, :, None]  # [..., page, 1, 2, 1]
    return (d * sc).reshape(*lead, page, width).astype(out_dtype)


def kv_cache_shape(num_pages: int, page_size: int, num_kv_heads: int,
                   head_dim: int) -> tuple[int, int, int, int]:
    return (num_pages, page_size, 2 * num_kv_heads, head_dim)


def write_to_kv_cache(
    kv_cache: jax.Array,  # [P, page, 2K, D] or width [P, page, 2K*D]
    key: jax.Array,  # [T, K, D] new keys
    value: jax.Array,  # [T, K, D] new values
    slot_mapping: jax.Array,  # [T] int32 flat slot ids; -1 = skip (pad)
) -> jax.Array:
    """Scatter new K/V rows into their pages. XLA reference path.

    Correctness contract mirrored by the page-RMW production path
    (reference precedent: vllm/attention/ops/pallas_kv_cache_update.py).
    """
    num_pages, page_size = kv_cache.shape[:2]
    t, num_kv_heads, head_dim = key.shape
    width = 2 * num_kv_heads * head_dim

    # interleave K/V per head → [T, 2K*D]
    kv = jnp.stack([key, value], axis=2).reshape(t, width)
    kv = kv.astype(kv_cache.dtype)

    flat = kv_cache.reshape(num_pages * page_size, width)
    # route padded tokens (slot -1) out of range; drop-mode discards them
    slots = jnp.where(slot_mapping >= 0, slot_mapping,
                      num_pages * page_size)
    flat = flat.at[slots].set(kv, mode="drop")
    return flat.reshape(kv_cache.shape)


def write_to_kv_cache_paged(
    kv_cache: jax.Array,  # [P, page, 2K, D] — pass [L*P, ...] with a
    # layer-offset baked into `slices` for stacked multi-layer caches
    key: jax.Array,  # [T, K, D]
    value: jax.Array,  # [T, K, D]
    slices: jax.Array,  # [3, S] (cache_start_row, new_start, len)
    num_slices: jax.Array,  # [1] int32
    row_offset=0,  # add to cache_start rows (layer offset, traced ok)
) -> jax.Array:
    """Page-granular read-modify-write — the TPU production path.

    The token-level scatter above serializes on TPU (one loop step per
    token row); this gathers each touched page once, overlays the new
    rows with a vector select, and scatters whole pages back (~16x
    fewer, page-sized updates). Slices come from the runner's host-side
    metadata build; a slice never crosses a page and pages are unique
    across slices (one run per page per request per step), except the
    padded entries which all target the null page 0 with an identity
    update. Replaces the reference's reshape_and_cache CUDA kernel
    (csrc/cache_kernels.cu) and its Pallas TPU equivalent
    (vllm/attention/ops/pallas_kv_cache_update.py).
    """
    num_pages, page_size = kv_cache.shape[:2]
    t, num_kv_heads, head_dim = key.shape
    width = 2 * num_kv_heads * head_dim
    kv = jnp.stack([key, value], axis=2).reshape(t, width)
    kv = kv.astype(kv_cache.dtype)
    pages = kv_cache.reshape(num_pages, page_size, width)

    s = slices.shape[1]
    cache_start, new_start, length = slices[0], slices[1], slices[2]
    cache_start = cache_start + row_offset
    page_ids = cache_start // page_size  # [S]
    offsets = cache_start % page_size
    r = jnp.arange(page_size, dtype=jnp.int32)[None, :]  # [1, page]
    src = new_start[:, None] + r - offsets[:, None]  # [S, page]
    valid = ((r >= offsets[:, None]) &
             (r < (offsets + length)[:, None]) &
             (jnp.arange(s, dtype=jnp.int32)[:, None] < num_slices[0]))
    gathered = jnp.take(kv, jnp.clip(src, 0, t - 1),
                        axis=0)  # [S, page, width]
    # padded slices scatter out of range → dropped (a null-page write
    # would race a real slice that legitimately targets page 0)
    real = valid.any(axis=1)
    safe_ids = jnp.where(real, page_ids, num_pages)
    old = jnp.take(pages, jnp.where(real, page_ids, 0), axis=0)
    merged = jnp.where(valid[:, :, None], gathered, old)
    pages = pages.at[safe_ids].set(merged, mode="drop")
    return pages.reshape(kv_cache.shape)


def write_to_kv_cache_quant(
    cache: QuantizedKV,  # data [LP, page, W] int8, scales [LP, page, 2]
    key: jax.Array,  # [T, K, D]
    value: jax.Array,  # [T, K, D]
    slot_mapping: jax.Array,  # [T] flat slots into THIS layer; -1 pad
    row_offset=0,  # layer offset in flat rows (layer_idx * P * page)
) -> QuantizedKV:
    """Token-scatter write of the int8 cache + per-token scales (XLA
    reference path; mirrors write_to_kv_cache). The token-major scale
    layout makes this one extra [T, 2]-row scatter."""
    data, scales = cache
    kv, k_scale, v_scale = quantize_kv_rows(key, value)
    width = kv.shape[-1]

    flat = data.reshape(-1, width)
    total_rows = flat.shape[0]
    slots = jnp.where(slot_mapping >= 0, slot_mapping + row_offset,
                      total_rows)
    flat = flat.at[slots].set(kv, mode="drop")

    sflat = scales.reshape(-1, 2)
    sflat = sflat.at[slots].set(
        jnp.stack([k_scale, v_scale], axis=-1), mode="drop")
    return QuantizedKV(flat.reshape(data.shape),
                       sflat.reshape(scales.shape))


def write_to_kv_cache_paged_quant(
    cache: QuantizedKV,
    key: jax.Array,  # [T, K, D]
    value: jax.Array,
    slices: jax.Array,  # [3, S] (cache_start_row, new_start, len)
    num_slices: jax.Array,  # [1]
    row_offset=0,
) -> QuantizedKV:
    """Page-RMW write of int8 data + per-token scales — the TPU
    production path (mirrors write_to_kv_cache_paged; same slice
    contract)."""
    data, scales = cache
    page_size = data.shape[-2]
    width = data.shape[-1]
    kv, k_scale, v_scale = quantize_kv_rows(key, value)
    t = kv.shape[0]
    pages = data.reshape(-1, page_size, width)
    num_pages = pages.shape[0]
    spages = scales.reshape(-1, page_size, 2)

    s = slices.shape[1]
    cache_start, new_start, length = slices[0], slices[1], slices[2]
    cache_start = cache_start + row_offset
    page_ids = cache_start // page_size
    offsets = cache_start % page_size
    r = jnp.arange(page_size, dtype=jnp.int32)[None, :]  # [1, page]
    src = new_start[:, None] + r - offsets[:, None]  # [S, page]
    valid = ((r >= offsets[:, None]) &
             (r < (offsets + length)[:, None]) &
             (jnp.arange(s, dtype=jnp.int32)[:, None] < num_slices[0]))
    src_c = jnp.clip(src, 0, t - 1)
    gathered = jnp.take(kv, src_c, axis=0)  # [S, page, width]
    g_scales = jnp.take(jnp.stack([k_scale, v_scale], axis=-1),
                        src_c, axis=0)  # [S, page, 2]
    real = valid.any(axis=1)
    safe_ids = jnp.where(real, page_ids, num_pages)
    read_ids = jnp.where(real, page_ids, 0)
    old = jnp.take(pages, read_ids, axis=0)
    merged = jnp.where(valid[:, :, None], gathered, old)
    pages = pages.at[safe_ids].set(merged, mode="drop")
    s_old = jnp.take(spages, read_ids, axis=0)  # [S, page, 2]
    s_merged = jnp.where(valid[:, :, None], g_scales, s_old)
    spages = spages.at[safe_ids].set(s_merged, mode="drop")
    return QuantizedKV(pages.reshape(data.shape),
                       spages.reshape(scales.shape))
