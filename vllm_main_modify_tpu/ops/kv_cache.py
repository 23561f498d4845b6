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

import jax
import jax.numpy as jnp


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
