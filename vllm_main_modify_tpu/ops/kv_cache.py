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
Pallas path (ops/pallas/kv_update.py) copies contiguous slices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kv_cache_shape(num_pages: int, page_size: int, num_kv_heads: int,
                   head_dim: int) -> tuple[int, int, int, int]:
    return (num_pages, page_size, 2 * num_kv_heads, head_dim)


def write_to_kv_cache(
    kv_cache: jax.Array,  # [P, page, 2K, D]
    key: jax.Array,  # [T, K, D] new keys
    value: jax.Array,  # [T, K, D] new values
    slot_mapping: jax.Array,  # [T] int32 flat slot ids; -1 = skip (pad)
) -> jax.Array:
    """Scatter new K/V rows into their pages. XLA reference path.

    Correctness contract mirrored by the Pallas kernel
    (reference precedent: vllm/attention/ops/pallas_kv_cache_update.py).
    """
    num_pages, page_size, two_k, head_dim = kv_cache.shape
    num_kv_heads = two_k // 2
    t = key.shape[0]

    # interleave K/V per head → [T, 2K, D]
    kv = jnp.stack([key, value], axis=2).reshape(t, two_k, head_dim)
    kv = kv.astype(kv_cache.dtype)

    flat = kv_cache.reshape(num_pages * page_size, two_k, head_dim)
    # route padded tokens (slot -1) out of range; drop-mode discards them
    slots = jnp.where(slot_mapping >= 0, slot_mapping,
                      num_pages * page_size)
    flat = flat.at[slots].set(kv, mode="drop")
    return flat.reshape(kv_cache.shape)
