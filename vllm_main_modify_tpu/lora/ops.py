"""Multi-LoRA batched apply (punica shrink/expand equivalent).

Reference: vllm/lora/punica_wrapper/punica_tpu.py:21 +
lora/ops/xla_ops/ — per-token adapter selection over stacked adapter
weights. TPU-native: tokens sort by adapter slot, then two grouped
matmuls (``jax.lax.ragged_dot``) do shrink (x@A) and expand (·@B) for
every adapter at once — the same megablox pattern as the MoE layer.
Slot 0 is the null adapter (zero weights), so unadapted tokens flow
through with zero delta.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lora_apply(
    x: jax.Array,  # [T, H]
    a_stack: jax.Array,  # [S, H, r]
    b_stack: jax.Array,  # [S, r, O]
    scales: jax.Array,  # [S] alpha/r per slot
    token_slots: jax.Array,  # [T] int32 adapter slot per token
) -> jax.Array:
    """sum-per-token LoRA delta: scale_s * (x @ A_s) @ B_s."""
    t = x.shape[0]
    num_slots = a_stack.shape[0]
    order = jnp.argsort(token_slots)
    xs = jnp.take(x, order, axis=0)
    group_sizes = jnp.bincount(token_slots,
                               length=num_slots).astype(jnp.int32)
    shrink = jax.lax.ragged_dot(xs, a_stack.astype(x.dtype),
                                group_sizes)  # [T, r]
    expand = jax.lax.ragged_dot(shrink.astype(x.dtype),
                                b_stack.astype(x.dtype),
                                group_sizes)  # [T, O]
    scale = jnp.take(scales, jnp.take(token_slots, order))[:, None]
    expand = expand.astype(jnp.float32) * scale
    out = jnp.zeros((t, expand.shape[1]), jnp.float32)
    out = out.at[order].set(expand)
    return out.astype(x.dtype)


def lora_apply_dense_reference(x, a_stack, b_stack, scales,
                               token_slots) -> jax.Array:
    """Oracle: per-slot masked dense application."""
    out = jnp.zeros((x.shape[0], b_stack.shape[-1]), jnp.float32)
    for s in range(a_stack.shape[0]):
        delta = (x @ a_stack[s].astype(x.dtype)) @ \
            b_stack[s].astype(x.dtype)
        mask = (token_slots == s)[:, None]
        out = out + jnp.where(mask,
                              delta.astype(jnp.float32) * scales[s],
                              0.0)
    return out.astype(x.dtype)
