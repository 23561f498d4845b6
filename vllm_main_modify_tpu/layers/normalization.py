"""RMSNorm (reference capability: csrc/layernorm_kernels.cu rms_norm /
fused_add_rms_norm — on TPU these are pure-XLA: the compiler fuses the
reduction + scale into neighbouring ops, so no Pallas kernel is
needed)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * weight.astype(jnp.float32)).astype(orig_dtype)


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array,
               eps: float) -> jax.Array:
    """Full LayerNorm (mean-centering + bias) for the GPT-2/NeoX/
    Falcon/Starcoder lineages; XLA fuses it like rms_norm."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xf = xf - mean
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    out = xf * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def fused_add_rms_norm(x: jax.Array, residual: jax.Array,
                       weight: jax.Array,
                       eps: float) -> tuple[jax.Array, jax.Array]:
    """Returns (normed(x + residual), x + residual)."""
    added = x + residual
    return rms_norm(added, weight, eps), added
