"""Gated activations (reference capability: csrc/activation_kernels.cu
silu_and_mul / gelu_and_mul — XLA fuses these into the surrounding
matmuls on TPU)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu_and_mul(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.silu(gate) * up


def gelu_and_mul(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.gelu(gate, approximate=False) * up


def gelu_tanh_and_mul(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.gelu(gate, approximate=True) * up


ACT2FN = {
    "silu": silu_and_mul,
    "gelu": gelu_and_mul,
    "gelu_pytorch_tanh": gelu_tanh_and_mul,
}
