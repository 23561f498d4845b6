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


def swigluoai_and_mul(gate: jax.Array, up: jax.Array,
                      alpha: float = 1.702,
                      limit: float = 7.0) -> jax.Array:
    """GPT-OSS clamped swiglu (reference:
    vllm/model_executor/layers/activation.py SwigluOAIAndMul
    forward_native / HF modeling_gpt_oss GptOssExperts): gate clamped
    above, up clamped both ways, sigmoid tempered by alpha, and the
    (up + 1) shift."""
    gate = jnp.minimum(gate, limit)
    up = jnp.clip(up, -limit, limit)
    glu = gate * jax.nn.sigmoid(gate * alpha)
    return (up + 1.0) * glu


ACT2FN = {
    "silu": silu_and_mul,
    "gelu": gelu_and_mul,
    "gelu_pytorch_tanh": gelu_tanh_and_mul,
    "swigluoai": swigluoai_and_mul,
}
