"""INT4 dequant-matmul dispatch: Pallas on TPU, XLA reference on CPU.

Replaces the reference's GPTQ exllama GEMM
(csrc/quantization/gptq/q_gemm.cu), AWQ GEMM
(csrc/quantization/awq/gemm_kernels.cu) and the Marlin/Machete W4A16
family — all after load-time repack to the canonical layout
(quantization/weights.py Int4Weight).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _delayer(w):
    """Collapse a stacked-layer Int4Weight (weights.py ``layer``
    field) to the indexed per-layer view for XLA paths — here the
    dynamic-slice fuses into the consumer dequant/dot, so slicing
    costs nothing."""
    if getattr(w, "layer", None) is None:
        return w
    from vllm_main_modify_tpu.quantization.weights import Int4Weight

    idx = lambda a: None if a is None else \
        jax.lax.dynamic_index_in_dim(a, w.layer, 0, keepdims=False)
    return Int4Weight(idx(w.packed), idx(w.scales), idx(w.zeros),
                      perm=idx(w.perm), w4a8=w.w4a8,
                      requant_m=idx(w.requant_m),
                      requant_s=idx(w.requant_s))


def int4_matmul_xla(x: jax.Array, w) -> jax.Array:
    """Reference path: full dequant then matmul (memory-heavy; CPU
    tests + oracle)."""
    from vllm_main_modify_tpu.quantization.weights import dequant_int4

    deq = dequant_int4(_delayer(w), dtype=x.dtype)
    return x @ deq


def int4_matmul_w4a8_xla(x: jax.Array, w) -> jax.Array:
    """W4A8 oracle/CPU path: same math as the Pallas kernel — int8
    activations, exact integer per-group dots, f32 group scales."""
    from vllm_main_modify_tpu.quantization.weights import (
        dequant_int4, quantize_activations_int8)

    qx, s_a = quantize_activations_int8(x.reshape(-1, x.shape[-1]))
    deq = dequant_int4(_delayer(w), dtype=jnp.float32)
    acc = jax.lax.dot_general(
        qx.astype(jnp.float32), deq,
        dimension_numbers=(((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.float32)
    return (acc * s_a).astype(x.dtype).reshape(*x.shape[:-1],
                                               deq.shape[-1])


def int4_matmul_w4a8_requant_xla(x: jax.Array, w) -> jax.Array:
    """Oracle for the progressive-requant prefill kernel: int8
    weights reconstructed as (q - z) * m, exact int32 dot
    (|sum| <= 127 * 127 * K < 2^31), then the per-channel requant
    scale and per-token activation scale."""
    from vllm_main_modify_tpu.quantization.weights import (
        int4_unpack, quantize_activations_int8)

    w = _delayer(w)
    qx, s_a = quantize_activations_int8(x.reshape(-1, x.shape[-1]))
    q = int4_unpack(w.packed)  # [K, O]
    k, o = q.shape[-2:]
    g = w.group_size
    z = w.zeros.astype(jnp.int32)
    w8 = ((q.reshape(k // g, g, o) - z[..., :, None, :]) *
          w.requant_m[..., :, None, :]).reshape(k, o)
    acc = jax.lax.dot_general(
        qx, w8.astype(jnp.int8),
        dimension_numbers=(((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.int32)
    out = (acc.astype(jnp.float32) * w.requant_s[..., 0:1, :] * s_a)
    return out.astype(x.dtype).reshape(*x.shape[:-1], o)


def int4_matmul(x: jax.Array, w) -> jax.Array:
    if jax.devices()[0].platform == "tpu":
        from vllm_main_modify_tpu.ops.pallas.int4_matmul import (
            int4_matmul_pallas, int4_matmul_w4a8_pallas)

        if getattr(w, "w4a8", False):
            return int4_matmul_w4a8_pallas(x, w)
        return int4_matmul_pallas(x, w)
    if getattr(w, "w4a8", False):
        return int4_matmul_w4a8_xla(x, w)
    return int4_matmul_xla(x, w)
