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


def int4_matmul_xla(x: jax.Array, w) -> jax.Array:
    """Reference path: full dequant then matmul (memory-heavy; CPU
    tests + oracle)."""
    from vllm_main_modify_tpu.quantization.weights import dequant_int4

    deq = dequant_int4(w, dtype=x.dtype)
    return x @ deq


def int4_matmul(x: jax.Array, w) -> jax.Array:
    if jax.devices()[0].platform == "tpu":
        from vllm_main_modify_tpu.ops.pallas.int4_matmul import \
            int4_matmul_pallas

        return int4_matmul_pallas(x, w)
    return int4_matmul_xla(x, w)
