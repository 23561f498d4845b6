"""INT4 GEMM microbenchmark: W4A16 / W4A8 Pallas kernels vs the bf16
XLA matmul at decode batch sizes, on the attached TPU.

The north-star claim (BASELINE.md) is INT4 tokens/s/$: decode is
HBM-bound, so the 4-bit weight stream must translate into wall-clock
wins over bf16. Run:

    python -m vllm_main_modify_tpu.benchmarks.microbench_int4

Shapes are Llama-3-8B projections (hidden 4096, q+kv fused 6144,
gate+up 28672, down 14336->4096). Reference kernels this replaces:
csrc/quantization/gptq/q_gemm.cu:1848, gptq_marlin/.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, x, w, iters: int = 100) -> float:
    """Per-iteration device time with iterations SERIALIZED inside a
    lax.scan (each iteration's input depends on the previous output),
    so overlapped async dispatch can't fake impossible bandwidths —
    independent-call timing through this environment's tunnel showed
    >5 TB/s implied HBM reads, i.e. pure pipelining artifacts."""

    @jax.jit
    def loop(x, w):
        def body(c, _):
            y = fn(x + c.astype(x.dtype), w)
            return y.ravel()[0].astype(jnp.float32) * 1e-12, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    jax.block_until_ready(loop(x, w))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(loop(x, w))
    return (time.perf_counter() - t0) / iters


def run(t_sizes=(8, 16, 32), verbose: bool = True) -> list[dict]:
    from vllm_main_modify_tpu.ops.pallas.int4_matmul import (
        int4_matmul_pallas, int4_matmul_w4a8_pallas)
    from vllm_main_modify_tpu.quantization.weights import quantize_int4

    shapes = [
        ("qkv_proj", 4096, 6144),
        ("o_proj", 4096, 4096),
        ("gate_up", 4096, 28672),
        ("down", 14336, 4096),
    ]
    bf16_mm = jax.jit(lambda a, b: a @ b)
    rows = []
    for name, k, o in shapes:
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (k, o), jnp.float32) * 0.02
        qw = quantize_int4(w, group_size=128)
        qw = jax.tree.map(jax.device_put, qw)
        wb = w.astype(jnp.bfloat16)
        for t in t_sizes:
            x = jax.random.normal(key, (t, k), jnp.bfloat16)
            t_bf16 = _time(bf16_mm, x, wb)
            t_a16 = _time(int4_matmul_pallas, x, qw)
            t_a8 = _time(int4_matmul_w4a8_pallas, x, qw)
            row = dict(shape=name, k=k, o=o, t=t,
                       bf16_us=round(t_bf16 * 1e6, 1),
                       w4a16_us=round(t_a16 * 1e6, 1),
                       w4a8_us=round(t_a8 * 1e6, 1),
                       w4a8_vs_bf16=round(t_bf16 / t_a8, 2),
                       w4a16_vs_bf16=round(t_bf16 / t_a16, 2))
            rows.append(row)
            if verbose:
                print(row)
    return rows


if __name__ == "__main__":
    run()
