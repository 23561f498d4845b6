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


def _time(fn, x, w, iters_a: int = 50, iters_b: int = 250) -> float:
    """Per-iteration device time, measured to survive this
    environment's tunneled TPU runtime, where three artifacts corrupt
    naive timing (each observed here):

    1. block_until_ready returns BEFORE execution finishes — a
       device→host fetch (float()) is the only real barrier;
    2. un-chained repeated calls pipeline into impossible bandwidths,
       so iterations run SERIALIZED inside a lax.scan with the carry
       feeding the next input — and the per-iteration reduction must
       be max(), not sum() (XLA collapses sum(x@w) into
       rowsum(x)·colsum(w) and hoists it) nor a [0] peek (DCE'd to
       one column);
    3. each blocking fetch costs a fixed ~26 ms RTT, so the
       per-iteration time is the DIFFERENCE of two iteration counts.
    """

    def loop(iters):
        @jax.jit
        def g(x, w):
            def body(c, _):
                y = fn(x + c.astype(x.dtype), w)
                return y.astype(jnp.float32).max() * 1e-12, None

            c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                length=iters)
            return c

        float(g(x, w))  # compile + warm
        best = float("inf")
        for _ in range(3):  # min-of-3: RTT jitter is one-sided noise
            t0 = time.perf_counter()
            float(g(x, w))
            best = min(best, time.perf_counter() - t0)
        return best

    return (loop(iters_b) - loop(iters_a)) / (iters_b - iters_a)


def run(t_sizes=(8, 16, 32), verbose: bool = True) -> list[dict]:
    from vllm_main_modify_tpu.ops.pallas.int4_matmul import (
        int4_matmul_pallas, int4_matmul_w4a8_pallas)
    from vllm_main_modify_tpu.quantization.weights import (
        quantize_int4, quantize_int4_w4a8)

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
        qw8 = quantize_int4_w4a8(w, group_size=128)  # + requant arrays
        qw8 = jax.tree.map(jax.device_put, qw8)
        wb = w.astype(jnp.bfloat16)
        for t in t_sizes:
            x = jax.random.normal(key, (t, k), jnp.bfloat16)
            t_bf16 = _time(bf16_mm, x, wb)
            t_a16 = _time(int4_matmul_pallas, x, qw)
            t_a8 = _time(int4_matmul_w4a8_pallas, x, qw8)
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
