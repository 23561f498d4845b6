"""Pallas TPU kernel: fused INT4 dequant + matmul (W4A16).

Replaces the reference's GPTQ/AWQ/Marlin/Machete CUDA GEMMs
(csrc/quantization/{gptq,awq,gptq_marlin,machete}/) with one kernel
over the canonical packed layout (quantization/weights.py Int4Weight).

Decode is HBM-bandwidth-bound: streaming 4-bit weights instead of
bf16 is a 4x traffic cut, which is the whole point — the nibble
unpack + dequant runs on the VPU while the MXU consumes the previous
tile (automatic BlockSpec pipelining double-buffers the weight
stream). Accumulation is f32 in VMEM scratch across K tiles.

Grid: (num_out_tiles, num_k_tiles) — K is the inner (fastest) axis so
the output tile stays resident while partial products accumulate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _int4_kernel(x_ref, packed_ref, scales_ref, zeros_ref, out_ref,
                 acc_ref, *, group_size: int, n_k_tiles: int):
    j = pl.program_id(1)

    # unpack nibbles: [BK, BO/8] int32 → [BK, BO]
    packed = packed_ref[...]
    bk, bo8 = packed.shape
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    nib = (packed[:, :, None] >> shifts) & 0xF  # [BK, BO/8, 8]
    q = nib.reshape(bk, bo8 * 8).astype(jnp.float32)

    scales = scales_ref[...]  # [BK/g, BO]
    zeros = zeros_ref[...]
    deq = (q.reshape(bk // group_size, group_size, bo8 * 8) -
           zeros[:, None, :]) * scales[:, None, :]
    deq = deq.reshape(bk, bo8 * 8).astype(x_ref.dtype)

    partial = jnp.dot(x_ref[...], deq,
                      preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = partial

    @pl.when(j > 0)
    def _():
        acc_ref[...] = acc_ref[...] + partial

    @pl.when(j == n_k_tiles - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _pick_tile(dim: int, group: int, cap: int) -> int:
    """Largest multiple of `group` that divides `dim`, capped."""
    best = 0
    t = group
    while t <= min(dim, cap):
        if dim % t == 0:
            best = t
        t += group
    return best


@functools.partial(jax.jit, static_argnames=["interpret"])
def int4_matmul_pallas(x: jax.Array, w, interpret: bool = False
                       ) -> jax.Array:
    from vllm_main_modify_tpu.quantization.int4_dispatch import \
        int4_matmul_xla

    t_dim, k = x.shape[:-1], x.shape[-1]
    x2 = x.reshape(-1, k)
    t = x2.shape[0]
    packed, scales, zeros = w.packed, w.scales, w.zeros
    o = packed.shape[-1] * 8
    g = k // scales.shape[-2]

    bk = _pick_tile(k, g, 512)
    bo = 0
    for cand in (512, 384, 256, 128):
        if o % cand == 0:
            bo = cand
            break
    if bk == 0 or bo == 0 or t % 8 != 0:
        return int4_matmul_xla(x, w)

    n_k_tiles = k // bk
    grid = (o // bo, n_k_tiles)

    out = pl.pallas_call(
        functools.partial(_int4_kernel, group_size=g,
                          n_k_tiles=n_k_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, bk), lambda i, j: (0, j)),
            pl.BlockSpec((bk, bo // 8), lambda i, j: (j, i)),
            pl.BlockSpec((bk // g, bo), lambda i, j: (j, i)),
            pl.BlockSpec((bk // g, bo), lambda i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((t, bo), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((t, o), x.dtype),
        scratch_shapes=[pltpu.VMEM((t, bo), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x2, packed, scales, zeros)
    return out.reshape(*t_dim, o)
