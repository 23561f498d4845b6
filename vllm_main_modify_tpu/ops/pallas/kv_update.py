"""Pallas TPU kernel: scatter new K/V token rows into the paged cache.

Replaces the reference's CUDA ``reshape_and_cache`` family
(csrc/cache_kernels.cu) for the TPU paged layout. XLA's scatter
serializes on TPU; this kernel instead issues one async DMA per
contiguous slice (a run of new tokens landing in one page), directly
HBM→HBM, updating the cache in place via input/output aliasing.
Host-side slice metadata build: worker/model_runner.py
``_compute_kv_update_slices`` (reference precedent for the metadata
shape: vllm/v1/worker/tpu_model_runner.py:562
``_get_slot_mapping_metadata``).

Slices layout: ``[3, S]`` int32 rows = (cache_start_row, new_kv_start,
length), rows beyond ``num_slices`` ignored. ``length`` never crosses a
page boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# slices handled per grid step; each gets its own DMA semaphore
SLICES_PER_BLOCK = 8


def _kv_update_kernel(
    slices_ref,  # [3, S] scalar prefetch
    num_slices_ref,  # [1] scalar prefetch
    new_kv_hbm,  # [T, 2*Hk, D]
    cache_hbm,  # [P*page, 2*Hk, D] (aliased input)
    cache_out,  # [P*page, 2*Hk, D] (aliased output)
    sems,  # DMA sems [SLICES_PER_BLOCK, n_chunk_sizes]
    *,
    max_len_log2: int,
):
    """Each slice's (dynamic) length is decomposed into power-of-two
    chunks so every DMA has a static size — dynamic-*size* DMAs don't
    discharge in interpret mode, and fixed sizes let the DMA engine
    pipeline uniform descriptors."""
    block = pl.program_id(0)
    started = []  # (cond, copy) for matched waits
    for j in range(SLICES_PER_BLOCK):
        idx = block * SLICES_PER_BLOCK + j
        real = idx < num_slices_ref[0]
        cache_start = jax.lax.select(real, slices_ref[0, idx], 0)
        new_start = jax.lax.select(real, slices_ref[1, idx], 0)
        length = jax.lax.select(real, slices_ref[2, idx], 0)
        offset = jnp.int32(0)
        for k in range(max_len_log2, -1, -1):
            size = 1 << k
            has_chunk = (length & size) != 0
            copy = pltpu.make_async_copy(
                new_kv_hbm.at[pl.ds(new_start + offset, size)],
                cache_out.at[pl.ds(cache_start + offset, size)],
                sems.at[j, k],
            )

            @pl.when(has_chunk)
            def _(copy=copy):
                copy.start()

            started.append((has_chunk, copy))
            offset += jax.lax.select(has_chunk, jnp.int32(size),
                                     jnp.int32(0))
    for has_chunk, copy in started:

        @pl.when(has_chunk)
        def _(copy=copy):
            copy.wait()


@functools.partial(jax.jit, static_argnames=["interpret"])
def kv_cache_update_pallas(
    kv_cache: jax.Array,  # [P, page, 2*Hk, D]
    new_kv: jax.Array,  # [T, 2*Hk, D] interleaved per head
    slices: jax.Array,  # [3, S] int32
    num_slices: jax.Array,  # [1] int32
    interpret: bool = False,
) -> jax.Array:
    num_pages, page_size, two_kh, head_dim = kv_cache.shape
    flat = kv_cache.reshape(num_pages * page_size, two_kh, head_dim)
    s_pad = slices.shape[1]
    grid = (pl.cdiv(s_pad, SLICES_PER_BLOCK), )
    # slice length <= page_size (a power of 2) → bits 0..log2(page)
    max_len_log2 = max(page_size.bit_length() - 1, 0)

    out = pl.pallas_call(
        functools.partial(_kv_update_kernel,
                          max_len_log2=max_len_log2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA(
                    (SLICES_PER_BLOCK, max_len_log2 + 1)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
        input_output_aliases={3: 0},  # cache input → output
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", ),
            has_side_effects=True),
        interpret=interpret,
    )(slices, num_slices, new_kv.astype(flat.dtype), flat)
    return out.reshape(kv_cache.shape)
