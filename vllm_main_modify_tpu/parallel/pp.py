"""Pipeline parallelism over a ``stage`` mesh axis.

Reference capability: vllm/distributed/parallel_state.py:654-829
(IntermediateTensors send/recv between PP ranks) + layer partitioning
(vllm/distributed/utils.py get_pp_indices). TPU-native redesign: no
rank processes and no point-to-point tensor protocol — the stacked
per-layer weights [L, ...] and the paged KV cache [L, P, page, W]
shard their LAYER axis across a ``stage`` mesh axis, and the decoder
runs as a ring pipeline inside one ``jax.shard_map`` region:

    tick i: every stage runs its local layer slab; only stage i's
            result is real (the rest is bubble work on pass-through
            data), selected by mask; ``lax.ppermute`` rotates the
            activations one stage forward.

After S ticks the final hidden state has returned to stage 0 and is
broadcast with a masked ``psum``. KV-cache writes during bubble ticks
are neutralized by slot/num-slice masking (the paged-write ops drop
out-of-range slots — ops/kv_cache.py), so the cache is written exactly
once, by the active stage, with no full-slab select copies.

Why not lax.cond around the bubble work: GSPMD auto-partitioning over
the remaining mesh axes ('data', 'model') inserts collectives INSIDE
the layer body; divergent cond branches across stage members would
deadlock those collectives. Unconditional compute keeps every device
on the same collective schedule; the bubble FLOPs are idle time the
pipeline pays either way.

Engine-level bubble filling (the reference's PP batch queue,
vllm/v1/engine/core.py:301) is future work: with the async scheduler
the next step's host prep already overlaps device time, and the masked
output lets XLA retire stage 0's program early across dispatches.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def stage_partition(num_layers: int, num_stages: int) -> int:
    """Layers per stage. GSPMD shards the leading layer axis in equal
    contiguous blocks (same layout as the reference's get_pp_indices
    for evenly divisible models)."""
    if num_layers % num_stages:
        raise ValueError(
            f"num_layers ({num_layers}) must divide evenly into "
            f"pipeline_parallel_size ({num_stages}) stages")
    return num_layers // num_stages


def _mask_meta(meta, active):
    """Neutralize this tick's KV writes on inactive stages: slot -1
    and num_slices 0 are dropped by ops/kv_cache.py write paths."""
    repl = {}
    if meta.slot_mapping is not None:
        repl["slot_mapping"] = jnp.where(active, meta.slot_mapping,
                                         -1)
    if meta.num_kv_update_slices is not None:
        repl["num_kv_update_slices"] = (
            meta.num_kv_update_slices * active.astype(jnp.int32))
    return meta._replace(**repl)


def pipeline_forward(
    mesh,
    axis: str,
    num_stages: int,
    layers,  # stacked per-layer weight pytree, leaves [L, ...]
    kv_caches: jax.Array,  # [L, P, page, W] (or 5-D [L,P,page,2K,D])
    x: jax.Array,  # [T, H] embedded input (replicated)
    positions: jax.Array,
    meta,  # AttentionMetadata
    layer_body: Callable,
    # layer_body(w, x, kv, local_l, global_l, positions, meta)
    #   -> (x, kv);  kv indexed by LOCAL layer id inside shard_map
    num_layers: int,
) -> tuple[jax.Array, jax.Array]:
    """Run the decoder layer stack as a stage pipeline. Returns the
    final hidden state (replicated) and the updated KV cache (stage-
    sharded on its layer axis)."""
    lps = stage_partition(num_layers, num_stages)

    arr = {k: v for k, v in meta._asdict().items()
           if isinstance(v, jax.Array)}
    static = {k: v for k, v in meta._asdict().items()
              if not isinstance(v, jax.Array)}
    # cascade's two-pass read assumes replicated full-cache access;
    # off under pp (the shared pages are read by one stage anyway)
    static["cascade_pages"] = 0
    meta_cls = type(meta)

    def shard_fn(layers_slab, kv_slab, x, positions, arr_fields):
        sidx = jax.lax.axis_index(axis)
        m = meta_cls(**{**static, **arr_fields})

        def tick(i, carry):
            x, kv = carry
            active = sidx == i
            mm = _mask_meta(m, active)

            def body(l, c):
                xx, kv = c
                w = jax.tree.map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, l, 0, keepdims=False), layers_slab)
                return layer_body(w, xx, kv, l, sidx * lps + l,
                                  positions, mm)

            y, kv = jax.lax.fori_loop(0, lps, body, (x, kv))
            # bubble ticks pass the activation through unchanged
            y = jnp.where(active, y, x)
            y = jax.lax.ppermute(
                y, axis,
                [(j, (j + 1) % num_stages)
                 for j in range(num_stages)])
            return y, kv

        x, kv_slab = jax.lax.fori_loop(0, num_stages, tick,
                                       (x, kv_slab))
        # after the full ring the result sits on stage 0; broadcast
        x = jax.lax.psum(jnp.where(sidx == 0, x, 0), axis)
        return x, kv_slab

    in_specs = (
        jax.tree.map(lambda _: P(axis), layers),
        P(axis),
        P(),
        P(),
        jax.tree.map(lambda _: P(), arr),
    )
    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                       out_specs=(P(), P(axis)),
                       axis_names={axis}, check_vma=False)
    return fn(layers, kv_caches, x, positions, arr)
