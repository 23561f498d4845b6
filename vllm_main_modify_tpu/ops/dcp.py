"""DCP — decode context parallelism: sequence-dim KV sharding with
log-sum-exp merge.

Reference capability: vllm/v1/attention/backends/mla/common.py:487-700
(decode-context-parallel path with cross-rank `lse` merge, used when
the TP degree exceeds the KV head count). TPU-native design
(SURVEY §5.7): KV pages shard across the mesh's model axis by PAGE
index (interleaved: page p lives on shard p % n, local id p // n).
Each shard runs ragged paged attention over ITS pages only, producing
an unnormalized partial (Σ e^{s - m_local} v, its denominator, and
m_local); the exact softmax over the full context is recovered with
the streaming-attention merge

    m = pmax_i(m_local_i)
    out = Σ_i e^{m_local_i - m} out_i / Σ_i e^{m_local_i - m} denom_i

— one psum pair over ICI, no KV allgather: a 64k-context decode reads
each shard's pages from its own HBM.

Built on the XLA attention path via ``shard_map``; moving the
per-shard body onto the Pallas kernel is the deployment step for real
multi-chip topologies (the math and sharding layout are identical —
the kernel already computes m/denom internally for its online
softmax, it only needs to emit them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

MIN_MASK = -0.7 * float(jnp.finfo(jnp.float32).max)


def localize_block_tables(block_tables: jax.Array, shard: jax.Array,
                          num_shards: int) -> jax.Array:
    """Global page ids (interleaved layout) → this shard's local ids,
    -1 where the page lives on another shard."""
    mine = (block_tables % num_shards) == shard
    return jnp.where(mine, block_tables // num_shards, -1)


def partial_paged_attention(
    q: jax.Array,  # [T, Hq, D]
    kv_cache: jax.Array,  # [P_local, page, 2K, D]
    block_tables: jax.Array,  # [R, max_pages] LOCAL ids, -1 = remote
    query_start_loc: jax.Array,  # [R+1]
    seq_lens: jax.Array,  # [R]
    sm_scale: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Causal ragged attention over a LOCAL page subset.

    Returns (out [T, Hq, D] f32 = Σ e^{s - m} v, denom [T, Hq] =
    Σ e^{s - m}, m [T, Hq] = local max score, -inf where the shard
    holds no keys for the token)."""
    num_tokens, num_q_heads, head_dim = q.shape
    _, page_size, two_k, _ = kv_cache.shape
    num_kv_heads = two_k // 2
    num_reqs, max_pages = block_tables.shape
    max_kv = max_pages * page_size
    group = num_q_heads // num_kv_heads

    t_idx = jnp.arange(num_tokens, dtype=jnp.int32)
    seq_ids = jnp.clip(
        jnp.searchsorted(query_start_loc, t_idx, side="right").astype(
            jnp.int32) - 1, 0, num_reqs - 1)
    q_pos = t_idx - query_start_loc[seq_ids]
    q_len = query_start_loc[seq_ids + 1] - query_start_loc[seq_ids]
    kv_pos = seq_lens[seq_ids] - q_len + q_pos

    pages = block_tables[seq_ids]  # [T, max_pages]
    local = pages >= 0
    kv = kv_cache[jnp.maximum(pages, 0)]
    kv = kv.reshape(num_tokens, max_kv, two_k, head_dim)
    k = kv[:, :, 0::2, :].astype(jnp.float32)
    v = kv[:, :, 1::2, :].astype(jnp.float32)

    qf = q.astype(jnp.float32).reshape(num_tokens, num_kv_heads,
                                       group, head_dim)
    scores = jnp.einsum("tkgd,tskd->tkgs", qf, k) * sm_scale
    kv_idx = jnp.arange(max_kv, dtype=jnp.int32)[None, :]
    mask = (kv_idx < seq_lens[seq_ids][:, None]) & \
        (kv_idx <= kv_pos[:, None]) & \
        jnp.repeat(local, page_size, axis=1)
    scores = jnp.where(mask[:, None, None, :], scores, MIN_MASK)

    m = jnp.max(scores, axis=-1)  # [T, K, group]
    dead = m <= MIN_MASK / 2
    safe_m = jnp.where(dead, 0.0, m)
    e = jnp.where(mask[:, None, None, :],
                  jnp.exp(scores - safe_m[..., None]), 0.0)
    denom = jnp.sum(e, axis=-1)
    out = jnp.einsum("tkgs,tskd->tkgd", e, v)
    m_out = jnp.where(dead, -jnp.inf, safe_m)
    return (out.reshape(num_tokens, num_q_heads, head_dim),
            denom.reshape(num_tokens, num_q_heads),
            m_out.reshape(num_tokens, num_q_heads))


def dcp_paged_attention(
    q: jax.Array,  # [T, Hq, D] (replicated)
    kv_cache: jax.Array,  # [P, page, 2K, D], pages sharded over axis
    block_tables: jax.Array,  # [R, max_pages] GLOBAL page ids
    query_start_loc: jax.Array,
    seq_lens: jax.Array,
    sm_scale: float,
    mesh: Mesh,
    axis: str = "model",
) -> jax.Array:
    """Context-parallel ragged paged attention: each shard attends
    over its pages, partials merge exactly by LSE."""
    n = mesh.shape[axis]

    def shard_fn(q, kv_local, bt, qsl, sl):
        shard = jax.lax.axis_index(axis)
        bt_local = localize_block_tables(bt, shard, n)
        out, denom, m = partial_paged_attention(
            q, kv_local, bt_local, qsl, sl, sm_scale)
        m_glob = jax.lax.pmax(m, axis)  # [T, Hq]
        safe = jnp.where(jnp.isfinite(m_glob), m_glob, 0.0)
        scale = jnp.where(jnp.isfinite(m), jnp.exp(m - safe), 0.0)
        num = jax.lax.psum(out * scale[..., None], axis)
        den = jax.lax.psum(denom * scale, axis)
        return (num / jnp.maximum(den, 1e-30)[..., None]).astype(
            q.dtype)

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P()),
        out_specs=P(),
    )(q, kv_cache, block_tables, query_start_loc, seq_lens)
