"""Ragged paged attention — XLA reference implementation + dispatch.

The unified prefill+decode attention over a paged KV cache (reference
capability: csrc/attention/ paged-attention kernels +
vllm/v1/attention/backends/pallas.py ragged_paged_attention; see also
PAPERS.md "Ragged Paged Attention"). Queries for all scheduled requests
are packed ragged into one [T, H, D] array; per-request spans come from
``query_start_loc``. Each query token attends to its request's KV pages
causally.

This file holds the pure-XLA implementation — the CPU/test oracle and
fallback. The production Pallas kernel lives in ops/pallas/ragged_attn.py
and must match this to ~1e-2 (bf16) / 1e-5 (f32).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

MIN_MASK = -0.7 * float(jnp.finfo(jnp.float32).max)


def _searchsorted_seq_ids(query_start_loc: jax.Array,
                          num_tokens: int) -> jax.Array:
    """seq id for each packed query token: s(t) with
    query_start_loc[s] <= t < query_start_loc[s+1]."""
    token_ids = jnp.arange(num_tokens, dtype=jnp.int32)
    # padded rows of query_start_loc repeat the final cumsum, so padded
    # tokens map to the last (padded) sequence
    return (jnp.searchsorted(
        query_start_loc, token_ids, side="right").astype(jnp.int32) - 1)


def ragged_paged_attention_xla(
    q: jax.Array,  # [T, num_q_heads, head_dim]
    kv_cache: jax.Array,  # [P, page_size, 2*num_kv_heads, head_dim]
    block_tables: jax.Array,  # [R, max_pages] int32
    query_start_loc: jax.Array,  # [R+1] int32 cumulative q lens
    seq_lens: jax.Array,  # [R] int32 total kv len per seq
    sm_scale: float,
    sliding_window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    causal: bool = True,
    alibi_slopes: Optional[tuple] = None,
    sinks: Optional[jax.Array] = None,  # [num_q_heads] f32
    chunk_size: Optional[int] = None,  # Llama4 chunked local attention
    bidir_spans: Optional[jax.Array] = None,  # [R, S, 2] kv positions
) -> jax.Array:
    """Token-parallel reference: each token gathers its request's pages.

    O(T * max_kv) memory — fine for tests/CPU; the Pallas kernel is the
    production path.

    ``sinks`` (GPT-OSS): a learned per-q-head logit that joins the
    softmax but contributes no value — it only inflates the
    denominator (reference: gpt_oss.py:78-120 + HF
    eager_attention_forward sink concat).
    """
    num_tokens, num_q_heads, head_dim = q.shape
    num_pages, page_size, two_k, _ = kv_cache.shape
    num_kv_heads = two_k // 2
    num_reqs, max_pages = block_tables.shape
    max_kv = max_pages * page_size
    group = num_q_heads // num_kv_heads

    seq_ids = _searchsorted_seq_ids(query_start_loc, num_tokens)
    seq_ids = jnp.clip(seq_ids, 0, num_reqs - 1)

    # kv position of each query token within its sequence: the i-th of a
    # request's q tokens lands at seq_len - q_len + i
    q_pos_in_seq = (jnp.arange(num_tokens, dtype=jnp.int32) -
                    query_start_loc[seq_ids])
    q_len = query_start_loc[seq_ids + 1] - query_start_loc[seq_ids]
    kv_pos = seq_lens[seq_ids] - q_len + q_pos_in_seq  # [T]

    # gather each token's pages → [T, max_kv, 2K, D]
    pages = block_tables[seq_ids]  # [T, max_pages]
    kv = kv_cache[pages]  # [T, max_pages, page, 2K, D]
    kv = kv.reshape(num_tokens, max_kv, two_k, head_dim)
    k = kv[:, :, 0::2, :]  # [T, max_kv, K, D]
    v = kv[:, :, 1::2, :]

    qf = q.astype(jnp.float32).reshape(num_tokens, num_kv_heads, group,
                                       head_dim)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # scores: [T, K, group, max_kv]
    scores = jnp.einsum("tkgd,tskd->tkgs", qf, kf) * sm_scale
    if alibi_slopes is not None:
        # ALiBi: bias = slope_h * (kv_idx - q_pos) (<= 0 in the causal
        # region); reference: BLOOM/MPT positional scheme
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(
            num_kv_heads, group)
        kv_idx_b = jnp.arange(max_kv, dtype=jnp.int32)[None, :]
        dist = (kv_idx_b - kv_pos[:, None]).astype(jnp.float32)
        scores = scores + slopes[None, :, :, None] * \
            dist[:, None, None, :]
    if logit_softcap is not None and logit_softcap > 0:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap

    kv_idx = jnp.arange(max_kv, dtype=jnp.int32)[None, :]  # [1, max_kv]
    in_len = kv_idx < seq_lens[seq_ids][:, None]
    mask = in_len
    if causal:
        mask = mask & (kv_idx <= kv_pos[:, None])
    if sliding_window is not None and sliding_window > 0:
        mask &= kv_idx > (kv_pos[:, None] - sliding_window)
    if chunk_size is not None and chunk_size > 0:
        # Llama4 chunked local attention: tokens attend only within
        # their own chunk (reference:
        # vllm/attention/layers/chunked_local_attention.py)
        mask &= (kv_idx // chunk_size) == (kv_pos[:, None] //
                                           chunk_size)
    if causal and bidir_spans is not None:
        # Gemma3 image blocks / PaliGemma prefix-LM: query and key
        # positions inside the SAME span attend bidirectionally,
        # bypassing causal AND window restrictions (HF or_mask
        # semantics; reference: gemma3_mm.py per-request image masks)
        spans = bidir_spans[seq_ids]  # [T, S, 2]
        lo, hi = spans[..., 0], spans[..., 1]  # [T, S]
        q_in = (kv_pos[:, None] >= lo) & (kv_pos[:, None] < hi)
        k_in = (kv_idx[:, :, None] >= lo[:, None, :]) & \
            (kv_idx[:, :, None] < hi[:, None, :])  # [T, max_kv, S]
        bid = jnp.any(q_in[:, None, :] & k_in, axis=-1)  # [T, kv]
        mask = mask | (in_len & bid)
    scores = jnp.where(mask[:, None, None, :], scores, MIN_MASK)

    if sinks is not None:
        s = sinks.astype(jnp.float32).reshape(num_kv_heads, group)
        m = jnp.maximum(jnp.max(scores, axis=-1), s[None])  # [T,K,g]
        p = jnp.exp(scores - m[..., None])
        p = jnp.where(mask[:, None, None, :], p, 0.0)
        denom = p.sum(axis=-1) + jnp.exp(s[None] - m)
        out = jnp.einsum("tkgs,tskd->tkgd", p, vf) / denom[..., None]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("tkgs,tskd->tkgd", probs, vf)
    return out.reshape(num_tokens, num_q_heads,
                       head_dim).astype(q.dtype)


def ragged_paged_attention(
    q: jax.Array,
    kv_cache: jax.Array,  # [P,page,2K,D] or width [P,page,2K*D]
    block_tables: jax.Array,
    query_start_loc: jax.Array,
    seq_lens: jax.Array,
    sm_scale: float,
    num_kv_heads: Optional[int] = None,
    sliding_window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    num_seqs: Optional[jax.Array] = None,
    page_base=0,
    causal: bool = True,
    alibi_slopes: Optional[tuple] = None,
    sinks: Optional[jax.Array] = None,
    chunk_size: Optional[int] = None,
    bidir_spans: Optional[jax.Array] = None,
    pure_decode: bool = False,
    kv_scales: Optional[jax.Array] = None,  # int8 KV per-token scales
) -> jax.Array:
    """Dispatch: Pallas kernel on TPU, XLA reference elsewhere.
    ``page_base`` offsets block-table entries into a stacked
    multi-layer page pool (layer_idx * num_pages). ``kv_scales``
    ([P, page, 2] f32) rides only the Pallas path — the XLA oracle
    takes a pre-dequantized cache (layers/attention.py)."""
    if use_pallas is None:
        # platform of the actual devices, not default_backend(): the
        # axon TPU plugin can override JAX_PLATFORMS=cpu, but a forced
        # host platform still reports cpu devices here
        use_pallas = jax.devices()[0].platform in ("tpu", )
    if num_kv_heads is None:
        assert kv_cache.ndim == 4
        num_kv_heads = kv_cache.shape[2] // 2
    if use_pallas:
        from vllm_main_modify_tpu.ops.pallas.ragged_attn import \
            ragged_paged_attention_pallas

        return ragged_paged_attention_pallas(
            q, kv_cache, block_tables, query_start_loc, seq_lens,
            sm_scale, num_kv_heads=num_kv_heads,
            sliding_window=sliding_window,
            logit_softcap=logit_softcap, num_seqs=num_seqs,
            page_base=page_base, causal=causal,
            alibi_slopes=alibi_slopes, sinks=sinks,
            chunk_size=chunk_size, bidir_spans=bidir_spans,
            pure_decode=pure_decode, kv_scales=kv_scales)
    assert kv_scales is None, \
        "XLA path takes a dequantized cache, not scales"
    bt = block_tables + page_base if page_base is not None else \
        block_tables
    if kv_cache.ndim == 3:
        # width layout → head layout (free on CPU, oracle-only there)
        p_, page = kv_cache.shape[:2]
        head_dim = q.shape[-1]
        kv_cache = kv_cache.reshape(p_, page, 2 * num_kv_heads,
                                    head_dim)
    return ragged_paged_attention_xla(q, kv_cache, bt,
                                      query_start_loc, seq_lens, sm_scale,
                                      causal=causal,
                                      alibi_slopes=alibi_slopes,
                                      sliding_window=sliding_window,
                                      logit_softcap=logit_softcap,
                                      sinks=sinks,
                                      chunk_size=chunk_size,
                                      bidir_spans=bidir_spans)


def cascade_ragged_attention_xla(
    q: jax.Array,  # [T, num_q_heads, head_dim]
    kv_cache: jax.Array,  # [P, page, 2K, D]
    block_tables: jax.Array,  # [R, max_pages] (page_base applied)
    query_start_loc: jax.Array,  # [R+1]
    seq_lens: jax.Array,  # [R]
    sm_scale: float,
    common_pages: int,  # STATIC: shared-prefix pages (>0)
) -> jax.Array:
    """Cascade (shared-prefix) attention — reference:
    gpu_model_runner.py:1293 cascade detection + FlashInfer cascade
    kernels. Every scheduled request shares its first ``common_pages``
    KV pages and every query position lies strictly past them, so:

    - PREFIX pass: gather the common pages ONCE (T-independent — the
      baseline re-gathers them per token) and attend all queries to
      them without a mask (all positions valid, all causal);
    - SUFFIX pass: the ordinary ragged path over the statically
      sliced table tail (max_pages - common_pages wide — fewer bytes);
    - exact LSE merge of the two partials (same math as ops/dcp.py).
    """
    num_tokens, num_q_heads, head_dim = q.shape
    _, page_size, two_k, _ = kv_cache.shape
    num_kv_heads = two_k // 2
    group = num_q_heads // num_kv_heads
    cp = common_pages * page_size

    # ---- prefix pass (one gather for the whole batch)
    common = block_tables[0, :common_pages]  # [C]
    kvc = kv_cache[common].reshape(cp, two_k, head_dim)
    kc = kvc[:, 0::2, :].astype(jnp.float32)  # [cp, K, D]
    vc = kvc[:, 1::2, :].astype(jnp.float32)
    qf = q.astype(jnp.float32).reshape(num_tokens, num_kv_heads,
                                       group, head_dim)
    sc = jnp.einsum("tkgd,skd->tkgs", qf, kc) * sm_scale
    m1 = jnp.max(sc, axis=-1)  # [T, K, g]
    e1 = jnp.exp(sc - m1[..., None])
    d1 = jnp.sum(e1, axis=-1)
    o1 = jnp.einsum("tkgs,skd->tkgd", e1, vc)

    # ---- suffix pass (positions relative to the suffix start: pages
    # and lengths both shift by the prefix, so the causal mask in the
    # partial path is exact)
    from vllm_main_modify_tpu.ops.dcp import partial_paged_attention

    o2, d2, m2 = partial_paged_attention(
        q, kv_cache, block_tables[:, common_pages:], query_start_loc,
        jnp.maximum(seq_lens - cp, 0), sm_scale)
    o2 = o2.reshape(num_tokens, num_kv_heads, group, head_dim)
    d2 = d2.reshape(num_tokens, num_kv_heads, group)
    m2 = m2.reshape(num_tokens, num_kv_heads, group)

    # ---- exact LSE merge
    m = jnp.maximum(m1, jnp.where(jnp.isfinite(m2), m2, m1))
    s1 = jnp.exp(m1 - m)
    s2 = jnp.where(jnp.isfinite(m2), jnp.exp(m2 - m), 0.0)
    num = o1 * s1[..., None] + o2 * s2[..., None]
    den = d1 * s1 + d2 * s2
    out = num / jnp.maximum(den, 1e-30)[..., None]
    return out.reshape(num_tokens, num_q_heads,
                       head_dim).astype(q.dtype)
