"""Attention layer application + per-step metadata.

The reference routes attention through an opaque custom op carrying a
thread-local forward context (vllm/attention/layer.py:557,
vllm/forward_context.py). TPU-native: the metadata is an explicit pytree
argument threaded through the jitted step — no globals, no context
objects, fully trace-friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vllm_main_modify_tpu.ops.attention import ragged_paged_attention
from vllm_main_modify_tpu.ops.kv_cache import (
    QuantizedKV, dequantize_kv_pages, write_to_kv_cache,
    write_to_kv_cache_paged_quant, write_to_kv_cache_quant)

# --------------------------------------------------------------------
# DCP (decode context parallel) trace-time context. Set by the model
# runner when ParallelConfig.decode_context_parallel_size > 1 — KV
# pages then shard across the mesh's model axis (interleaved by global
# page id) and attention() takes the shard_map partial+LSE-merge path
# below instead of the plain GSPMD path. This is a module-level value
# read at TRACE time (like the use_pallas platform default): one
# process traces one DCP configuration; the runner resets it on
# shutdown. Reference: mla/common.py:487-700.
_DCP_CTX: Optional[tuple] = None  # (mesh, axis_name, n_shards)


def set_dcp_context(ctx: Optional[tuple]) -> None:
    global _DCP_CTX
    _DCP_CTX = ctx


def get_dcp_context() -> Optional[tuple]:
    return _DCP_CTX


class AttentionMetadata(NamedTuple):
    """Static-shape per-step attention inputs (padded).

    Mirrors the information content of the reference's
    PallasMetadata/FlashAttentionMetadata builders."""

    block_tables: jax.Array  # [R, max_pages] int32
    query_start_loc: jax.Array  # [R+1] int32
    seq_lens: jax.Array  # [R] int32
    slot_mapping: jax.Array  # [T] int32 flat slots, -1 pad
    num_seqs: jax.Array  # [1] int32 — real request count
    # Pallas KV-update slice metadata (None on the XLA/CPU path):
    # [3, S] (cache_start, new_start, len) + real count [1]
    kv_update_slices: Optional[jax.Array] = None
    num_kv_update_slices: Optional[jax.Array] = None
    # multi-LoRA: adapter slot per token (0 = no adapter); carried in
    # the metadata pytree so models stay (params, inputs) pure fns
    token_lora_slots: Optional[jax.Array] = None
    # encoder-decoder cross-attention (Whisper): pages of the separate
    # cross-KV pool per request + encoder lengths
    cross_block_tables: Optional[jax.Array] = None  # [R, max_cp]
    cross_seq_lens: Optional[jax.Array] = None  # [R]
    # bidirectional spans (Gemma3 image blocks / PaliGemma prefix-LM):
    # [R, S, 2] absolute kv positions [start, end) per request; tokens
    # whose query AND key positions fall inside the same span attend
    # without the causal restriction. -1 rows are padding.
    bidir_spans: Optional[jax.Array] = None
    # hybrid KV groups (core/kv_cache_interface.py): per-group paging
    # overrides for groups 1..N-1; group 0 lives in the base fields
    groups: tuple = ()
    # cascade (shared-prefix) attention: STATIC page count every
    # scheduled request shares at the front of its block table (0 =
    # off). Always a trace-time Python int — the runner builds the
    # metadata inside the jitted step. Reference:
    # gpu_model_runner.py:1293.
    cascade_pages: int = 0
    # STATIC trace-time flag: every sequence in this dispatch has
    # exactly one query token at row s == seq s (decode-chunk scan) —
    # routes the Pallas kernel to its decode specialization
    pure_decode: bool = False

    def for_group(self, g: int) -> "AttentionMetadata":
        """Metadata view for KV group ``g`` — substitutes the paging
        fields, shares the ragged layout (query_start_loc etc.)."""
        if g == 0:
            return self
        gm = self.groups[g - 1]
        return self._replace(block_tables=gm.block_tables,
                             slot_mapping=gm.slot_mapping,
                             kv_update_slices=gm.kv_update_slices,
                             num_kv_update_slices=gm.num_kv_update_slices,
                             groups=())


class KVGroupMeta(NamedTuple):
    """Paging inputs of one extra KV group (hybrid models)."""

    block_tables: jax.Array  # [R, max_pages]
    slot_mapping: jax.Array  # [T]
    kv_update_slices: Optional[jax.Array] = None  # [3, S]
    num_kv_update_slices: Optional[jax.Array] = None  # [1]
    state_slots: Optional[jax.Array] = None  # [R] (mamba groups)
    # [R] 1 when this step holds the request's first tokens (its
    # reused slot's stale state must not carry in)
    state_fresh: Optional[jax.Array] = None


def attention(
    q: jax.Array,  # [T, Hq, D]
    k: jax.Array,  # [T, Hk, D] (this step's new keys, post-rope)
    v: jax.Array,  # [T, Hk, D]
    kv_caches: jax.Array,  # [L, P, page, 2*Hk, D] FULL stacked cache
    layer_idx,  # traced int32 — which layer's pages to touch
    meta: AttentionMetadata,
    sm_scale: float,
    sliding_window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    alibi_slopes: Optional[tuple] = None,
    sinks: Optional[jax.Array] = None,  # [Hq] learned sink logits
    chunk_size: Optional[int] = None,  # Llama4 chunked local attn
    bidir_spans: Optional[jax.Array] = None,  # [R, S, 2]
    write_kv: bool = True,  # False: READ-ONLY reuse of layer_idx's
    # pages (Gemma3n KV sharing — the source layer already wrote this
    # step's K/V earlier in the same forward)
) -> tuple[jax.Array, jax.Array]:
    """Write new KV into this layer's pages of the FULL cache, then
    ragged paged attention over them. The cache is a loop carry updated
    by in-place scatters (one stacked array + per-layer page offsets);
    a per-layer scan output would allocate a second full-size KV buffer
    — the 2x HBM bug this layout exists to avoid.

    Returns (attn_out [T, Hq, D], updated kv_caches)."""
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if bidir_spans is None:
        bidir_spans = meta.bidir_spans
    if isinstance(kv_caches, QuantizedKV):
        assert _DCP_CTX is None, \
            "int8 KV cache + DCP not supported yet"
        return _quantized_attention(
            q, k, v, kv_caches, layer_idx, meta, sm_scale,
            sliding_window, logit_softcap, use_pallas, alibi_slopes,
            sinks, chunk_size, bidir_spans, write_kv)
    if isinstance(meta.cascade_pages, int) and meta.cascade_pages \
            and not use_pallas and \
            sliding_window is None and logit_softcap is None and \
            sinks is None and chunk_size is None and \
            bidir_spans is None and alibi_slopes is None and \
            _DCP_CTX is None:
        # (isinstance: when metadata crosses a jit boundary as an
        # ARGUMENT — tests, entry() — the field arrives traced and
        # cascade simply stays off; the runner builds metadata inside
        # the step, where the field is a trace-time Python int)
        # cascade path (XLA; the Pallas fast-path is future work):
        # write KV normally, then the two-pass shared-prefix read
        num_kv_heads, head_dim = k.shape[-2], k.shape[-1]
        width = 2 * num_kv_heads * head_dim
        if kv_caches.ndim == 5:
            nl, np_, ps = kv_caches.shape[:3]
            wide = kv_caches.reshape(nl, np_, ps, width)
        else:
            wide = kv_caches
            nl, np_, ps = wide.shape[:3]
        flat = wide.reshape(nl * np_, ps, width)
        row_offset = layer_idx * (np_ * ps)
        if meta.kv_update_slices is not None:
            from vllm_main_modify_tpu.ops.kv_cache import \
                write_to_kv_cache_paged

            flat = write_to_kv_cache_paged(flat, k, v,
                                           meta.kv_update_slices,
                                           meta.num_kv_update_slices,
                                           row_offset=row_offset)
        else:
            slots = jnp.where(meta.slot_mapping >= 0,
                              meta.slot_mapping + row_offset, -1)
            flat = write_to_kv_cache(flat, k, v, slots)
        from vllm_main_modify_tpu.ops.attention import \
            cascade_ragged_attention_xla

        out = cascade_ragged_attention_xla(
            q, flat.reshape(nl * np_, ps, 2 * num_kv_heads, head_dim),
            meta.block_tables + layer_idx * np_,
            meta.query_start_loc, meta.seq_lens, sm_scale,
            common_pages=meta.cascade_pages)
        return out, flat.reshape(kv_caches.shape)
    if _DCP_CTX is not None:
        assert sliding_window is None and logit_softcap is None and \
            sinks is None and chunk_size is None and \
            bidir_spans is None and alibi_slopes is None, \
            "DCP supports plain causal full attention only"
        return _dcp_attention(q, k, v, kv_caches, layer_idx, meta,
                              sm_scale)
    num_kv_heads, head_dim = k.shape[-2], k.shape[-1]
    width = 2 * num_kv_heads * head_dim
    if kv_caches.ndim == 5:
        # test/CPU convenience layout [L, P, page, 2K, D] — merge to
        # width (free when unsharded; the runner's cache is stored
        # width-native because merging a head-SHARDED axis is a full
        # layout copy under GSPMD)
        num_layers, num_pages, page_size = kv_caches.shape[:3]
        wide = kv_caches.reshape(num_layers, num_pages, page_size,
                                 width)
    else:
        wide = kv_caches
        num_layers, num_pages, page_size = wide.shape[:3]
    flat = wide.reshape(num_layers * num_pages, page_size, width)
    row_offset = layer_idx * (num_pages * page_size)
    if not write_kv:
        pass  # KV-shared layer: read the source layer's pages as-is
    elif meta.kv_update_slices is not None and not (
            isinstance(meta.pure_decode, bool) and meta.pure_decode
            and meta.slot_mapping is not None):
        from vllm_main_modify_tpu.ops.kv_cache import \
            write_to_kv_cache_paged

        flat = write_to_kv_cache_paged(flat, k, v,
                                       meta.kv_update_slices,
                                       meta.num_kv_update_slices,
                                       row_offset=row_offset)
    else:
        # pure decode writes one row per request: the direct row
        # scatter moves ~0.13 MB vs the page-RMW's ~25 MB of whole-
        # page traffic (measured 13 vs 43 us/layer, width-native
        # cache; the RMW path remains the prefill/mixed-step choice
        # where slices span many rows)
        slots = jnp.where(meta.slot_mapping >= 0,
                          meta.slot_mapping + row_offset, -1)
        flat = write_to_kv_cache(flat, k, v, slots)
    out = ragged_paged_attention(
        q,
        flat,
        meta.block_tables,
        meta.query_start_loc,
        meta.seq_lens,
        sm_scale,
        num_kv_heads=num_kv_heads,
        sliding_window=sliding_window,
        logit_softcap=logit_softcap,
        use_pallas=use_pallas,
        num_seqs=meta.num_seqs,
        page_base=layer_idx * num_pages,
        alibi_slopes=alibi_slopes,
        sinks=sinks,
        chunk_size=chunk_size,
        bidir_spans=bidir_spans,
        pure_decode=(isinstance(meta.pure_decode, bool)
                     and meta.pure_decode),
    )
    return out, flat.reshape(kv_caches.shape)


def _quantized_attention(
    q: jax.Array,  # [T, Hq, D]
    k: jax.Array,  # [T, Hk, D]
    v: jax.Array,
    kv_caches: QuantizedKV,  # data [L, P, page, W] int8 (or 5-D
    # [L, P, page, 2K, D]); scales [L, P, page, 2] f32
    layer_idx,
    meta: AttentionMetadata,
    sm_scale: float,
    sliding_window,
    logit_softcap,
    use_pallas: bool,
    alibi_slopes,
    sinks,
    chunk_size,
    bidir_spans,
    write_kv: bool,
) -> tuple[jax.Array, QuantizedKV]:
    """INT8 paged-KV attention (reference capability:
    pallas.py:29,335-343 int8 kv-cache quantization — here with
    dynamic per-token scales, see ops/kv_cache.py QuantizedKV).

    Write path quantizes this step's K/V rows and records their
    scales; read path streams int8 pages + [2, page] scale blocks into
    the Pallas kernel (native int8→bf16 upcast + two [rows, kv] VPU
    multiplies). The XLA/CPU path dequantizes the cache and runs the
    bf16 oracle."""
    data, scales = kv_caches
    num_kv_heads, head_dim = k.shape[-2], k.shape[-1]
    width = 2 * num_kv_heads * head_dim
    orig_shape = data.shape
    if data.ndim == 5:
        num_layers, num_pages, page_size = data.shape[:3]
        data = data.reshape(num_layers, num_pages, page_size, width)
    else:
        num_layers, num_pages, page_size = data.shape[:3]
    flat = data.reshape(num_layers * num_pages, page_size, width)
    sflat = scales.reshape(num_layers * num_pages, page_size, 2)
    row_offset = layer_idx * (num_pages * page_size)
    qkv = QuantizedKV(flat, sflat)
    if not write_kv:
        pass  # KV-shared layer: read the source layer's pages as-is
    elif meta.kv_update_slices is not None:
        # NOTE: unlike the bf16 path, pure-decode steps stay on the
        # page-RMW here — the int8 row scatter + thin [T, 2] scale
        # scatter measured ~5x slower than the RMW on v5e (int8
        # (32,128) tiling makes sub-page row scatters layout-hostile)
        qkv = write_to_kv_cache_paged_quant(qkv, k, v,
                                            meta.kv_update_slices,
                                            meta.num_kv_update_slices,
                                            row_offset=row_offset)
    else:
        qkv = write_to_kv_cache_quant(qkv, k, v, meta.slot_mapping,
                                      row_offset=row_offset)
    if use_pallas:
        out = ragged_paged_attention(
            q, qkv.data, meta.block_tables, meta.query_start_loc,
            meta.seq_lens, sm_scale, num_kv_heads=num_kv_heads,
            sliding_window=sliding_window, logit_softcap=logit_softcap,
            use_pallas=True, num_seqs=meta.num_seqs,
            page_base=layer_idx * num_pages,
            alibi_slopes=alibi_slopes, sinks=sinks,
            chunk_size=chunk_size, bidir_spans=bidir_spans,
            pure_decode=(isinstance(meta.pure_decode, bool)
                         and meta.pure_decode),
            kv_scales=qkv.scales)
    else:
        deq = dequantize_kv_pages(qkv.data, qkv.scales, num_kv_heads,
                                  head_dim, out_dtype=q.dtype)
        out = ragged_paged_attention(
            q, deq, meta.block_tables, meta.query_start_loc,
            meta.seq_lens, sm_scale, num_kv_heads=num_kv_heads,
            sliding_window=sliding_window, logit_softcap=logit_softcap,
            use_pallas=False, num_seqs=meta.num_seqs,
            page_base=layer_idx * num_pages,
            alibi_slopes=alibi_slopes, sinks=sinks,
            chunk_size=chunk_size, bidir_spans=bidir_spans)
    return out, QuantizedKV(qkv.data.reshape(orig_shape),
                            qkv.scales.reshape(scales.shape))


def _dcp_attention(
    q: jax.Array,  # [T, Hq, D]
    k: jax.Array,  # [T, Hk, D]
    v: jax.Array,  # [T, Hk, D]
    kv_caches: jax.Array,  # [L, P, page, 2*Hk*D], P sharded over axis
    layer_idx,  # traced int32
    meta: "AttentionMetadata",
    sm_scale: float,
) -> tuple[jax.Array, jax.Array]:
    """Decode-context-parallel attention (reference:
    mla/common.py:487-700 + cp_gather_cache): global page id g lives
    on shard g % n at local row g // n; each shard writes/reads ITS
    pages only and the exact softmax is recovered with the streaming
    LSE merge (ops/dcp.py) — one psum pair over ICI, no KV allgather.
    Host-side state (block tables, slot mapping) stays GLOBAL; the
    localization happens inside the shard_map region."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as PS

    from vllm_main_modify_tpu.ops.dcp import (localize_block_tables,
                                              partial_paged_attention)
    from vllm_main_modify_tpu.ops.kv_cache import \
        write_to_kv_cache_paged

    mesh, axis, n = _DCP_CTX
    num_kv_heads, head_dim = k.shape[-2], k.shape[-1]
    width = 2 * num_kv_heads * head_dim
    if kv_caches.ndim == 5:
        num_layers, num_pages, page_size = kv_caches.shape[:3]
        wide = kv_caches.reshape(num_layers, num_pages, page_size,
                                 width)
    else:
        wide = kv_caches
        num_layers, num_pages, page_size = wide.shape[:3]
    pl_pages = num_pages // n  # local pages per shard
    slices = meta.kv_update_slices
    has_slices = slices is not None
    nsl = meta.num_kv_update_slices

    def shard_fn(wide_local, li, q, kk, vv, bt, qsl, sl, slots,
                 slc, nslc):
        shard = jax.lax.axis_index(axis)
        row_off = li * (pl_pages * page_size)
        flat = wide_local.reshape(num_layers * pl_pages, page_size,
                                  width)
        if has_slices:
            # localize page-RMW slices: remote slices get length 0
            # (dropped by write_to_kv_cache_paged)
            g = slc[0] // page_size
            off = slc[0] % page_size
            mine = (g % n) == shard
            local_start = (g // n) * page_size + off
            slc_local = jnp.stack([
                jnp.where(mine, local_start, 0), slc[1],
                jnp.where(mine, slc[2], 0)
            ])
            flat = write_to_kv_cache_paged(flat, kk, vv, slc_local,
                                           nslc, row_offset=row_off)
        else:
            g = slots // page_size
            off = slots % page_size
            mine = (slots >= 0) & ((g % n) == shard)
            lslot = (g // n) * page_size + off + row_off
            flat = write_to_kv_cache(flat, kk, vv,
                                     jnp.where(mine, lslot, -1))
        bt_local = localize_block_tables(bt, shard, n)
        bt_off = jnp.where(bt_local >= 0, bt_local + li * pl_pages,
                           -1)
        kvl = flat.reshape(num_layers * pl_pages, page_size,
                           2 * num_kv_heads, head_dim)
        out, denom, m = partial_paged_attention(q, kvl, bt_off, qsl,
                                                sl, sm_scale)
        m_glob = jax.lax.pmax(m, axis)
        safe = jnp.where(jnp.isfinite(m_glob), m_glob, 0.0)
        scale = jnp.where(jnp.isfinite(m), jnp.exp(m - safe), 0.0)
        num = jax.lax.psum(out * scale[..., None], axis)
        den = jax.lax.psum(denom * scale, axis)
        o = (num / jnp.maximum(den, 1e-30)[..., None]).astype(q.dtype)
        return o, flat.reshape(wide_local.shape)

    zero = jnp.zeros((1, ), jnp.int32)
    out, wide2 = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(PS(None, axis), PS(), PS(), PS(), PS(), PS(), PS(),
                  PS(), PS(), PS(), PS()),
        out_specs=(PS(), PS(None, axis)),
    )(wide, jnp.asarray(layer_idx, jnp.int32), q, k, v,
      meta.block_tables, meta.query_start_loc, meta.seq_lens,
      meta.slot_mapping,
      slices if has_slices else zero,
      nsl if has_slices else zero)
    return out, wide2.reshape(kv_caches.shape)


def cross_attention(
    q: jax.Array,  # [T, Hq, D]
    cross_kv_cache: jax.Array,  # [L, P2, page, 2*Hk*D] read-only
    layer_idx,
    meta: AttentionMetadata,
    sm_scale: float,
    num_kv_heads: int,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Encoder-decoder cross attention (reference capability:
    CrossAttentionSpec + whisper.py): every decoder token attends
    NON-causally to its request's encoder states, which live in a
    separate paged pool written once at ingest. Same ragged kernel,
    causal mask off, no KV write."""
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    num_layers, num_pages, page_size = cross_kv_cache.shape[:3]
    flat = cross_kv_cache.reshape(num_layers * num_pages, page_size,
                                  cross_kv_cache.shape[-1])
    return ragged_paged_attention(
        q,
        flat,
        meta.cross_block_tables,
        meta.query_start_loc,
        meta.cross_seq_lens,
        sm_scale,
        num_kv_heads=num_kv_heads,
        use_pallas=use_pallas,
        num_seqs=meta.num_seqs,
        page_base=layer_idx * num_pages,
        causal=False,
    )
