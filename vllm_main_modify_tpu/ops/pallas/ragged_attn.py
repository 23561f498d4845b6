"""Pallas TPU kernel: unified ragged paged attention (prefill+decode).

Replaces the reference's CUDA PagedAttention v1/v2
(csrc/attention/attention_kernels.cuh) and its torch-xla
``ragged_paged_attention`` op (vllm/v1/attention/backends/pallas.py:285)
with a from-scratch TPU design:

- Grid iterates **global q blocks** of the packed [T, Hq, D] query
  array (TPU grid steps are sequential per core, so exclusive row
  ownership beats per-sequence grids: one aligned output DMA per block,
  no masked-row write hazards).
- Work is flattened to (sequence, kv-block) items and **software-
  pipelined with triple-buffered page DMA**: while item i computes,
  item i+1's pages are in flight and item i+2's buffer is free — the
  HBM stream never stalls on sequence boundaries (decode batches are
  many short per-sequence streams; a per-sequence pipeline restarts
  the pipe at every boundary and serializes on DMA latency).
- 2-D HBM layouts ([T, Hq*D], [P*page, 2*Hk*D]) so every DMA slices
  only tile-aligned dims (Mosaic rejects sliced memrefs whose minor
  dims are not tile-aligned, e.g. 12 q heads).
- KV pages stay in the paged layout with K/V interleaved per head, so
  one page DMA fetches both K and V.
- flash-attention style online softmax, f32 accumulators.

Numerical contract: matches ops/attention.py ragged_paged_attention_xla
(the CPU oracle) to bf16 tolerance. Masking: causal within each
sequence, kv < seq_len, optional sliding window and logit softcap.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_main_modify_tpu import envs

NEG_INF = -2.0**30  # large finite: avoids inf-inf NaNs in rescaling

# triple-buffered KV stream (consume i, i+1 in flight, i+2 free)
N_BUF = 3
# decode kernel: items are ~100 ns of HBM service, so DMA latency
# needs a much deeper pipeline (n_buf-1 item DMAs in flight)
N_BUF_DECODE = 8
# VMEM budget for the KV stream buffers
KV_STREAM_BYTES = 4 * 1024 * 1024


def _rpa_kernel(
    # scalar prefetch (SMEM)
    qsl_ref,  # [R+1] query_start_loc
    seq_lens_ref,  # [R]
    block_tables_ref,  # [R, max_pages]
    first_seq_ref,  # [num_q_blocks] first seq overlapping each block
    num_seqs_ref,  # [1]
    page_base_ref,  # [1] page offset into a stacked multi-layer pool
    sinks_ref,  # [num_q_heads] f32 (all-zero dummy when has_sinks=False)
    spans_ref,  # [R, 2*num_spans] bidir spans ([0,0] rows when unused)
    # inputs (HBM)
    q_hbm,  # [T, Hq*D]
    kv_hbm,  # [P*page, 2*Hk*D]
    # then, when has_scales: sc_hbm [R*8, max_kv_pad] f32 — int8-KV
    # scale columns pre-gathered per request (see
    # _gather_scale_columns)
    # output (HBM): o_hbm [T, Hq*D]
    # scratch: q_vmem [BQ, Hq*D], kv_vmem [N_BUF, KVB, 2*Hk*D],
    #   o_vmem [BQ, Hq*D], q_sem, o_sem, kv_sems [N_BUF, NPP],
    #   then when has_scales: sc_vmem [N_BUF, 8, KVB] +
    #   sc_sems [N_BUF]
    *refs,
    sm_scale: float,
    num_q_heads: int,
    num_kv_heads: int,
    head_dim: int,
    page_size: int,
    sliding_window: Optional[int],
    logit_softcap: Optional[float],
    causal: bool,
    alibi_slopes: Optional[tuple],
    has_sinks: bool,
    chunk_size: Optional[int],
    num_spans: int,
    has_scales: bool = False,
):
    it = iter(refs)
    sc_hbm = next(it) if has_scales else None
    o_hbm, q_vmem, kv_vmem, o_vmem, q_sem, o_sem, kv_sems = \
        (next(it) for _ in range(7))
    if has_scales:
        sc_vmem = next(it)
        sc_sems = next(it)
    else:
        sc_vmem = sc_sems = None
    i = pl.program_id(0)
    bq = q_vmem.shape[0]
    kvb = kv_vmem.shape[1]  # kv tokens per stream block
    npp = kvb // page_size
    group = num_q_heads // num_kv_heads
    rows = bq * group
    t0 = i * bq
    num_seqs = num_seqs_ref[0]

    q_copy = pltpu.make_async_copy(q_hbm.at[pl.ds(t0, bq)], q_vmem,
                                   q_sem)
    q_copy.start()

    # ---- work-item iteration ------------------------------------------
    # item = (s, kb): kv block kb of sequence s. Sequences visited are
    # those overlapping this q block with rows and kv.

    def seq_valid(s):
        q_start = qsl_ref[s]
        q_end = qsl_ref[s + 1]
        return ((q_end > q_start) & (q_end > t0) &
                (seq_lens_ref[s] > 0))

    def first_valid_seq(s):
        """Smallest s' >= s that is in-range and valid; returns
        (s', in_range)."""

        def cond(s2):
            in_range = (s2 < num_seqs) & (qsl_ref[s2] < t0 + bq)
            return in_range & jnp.logical_not(seq_valid(s2))

        s2 = jax.lax.while_loop(cond, lambda s2: s2 + 1, s)
        return s2, (s2 < num_seqs) & (qsl_ref[s2] < t0 + bq)

    if causal and num_spans == 0:
        def num_kv_blocks(s):
            # skip kv blocks wholly ABOVE the causal diagonal of every
            # q row this program owns: the largest attended kv index
            # is pos of the last owned row. Halves prefill attention
            # items on average (a q block early in a long sequence
            # never streams the sequence's tail pages). Disabled for
            # bidirectional spans — a span may live above the
            # diagonal.
            q_start = qsl_ref[s]
            q_end = qsl_ref[s + 1]
            kv_len = seq_lens_ref[s]
            pos_max = (kv_len - (q_end - q_start) +
                       jnp.minimum(t0 + bq, q_end) - 1 - q_start)
            return jnp.minimum(pl.cdiv(kv_len, kvb),
                               pl.cdiv(pos_max + 1, kvb))
    else:
        def num_kv_blocks(s):
            return pl.cdiv(seq_lens_ref[s], kvb)

    if sliding_window is not None and num_spans == 0:
        # skip kv blocks wholly behind the window of every q row this
        # program owns for sequence s: the smallest attended kv index
        # is min(pos) - window + 1. (Disabled when bidirectional spans
        # are active: a span may live behind the window.) Saves DMA +
        # MXU work at long
        # context AND guarantees pages freed behind the window by the
        # hybrid KV manager are never read.
        def first_kv_block(s):
            q_start = qsl_ref[s]
            q_len = qsl_ref[s + 1] - q_start
            pos_min = (seq_lens_ref[s] - q_len +
                       jnp.maximum(t0 - q_start, 0))
            return jnp.maximum((pos_min - sliding_window + 1) // kvb,
                               0).astype(jnp.int32)
    elif chunk_size is not None and num_spans == 0:
        # chunked local attention (Llama4): the smallest attended kv
        # index is the chunk start of the earliest q row. (Disabled
        # when bidirectional spans are active, mirroring the
        # sliding-window guard: a span may live behind the chunk
        # start and its KV blocks must still be read.)
        def first_kv_block(s):
            q_start = qsl_ref[s]
            q_len = qsl_ref[s + 1] - q_start
            pos_min = (seq_lens_ref[s] - q_len +
                       jnp.maximum(t0 - q_start, 0))
            return jnp.maximum(
                (pos_min // chunk_size) * chunk_size // kvb,
                0).astype(jnp.int32)
    else:
        def first_kv_block(s):
            return jnp.int32(0)

    def next_item(s, kb, valid):
        """Successor of item (s, kb)."""

        def advance_seq():
            s2, ok = first_valid_seq(s + 1)
            return s2, first_kv_block(s2), ok

        def same_seq():
            return s, kb + 1, jnp.bool_(True)

        return jax.lax.cond(
            valid & (kb + 1 < num_kv_blocks(s)), same_seq, advance_seq)

    page_base = page_base_ref[0]

    def start_kv_dma(s, kb, slot):
        for j in range(npp):
            page_id = page_base + block_tables_ref[s, kb * npp + j]
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(page_id * page_size, page_size)],
                kv_vmem.at[slot, pl.ds(j * page_size, page_size)],
                kv_sems.at[slot, j]).start()
        if has_scales:
            pltpu.make_async_copy(
                sc_hbm.at[pl.ds(s * 8, 8), pl.ds(kb * kvb, kvb)],
                sc_vmem.at[slot], sc_sems.at[slot]).start()

    def wait_kv_dma(slot):
        for j in range(npp):
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(0, page_size)],
                kv_vmem.at[slot, pl.ds(j * page_size, page_size)],
                kv_sems.at[slot, j]).wait()
        if has_scales:
            pltpu.make_async_copy(
                sc_hbm.at[pl.ds(0, 8), pl.ds(0, kvb)],
                sc_vmem.at[slot], sc_sems.at[slot]).wait()

    # prologue: locate item0, start DMAs for item0 and item1
    s0, v0 = first_valid_seq(first_seq_ref[i])
    kb0 = first_kv_block(s0)

    @pl.when(v0)
    def _():
        start_kv_dma(s0, kb0, 0)

    s1, kb1, v1 = jax.lax.cond(
        v0, lambda: next_item(s0, kb0, v0),
        lambda: (s0, jnp.int32(0), jnp.bool_(False)))

    @pl.when(v1)
    def _():
        start_kv_dma(s1, kb1, 1)

    q_copy.wait()
    q_all = q_vmem[...].reshape(bq, num_q_heads, head_dim)

    # row/column index VECTORS, not [rows, kvb] planes: every mask
    # predicate is built from [rows, 1] (row-only) and [1, kvb]
    # (column-only) pieces that broadcast in the final AND — the old
    # full-plane iota arithmetic issued ~10 VPU ops over rows*kvb i32
    # elements per item, which COST MORE THAN THE QK MATMUL at
    # bq=128/group=6 (768x512 i32 plane = 384 VPU cycles per op)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    b_abs_row = t0 + row_i // group  # [rows, 1] absolute q token
    col1 = jax.lax.broadcasted_iota(jnp.int32, (1, kvb), 1)

    def compute_item(s, kb, slot, m, l, acc):
        q_start = qsl_ref[s]
        q_end = qsl_ref[s + 1]
        kv_len = seq_lens_ref[s]
        q_len = q_end - q_start
        pos = kv_len - q_len + (b_abs_row - q_start)  # [rows, 1]
        row_owned = (b_abs_row >= q_start) & (b_abs_row < q_end)
        kv_idx = kb * kvb + col1  # [1, kvb]
        mask = row_owned & (kv_idx < kv_len)
        if causal:
            mask &= kv_idx <= pos
        if sliding_window is not None:
            mask &= kv_idx > pos - sliding_window
        if chunk_size is not None:
            mask &= (kv_idx // chunk_size) == (pos // chunk_size)
        for si in range(num_spans):
            # bidirectional spans (Gemma3 image blocks / prefix-LM):
            # same-span (q, kv) pairs bypass causal/window limits
            lo = spans_ref[s, 2 * si]
            hi = spans_ref[s, 2 * si + 1]
            bid = (row_owned & (pos >= lo) & (pos < hi) &
                   (kv_idx < kv_len) & (kv_idx >= lo) & (kv_idx < hi))
            mask |= bid

        kv = kv_vmem[slot]
        if kv.dtype != q_all.dtype:
            # quantized (fp8/int8) KV cache: stream 1-byte pages,
            # upcast in VMEM right before the MXU (reference
            # capability: pallas.py:335-343 fp8/int8 kv-cache
            # quantization). Convert the CONTIGUOUS block before any
            # strided head slicing — slicing 8-bit data costs Mosaic
            # element relayouts
            kv = kv.astype(q_all.dtype)
        kv = kv.reshape(kvb, num_kv_heads, 2, head_dim)
        k = kv[:, :, 0, :]  # [KVB, Hk, D]
        v = kv[:, :, 1, :]
        if has_scales:
            # int8 KV: per-token K/V scale columns [1, KVB] applied to
            # the score/probability planes (not the streamed block);
            # pre-gathered, sublane 0 = K scales, 1 = V scales
            k_col_sc = sc_vmem[slot, 0:1, :]
            v_col_sc = sc_vmem[slot, 1:2, :]

        new_m, new_l, new_acc = [], [], []
        for h in range(num_kv_heads):
            qh = q_all[:, h * group:(h + 1) * group, :].reshape(
                rows, head_dim)
            scores = jax.lax.dot_general(
                qh, k[:, h, :],
                dimension_numbers=(((1, ), (1, )), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            if has_scales:
                scores = scores * k_col_sc
            if alibi_slopes is not None:
                # per-row slope: row r of this head block is q head
                # h*group + (r % group). Slopes are python floats —
                # Pallas forbids captured ARRAY constants, so build
                # the column from scalar selects (group is 1 for the
                # MHA ALiBi families, so this is usually one scalar)
                if group == 1:
                    slope_col = float(alibi_slopes[h])
                else:
                    g_idx = jax.lax.rem(
                        jax.lax.broadcasted_iota(
                            jnp.int32, (rows, 1), 0), group)
                    slope_col = jnp.zeros((rows, 1), jnp.float32)
                    for gi in range(group):
                        slope_col = jnp.where(
                            g_idx == gi,
                            float(alibi_slopes[h * group + gi]),
                            slope_col)
                scores = scores + slope_col * (
                    kv_idx - pos).astype(jnp.float32)
            if logit_softcap is not None:
                scores = jnp.tanh(scores / logit_softcap) * logit_softcap
            scores = jnp.where(mask, scores, NEG_INF)

            m_h, l_h, acc_h = m[h], l[h], acc[h]
            m_new = jnp.maximum(m_h,
                                jnp.max(scores, axis=-1, keepdims=True))
            p = jnp.exp(scores - m_new)
            # NEG_INF is finite → fully-masked rows would get exp(0)=1
            p = jnp.where(mask, p, 0.0)
            scale_old = jnp.exp(m_h - m_new)
            l_new = l_h * scale_old + jnp.sum(p, axis=-1, keepdims=True)
            # int8 KV: v_scale folds into p; l keeps the unscaled sum
            pm = ((p * v_col_sc) if has_scales else p).astype(v.dtype)
            pv = jax.lax.dot_general(
                pm, v[:, h, :],
                dimension_numbers=(((1, ), (0, )), ((), ())),
                preferred_element_type=jnp.float32)
            new_m.append(m_new)
            new_l.append(l_new)
            new_acc.append(acc_h * scale_old + pv)
        return jnp.stack(new_m), jnp.stack(new_l), jnp.stack(new_acc)

    # ---- steady-state pipeline ----------------------------------------
    # carry: current item, next item, buffer slot of current, m/l/acc

    def pipe_cond(carry):
        (_, _, valid, *_rest) = carry
        return valid

    def pipe_body(carry):
        (s, kb, valid, ns, nkb, nvalid, slot, m, l, acc) = carry
        # start DMA for the item after next into the free buffer
        n2s, n2kb, n2valid = jax.lax.cond(
            nvalid, lambda: next_item(ns, nkb, nvalid),
            lambda: (ns, nkb, jnp.bool_(False)))

        @pl.when(n2valid)
        def _():
            start_kv_dma(n2s, n2kb, jax.lax.rem(slot + 2, N_BUF))

        wait_kv_dma(slot)
        m, l, acc = compute_item(s, kb, slot, m, l, acc)
        return (ns, nkb, nvalid, n2s, n2kb, n2valid,
                jax.lax.rem(slot + 1, N_BUF), m, l, acc)

    m0 = jnp.full((num_kv_heads, rows, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((num_kv_heads, rows, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((num_kv_heads, rows, head_dim), dtype=jnp.float32)
    carry = (s0, kb0, v0, s1, kb1, v1, jnp.int32(0), m0, l0,
             acc0)
    (*_, m, l, acc) = jax.lax.while_loop(pipe_cond, pipe_body, carry)

    if has_sinks:
        # GPT-OSS attention sinks: a per-q-head logit joins the softmax
        # denominator without a value vector. out =
        # acc·e^(m-m') / (l·e^(m-m') + e^(sink-m')), m' = max(m, sink);
        # rows with no kv (m=NEG_INF, l=0) come out exactly 0.
        outs = []
        for h in range(num_kv_heads):
            svals = [sinks_ref[h * group + gi] for gi in range(group)]
            s_col = jnp.stack(svals)[None, :]  # [1, group]
            s_col = jnp.broadcast_to(s_col, (bq, group)).reshape(
                rows, 1)
            m_t = jnp.maximum(m[h], s_col)
            sc = jnp.exp(m[h] - m_t)
            outs.append((acc[h] * sc) /
                        (l[h] * sc + jnp.exp(s_col - m_t)))
        out = jnp.stack(outs)
    else:
        out = acc / jnp.maximum(l, 1e-20)  # rows with no kv → 0
    # [Hk, BQ*G, D] → [BQ, Hq*D]
    out = out.reshape(num_kv_heads, bq, group, head_dim)
    out = out.transpose(1, 0, 2, 3).reshape(bq, num_q_heads * head_dim)
    o_vmem[...] = out.astype(o_vmem.dtype)
    o_copy = pltpu.make_async_copy(o_vmem, o_hbm.at[pl.ds(t0, bq)],
                                   o_sem)
    o_copy.start()
    o_copy.wait()


def _rpa_decode_kernel(
    # scalar prefetch (SMEM)
    seq_lens_ref,  # [R]
    block_tables_ref,  # [R, max_pages]
    num_seqs_ref,  # [1]
    page_base_ref,  # [1]
    sinks_ref,  # [num_q_heads] f32
    # inputs (HBM)
    q_hbm,  # [T*HqP, W]  block-diagonal q (see wrapper): row
    #         s*HqP + h*group + g holds q head h*group+g in the K
    #         columns of kv head h ([2h*D, 2h*D + D)), zeros elsewhere
    kv_hbm,  # [P*page, W],  W = 2*Hk*D
    # then, when has_scales: sc_hbm [R*8, max_kv_pad] f32 — int8-KV
    # scale columns PRE-GATHERED per request in XLA (row s*8 = seq s's
    # K scales by kv position, s*8+1 = V scales, rows 2-7 padding);
    # a DMA-friendly layout: one [8, KVB] tile-aligned copy per item
    # output (HBM): o_hbm [T*HqP, D]
    # scratch: q_vmem [BS*HqP, W], kv_vmem [N_BUF, KVB, W],
    #   o_vmem [BS*HqP, D], q_sem, o_sem, kv_sems [N_BUF, NPP],
    #   then when kv dtype != q dtype: kv16_vmem [KVB, W],
    #   then when has_scales: sc_vmem [N_BUF, 8, KVB] f32 +
    #   sc_sems [N_BUF]
    *refs,
    sm_scale: float,
    num_q_heads: int,
    hq_pad: int,  # num_q_heads rounded up to a multiple of 8
    num_kv_heads: int,
    head_dim: int,
    page_size: int,
    sliding_window: Optional[int],
    logit_softcap: Optional[float],
    has_sinks: bool,
    chunk_size: Optional[int],
    has_quant: bool = False,  # kv dtype != q dtype (kv16_vmem present)
    has_scales: bool = False,  # int8 KV: per-token scales present
):
    """Decode specialization of the ragged kernel: every sequence has
    exactly ONE query token (row s of the batch). vs the general
    kernel this (a) computes scores only for the OWNING sequence's
    q heads, (b) keeps tiny per-sequence accumulators flushed to the
    output row when the item stream advances to the next sequence,
    and (c) skips page DMAs wholly beyond seq_len (no padding
    traffic).

    All kv heads are processed by ONE matmul pair per sub-block via a
    block-diagonal q layout: q head h*group+g occupies the K columns
    of kv head h in a [HqP, W] tile, so ``q_wide @ kv_block.T``
    contracts each row only against its own head's keys (cross-head
    terms hit zeros), and ``p @ kv_block`` lands each row's PV result
    in its own head's V columns. The 2x MAC overhead is free — these
    matmuls are far under the MXU roofline — while the per-head
    Python loop it replaces issued ~Hk x more VPU/scalar ops per
    item, which dominated decode attention time (the kernel is
    op-issue bound, not bandwidth bound, at ~1 us/item)."""
    it = iter(refs)
    if has_scales:
        sc_hbm = next(it)
    else:
        sc_hbm = None
    o_hbm, q_vmem, kv_vmem, o_vmem, q_sem, o_sem, kv_sems = \
        (next(it) for _ in range(7))
    kv16_vmem = next(it) if has_quant else None
    if has_scales:
        sc_vmem = next(it)
        sc_sems = next(it)
    else:
        sc_vmem = sc_sems = None
    i = pl.program_id(0)
    bs = q_vmem.shape[0] // hq_pad  # sequences per program
    kvb = kv_vmem.shape[1]
    npp = kvb // page_size
    group = num_q_heads // num_kv_heads
    s_base = i * bs
    num_seqs = num_seqs_ref[0]

    q_copy = pltpu.make_async_copy(
        q_hbm.at[pl.ds(s_base * hq_pad, bs * hq_pad)],
        q_vmem, q_sem)
    q_copy.start()
    o_vmem[...] = jnp.zeros_like(o_vmem)

    def seq_valid(s):
        return (s < num_seqs) & (seq_lens_ref[s] > 0)

    def first_valid_seq(s):
        def cond(s2):
            return (s2 < jnp.minimum(s_base + bs, num_seqs)) & \
                jnp.logical_not(seq_valid(s2))

        s2 = jax.lax.while_loop(cond, lambda s2: s2 + 1, s)
        return s2, (s2 < jnp.minimum(s_base + bs, num_seqs))

    def num_kv_blocks(s):
        return pl.cdiv(seq_lens_ref[s], kvb)

    if sliding_window is not None:
        def first_kv_block(s):
            return jnp.maximum(
                (seq_lens_ref[s] - sliding_window) // kvb,
                0).astype(jnp.int32)
    elif chunk_size is not None:
        def first_kv_block(s):
            pos = seq_lens_ref[s] - 1
            return jnp.maximum(
                (pos // chunk_size) * chunk_size // kvb,
                0).astype(jnp.int32)
    else:
        def first_kv_block(s):
            return jnp.int32(0)

    def next_item(s, kb, valid):
        def advance_seq():
            s2, ok = first_valid_seq(s + 1)
            return s2, first_kv_block(s2), ok

        def same_seq():
            return s, kb + 1, jnp.bool_(True)

        return jax.lax.cond(
            valid & (kb + 1 < num_kv_blocks(s)), same_seq, advance_seq)

    page_base = page_base_ref[0]

    # compute sub-blocks are SB columns (defined below); pages beyond
    # the last PARTIAL sub-block are never read (the sub-block skip
    # cond jumps them), so only pages inside ceil(kv_len/SB)*SB need
    # the stale-VMEM zero-fill — the rest skip both the DMA and the
    # store (the fill was ~15 wasted 64 KB stores per 1024-token item
    # at decode ctx ~530)
    SB_FILL = 128 if kvb % 128 == 0 else kvb

    def start_kv_dma(s, kb, slot):
        kv_len = seq_lens_ref[s]
        read_end = ((kv_len + SB_FILL - 1) // SB_FILL) * SB_FILL
        for j in range(npp):
            # skip pages wholly beyond the sequence (padding traffic)
            needed = kb * kvb + j * page_size < kv_len
            touched = kb * kvb + j * page_size < read_end

            @pl.when(needed)
            def _():
                page_id = page_base + \
                    block_tables_ref[s, kb * npp + j]
                pltpu.make_async_copy(
                    kv_hbm.at[pl.ds(page_id * page_size, page_size)],
                    kv_vmem.at[slot, pl.ds(j * page_size, page_size)],
                    kv_sems.at[slot, j]).start()

            @pl.when(jnp.logical_not(needed) & touched)
            def _():
                # stale VMEM can hold NaN/inf bit patterns; masked
                # probabilities are 0 but 0*NaN = NaN in p @ v —
                # zero-fill the read-but-skipped region
                kv_vmem[slot, pl.ds(j * page_size, page_size)] = \
                    jnp.zeros((page_size, kv_vmem.shape[-1]),
                              kv_vmem.dtype)
        if has_scales:
            # one aligned [8, KVB] copy per item; the gathered array
            # always holds finite values (padded table entries gather
            # page 0's scales), so no stale-NaN hazard here
            pltpu.make_async_copy(
                sc_hbm.at[pl.ds(s * 8, 8), pl.ds(kb * kvb, kvb)],
                sc_vmem.at[slot], sc_sems.at[slot]).start()

    def wait_kv_dma(s, kb, slot):
        kv_len = seq_lens_ref[s]
        for j in range(npp):
            @pl.when(kb * kvb + j * page_size < kv_len)
            def _():
                pltpu.make_async_copy(
                    kv_hbm.at[pl.ds(0, page_size)],
                    kv_vmem.at[slot, pl.ds(j * page_size, page_size)],
                    kv_sems.at[slot, j]).wait()
        if has_scales:
            pltpu.make_async_copy(
                sc_hbm.at[pl.ds(0, 8), pl.ds(0, kvb)],
                sc_vmem.at[slot], sc_sems.at[slot]).wait()

    n_buf = kv_vmem.shape[0]
    depth = n_buf - 1  # outstanding prefetches

    s0, v0 = first_valid_seq(s_base)
    kb0 = first_kv_block(s0)
    # DEEP prefetch: decode items are tiny (one 128-token block is
    # ~130 ns of HBM service at narrow widths), so the old 2-deep
    # pipeline stalled on DMA issue→complete latency (~275 ns/item of
    # measured overhead at bs=32, W=512 — 3.1x over the stream
    # roofline). Keep depth = n_buf-1 item DMAs in flight; the item
    # queue is a scalar shift register carried through the while loop
    # (ONE next_item evaluation per iteration, same as before).
    states = [(s0, kb0, v0)]
    for j in range(depth):
        sj, kbj, vj = states[-1]

        @pl.when(vj)
        def _(sj=sj, kbj=kbj, j=j):
            start_kv_dma(sj, kbj, j)

        states.append(jax.lax.cond(
            vj,
            lambda sj=sj, kbj=kbj, vj=vj: next_item(sj, kbj, vj),
            lambda sj=sj: (sj, jnp.int32(0), jnp.bool_(False))))

    q_copy.wait()

    # compute sub-block: MXU QK/PV columns scale with the PADDED kv
    # block, so skip 128-column sub-blocks wholly beyond kv_len — the
    # work becomes ∝ ceil(kv_len/SB) independent of the stream block
    # size (measured on v5e: 12% whole-bench win at 550-token decode)
    SB = 128 if kvb % 128 == 0 else kvb
    n_sub = kvb // SB
    col = jax.lax.broadcasted_iota(jnp.int32, (1, SB), 1)
    width = kv_vmem.shape[-1]  # 2*Hk*D

    # row r of a sequence tile belongs to q head r (kv head r//group);
    # padding rows (r >= Hq) match no kv head and flush to zero
    head_row = jax.lax.broadcasted_iota(
        jnp.int32, (hq_pad, 1), 0) // group
    if has_sinks:
        s_col = jnp.stack([
            sinks_ref[min(r, num_q_heads - 1)] for r in range(hq_pad)
        ]).reshape(hq_pad, 1)

    def flush(s, m, l, acc):
        """Normalize sequence s's accumulators into its output row.
        acc is [HqP, W]; row r's result lives in its kv head's V
        columns ([2h*D + D, 2h*D + 2D), h = r//group)."""
        row = (s - s_base) * hq_pad  # multiple of 8 (sublane tile)
        out = jnp.zeros((hq_pad, head_dim), jnp.float32)
        for h in range(num_kv_heads):
            vpart = acc[:, (2 * h + 1) * head_dim:
                        (2 * h + 2) * head_dim]
            out = jnp.where(head_row == h, vpart, out)
        if has_sinks:
            m_t = jnp.maximum(m, s_col)
            sc = jnp.exp(m - m_t)
            out = (out * sc) / (l * sc + jnp.exp(s_col - m_t))
        else:
            out = out / jnp.maximum(l, 1e-20)
        o_vmem[pl.ds(row, hq_pad), :] = out.astype(o_vmem.dtype)

    def compute_item(s, kb, slot, m, l, acc):
        kv_len = seq_lens_ref[s]
        row = (s - s_base) * hq_pad  # multiple of 8 (sublane tile)
        qs = q_vmem[pl.ds(row, hq_pad), :]  # [HqP, W] block-diagonal

        if kv16_vmem is not None:
            # quantized (fp8/int8) KV: upcast the WHOLE stream block
            # once — per-head strided slices of 8-bit data force Mosaic
            # into element relayouts (measured 2.6x on the whole
            # kernel); one contiguous convert then 16-bit slicing is
            # clean. int8→bf16 is a native VPU convert (values ±127 are
            # exact in bf16); the per-token scales below multiply the
            # [rows, SB] score/probability planes instead of the
            # [SB, W] block — ~W/rows x less VPU work.
            kv16_vmem[...] = kv_vmem[slot].astype(kv16_vmem.dtype)
        if has_scales:
            # pre-gathered columns: sublane 0 = K scales, 1 = V scales
            k_col_all = sc_vmem[slot, 0:1, :]
            v_col_all = sc_vmem[slot, 1:2, :]

        def sub_block(si, m, l, acc):
            kv = (kv_vmem[slot, pl.ds(si * SB, SB)]
                  if kv16_vmem is None else
                  kv16_vmem[pl.ds(si * SB, SB)])  # [SB, W]
            kv_idx = kb * kvb + si * SB + col  # [1, SB]
            mask = kv_idx < kv_len  # decode: pos == kv_len-1
            if sliding_window is not None:
                mask &= kv_idx > kv_len - 1 - sliding_window
            if chunk_size is not None:
                mask &= (kv_idx // chunk_size) == ((kv_len - 1) //
                                                   chunk_size)
            if kv.dtype != qs.dtype:
                kv = kv.astype(qs.dtype)
            # one QK for ALL heads: zeros in q_wide kill cross-head
            # and V-column terms
            scores = jax.lax.dot_general(
                qs, kv,
                dimension_numbers=(((1, ), (1, )), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            if has_scales:
                # int8 KV: logits = (q·k_int8) * k_scale[token]
                scores = scores * k_col_all[:, si * SB:(si + 1) * SB]
            if logit_softcap is not None:
                scores = jnp.tanh(scores / logit_softcap) * \
                    logit_softcap
            scores = jnp.where(mask, scores, NEG_INF)
            m_new = jnp.maximum(
                m, jnp.max(scores, axis=-1, keepdims=True))
            p = jnp.exp(scores - m_new)
            p = jnp.where(mask, p, 0.0)
            scale_old = jnp.exp(m - m_new)
            l_new = l * scale_old + jnp.sum(p, axis=-1, keepdims=True)
            # one PV for ALL heads: row r's useful result lands in its
            # head's V columns; K columns accumulate p@K garbage that
            # flush never reads
            if has_scales:
                # fold v_scale[token] into p (the denominator l keeps
                # the UNSCALED p): Σ p·(v_scale·v_int8) = (p·v_scale)@v
                pm = (p * v_col_all[:, si * SB:(si + 1) * SB]).astype(
                    kv.dtype)
            else:
                pm = p.astype(kv.dtype)
            pv = jax.lax.dot_general(
                pm, kv,
                dimension_numbers=(((1, ), (0, )), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc * scale_old + pv

        for si in range(n_sub):
            if si == 0:
                m, l, acc = sub_block(0, m, l, acc)
            else:
                # window/chunk lower bounds are handled by
                # first_kv_block at item granularity; within an item
                # only the upper bound can skip whole sub-blocks
                m, l, acc = jax.lax.cond(
                    kb * kvb + si * SB < kv_len,
                    lambda m, l, acc, si=si: sub_block(si, m, l, acc),
                    lambda m, l, acc: (m, l, acc), m, l, acc)
        return m, l, acc

    m0 = jnp.full((hq_pad, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((hq_pad, 1), jnp.float32)
    acc0 = jnp.zeros((hq_pad, width), jnp.float32)

    def pipe_cond(carry):
        return carry[2]  # states[0].valid

    def pipe_body(carry):
        flat = carry[:3 * (depth + 1)]
        slot, m, l, acc = carry[3 * (depth + 1):]
        q_states = [tuple(flat[3 * j:3 * j + 3])
                    for j in range(depth + 1)]
        s, kb, valid = q_states[0]
        st, kbt, vt = q_states[depth]

        @pl.when(vt)
        def _():
            start_kv_dma(st, kbt, jax.lax.rem(slot + depth, n_buf))

        tail = jax.lax.cond(
            vt, lambda: next_item(st, kbt, vt),
            lambda: (st, jnp.int32(0), jnp.bool_(False)))

        wait_kv_dma(s, kb, slot)
        m, l, acc = compute_item(s, kb, slot, m, l, acc)

        # flush + reset accumulators when the stream leaves sequence s
        ns, _, nvalid = q_states[1]
        done_seq = jnp.logical_not(nvalid) | (ns != s)

        @pl.when(done_seq)
        def _():
            flush(s, m, l, acc)

        m, l, acc = jax.lax.cond(
            done_seq, lambda: (m0, l0, acc0), lambda: (m, l, acc))
        out = ()
        for st2 in q_states[1:] + [tail]:
            out += st2
        return out + (jax.lax.rem(slot + 1, n_buf), m, l, acc)

    carry = ()
    for st2 in states:
        carry += st2
    carry += (jnp.int32(0), m0, l0, acc0)
    jax.lax.while_loop(pipe_cond, pipe_body, carry)

    o_copy = pltpu.make_async_copy(
        o_vmem, o_hbm.at[pl.ds(s_base * hq_pad, bs * hq_pad)], o_sem)
    o_copy.start()
    o_copy.wait()


def _gather_scale_columns(kv_scales, block_tables, page_base,
                          page_size) -> jax.Array:
    """int8-KV: materialize per-request K/V scale columns in XLA
    before the kernel — [R*8, max_kv] f32, row s*8 holding seq s's K
    scale per kv position, s*8+1 the V scales, rows 2-7 zero padding.

    Rationale: the dense [P, page, 2] scale array cannot be DMA'd
    page-wise (Mosaic requires the minor dim of a sliced copy to be
    lane-aligned, and 2 ≠ 128·k — measured on v5e); the gather costs
    ~R·max_kv·8 B/layer in XLA, 1-4% of the KV stream itself, and
    buys the kernel one aligned [8, KVB] copy per work item. Call
    AFTER the block-table width is padded to the stream-block multiple
    so max_kv divides evenly into KVB slices."""
    r, mp = block_tables.shape
    sflat = kv_scales.reshape(-1, page_size, 2)
    g = jnp.take(sflat, (block_tables + page_base[0]).reshape(-1),
                 axis=0)
    g = g.reshape(r, mp * page_size, 2).transpose(0, 2, 1)
    g = jnp.pad(g, ((0, 0), (0, 6), (0, 0)))
    return g.reshape(r * 8, mp * page_size)


def _rpa_decode_packed_kernel(
    # scalar prefetch (SMEM)
    seq_lens_ref,  # [R2] (R2 = t rounded up to a multiple of F)
    block_tables_ref,  # [R2, max_pages]
    num_seqs_ref,  # [1]
    page_base_ref,  # [1]
    # inputs (HBM)
    q_hbm,  # [R2*HqP, F*W] lane-packed block-diagonal q (wrapper)
    kv_hbm,  # [P*page, W]
    # output (HBM): o_hbm [R2*HqP, D]
    o_hbm,
    # scratch
    q_vmem,  # [BS*HqP, F*W]
    kv_vmem,  # [N_BUF, KVB, F*W]
    o_vmem,  # [BS*HqP, D]
    q_sem,
    o_sem,
    kv_sems,  # [N_BUF, F*NPP]
    *,
    sm_scale: float,
    num_q_heads: int,
    hq_pad: int,
    num_kv_heads: int,
    head_dim: int,
    page_size: int,
    logit_softcap: Optional[float],
    pack: int,  # F sequences lane-packed per stream block
):
    """Lane-packed decode kernel for NARROW kv widths (W = 2*Hk*D <=
    512). The per-(sequence, kv-block) item cost of the general decode
    kernel is scalar-sequencing/issue bound, not bandwidth bound
    (~275 ns/item vs ~130 ns of HBM service at W=512, measured on
    v5e-class hardware — deep DMA prefetch does not recover it). This
    variant streams F = 1024//W sequences SIDE-BY-SIDE in the lane
    dimension: each work item fetches F sequences' pages into disjoint
    lane stripes of one [KVB, F*W] block and contracts all F with ONE
    QK/PV matmul pair (block-diagonal q per side x head, zeros kill
    cross terms), cutting the item count — and with it the serialized
    scalar/issue overhead — by F. Only the simple decode config packs
    (full causal, no window/chunk/sinks, 16-bit KV); everything else
    falls back to _rpa_decode_kernel. [reference behavior:
    vllm/v1/attention/backends/pallas.py ragged_paged_attention]"""
    F = pack
    i = pl.program_id(0)
    bs = q_vmem.shape[0] // hq_pad  # sequences per program (mult. F)
    n_grp = bs // F
    kvb = kv_vmem.shape[1]
    npp = kvb // page_size
    wp = kv_vmem.shape[-1]
    w = wp // F
    group = num_q_heads // num_kv_heads
    g0 = i * n_grp
    g_end = g0 + n_grp
    num_seqs = num_seqs_ref[0]
    n_buf = kv_vmem.shape[0]
    depth = n_buf - 1

    q_copy = pltpu.make_async_copy(
        q_hbm.at[pl.ds(g0 * F * hq_pad, bs * hq_pad)], q_vmem, q_sem)
    q_copy.start()
    o_vmem[...] = jnp.zeros_like(o_vmem)

    def side_len(s):
        return jnp.where(s < num_seqs, seq_lens_ref[s], 0)

    def group_len(g):
        gl = jnp.int32(0)
        for c in range(F):
            gl = jnp.maximum(gl, side_len(g * F + c))
        return gl

    def first_valid_group(g):
        def cond(g2):
            return (g2 < g_end) & (group_len(g2) == 0)

        g2 = jax.lax.while_loop(cond, lambda g2: g2 + 1, g)
        return g2, (g2 < g_end)

    def num_kv_blocks(g):
        return pl.cdiv(group_len(g), kvb)

    def next_item(g, kb, valid):
        def advance_group():
            g2, ok = first_valid_group(g + 1)
            return g2, jnp.int32(0), ok

        def same_group():
            return g, kb + 1, jnp.bool_(True)

        return jax.lax.cond(valid & (kb + 1 < num_kv_blocks(g)),
                            same_group, advance_group)

    page_base = page_base_ref[0]
    SB = 128 if kvb % 128 == 0 else kvb
    n_sub = kvb // SB

    def start_kv_dma(g, kb, slot):
        # every side computes up to the GROUP's padded extent, so a
        # side whose pages end early zero-fills its lane stripe there
        # (stale VMEM can hold NaN bit patterns; 0 * NaN = NaN in p@v)
        read_end = ((group_len(g) + SB - 1) // SB) * SB
        for c in range(F):
            s = g * F + c
            len_c = side_len(s)
            for j in range(npp):
                base = kb * kvb + j * page_size
                needed = base < len_c
                touched = base < read_end

                @pl.when(needed)
                def _(s=s, c=c, j=j):
                    page_id = page_base + \
                        block_tables_ref[s, kb * npp + j]
                    pltpu.make_async_copy(
                        kv_hbm.at[pl.ds(page_id * page_size,
                                        page_size)],
                        kv_vmem.at[slot, pl.ds(j * page_size,
                                               page_size),
                                   pl.ds(c * w, w)],
                        kv_sems.at[slot, c * npp + j]).start()

                @pl.when(jnp.logical_not(needed) & touched)
                def _(c=c, j=j):
                    kv_vmem[slot, pl.ds(j * page_size, page_size),
                            pl.ds(c * w, w)] = \
                        jnp.zeros((page_size, w), kv_vmem.dtype)

    def wait_kv_dma(g, kb, slot):
        for c in range(F):
            len_c = side_len(g * F + c)
            for j in range(npp):
                @pl.when(kb * kvb + j * page_size < len_c)
                def _(c=c, j=j):
                    pltpu.make_async_copy(
                        kv_hbm.at[pl.ds(0, page_size)],
                        kv_vmem.at[slot, pl.ds(j * page_size,
                                               page_size),
                                   pl.ds(c * w, w)],
                        kv_sems.at[slot, c * npp + j]).wait()

    col = jax.lax.broadcasted_iota(jnp.int32, (1, SB), 1)
    rows = F * hq_pad
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    side_row = row_iota // hq_pad  # which packed side owns row r
    head_row = (row_iota % hq_pad) // group  # kv head within side

    def flush(g, m, l, acc):
        row = (g - g0) * rows  # multiple of 8 (hq_pad is)
        out = jnp.zeros((rows, head_dim), jnp.float32)
        for c in range(F):
            for h in range(num_kv_heads):
                vpart = acc[:, c * w + (2 * h + 1) * head_dim:
                            c * w + (2 * h + 2) * head_dim]
                out = jnp.where((side_row == c) & (head_row == h),
                                vpart, out)
        out = out / jnp.maximum(l, 1e-20)
        o_vmem[pl.ds(row, rows), :] = out.astype(o_vmem.dtype)

    def compute_item(g, kb, slot, m, l, acc):
        row = (g - g0) * rows
        qs = q_vmem[pl.ds(row, rows), :]  # [rows, F*W] block-diag
        len_rows = jnp.zeros((rows, 1), jnp.int32)
        for c in range(F):
            len_rows = jnp.where(side_row == c,
                                 side_len(g * F + c), len_rows)
        glen = group_len(g)

        def sub_block(si, m, l, acc):
            kv = kv_vmem[slot, pl.ds(si * SB, SB)]  # [SB, F*W]
            kv_idx = kb * kvb + si * SB + col  # [1, SB]
            mask = kv_idx < len_rows  # [rows, SB]
            scores = jax.lax.dot_general(
                qs, kv,
                dimension_numbers=(((1, ), (1, )), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            if logit_softcap is not None:
                scores = jnp.tanh(scores / logit_softcap) * \
                    logit_softcap
            scores = jnp.where(mask, scores, NEG_INF)
            m_new = jnp.maximum(
                m, jnp.max(scores, axis=-1, keepdims=True))
            p = jnp.exp(scores - m_new)
            p = jnp.where(mask, p, 0.0)
            scale_old = jnp.exp(m - m_new)
            l_new = l * scale_old + jnp.sum(p, axis=-1,
                                            keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(kv.dtype), kv,
                dimension_numbers=(((1, ), (0, )), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc * scale_old + pv

        for si in range(n_sub):
            if si == 0:
                m, l, acc = sub_block(0, m, l, acc)
            else:
                m, l, acc = jax.lax.cond(
                    kb * kvb + si * SB < glen,
                    lambda m, l, acc, si=si: sub_block(si, m, l, acc),
                    lambda m, l, acc: (m, l, acc), m, l, acc)
        return m, l, acc

    g_first, v0 = first_valid_group(g0)
    states = [(g_first, jnp.int32(0), v0)]
    for j in range(depth):
        gj, kbj, vj = states[-1]

        @pl.when(vj)
        def _(gj=gj, kbj=kbj, j=j):
            start_kv_dma(gj, kbj, j)

        states.append(jax.lax.cond(
            vj,
            lambda gj=gj, kbj=kbj, vj=vj: next_item(gj, kbj, vj),
            lambda gj=gj: (gj, jnp.int32(0), jnp.bool_(False))))

    q_copy.wait()

    m0 = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc0 = jnp.zeros((rows, wp), jnp.float32)

    def pipe_cond(carry):
        return carry[2]

    def pipe_body(carry):
        flat = carry[:3 * (depth + 1)]
        slot, m, l, acc = carry[3 * (depth + 1):]
        q_states = [tuple(flat[3 * j:3 * j + 3])
                    for j in range(depth + 1)]
        g, kb, valid = q_states[0]
        gt, kbt, vt = q_states[depth]

        @pl.when(vt)
        def _():
            start_kv_dma(gt, kbt, jax.lax.rem(slot + depth, n_buf))

        tail = jax.lax.cond(
            vt, lambda: next_item(gt, kbt, vt),
            lambda: (gt, jnp.int32(0), jnp.bool_(False)))

        wait_kv_dma(g, kb, slot)
        m, l, acc = compute_item(g, kb, slot, m, l, acc)

        ng, _, nvalid = q_states[1]
        done_grp = jnp.logical_not(nvalid) | (ng != g)

        @pl.when(done_grp)
        def _():
            flush(g, m, l, acc)

        m, l, acc = jax.lax.cond(
            done_grp, lambda: (m0, l0, acc0), lambda: (m, l, acc))
        out = ()
        for st2 in q_states[1:] + [tail]:
            out += st2
        return out + (jax.lax.rem(slot + 1, n_buf), m, l, acc)

    carry = ()
    for st2 in states:
        carry += st2
    carry += (jnp.int32(0), m0, l0, acc0)
    jax.lax.while_loop(pipe_cond, pipe_body, carry)

    o_copy = pltpu.make_async_copy(
        o_vmem, o_hbm.at[pl.ds(g0 * F * hq_pad, bs * hq_pad)], o_sem)
    o_copy.start()
    o_copy.wait()


def _decode_attention_packed(
    q: jax.Array,  # [T, Hq, D]
    kv_cache2: jax.Array,  # [P*page, W]
    block_tables: jax.Array,
    seq_lens: jax.Array,
    sm_scale: float,
    num_kv_heads: int,
    page_size: int,
    logit_softcap: Optional[float],
    num_seqs: jax.Array,
    page_base: jax.Array,
    interpret: bool,
    pack: int,
) -> jax.Array:
    """Wrapper for the lane-packed narrow-KV decode kernel: pads the
    batch to a multiple of F, builds the lane-packed block-diagonal q
    (side s%F at lane offset (s%F)*W), and slices the result back."""
    t, num_q_heads, head_dim = q.shape
    width = 2 * num_kv_heads * head_dim
    F = pack
    wp = F * width
    hq_pad = -(-num_q_heads // 8) * 8
    t2 = -(-t // F) * F
    if t2 != t:
        seq_lens = jnp.pad(seq_lens, (0, t2 - t))
        block_tables = jnp.pad(block_tables,
                               ((0, t2 - t), (0, 0)))
    n_grp = t2 // F
    # groups per program: cap the q tile ([bsg*F*hq_pad, F*W]) ~2 MB
    bsg = min(n_grp, 64,
              max(1, (2 * 1024 * 1024) //
                  (F * hq_pad * wp * q.dtype.itemsize)))
    while n_grp % bsg:
        bsg //= 2
    bs = bsg * F
    kvb_tokens = 128
    env = envs.VLLM_TPU_DECODE_KV_BLOCK
    if env:
        kvb_tokens = int(env)
    npp = max(kvb_tokens // page_size, 1)
    kvb = npp * page_size
    max_pages = block_tables.shape[1]
    if max_pages % npp != 0:
        block_tables = jnp.pad(
            block_tables, ((0, 0), (0, npp - max_pages % npp)))

    kernel = functools.partial(
        _rpa_decode_packed_kernel,
        sm_scale=sm_scale,
        num_q_heads=num_q_heads,
        hq_pad=hq_pad,
        num_kv_heads=num_kv_heads,
        head_dim=head_dim,
        page_size=page_size,
        logit_softcap=logit_softcap,
        pack=F,
    )
    # block-diagonal q per side: head h*group+g of seq s → row
    # s*hq_pad + h*group+g, lanes [(s%F)*W + 2h*D, (s%F)*W + 2h*D+D)
    group = num_q_heads // num_kv_heads
    qr = q.reshape(t, num_kv_heads, group, head_dim)
    qw = jnp.zeros((t, num_kv_heads, group, width), q.dtype)
    for h in range(num_kv_heads):
        qw = qw.at[:, h, :, 2 * h * head_dim:
                   (2 * h + 1) * head_dim].set(qr[:, h])
    qw = qw.reshape(t, num_q_heads, width)
    if hq_pad != num_q_heads:
        qw = jnp.pad(qw,
                     ((0, 0), (0, hq_pad - num_q_heads), (0, 0)))
    if t2 != t:
        qw = jnp.pad(qw, ((0, t2 - t), (0, 0), (0, 0)))
    lane = (jnp.arange(t2) % F)[:, None, None, None]
    qp = jnp.where(lane == jnp.arange(F)[None, None, :, None],
                   qw[:, :, None, :], 0)
    q2 = qp.reshape(t2 * hq_pad, wp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_grp // bsg, ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((bs * hq_pad, wp), q.dtype),
            pltpu.VMEM((N_BUF_DECODE, kvb, wp), kv_cache2.dtype),
            pltpu.VMEM((bs * hq_pad, head_dim), q.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((N_BUF_DECODE, F * npp)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t2 * hq_pad, head_dim),
                                       q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", ),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seq_lens, block_tables, num_seqs, page_base, q2, kv_cache2)
    out = out.reshape(t2, hq_pad, head_dim)
    return out[:t, :num_q_heads, :]


def _decode_attention_pallas(
    q: jax.Array,  # [T, Hq, D] — T == num padded seqs, 1 token each
    kv_cache2: jax.Array,  # [P*page, 2*Hk*D] width layout
    block_tables: jax.Array,
    seq_lens: jax.Array,
    sm_scale: float,
    num_kv_heads: int,
    page_size: int,
    sliding_window: Optional[int],
    logit_softcap: Optional[float],
    num_seqs: jax.Array,
    page_base: jax.Array,
    sinks_in: jax.Array,
    has_sinks: bool,
    chunk_size: Optional[int],
    interpret: bool,
    kv_scales: Optional[jax.Array] = None,  # [P, page, 2] f32 (int8)
) -> jax.Array:
    t, num_q_heads, head_dim = q.shape
    width = 2 * num_kv_heads * head_dim
    # narrow-KV models (W <= 512): lane-pack F sequences per stream
    # block — the general kernel's per-item scalar/issue overhead
    # dominates at these widths (see _rpa_decode_packed_kernel)
    pack_env = envs.VLLM_TPU_DECODE_PACK
    pack = (min(4, 1024 // width) if pack_env is None else pack_env)
    if (pack >= 2 and sliding_window is None and chunk_size is None
            and not has_sinks and kv_cache2.dtype == q.dtype
            and kv_scales is None):
        return _decode_attention_packed(
            q, kv_cache2, block_tables, seq_lens, sm_scale,
            num_kv_heads, page_size, logit_softcap, num_seqs,
            page_base, interpret, pack)
    # per-sequence q rows padded to the 8-row sublane tile so every
    # dynamic VMEM slice offset ((s - s_base) * hq_pad) is provably
    # tile-aligned for Mosaic
    hq_pad = -(-num_q_heads // 8) * 8
    # sequences per program: cap the block-diagonal q tile
    # ([bs*hq_pad, W]) to ~2 MB of VMEM (wide-Hk models); grid steps
    # are sequential on-core so more programs cost nothing
    bs = min(t, 128,
             max(1, (2 * 1024 * 1024) //
                 (hq_pad * width * q.dtype.itemsize)))
    while t % bs:
        bs //= 2
    kvb_budget = KV_STREAM_BYTES // (
        N_BUF_DECODE * width * kv_cache2.dtype.itemsize)
    # small stream blocks win at decode: with kvb == SB (128) the
    # per-item sub-block cond chain disappears, page DMAs skip at the
    # finest granularity, and the padded MXU/VPU area past seq_len
    # shrinks to one partial block (v5e headline sweep:
    # 256 -> 128 is ~2% whole-bench at 32 x ~550-token decode)
    kvb_tokens = max(min(kvb_budget, 128), 128)
    env = envs.VLLM_TPU_DECODE_KV_BLOCK
    if env:  # workload tuning knob
        kvb_tokens = int(env)
    npp = max(kvb_tokens // page_size, 1)
    kvb = npp * page_size
    max_pages = block_tables.shape[1]
    if max_pages % npp != 0:
        block_tables = jnp.pad(
            block_tables, ((0, 0), (0, npp - max_pages % npp)))

    has_quant = kv_cache2.dtype != q.dtype
    has_scales = kv_scales is not None
    kernel = functools.partial(
        _rpa_decode_kernel,
        sm_scale=sm_scale,
        num_q_heads=num_q_heads,
        hq_pad=hq_pad,
        num_kv_heads=num_kv_heads,
        head_dim=head_dim,
        page_size=page_size,
        sliding_window=sliding_window,
        logit_softcap=logit_softcap,
        has_sinks=has_sinks,
        chunk_size=chunk_size,
        has_quant=has_quant,
        has_scales=has_scales,
    )
    # block-diagonal q (built in XLA, tiny: t x hq_pad x W): q head
    # h*group+g of sequence s → row s*hq_pad + h*group + g, occupying
    # the K columns of kv head h ([2h*D, 2h*D + D)); zeros elsewhere.
    # Lets the kernel contract ALL heads with ONE matmul pair per
    # kv sub-block (see _rpa_decode_kernel docstring).
    group = num_q_heads // num_kv_heads
    qr = q.reshape(t, num_kv_heads, group, head_dim)
    qw = jnp.zeros((t, num_kv_heads, group, width), q.dtype)
    for h in range(num_kv_heads):
        qw = qw.at[:, h, :, 2 * h * head_dim:
                   (2 * h + 1) * head_dim].set(qr[:, h])
    qw = qw.reshape(t, num_q_heads, width)
    if hq_pad != num_q_heads:
        qw = jnp.pad(qw,
                     ((0, 0), (0, hq_pad - num_q_heads), (0, 0)))
    q2 = qw.reshape(t * hq_pad, width)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(t // bs, ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] *
        (3 if has_scales else 2),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((bs * hq_pad, width), q.dtype),
            pltpu.VMEM((N_BUF_DECODE, kvb, width), kv_cache2.dtype),
            pltpu.VMEM((bs * hq_pad, head_dim), q.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((N_BUF_DECODE, npp)),
        ] + ([pltpu.VMEM((kvb, width), q.dtype)] if has_quant else [])
        + ([
            pltpu.VMEM((N_BUF_DECODE, 8, kvb), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF_DECODE, )),
        ] if has_scales else []),
    )
    sc2 = (_gather_scale_columns(kv_scales, block_tables, page_base,
                                 page_size), ) if has_scales else ()
    args = (seq_lens, block_tables, num_seqs, page_base, sinks_in, q2,
            kv_cache2) + sc2
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t * hq_pad, head_dim),
                                       q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", ),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    out = out.reshape(t, hq_pad, head_dim)
    return out[:, :num_q_heads, :] if hq_pad != num_q_heads else out


@functools.partial(
    jax.jit,
    static_argnames=["sm_scale", "num_kv_heads", "sliding_window",
                     "logit_softcap", "interpret", "causal",
                     "alibi_slopes", "chunk_size", "pure_decode"],
)
def ragged_paged_attention_pallas(
    q: jax.Array,  # [T, Hq, D]
    kv_cache: jax.Array,  # [P, page, 2*Hk, D] or width [P, page, W]
    block_tables: jax.Array,  # [R, max_pages]
    query_start_loc: jax.Array,  # [R+1]
    seq_lens: jax.Array,  # [R]
    sm_scale: float,
    num_kv_heads: Optional[int] = None,
    sliding_window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    num_seqs: Optional[jax.Array] = None,
    page_base=0,
    interpret: bool = False,
    causal: bool = True,
    alibi_slopes: Optional[tuple] = None,
    sinks: Optional[jax.Array] = None,  # [Hq] f32 learned sink logits
    chunk_size: Optional[int] = None,  # Llama4 chunked local attn
    bidir_spans: Optional[jax.Array] = None,  # [R, S, 2] kv positions
    pure_decode: bool = False,  # STATIC: every seq has q_len == 1
    kv_scales: Optional[jax.Array] = None,  # [P, page, 2] f32 — int8
    # KV per-token scales (see ops/kv_cache.py QuantizedKV)
) -> jax.Array:
    t, num_q_heads, head_dim = q.shape
    num_pages, page_size = kv_cache.shape[:2]
    if num_kv_heads is None:
        assert kv_cache.ndim == 4
        num_kv_heads = kv_cache.shape[2] // 2
    two_kh = 2 * num_kv_heads
    page_base = jnp.asarray(page_base, dtype=jnp.int32).reshape(1)
    num_reqs = block_tables.shape[0]
    if num_seqs is None:
        num_seqs = jnp.asarray([num_reqs], dtype=jnp.int32)

    if (pure_decode and causal and t == num_reqs
            and alibi_slopes is None and bidir_spans is None
            and head_dim % 128 == 0):
        # decode fast path: one q token per sequence (row s == seq s)
        if sinks is None:
            sinks_d = jnp.zeros((num_q_heads, ), jnp.float32)
        else:
            sinks_d = sinks.astype(jnp.float32).reshape(num_q_heads)
        kv2d = kv_cache.reshape(num_pages * page_size,
                                two_kh * head_dim)
        return _decode_attention_pallas(
            q, kv2d, block_tables, seq_lens, sm_scale, num_kv_heads,
            page_size, sliding_window, logit_softcap, num_seqs,
            page_base, sinks_d, sinks is not None, chunk_size,
            interpret, kv_scales=kv_scales)

    group_ratio = num_q_heads // (num_kv_heads or 1)
    # scores live in VMEM as [bq*group, kvb] f32 — clamp bq so huge
    # MQA groups (MLA: group == num_heads) stay inside the budget
    bq = min(t, max(envs.VLLM_TPU_PREFILL_BQ //
                    max(group_ratio, 1), 16), 128)
    bq = 1 << (bq.bit_length() - 1)  # power of 2; t buckets are too
    while t % bq:
        bq //= 2
    num_q_blocks = t // bq
    # kv stream block: as many pages as fit the VMEM budget, at least
    # 128 tokens, at most 512
    width = two_kh * head_dim
    kvb_budget = KV_STREAM_BYTES // (N_BUF * width * kv_cache.dtype.itemsize)
    kvb_tokens = max(min(kvb_budget, 512), 128)
    env = envs.VLLM_TPU_PREFILL_KV_BLOCK
    if env:  # workload tuning knob (finer blocks track the causal
        # fraction more closely now that num_kv_blocks is bounded
        # above the diagonal)
        kvb_tokens = int(env)
    npp = max(kvb_tokens // page_size, 1)
    kvb = npp * page_size
    # the kernel indexes pages in groups of npp — pad the table width
    max_pages = block_tables.shape[1]
    if max_pages % npp != 0:
        block_tables = jnp.pad(
            block_tables, ((0, 0), (0, npp - max_pages % npp)))

    # first sequence overlapping each q block
    starts = jnp.arange(num_q_blocks, dtype=jnp.int32) * bq
    first_seq = (jnp.searchsorted(query_start_loc, starts, side="right")
                 .astype(jnp.int32) - 1)
    first_seq = jnp.clip(first_seq, 0, num_reqs - 1)

    has_scales = kv_scales is not None
    kernel = functools.partial(
        _rpa_kernel,
        sm_scale=sm_scale,
        num_q_heads=num_q_heads,
        num_kv_heads=num_kv_heads,
        head_dim=head_dim,
        page_size=page_size,
        sliding_window=sliding_window,
        logit_softcap=logit_softcap,
        causal=causal,
        alibi_slopes=alibi_slopes,
        has_sinks=sinks is not None,
        chunk_size=chunk_size,
        num_spans=0 if bidir_spans is None else bidir_spans.shape[1],
        has_scales=has_scales,
    )
    if sinks is None:
        sinks_in = jnp.zeros((num_q_heads, ), jnp.float32)
    else:
        sinks_in = sinks.astype(jnp.float32).reshape(num_q_heads)
    if bidir_spans is None:
        spans_in = jnp.zeros((num_reqs, 2), jnp.int32)
    else:
        spans_in = bidir_spans.astype(jnp.int32).reshape(
            bidir_spans.shape[0], -1)
    # 2-D HBM layouts keep every DMA slice tile-aligned (see kernel).
    # The production cache is already width-layout, so this reshape
    # never touches a sharded axis (a head-axis merge under GSPMD is a
    # full-cache layout copy).
    q2 = q.reshape(t, num_q_heads * head_dim)
    kv2 = kv_cache.reshape(num_pages * page_size, width)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(num_q_blocks, ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] *
        (3 if has_scales else 2),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((bq, num_q_heads * head_dim), q.dtype),
            pltpu.VMEM((N_BUF, kvb, width), kv_cache.dtype),
            pltpu.VMEM((bq, num_q_heads * head_dim), q.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((N_BUF, npp)),
        ] + ([
            pltpu.VMEM((N_BUF, 8, kvb), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF, )),
        ] if has_scales else []),
    )
    sc2 = (_gather_scale_columns(kv_scales, block_tables, page_base,
                                 page_size), ) if has_scales else ()
    args = (query_start_loc, seq_lens, block_tables, first_seq,
            num_seqs, page_base, sinks_in, spans_in, q2, kv2) + sc2
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q2.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", ),
            # wide-head MQA (MLA latent: D=640) needs more scoped
            # VMEM than the 16M default for its mask/score temporaries
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out.reshape(q.shape)
