"""Pallas TPU kernel: unified ragged paged attention (prefill+decode).

Replaces the reference's CUDA PagedAttention v1/v2
(csrc/attention/attention_kernels.cuh) and its torch-xla
``ragged_paged_attention`` op (vllm/v1/attention/backends/pallas.py:285)
with a from-scratch TPU design:

- Grid iterates **global q blocks** of the packed [T, Hq, D] query
  array (TPU grid steps are sequential per core, so exclusive row
  ownership beats per-sequence grids: one aligned output DMA per block,
  no masked-row write hazards).
- Each q block walks the sequences it spans (host precomputes each
  block's first sequence); per sequence it streams that sequence's KV
  pages HBM→VMEM with double buffering and accumulates
  flash-attention-style (online softmax, f32 accumulators).
- KV pages stay in the paged layout [P, page, 2*Hk, D] with K/V
  interleaved per head, so one page DMA fetches both K and V.

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

NEG_INF = -2.0**30  # large finite: avoids inf-inf NaNs in rescaling


def _rpa_kernel(
    # scalar prefetch (SMEM)
    qsl_ref,  # [R+1] query_start_loc
    seq_lens_ref,  # [R]
    block_tables_ref,  # [R, max_pages]
    first_seq_ref,  # [num_q_blocks] first seq overlapping each block
    num_seqs_ref,  # [1]
    # inputs (HBM). 2-D layouts so every DMA slices only the
    # second-minor dim at tile-aligned offsets (Mosaic rejects sliced
    # memrefs whose minor dims aren't tile-aligned — e.g. Hq=12):
    q_hbm,  # [T, Hq*D]
    kv_hbm,  # [P*page, 2*Hk*D]
    # output (HBM)
    o_hbm,  # [T, Hq*D]
    # scratch
    q_vmem,  # [BQ, Hq*D]
    kv_vmem,  # [2, NPP*page, 2*Hk*D]
    o_vmem,  # [BQ, Hq*D]
    q_sem,
    o_sem,
    kv_sems,  # DMA sems [2, NPP]
    *,
    sm_scale: float,
    num_q_heads: int,
    num_kv_heads: int,
    head_dim: int,
    page_size: int,
    sliding_window: Optional[int],
    logit_softcap: Optional[float],
):
    i = pl.program_id(0)
    bq = q_vmem.shape[0]
    kvb = kv_vmem.shape[1]  # kv tokens per stream block
    npp = kvb // page_size
    two_kh = 2 * num_kv_heads
    group = num_q_heads // num_kv_heads
    rows = bq * group
    t0 = i * bq

    # q block in
    q_copy = pltpu.make_async_copy(q_hbm.at[pl.ds(t0, bq)], q_vmem,
                                   q_sem)
    q_copy.start()

    num_seqs = num_seqs_ref[0]

    def start_kv_dma(s, kb, slot):
        """Fetch pages [kb*npp, kb*npp+npp) of seq s into buffer
        `slot` (one row-range DMA per page)."""
        for j in range(npp):
            page_id = block_tables_ref[s, kb * npp + j]
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(page_id * page_size, page_size)],
                kv_vmem.at[slot, pl.ds(j * page_size, page_size)],
                kv_sems.at[slot, j]).start()

    def wait_kv_dma(slot):
        for j in range(npp):
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(0, page_size)],
                kv_vmem.at[slot, pl.ds(j * page_size, page_size)],
                kv_sems.at[slot, j]).wait()

    q_copy.wait()
    # load all heads once → [BQ, Hq, D] (minor-preserving split)
    q_all = q_vmem[...].reshape(bq, num_q_heads, head_dim)

    def process_seq(s, carry):
        """Accumulate seq s's KV into every (masked) row of the block."""
        m, l, acc = carry
        q_start = qsl_ref[s]
        q_end = qsl_ref[s + 1]
        kv_len = seq_lens_ref[s]
        q_len = q_end - q_start

        # absolute kv position of flat row fr (= b*group + g):
        #   b = t0 + fr//group;  pos = kv_len - q_len + (b - q_start)
        fr = jax.lax.broadcasted_iota(jnp.int32, (rows, kvb), 0)
        b_abs = t0 + fr // group
        pos = kv_len - q_len + (b_abs - q_start)
        row_owned = (b_abs >= q_start) & (b_abs < q_end)
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, kvb), 1)

        num_kv_blocks = pl.cdiv(kv_len, kvb)
        start_kv_dma(s, 0, 0)

        def kv_step(kb, carry):
            m, l, acc = carry
            slot = jax.lax.rem(kb, 2)

            @pl.when(kb + 1 < num_kv_blocks)
            def _():
                start_kv_dma(s, kb + 1, 1 - slot)

            wait_kv_dma(slot)
            kv = kv_vmem[slot].reshape(kvb, num_kv_heads, 2, head_dim)
            k = kv[:, :, 0, :]  # [KVB, Hk, D]
            v = kv[:, :, 1, :]

            kv_idx = kb * kvb + col  # [rows, KVB]
            mask = row_owned & (kv_idx <= pos) & (kv_idx < kv_len)
            if sliding_window is not None:
                mask &= kv_idx > pos - sliding_window

            new_m, new_l, new_acc = [], [], []
            for h in range(num_kv_heads):
                qh = q_all[:, h * group:(h + 1) * group, :].reshape(
                    rows, head_dim)
                scores = jax.lax.dot_general(
                    qh, k[:, h, :],
                    dimension_numbers=(((1, ), (1, )), ((), ())),
                    preferred_element_type=jnp.float32) * sm_scale
                if logit_softcap is not None:
                    scores = jnp.tanh(
                        scores / logit_softcap) * logit_softcap
                scores = jnp.where(mask, scores, NEG_INF)

                m_h = m[h]  # [rows, 1]
                l_h = l[h]
                acc_h = acc[h]  # [rows, D]
                m_new = jnp.maximum(
                    m_h, jnp.max(scores, axis=-1, keepdims=True))
                p = jnp.exp(scores - m_new)  # [rows, KVB]
                # NEG_INF is finite → fully-masked rows would get
                # exp(0)=1; zero them explicitly
                p = jnp.where(mask, p, 0.0)
                scale_old = jnp.exp(m_h - m_new)
                l_new = l_h * scale_old + jnp.sum(p, axis=-1,
                                                  keepdims=True)
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v[:, h, :],
                    dimension_numbers=(((1, ), (0, )), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_new = acc_h * scale_old + pv
                new_m.append(m_new)
                new_l.append(l_new)
                new_acc.append(acc_new)
            return (jnp.stack(new_m), jnp.stack(new_l),
                    jnp.stack(new_acc))

        has_rows = (q_end > jnp.maximum(q_start, t0)) & \
                   (jnp.minimum(q_end, t0 + bq) > q_start) & (kv_len > 0)
        m, l, acc = jax.lax.cond(
            has_rows,
            lambda c: jax.lax.fori_loop(0, num_kv_blocks, kv_step, c),
            lambda c: c, (m, l, acc))
        return m, l, acc

    def seq_cond(carry):
        s, _ = carry
        return (s < num_seqs) & (qsl_ref[s] < t0 + bq)

    def seq_body(carry):
        s, mla = carry
        return s + 1, process_seq(s, mla)

    m0 = jnp.full((num_kv_heads, rows, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((num_kv_heads, rows, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((num_kv_heads, rows, head_dim), dtype=jnp.float32)
    s0 = first_seq_ref[i]
    _, (m, l, acc) = jax.lax.while_loop(seq_cond, seq_body,
                                        (s0, (m0, l0, acc0)))

    out = acc / jnp.maximum(l, 1e-20)  # rows with no kv → 0
    # [Hk, BQ*G, D] → [BQ, Hq*D]
    out = out.reshape(num_kv_heads, bq, group, head_dim)
    out = out.transpose(1, 0, 2, 3).reshape(bq,
                                            num_q_heads * head_dim)
    o_vmem[...] = out.astype(o_vmem.dtype)
    o_copy = pltpu.make_async_copy(o_vmem, o_hbm.at[pl.ds(t0, bq)],
                                   o_sem)
    o_copy.start()
    o_copy.wait()


@functools.partial(
    jax.jit,
    static_argnames=["sm_scale", "sliding_window", "logit_softcap",
                     "interpret"],
)
def ragged_paged_attention_pallas(
    q: jax.Array,  # [T, Hq, D]
    kv_cache: jax.Array,  # [P, page, 2*Hk, D]
    block_tables: jax.Array,  # [R, max_pages]
    query_start_loc: jax.Array,  # [R+1]
    seq_lens: jax.Array,  # [R]
    sm_scale: float,
    sliding_window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    num_seqs: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    t, num_q_heads, head_dim = q.shape
    _, page_size, two_kh, _ = kv_cache.shape
    num_kv_heads = two_kh // 2
    num_reqs = block_tables.shape[0]
    if num_seqs is None:
        num_seqs = jnp.asarray([num_reqs], dtype=jnp.int32)

    bq = min(t, 128)
    num_q_blocks = t // bq
    npp = max(128 // page_size, 1)  # pages per kv stream block
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

    kernel = functools.partial(
        _rpa_kernel,
        sm_scale=sm_scale,
        num_q_heads=num_q_heads,
        num_kv_heads=num_kv_heads,
        head_dim=head_dim,
        page_size=page_size,
        sliding_window=sliding_window,
        logit_softcap=logit_softcap,
    )
    # 2-D HBM layouts keep every DMA slice tile-aligned (see kernel)
    num_pages = kv_cache.shape[0]
    q2 = q.reshape(t, num_q_heads * head_dim)
    kv2 = kv_cache.reshape(num_pages * page_size, two_kh * head_dim)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_q_blocks, ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((bq, num_q_heads * head_dim), q.dtype),
            pltpu.VMEM((2, npp * page_size, two_kh * head_dim),
                       kv_cache.dtype),
            pltpu.VMEM((bq, num_q_heads * head_dim), q.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2, npp)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q2.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", )),
        interpret=interpret,
    )(query_start_loc, seq_lens, block_tables, first_seq, num_seqs, q2,
      kv2)
    return out.reshape(q.shape)
