"""INT8 KV cache: quantized write paths, kernel parity (interpret
mode), and dequantization round-trip (reference capability:
vllm/v1/attention/backends/pallas.py:29,335-343 int8 kv-cache
quantization; this design uses dynamic per-token scales — see
ops/kv_cache.py QuantizedKV)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_main_modify_tpu.ops.attention import ragged_paged_attention_xla
from vllm_main_modify_tpu.ops.kv_cache import (
    QuantizedKV, dequantize_kv_pages, quantize_kv_rows,
    write_to_kv_cache, write_to_kv_cache_paged_quant,
    write_to_kv_cache_quant)
from vllm_main_modify_tpu.ops.pallas.ragged_attn import \
    ragged_paged_attention_pallas


def test_quantize_roundtrip():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((7, 2, 16)) * 3.0,
                    jnp.float32)
    v = jnp.asarray(rng.standard_normal((7, 2, 16)) * 0.2,
                    jnp.float32)
    kv, k_scale, v_scale = quantize_kv_rows(k, v)
    assert kv.dtype == jnp.int8
    kvr = np.asarray(kv).reshape(7, 2, 2, 16)
    kd = kvr[:, :, 0, :] * np.asarray(k_scale)[:, None, None]
    vd = kvr[:, :, 1, :] * np.asarray(v_scale)[:, None, None]
    # symmetric int8: relative error bounded by scale/2 per element
    np.testing.assert_allclose(kd, np.asarray(k),
                               atol=np.max(np.asarray(k_scale)) * 0.51)
    np.testing.assert_allclose(vd, np.asarray(v),
                               atol=np.max(np.asarray(v_scale)) * 0.51)


def _empty_cache(num_pages, page_size, num_kv_heads, head_dim):
    width = 2 * num_kv_heads * head_dim
    return QuantizedKV(
        jnp.zeros((num_pages, page_size, width), jnp.int8),
        jnp.zeros((num_pages, page_size, 2), jnp.float32))


def test_write_scatter_matches_bf16_semantics():
    """Quantized token-scatter: dequantized cache ≈ the bf16 cache
    written by the unquantized path."""
    rng = np.random.default_rng(1)
    num_pages, page_size, hk, d = 6, 8, 2, 16
    t = 11
    k = jnp.asarray(rng.standard_normal((t, hk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((t, hk, d)), jnp.float32)
    slots = np.full(16, -1, np.int32)
    slots[:t] = rng.permutation(num_pages * page_size)[:t]
    slots_j = jnp.asarray(slots[:t])

    qc = write_to_kv_cache_quant(
        _empty_cache(num_pages, page_size, hk, d), k, v, slots_j)
    ref = write_to_kv_cache(
        jnp.zeros((num_pages, page_size, 2 * hk, d), jnp.float32), k,
        v, slots_j)
    deq = dequantize_kv_pages(qc.data, qc.scales, hk, d,
                              out_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(deq).reshape(ref.shape), np.asarray(ref),
        atol=2.5e-2)


def test_write_paged_matches_scatter():
    """Page-RMW quantized write == token-scatter quantized write for
    the same token placement."""
    rng = np.random.default_rng(2)
    num_pages, page_size, hk, d = 5, 8, 1, 8
    # two sequences: rows 0..9 of page 1, rows 0..4 of page 3
    placements = [(1 * page_size + 0, 0, 6), (3 * page_size + 0, 6, 5)]
    t = 11
    k = jnp.asarray(rng.standard_normal((t, hk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((t, hk, d)), jnp.float32)
    slices = np.zeros((3, 4), np.int32)  # padded to 4 slices
    for i, (cs, ns, ln) in enumerate(placements):
        slices[:, i] = (cs, ns, ln)
    qp = write_to_kv_cache_paged_quant(
        _empty_cache(num_pages, page_size, hk, d), k, v,
        jnp.asarray(slices), jnp.asarray([2], jnp.int32))

    slot_list = []
    for cs, ns, ln in placements:
        slot_list.extend(range(cs, cs + ln))
    qs = write_to_kv_cache_quant(
        _empty_cache(num_pages, page_size, hk, d), k, v,
        jnp.asarray(slot_list, jnp.int32))
    np.testing.assert_array_equal(np.asarray(qp.data),
                                  np.asarray(qs.data))
    np.testing.assert_allclose(np.asarray(qp.scales),
                               np.asarray(qs.scales), rtol=1e-6)


def _quantize_pages(rng, num_pages, page_size, hk, d):
    """Random bf16 cache → (QuantizedKV, dequantized oracle cache)."""
    kv = rng.standard_normal(
        (num_pages, page_size, 2 * hk, d)).astype(np.float32)
    flat = kv.reshape(num_pages * page_size, 2 * hk, d)
    k = jnp.asarray(flat[:, 0::2, :].reshape(-1, hk, d))
    v = jnp.asarray(flat[:, 1::2, :].reshape(-1, hk, d))
    slots = jnp.arange(num_pages * page_size, dtype=jnp.int32)
    qc = write_to_kv_cache_quant(
        _empty_cache(num_pages, page_size, hk, d), k, v, slots)
    deq = dequantize_kv_pages(qc.data, qc.scales, hk, d,
                              out_dtype=jnp.float32)
    return qc, deq.reshape(num_pages, page_size, 2 * hk, d)


@pytest.mark.parametrize("pure_decode", [False, True])
def test_pallas_int8_matches_dequant_oracle(pure_decode):
    """Interpret-mode Pallas kernels with int8 pages + per-token
    scales vs the XLA oracle on the dequantized cache."""
    rng = np.random.default_rng(3)
    hk, hq, d, page_size, num_pages = 2, 4, 128, 32, 12
    if pure_decode:
        specs = [(1, 40), (1, 65), (1, 33), (1, 7)]
    else:
        specs = [(33, 50), (1, 40), (8, 8)]
    num_reqs = len(specs)
    total_q = sum(q for q, _ in specs)
    t_pad = max(16, 1 << (total_q - 1).bit_length())
    max_pages = max(-(-kv // page_size) for _, kv in specs)
    q = jnp.asarray(rng.standard_normal((t_pad, hq, d)), jnp.float32)

    qsl = np.zeros(num_reqs + 1, np.int32)
    seq_lens = np.zeros(num_reqs, np.int32)
    bt = np.zeros((num_reqs, max_pages), np.int32)
    next_page = 1
    for r, (ql, kvl) in enumerate(specs):
        qsl[r + 1] = qsl[r] + ql
        seq_lens[r] = kvl
        n = -(-kvl // page_size)
        bt[r, :n] = np.arange(next_page, next_page + n)
        next_page += n
    assert next_page <= num_pages

    qc, deq = _quantize_pages(rng, num_pages, page_size, hk, d)
    sm = 1.0 / np.sqrt(d)
    if pure_decode:
        q_dec = q[:num_reqs]
        out = ragged_paged_attention_pallas(
            q_dec, qc.data.reshape(num_pages, page_size, 2 * hk * d),
            jnp.asarray(bt), jnp.asarray(qsl), jnp.asarray(seq_lens),
            sm, num_kv_heads=hk, interpret=True, pure_decode=True,
            kv_scales=qc.scales)
        ref = ragged_paged_attention_xla(q_dec, deq, jnp.asarray(bt),
                                         jnp.asarray(qsl),
                                         jnp.asarray(seq_lens), sm)
    else:
        out = ragged_paged_attention_pallas(
            q, qc.data.reshape(num_pages, page_size, 2 * hk * d),
            jnp.asarray(bt), jnp.asarray(qsl), jnp.asarray(seq_lens),
            sm, num_kv_heads=hk, interpret=True, kv_scales=qc.scales)
        ref = ragged_paged_attention_xla(q, deq, jnp.asarray(bt),
                                         jnp.asarray(qsl),
                                         jnp.asarray(seq_lens), sm)
        out = out[:total_q]
        ref = ref[:total_q]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_attention_layer_int8_close_to_bf16():
    """layers.attention with a QuantizedKV carry ≈ the bf16-cache
    result (accuracy-parity gate: int8-KV vs full-precision logits)."""
    from vllm_main_modify_tpu.layers.attention import (
        AttentionMetadata, attention)

    rng = np.random.default_rng(4)
    hk, hq, d, page_size, num_pages, layers = 2, 4, 64, 16, 8, 2
    width = 2 * hk * d
    t, kv_len = 16, 16
    q = jnp.asarray(rng.standard_normal((t, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((t, hk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((t, hk, d)), jnp.float32)

    bt = np.zeros((1, 2), np.int32)
    bt[0] = [1, 2]
    slots = np.arange(page_size, page_size + t, dtype=np.int32)
    meta = AttentionMetadata(
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray([0, t], jnp.int32),
        seq_lens=jnp.asarray([kv_len], jnp.int32),
        slot_mapping=jnp.asarray(slots),
        num_seqs=jnp.asarray([1], jnp.int32),
    )
    sm = 1.0 / np.sqrt(d)

    bf16_cache = jnp.zeros((layers, num_pages, page_size, width),
                           jnp.float32)
    out_ref, _ = attention(q, k, v, bf16_cache, 1, meta, sm,
                           use_pallas=False)

    qkv = QuantizedKV(
        jnp.zeros((layers, num_pages, page_size, width), jnp.int8),
        jnp.zeros((layers, num_pages, page_size, 2), jnp.float32))
    out_q, qkv2 = attention(q, k, v, qkv, 1, meta, sm,
                            use_pallas=False)
    assert isinstance(qkv2, QuantizedKV)
    # layer 1 pages written, layer 0 untouched
    assert np.abs(np.asarray(qkv2.data[1])).sum() > 0
    assert np.abs(np.asarray(qkv2.data[0])).sum() == 0
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_ref),
                               atol=2.5e-2, rtol=2.5e-2)
