"""Pallas ragged-paged-attention kernel vs the XLA oracle, in
interpreter mode on CPU (SURVEY.md §4 test-pyramid item 2; reference
test style: tests/v1/tpu/test_kv_cache_update_kernel.py — kernel vs
numpy reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_main_modify_tpu.ops.attention import ragged_paged_attention_xla
from vllm_main_modify_tpu.ops.pallas.ragged_attn import \
    ragged_paged_attention_pallas


def build_case(rng, seq_specs, num_q_heads, num_kv_heads, head_dim,
               page_size, num_pages, dtype=jnp.float32):
    """seq_specs: list of (q_len, kv_len) with q_len <= kv_len."""
    num_reqs = len(seq_specs)
    total_q = sum(q for q, _ in seq_specs)
    t_pad = max(16, 1 << (total_q - 1).bit_length())
    max_pages = max(-(-kv // page_size) for _, kv in seq_specs)

    q = jnp.asarray(
        rng.standard_normal((t_pad, num_q_heads, head_dim)), dtype)
    kv_cache = jnp.asarray(
        rng.standard_normal(
            (num_pages, page_size, 2 * num_kv_heads, head_dim)), dtype)

    qsl = np.zeros(num_reqs + 1, dtype=np.int32)
    seq_lens = np.zeros(num_reqs, dtype=np.int32)
    block_tables = np.zeros((num_reqs, max_pages), dtype=np.int32)
    next_page = 1
    for r, (q_len, kv_len) in enumerate(seq_specs):
        qsl[r + 1] = qsl[r] + q_len
        seq_lens[r] = kv_len
        n_pages = -(-kv_len // page_size)
        assert next_page + n_pages <= num_pages
        block_tables[r, :n_pages] = np.arange(next_page,
                                              next_page + n_pages)
        next_page += n_pages
    return (q, kv_cache, jnp.asarray(block_tables), jnp.asarray(qsl),
            jnp.asarray(seq_lens))


CASES = [
    # decode-like: many seqs, one q token each
    [(1, 17), (1, 33), (1, 1), (1, 64)],
    # prefill: one long seq
    [(48, 48)],
    # chunked prefill: q covers the tail of a longer context
    [(16, 40)],
    # mixed prefill + decode spanning q-block boundaries
    [(20, 20), (1, 30), (7, 19), (1, 5), (3, 3)],
]


@pytest.mark.parametrize("specs", CASES)
@pytest.mark.parametrize("heads", [(4, 4), (8, 2)])
def test_pallas_matches_xla_oracle(specs, heads):
    num_q, num_kv = heads
    rng = np.random.default_rng(0)
    head_dim, page_size = 128, 8
    q, kv, bt, qsl, lens = build_case(rng, specs, num_q, num_kv,
                                      head_dim, page_size,
                                      num_pages=64)
    sm = head_dim**-0.5
    ref = ragged_paged_attention_xla(q, kv, bt, qsl, lens, sm)
    got = ragged_paged_attention_pallas(q, kv, bt, qsl, lens, sm,
                                        interpret=True)
    total_q = int(qsl[-1])
    np.testing.assert_allclose(np.asarray(got[:total_q]),
                               np.asarray(ref[:total_q]), atol=2e-5,
                               rtol=2e-5)


def test_pallas_sliding_window():
    rng = np.random.default_rng(1)
    q, kv, bt, qsl, lens = build_case(rng, [(8, 40), (1, 33)], 4, 2,
                                      128, 8, num_pages=64)
    sm = 0.125
    ref = ragged_paged_attention_xla(q, kv, bt, qsl, lens, sm,
                                     sliding_window=16)
    got = ragged_paged_attention_pallas(q, kv, bt, qsl, lens, sm,
                                        sliding_window=16,
                                        interpret=True)
    total_q = int(qsl[-1])
    np.testing.assert_allclose(np.asarray(got[:total_q]),
                               np.asarray(ref[:total_q]), atol=2e-5,
                               rtol=2e-5)


def test_pallas_softcap():
    rng = np.random.default_rng(2)
    q, kv, bt, qsl, lens = build_case(rng, [(4, 12), (2, 9)], 4, 2, 128,
                                      8, num_pages=32)
    sm = 0.125
    ref = ragged_paged_attention_xla(q, kv, bt, qsl, lens, sm,
                                     logit_softcap=30.0)
    got = ragged_paged_attention_pallas(q, kv, bt, qsl, lens, sm,
                                        logit_softcap=30.0,
                                        interpret=True)
    total_q = int(qsl[-1])
    np.testing.assert_allclose(np.asarray(got[:total_q]),
                               np.asarray(ref[:total_q]), atol=2e-5,
                               rtol=2e-5)


def test_pallas_padded_rows_are_zero():
    """Rows beyond the last real token must come out exactly 0."""
    rng = np.random.default_rng(3)
    q, kv, bt, qsl, lens = build_case(rng, [(3, 3)], 4, 2, 128, 8,
                                      num_pages=16)
    got = ragged_paged_attention_pallas(q, kv, bt, qsl, lens, 0.125,
                                        interpret=True)
    assert np.all(np.asarray(got[3:]) == 0.0)


def test_pallas_fp8_kv_interpret():
    """fp8 KV pages: kernel upcast path vs the oracle on an fp8 cache
    (reference capability: pallas.py fp8 kv-cache quantization)."""
    import jax.numpy as jnp
    import numpy as np

    from vllm_main_modify_tpu.ops.attention import \
        ragged_paged_attention_xla
    from vllm_main_modify_tpu.ops.pallas.ragged_attn import \
        ragged_paged_attention_pallas

    rng = np.random.default_rng(11)
    pages, page, hk, hq, d = 8, 32, 2, 4, 128
    t = 16
    kv = (rng.standard_normal((pages, page, 2 * hk, d)) * 0.3)
    kv_fp8 = jnp.asarray(kv, jnp.float32).astype(jnp.float8_e4m3fn)
    q = jnp.asarray(rng.standard_normal((t, hq, d)) * 0.3,
                    jnp.float32)
    bt = np.zeros((4, pages), np.int32)
    bt[0] = np.arange(pages)
    qsl = jnp.asarray([0, t, t, t, t], jnp.int32)
    sl = jnp.asarray([t + 8, 0, 0, 0], jnp.int32)
    ref = ragged_paged_attention_xla(
        q, kv_fp8.astype(jnp.float32).reshape(pages, page, 2 * hk, d),
        jnp.asarray(bt), qsl, sl, sm_scale=d**-0.5)
    got = ragged_paged_attention_pallas(
        q, kv_fp8.reshape(pages, page, 2 * hk * d), jnp.asarray(bt),
        qsl, sl, sm_scale=d**-0.5, num_kv_heads=hk,
        num_seqs=jnp.asarray([1], jnp.int32), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


# ---------------------------------------------------------------------
# decode fast path (pure_decode=True): one q token per sequence


def build_decode_case(rng, kv_lens, num_q_heads, num_kv_heads,
                      head_dim, page_size, num_pages,
                      dtype=jnp.float32):
    """kv_lens: per-row context length; 0 = padding row. q has exactly
    num_rows tokens (row s == sequence s)."""
    num_reqs = len(kv_lens)
    max_pages = max(-(-kv // page_size) for kv in kv_lens if kv) or 1
    q = jnp.asarray(
        rng.standard_normal((num_reqs, num_q_heads, head_dim)), dtype)
    kv_cache = jnp.asarray(
        rng.standard_normal(
            (num_pages, page_size, 2 * num_kv_heads, head_dim)), dtype)
    qsl = np.arange(num_reqs + 1, dtype=np.int32)
    n_active = sum(1 for kv in kv_lens if kv)
    qsl = np.minimum(qsl, n_active)
    block_tables = np.zeros((num_reqs, max_pages), dtype=np.int32)
    next_page = 1
    for r, kv_len in enumerate(kv_lens):
        n_pages = -(-kv_len // page_size)
        assert next_page + n_pages <= num_pages
        block_tables[r, :n_pages] = np.arange(next_page,
                                              next_page + n_pages)
        next_page += n_pages
    return (q, kv_cache, jnp.asarray(block_tables), jnp.asarray(qsl),
            jnp.asarray(np.asarray(kv_lens, np.int32)))


@pytest.mark.parametrize("heads", [(4, 4), (12, 2), (8, 1)])
def test_decode_fast_path_matches_oracle(heads):
    num_q, num_kv = heads
    rng = np.random.default_rng(7)
    kv_lens = [17, 33, 1, 64, 40, 9]
    q, kv, bt, qsl, lens = build_decode_case(rng, kv_lens, num_q,
                                             num_kv, 128, 8, 64)
    sm = 128**-0.5
    ref = ragged_paged_attention_xla(q, kv, bt, qsl, lens, sm)
    got = ragged_paged_attention_pallas(
        q, kv, bt, qsl, lens, sm,
        num_seqs=jnp.asarray([len(kv_lens)], jnp.int32),
        pure_decode=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_decode_fast_path_padding_rows_zero():
    """Padding rows (seq_len 0 / beyond num_seqs) come out exactly 0,
    matching the general kernel's contract."""
    rng = np.random.default_rng(8)
    kv_lens = [12, 30, 0, 0]
    q, kv, bt, qsl, lens = build_decode_case(rng, kv_lens, 4, 2, 128,
                                             8, 32)
    got = ragged_paged_attention_pallas(
        q, kv, bt, qsl, lens, 0.125,
        num_seqs=jnp.asarray([2], jnp.int32), pure_decode=True,
        interpret=True)
    assert np.all(np.asarray(got[2:]) == 0.0)
    ref = ragged_paged_attention_xla(q, kv, bt, qsl, lens, 0.125)
    np.testing.assert_allclose(np.asarray(got[:2]),
                               np.asarray(ref[:2]), atol=2e-5,
                               rtol=2e-5)


def test_decode_fast_path_sliding_window():
    rng = np.random.default_rng(9)
    kv_lens = [40, 33, 16, 7]
    q, kv, bt, qsl, lens = build_decode_case(rng, kv_lens, 4, 2, 128,
                                             8, 64)
    ref = ragged_paged_attention_xla(q, kv, bt, qsl, lens, 0.125,
                                     sliding_window=16)
    got = ragged_paged_attention_pallas(
        q, kv, bt, qsl, lens, 0.125, sliding_window=16,
        num_seqs=jnp.asarray([4], jnp.int32), pure_decode=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_decode_fast_path_softcap_and_sinks():
    rng = np.random.default_rng(10)
    kv_lens = [25, 10]
    q, kv, bt, qsl, lens = build_decode_case(rng, kv_lens, 4, 2, 128,
                                             8, 32)
    sinks = jnp.asarray(rng.standard_normal(4), jnp.float32)
    ref = ragged_paged_attention_xla(q, kv, bt, qsl, lens, 0.125,
                                     logit_softcap=20.0, sinks=sinks)
    got = ragged_paged_attention_pallas(
        q, kv, bt, qsl, lens, 0.125, logit_softcap=20.0, sinks=sinks,
        num_seqs=jnp.asarray([2], jnp.int32), pure_decode=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_decode_fast_path_chunked_local():
    """Llama4 chunked local attention in the decode specialization."""
    rng = np.random.default_rng(12)
    kv_lens = [40, 17, 64]
    q, kv, bt, qsl, lens = build_decode_case(rng, kv_lens, 4, 2, 128,
                                             8, 64)
    ref = ragged_paged_attention_xla(q, kv, bt, qsl, lens, 0.125,
                                     chunk_size=16)
    got = ragged_paged_attention_pallas(
        q, kv, bt, qsl, lens, 0.125, chunk_size=16,
        num_seqs=jnp.asarray([3], jnp.int32), pure_decode=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_decode_fast_path_fp8_kv():
    """fp8 KV pages through the decode specialization's whole-block
    upcast scratch (kv16_vmem)."""
    rng = np.random.default_rng(13)
    kv_lens = [20, 33, 9]
    q, kv, bt, qsl, lens = build_decode_case(rng, kv_lens, 12, 2, 128,
                                             8, 64)
    kv_fp8 = (kv * 0.3).astype(jnp.float8_e4m3fn)
    ref = ragged_paged_attention_xla(
        q, kv_fp8.astype(jnp.float32), bt, qsl, lens, 0.125)
    got = ragged_paged_attention_pallas(
        q, kv_fp8, bt, qsl, lens, 0.125, num_kv_heads=2,
        num_seqs=jnp.asarray([3], jnp.int32), pure_decode=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
