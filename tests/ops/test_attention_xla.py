"""Ragged paged attention (XLA reference) vs dense per-sequence oracle,
and paged KV write. Strategy mirrors the reference's kernel tests
(tests/kernels/, tests/v1/tpu/test_kv_cache_update_kernel.py): random
shapes, numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_main_modify_tpu.ops.attention import ragged_paged_attention_xla
from vllm_main_modify_tpu.ops.kv_cache import write_to_kv_cache

PAGE = 8


def dense_attention(q, k, v, sm_scale, sliding_window=None, softcap=None):
    """Oracle: plain causal attention for one sequence.
    q: [Tq, H, D]; k/v: [Tk, K, D]."""
    tq, h, d = q.shape
    tk, kh, _ = k.shape
    g = h // kh
    q = q.astype(np.float32).reshape(tq, kh, g, d)
    scores = np.einsum("qkgd,skd->qkgs", q, k.astype(np.float32))
    scores *= sm_scale
    if softcap:
        scores = np.tanh(scores / softcap) * softcap
    q_pos = np.arange(tk - tq, tk)[:, None]
    kv_idx = np.arange(tk)[None, :]
    mask = kv_idx <= q_pos
    if sliding_window:
        mask &= kv_idx > (q_pos - sliding_window)
    scores = np.where(mask[:, None, None, :], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("qkgs,skd->qkgd", p, v.astype(np.float32))
    return out.reshape(tq, h, d)


def build_case(rng, seq_specs, num_q_heads=4, num_kv_heads=2, head_dim=16,
               num_pages=64, max_pages=16):
    """seq_specs: list of (q_len, kv_len). Returns packed inputs + per-seq
    dense k/v for the oracle."""
    total_q = sum(q for q, _ in seq_specs)
    q = rng.standard_normal((total_q, num_q_heads, head_dim),
                            dtype=np.float32)
    kv_cache = np.zeros((num_pages, PAGE, 2 * num_kv_heads, head_dim),
                        np.float32)
    block_tables = np.zeros((len(seq_specs), max_pages), np.int32)
    seq_lens = np.array([kv for _, kv in seq_specs], np.int32)
    qsl = np.zeros(len(seq_specs) + 1, np.int32)
    dense_kv = []
    next_page = 1  # page 0 = null
    for i, (q_len, kv_len) in enumerate(seq_specs):
        qsl[i + 1] = qsl[i] + q_len
        n_pages = -(-kv_len // PAGE)
        pages = list(range(next_page, next_page + n_pages))
        next_page += n_pages
        block_tables[i, :n_pages] = pages
        k = rng.standard_normal((kv_len, num_kv_heads, head_dim),
                                dtype=np.float32)
        v = rng.standard_normal((kv_len, num_kv_heads, head_dim),
                                dtype=np.float32)
        dense_kv.append((k, v))
        for t in range(kv_len):
            pg, off = pages[t // PAGE], t % PAGE
            kv_cache[pg, off, 0::2] = k[t]
            kv_cache[pg, off, 1::2] = v[t]
    return q, kv_cache, block_tables, qsl, seq_lens, dense_kv


@pytest.mark.parametrize("seq_specs", [
    [(1, 10)],                      # single decode
    [(16, 16)],                     # pure prefill
    [(8, 24)],                      # chunked-prefill continuation
    [(1, 5), (1, 33), (1, 8)],      # decode batch
    [(12, 12), (1, 7), (5, 21)],    # mixed prefill+decode
])
def test_ragged_vs_dense(seq_specs):
    rng = np.random.default_rng(0)
    q, kv_cache, bt, qsl, sl, dense_kv = build_case(rng, seq_specs)
    sm_scale = 1.0 / np.sqrt(q.shape[-1])
    out = np.asarray(
        ragged_paged_attention_xla(jnp.asarray(q), jnp.asarray(kv_cache),
                                   jnp.asarray(bt), jnp.asarray(qsl),
                                   jnp.asarray(sl), sm_scale))
    for i, (q_len, kv_len) in enumerate(seq_specs):
        ref = dense_attention(q[qsl[i]:qsl[i + 1]], *dense_kv[i],
                              sm_scale)
        np.testing.assert_allclose(out[qsl[i]:qsl[i + 1]], ref,
                                   rtol=2e-5, atol=2e-5)


def test_sliding_window():
    rng = np.random.default_rng(1)
    specs = [(6, 30)]
    q, kv_cache, bt, qsl, sl, dense_kv = build_case(rng, specs)
    sm_scale = 0.25
    out = np.asarray(
        ragged_paged_attention_xla(jnp.asarray(q), jnp.asarray(kv_cache),
                                   jnp.asarray(bt), jnp.asarray(qsl),
                                   jnp.asarray(sl), sm_scale,
                                   sliding_window=8))
    ref = dense_attention(q, *dense_kv[0], sm_scale, sliding_window=8)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_logit_softcap():
    rng = np.random.default_rng(2)
    specs = [(4, 12), (1, 9)]
    q, kv_cache, bt, qsl, sl, dense_kv = build_case(rng, specs)
    out = np.asarray(
        ragged_paged_attention_xla(jnp.asarray(q), jnp.asarray(kv_cache),
                                   jnp.asarray(bt), jnp.asarray(qsl),
                                   jnp.asarray(sl), 0.25,
                                   logit_softcap=30.0))
    for i, _ in enumerate(specs):
        ref = dense_attention(q[qsl[i]:qsl[i + 1]], *dense_kv[i], 0.25,
                              softcap=30.0)
        np.testing.assert_allclose(out[qsl[i]:qsl[i + 1]], ref,
                                   rtol=2e-5, atol=2e-5)


def test_padded_tokens_dont_crash():
    """Packed q longer than real tokens: padded tail maps to last seq."""
    rng = np.random.default_rng(3)
    q, kv_cache, bt, qsl, sl, dense_kv = build_case(rng, [(2, 6)])
    q_pad = np.concatenate([q, np.zeros((6, *q.shape[1:]), np.float32)])
    out = np.asarray(
        ragged_paged_attention_xla(jnp.asarray(q_pad),
                                   jnp.asarray(kv_cache),
                                   jnp.asarray(bt), jnp.asarray(qsl),
                                   jnp.asarray(sl), 0.25))
    ref = dense_attention(q, *dense_kv[0], 0.25)
    np.testing.assert_allclose(out[:2], ref, rtol=2e-5, atol=2e-5)
    assert np.all(np.isfinite(out))


def test_write_to_kv_cache():
    rng = np.random.default_rng(4)
    kv_cache = jnp.zeros((8, PAGE, 4, 16), jnp.float32)
    t = 10
    k = rng.standard_normal((t, 2, 16), dtype=np.float32)
    v = rng.standard_normal((t, 2, 16), dtype=np.float32)
    # tokens 0..5 → page 2 slots 3..8; tokens 6..9 → page 5 slots 0..3
    slots = np.array([2 * PAGE + 3 + i for i in range(5)] +
                     [5 * PAGE + i for i in range(4)] + [-1], np.int32)
    out = np.asarray(
        write_to_kv_cache(kv_cache, jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(slots)))
    for i, s in enumerate(slots):
        if s < 0:
            continue
        pg, off = divmod(int(s), PAGE)
        np.testing.assert_array_equal(out[pg, off, 0::2], k[i])
        np.testing.assert_array_equal(out[pg, off, 1::2], v[i])
    # everything else untouched (zero)
    mask = np.ones((8, PAGE), bool)
    for s in slots[slots >= 0]:
        mask[divmod(int(s), PAGE)] = False
    assert np.all(out[mask] == 0)
