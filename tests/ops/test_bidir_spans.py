"""Bidirectional-span attention masking (Gemma3 image blocks /
PaliGemma prefix-LM): XLA path vs dense oracle, Pallas interpret vs
XLA, interaction with sliding windows (spans bypass the window)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vllm_main_modify_tpu.ops.attention import \
    ragged_paged_attention_xla  # noqa: E402


def _dense_oracle(q, k, v, spans, sm, window=None):
    """[T,H,D] causal + bidirectional spans, single request."""
    T, H, _ = q.shape
    out = np.zeros_like(q)
    for t in range(T):
        for h in range(H):
            allowed = []
            for j in range(T):
                ok = j <= t
                if window:
                    ok = ok and j > t - window
                for lo, hi in spans:
                    if lo <= t < hi and lo <= j < hi:
                        ok = True
                allowed.append(ok)
            idx = [j for j in range(T) if allowed[j]]
            s = (q[t, h] @ k[idx, h].T) * sm
            p = np.exp(s - s.max())
            p /= p.sum()
            out[t, h] = p @ v[idx, h]
    return out


def _setup(T, Hq, Hk, D, page, n_pages):
    rng = np.random.RandomState(0)
    q = rng.randn(T, Hq, D).astype(np.float32)
    kv = rng.randn(n_pages, page, 2 * Hk, D).astype(np.float32)
    return q, kv


def test_spans_xla_vs_dense():
    T, Hq, Hk, D, page = 10, 2, 2, 8, 4
    q, kv = _setup(T, Hq, Hk, D, page, 8)
    spans = [(2, 6)]
    bt = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
    out = ragged_paged_attention_xla(
        jnp.asarray(q), jnp.asarray(kv), bt,
        jnp.asarray([0, T], jnp.int32), jnp.asarray([T], jnp.int32),
        0.5, bidir_spans=jnp.asarray([spans], jnp.int32))
    k = kv[1:4, :, 0::2, :].reshape(3 * page, Hk, D)[:T]
    v = kv[1:4, :, 1::2, :].reshape(3 * page, Hk, D)[:T]
    want = _dense_oracle(q, k, v, spans, 0.5)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_spans_bypass_sliding_window():
    T, Hq, Hk, D, page = 12, 2, 2, 8, 4
    q, kv = _setup(T, Hq, Hk, D, page, 8)
    spans = [(0, 4)]  # span behind the window of late tokens...
    bt = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
    out = ragged_paged_attention_xla(
        jnp.asarray(q), jnp.asarray(kv), bt,
        jnp.asarray([0, T], jnp.int32), jnp.asarray([T], jnp.int32),
        0.5, sliding_window=4,
        bidir_spans=jnp.asarray([spans], jnp.int32))
    k = kv[1:4, :, 0::2, :].reshape(3 * page, Hk, D)[:T]
    v = kv[1:4, :, 1::2, :].reshape(3 * page, Hk, D)[:T]
    want = _dense_oracle(q, k, v, spans, 0.5, window=4)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_spans_pallas_interpret():
    from vllm_main_modify_tpu.ops.pallas.ragged_attn import \
        ragged_paged_attention_pallas

    T, Hq, Hk, D, page = 16, 4, 2, 8, 4
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(T, Hq, D), jnp.float32)
    kv = jnp.asarray(rng.randn(16, page, 2 * Hk, D), jnp.float32)
    bt = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    qsl = jnp.asarray([0, 10, 16], jnp.int32)
    seq_lens = jnp.asarray([12, 6], jnp.int32)
    spans = jnp.asarray([[(1, 7), (8, 10)], [(0, 3), (-1, -1)]],
                        jnp.int32)
    want = ragged_paged_attention_xla(q, kv, bt, qsl, seq_lens, 0.35,
                                      bidir_spans=spans)
    got = ragged_paged_attention_pallas(
        q, kv.reshape(16, page, 2 * Hk * D), bt, qsl, seq_lens, 0.35,
        num_kv_heads=Hk, interpret=True, bidir_spans=spans)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
