"""Cascade (shared-prefix) attention vs the monolithic oracle
(reference: gpu_model_runner.py:1293): identical logits, and the
compiled cascade step reads fewer bytes because the shared pages are
gathered once for the whole batch instead of once per token."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_main_modify_tpu.ops.attention import (
    cascade_ragged_attention_xla, ragged_paged_attention_xla)

PAGE = 32


def _build(num_reqs, common_tokens, suffix_tokens, q_per_req,
           heads=4, kv_heads=2, d=16, seed=0):
    rng = np.random.default_rng(seed)
    common_pages = common_tokens // PAGE
    pages_per_req = common_pages + (suffix_tokens + PAGE - 1) // PAGE
    num_pages = 1 + common_pages + num_reqs * (pages_per_req -
                                               common_pages)
    kv = jnp.asarray(rng.standard_normal(
        (num_pages, PAGE, 2 * kv_heads, d)) * 0.3, jnp.float32)
    bt = np.zeros((num_reqs, pages_per_req), np.int32)
    nxt = 1 + common_pages
    for r in range(num_reqs):
        bt[r, :common_pages] = np.arange(1, 1 + common_pages)
        n_suf = pages_per_req - common_pages
        bt[r, common_pages:] = np.arange(nxt, nxt + n_suf)
        nxt += n_suf
    t = num_reqs * q_per_req
    q = jnp.asarray(rng.standard_normal((t, heads, d)) * 0.5,
                    jnp.float32)
    qsl = jnp.asarray(np.arange(num_reqs + 1) * q_per_req, jnp.int32)
    seq_lens = jnp.full((num_reqs, ), common_tokens + suffix_tokens,
                        jnp.int32)
    return q, kv, jnp.asarray(bt), qsl, seq_lens, common_pages


def test_cascade_matches_monolithic():
    q, kv, bt, qsl, sl, cp = _build(8, common_tokens=128,
                                    suffix_tokens=40, q_per_req=3)
    ref = ragged_paged_attention_xla(q, kv, bt, qsl, sl, 0.25)
    got = cascade_ragged_attention_xla(q, kv, bt, qsl, sl, 0.25,
                                       common_pages=cp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_cascade_partial_prefix_bucket():
    """The static bucket may cover only part of the true shared
    prefix (power-of-2 floor); the remainder rides the suffix pass."""
    q, kv, bt, qsl, sl, cp = _build(4, common_tokens=160,
                                    suffix_tokens=33, q_per_req=1)
    ref = ragged_paged_attention_xla(q, kv, bt, qsl, sl, 0.25)
    got = cascade_ragged_attention_xla(q, kv, bt, qsl, sl, 0.25,
                                       common_pages=2)  # of 5 shared
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_cascade_reads_fewer_bytes():
    """64 decode requests sharing a 512-token prefix (the VERDICT
    scenario): the compiled cascade step must access fewer HBM bytes
    than the monolithic gather-per-token oracle."""
    q, kv, bt, qsl, sl, cp = _build(64, common_tokens=512,
                                    suffix_tokens=32, q_per_req=1)

    base = jax.jit(lambda *a: ragged_paged_attention_xla(
        *a, 0.25)).lower(q, kv, bt, qsl, sl).compile()
    casc = jax.jit(lambda *a: cascade_ragged_attention_xla(
        *a, 0.25, common_pages=cp)).lower(q, kv, bt, qsl,
                                          sl).compile()
    got = casc(q, kv, bt, qsl, sl)
    ref = base(q, kv, bt, qsl, sl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    b_base = base.cost_analysis()["bytes accessed"]
    b_casc = casc.cost_analysis()["bytes accessed"]
    assert b_casc < 0.6 * b_base, (b_casc, b_base)
