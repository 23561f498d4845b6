"""DCP context-parallel attention vs the single-device oracle
(reference capability: mla/common.py DCP path; test on the virtual
8-device CPU mesh like the other sharding tests)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from vllm_main_modify_tpu.ops.attention import \
    ragged_paged_attention_xla  # noqa: E402
from vllm_main_modify_tpu.ops.dcp import \
    dcp_paged_attention  # noqa: E402


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.array(devs[:n]).reshape(n), ("model", ))


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_dcp_matches_single_device(n_shards):
    mesh = _mesh(n_shards)
    rng = np.random.default_rng(0)
    page, heads, kv_heads, hd = 8, 4, 2, 16
    num_pages = 32  # multiple of n_shards
    # 3 requests: long decode (1 q tok, 60 ctx), chunk (4 q, 20 ctx),
    # short prefill (6 q, 6 ctx)
    q_lens = [1, 4, 6]
    seq_lens = [60, 20, 6]
    t = sum(q_lens)
    qsl = np.zeros(4, np.int32)
    qsl[1:] = np.cumsum(q_lens)
    max_pages = 8
    bt = np.zeros((3, max_pages), np.int32)
    next_page = 1
    for r, sl in enumerate(seq_lens):
        need = -(-sl // page)
        bt[r, :need] = np.arange(next_page, next_page + need)
        next_page += need
    assert next_page <= num_pages

    q = rng.normal(size=(t, heads, hd)).astype(np.float32)
    kv = rng.normal(size=(num_pages, page, 2 * kv_heads,
                          hd)).astype(np.float32)

    ref = ragged_paged_attention_xla(
        jnp.asarray(q), jnp.asarray(kv), jnp.asarray(bt),
        jnp.asarray(qsl), jnp.asarray(seq_lens, jnp.int32),
        sm_scale=hd**-0.5)

    # shard pages interleaved: global page p -> shard p % n, local
    # slab ordered by shard then local id
    reorder = np.concatenate(
        [np.arange(num_pages)[np.arange(num_pages) % n_shards == s]
         for s in range(n_shards)])
    kv_sharded_layout = kv[reorder]
    kv_dev = jax.device_put(
        jnp.asarray(kv_sharded_layout),
        NamedSharding(mesh, P("model")))

    got = dcp_paged_attention(
        jnp.asarray(q), kv_dev, jnp.asarray(bt), jnp.asarray(qsl),
        jnp.asarray(seq_lens, jnp.int32), hd**-0.5, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_dcp_token_with_pages_on_one_shard():
    """A short request whose pages all land on one shard must still be
    exact (other shards contribute zero weight, no NaNs)."""
    mesh = _mesh(4)
    rng = np.random.default_rng(1)
    page, heads, kv_heads, hd = 4, 2, 1, 8
    num_pages = 8
    bt = np.zeros((1, 2), np.int32)
    bt[0, 0] = 4  # page 4 -> shard 0 only
    q = rng.normal(size=(1, heads, hd)).astype(np.float32)
    kv = rng.normal(size=(num_pages, page, 2 * kv_heads,
                          hd)).astype(np.float32)
    qsl = np.array([0, 1], np.int32)
    sl = np.array([3], np.int32)
    ref = ragged_paged_attention_xla(
        jnp.asarray(q), jnp.asarray(kv), jnp.asarray(bt),
        jnp.asarray(qsl), jnp.asarray(sl), sm_scale=hd**-0.5)
    reorder = np.concatenate(
        [np.arange(num_pages)[np.arange(num_pages) % 4 == s]
         for s in range(4)])
    from jax.sharding import NamedSharding

    kv_dev = jax.device_put(jnp.asarray(kv[reorder]),
                            NamedSharding(mesh, P("model")))
    got = dcp_paged_attention(jnp.asarray(q), kv_dev,
                              jnp.asarray(bt), jnp.asarray(qsl),
                              jnp.asarray(sl), hd**-0.5, mesh)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
