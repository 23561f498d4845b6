"""Page-granular KV-update (production path) vs the token-scatter
oracle. Reference test style: tests/v1/tpu/test_kv_cache_update_kernel.py."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_main_modify_tpu.ops.kv_cache import write_to_kv_cache
from vllm_main_modify_tpu.ops.kv_cache import write_to_kv_cache_paged


def make_slices(slot_mapping: np.ndarray, page_size: int, s_pad: int):
    """Contiguous runs of (cache_start, new_start, len) within pages —
    the host-side metadata build mirrored from the runner."""
    slices = []
    t = 0
    n = len(slot_mapping)
    while t < n:
        if slot_mapping[t] < 0:
            t += 1
            continue
        start = t
        while (t + 1 < n and slot_mapping[t + 1] == slot_mapping[t] + 1
               and slot_mapping[t + 1] % page_size != 0):
            t += 1
        slices.append((slot_mapping[start], start, t - start + 1))
        t += 1
    out = np.zeros((3, s_pad), dtype=np.int32)
    for i, (c, s, l) in enumerate(slices):
        out[:, i] = (c, s, l)
    return jnp.asarray(out), jnp.asarray([len(slices)], dtype=np.int32)


@pytest.mark.parametrize("seed", [0, 1])
def test_kv_update_matches_scatter(seed):
    rng = np.random.default_rng(seed)
    num_pages, page_size, two_kh, d = 16, 8, 4, 128
    t = 24
    cache = jnp.asarray(
        rng.standard_normal((num_pages, page_size, two_kh, d)),
        jnp.float32)
    key = jnp.asarray(rng.standard_normal((t, two_kh // 2, d)),
                      jnp.float32)
    value = jnp.asarray(rng.standard_normal((t, two_kh // 2, d)),
                        jnp.float32)

    # two requests' new tokens + padding: req A slots 5..20 (crosses
    # pages), req B slots 40..45, tail padded
    slot_mapping = np.full(t, -1, dtype=np.int32)
    slot_mapping[0:16] = np.arange(5, 21)
    slot_mapping[16:22] = np.arange(40, 46)

    ref = write_to_kv_cache(cache, key, value,
                            jnp.asarray(slot_mapping))

    slices, num = make_slices(slot_mapping, page_size, s_pad=16)
    got = write_to_kv_cache_paged(cache, key, value, slices, num)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_kv_update_full_pages():
    """Slices of exactly page_size (aligned prefill)."""
    rng = np.random.default_rng(2)
    num_pages, page_size, two_kh, d = 8, 8, 2, 128
    t = 32
    cache = jnp.zeros((num_pages, page_size, two_kh, d), jnp.float32)
    key = jnp.asarray(rng.standard_normal((t, 1, d)), jnp.float32)
    value = jnp.asarray(rng.standard_normal((t, 1, d)), jnp.float32)
    slot_mapping = np.arange(8, 40, dtype=np.int32)  # pages 1..4 full

    ref = write_to_kv_cache(cache, key, value,
                            jnp.asarray(slot_mapping))
    slices, num = make_slices(slot_mapping, page_size, s_pad=8)
    got = write_to_kv_cache_paged(cache, key, value, slices, num)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
