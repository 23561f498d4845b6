"""Grouped-matmul MoE vs the dense oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_main_modify_tpu.layers.activation import silu_and_mul
from vllm_main_modify_tpu.layers.moe import (moe_ffn,
                                             moe_ffn_dense_reference)


@pytest.mark.parametrize("renorm", [True, False])
@pytest.mark.parametrize("t,e,k", [(16, 4, 2), (33, 8, 2), (7, 4, 4)])
def test_moe_matches_dense(t, e, k, renorm):
    rng = np.random.default_rng(0)
    h, inter = 32, 64
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.float32)
    rw = jnp.asarray(rng.standard_normal((h, e)) * 0.1, jnp.float32)
    wg = jnp.asarray(rng.standard_normal((e, h, inter)) * 0.1,
                     jnp.float32)
    wu = jnp.asarray(rng.standard_normal((e, h, inter)) * 0.1,
                     jnp.float32)
    wd = jnp.asarray(rng.standard_normal((e, inter, h)) * 0.1,
                     jnp.float32)
    ref = moe_ffn_dense_reference(x, rw, wg, wu, wd, k, silu_and_mul,
                                  renormalize=renorm)
    got = moe_ffn(x, rw, wg, wu, wd, k, silu_and_mul,
                  renormalize=renorm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
