"""Quantized-weight containers: quantize → matmul ≈ full-precision,
int4 pack/unpack roundtrip, Pallas kernel vs XLA oracle (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_main_modify_tpu.ops.pallas.int4_matmul import \
    int4_matmul_pallas
from vllm_main_modify_tpu.quantization.int4_dispatch import \
    int4_matmul_xla
from vllm_main_modify_tpu.quantization.weights import (
    Int4Weight, dequant_int4, int4_pack, int4_unpack, matmul,
    quantize_fp8, quantize_int4, quantize_int8)


def rel_err(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return np.abs(a - b).mean() / (np.abs(b).mean() + 1e-9)


@pytest.fixture()
def wx():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.05,
                    jnp.float32)
    x = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
    return w, x


def test_int8_matmul_close(wx):
    w, x = wx
    qw = quantize_int8(w)
    assert qw.qweight.dtype == jnp.int8
    assert rel_err(matmul(x, qw), x @ w) < 0.01


def test_fp8_matmul_close(wx):
    w, x = wx
    qw = quantize_fp8(w)
    assert qw.qweight.dtype == jnp.float8_e4m3fn
    assert rel_err(matmul(x, qw), x @ w) < 0.03


def test_int4_pack_roundtrip():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.integers(0, 16, (64, 128)), jnp.int32)
    packed = int4_pack(q)
    assert packed.shape == (64, 16)
    np.testing.assert_array_equal(np.asarray(int4_unpack(packed)),
                                  np.asarray(q))


def test_int4_matmul_close(wx):
    w, x = wx
    qw = quantize_int4(w, group_size=64)
    # ~sigma/3 quantization step at 4 bits → ~10% relative error is
    # the information-theoretic expectation, not a bug
    assert rel_err(matmul(x, qw), x @ w) < 0.15
    # dequant consistency
    deq = dequant_int4(qw, jnp.float32)
    assert rel_err(deq, w) < 0.15


def test_int4_pallas_matches_xla_interpret():
    rng = np.random.default_rng(2)
    k_dim, o_dim, g = 512, 1024, 128
    w = jnp.asarray(rng.standard_normal((k_dim, o_dim)) * 0.05,
                    jnp.float32)
    x = jnp.asarray(rng.standard_normal((16, k_dim)), jnp.float32)
    qw = quantize_int4(w, group_size=g)
    ref = int4_matmul_xla(x, qw)
    got = int4_matmul_pallas(x, qw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_stacked_layer_axis():
    """Containers must scan over a leading layer axis like plain
    weights do."""
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((3, 64, 32)) * 0.05,
                    jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    qw = quantize_int8(w)

    def body(carry, wl):
        return carry + matmul(x, wl), None

    out, _ = jax.lax.scan(body, jnp.zeros((8, 32), jnp.float32), qw)
    ref = sum(
        np.asarray(matmul(x, quantize_int8(w[i]))) for i in range(3))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_int4_w4a8_pallas_matches_oracle_interpret():
    """W4A8 kernel (int8 MXU, integer-domain group dequant) vs its
    XLA oracle — same activation quantization, so only accumulation
    order differs."""
    from vllm_main_modify_tpu.ops.pallas.int4_matmul import \
        int4_matmul_w4a8_pallas
    from vllm_main_modify_tpu.quantization.int4_dispatch import \
        int4_matmul_w4a8_xla

    rng = np.random.default_rng(4)
    k_dim, o_dim, g = 2048, 1024, 128
    w = jnp.asarray(rng.standard_normal((k_dim, o_dim)) * 0.05,
                    jnp.float32)
    x = jnp.asarray(rng.standard_normal((16, k_dim)), jnp.float32)
    qw = quantize_int4(w, group_size=g)
    ref = int4_matmul_w4a8_xla(x, qw)
    got = int4_matmul_w4a8_pallas(x, qw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
    # end-to-end accuracy: W4A8 ≈ W4A16 quality (activation int8 adds
    # <1% relative on gaussian data)
    assert rel_err(got, np.asarray(x) @ np.asarray(w)) < 0.15


def test_int4_w4a8_pallas_prefill_m_grid_interpret():
    """Large-T path: T > 512 runs the M-gridded kernel (512-row
    tiles) instead of the XLA fallback — same oracle parity."""
    from vllm_main_modify_tpu.ops.pallas.int4_matmul import \
        int4_matmul_w4a8_pallas
    from vllm_main_modify_tpu.quantization.int4_dispatch import \
        int4_matmul_w4a8_xla

    rng = np.random.default_rng(6)
    k_dim, o_dim, g = 1024, 1024, 128
    w = jnp.asarray(rng.standard_normal((k_dim, o_dim)) * 0.05,
                    jnp.float32)
    x = jnp.asarray(rng.standard_normal((1024, k_dim)), jnp.float32)
    qw = quantize_int4(w, group_size=g)
    ref = int4_matmul_w4a8_xla(x, qw)
    got = int4_matmul_w4a8_pallas(x, qw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_int4_pallas_prefill_m_grid_interpret():
    from vllm_main_modify_tpu.ops.pallas.int4_matmul import \
        int4_matmul_pallas

    rng = np.random.default_rng(7)
    k_dim, o_dim, g = 1024, 1024, 128
    w = jnp.asarray(rng.standard_normal((k_dim, o_dim)) * 0.05,
                    jnp.float32)
    x = jnp.asarray(rng.standard_normal((1024, k_dim)), jnp.float32)
    qw = quantize_int4(w, group_size=g)
    ref = int4_matmul_xla(x, qw)
    got = int4_matmul_pallas(x, qw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_int4_w4a8_flag_dispatch():
    """quantize_int4_w4a8 flags the container; matmul() routes it to
    the W4A8 path and survives pytree flatten/unflatten."""
    from vllm_main_modify_tpu.quantization.weights import \
        quantize_int4_w4a8

    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.05,
                    jnp.float32)
    x = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
    qw = quantize_int4_w4a8(w, group_size=64)
    assert qw.w4a8
    leaves, treedef = jax.tree_util.tree_flatten(qw)
    qw2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert qw2.w4a8
    assert rel_err(matmul(x, qw), x @ w) < 0.15
