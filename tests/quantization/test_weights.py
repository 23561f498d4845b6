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


# ---- MXFP4 (GPT-OSS) + block-scale FP8 (DeepSeek) ------------------


def test_mxfp4_roundtrip_and_matmul():
    from vllm_main_modify_tpu.quantization.weights import (
        dequant_mxfp4, quantize_mxfp4)

    rng = np.random.default_rng(8)
    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.05,
                    jnp.float32)
    qw = quantize_mxfp4(w)
    assert qw.packed.dtype == jnp.uint8
    assert qw.packed.shape == (256, 64)
    assert qw.scales.shape == (8, 128)
    deq = dequant_mxfp4(qw, jnp.float32)
    # 4-bit e2m1 with power-of-2 scales: ~0.1 relative on gaussian
    assert rel_err(deq, w) < 0.2
    x = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
    assert rel_err(matmul(x, qw), x @ w) < 0.2


def test_mxfp4_repack_matches_oracle():
    """Checkpoint layout (blocks u8 [out, in/32, 16] low-nibble-first
    + e8m0 scales [out, in/32]) repacks to the canonical form with
    exact dequant parity."""
    from vllm_main_modify_tpu.quantization.formats import repack_mxfp4
    from vllm_main_modify_tpu.quantization.weights import (
        FP4_E2M1, Mxfp4Weight, dequant_mxfp4)

    rng = np.random.default_rng(9)
    out_d, in_d = 8, 64
    nib = rng.integers(0, 16, (out_d, in_d)).astype(np.uint8)
    e8m0 = rng.integers(120, 132, (out_d, in_d // 32)).astype(np.uint8)
    blocks = (nib[:, 0::2] | (nib[:, 1::2] << 4)).reshape(
        out_d, in_d // 32, 16)
    packed, scales = repack_mxfp4(blocks, e8m0)
    got = np.asarray(dequant_mxfp4(
        Mxfp4Weight(jnp.asarray(packed), jnp.asarray(scales)),
        jnp.float32))
    lut = np.asarray(FP4_E2M1, np.float32)
    want = (lut[nib] * np.repeat(
        2.0**(e8m0.astype(np.float32) - 127), 32, axis=1)).T
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fp8_block_roundtrip_and_matmul():
    from vllm_main_modify_tpu.quantization.weights import (
        dequant_fp8_block, quantize_fp8_block)

    rng = np.random.default_rng(10)
    w = jnp.asarray(rng.standard_normal((256, 256)) * 0.03,
                    jnp.float32)
    qw = quantize_fp8_block(w, (128, 128))
    assert qw.scales.shape == (2, 2)
    deq = dequant_fp8_block(qw, jnp.float32)
    assert rel_err(deq, w) < 0.03
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    assert rel_err(matmul(x, qw), x @ w) < 0.05


def test_fp8_block_checkpoint_e2e(tiny_llama_dir, tmp_path_factory):
    """A DeepSeek-style block-fp8 export of the tiny llama (weight
    f8e4m3 + weight_scale_inv per projection + quantization_config)
    loads through the engine and generates sanely vs bf16."""
    import json
    import os
    import shutil

    import ml_dtypes
    from safetensors.numpy import load_file, save_file

    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    src = load_file(os.path.join(tiny_llama_dir,
                                 "model.safetensors"))
    out_dir = str(tmp_path_factory.mktemp("fp8block") / "m")
    os.makedirs(out_dir, exist_ok=True)
    bn = bk = 32  # tiny dims; block semantics identical to 128
    tensors = {}
    for k, v in src.items():
        if k.endswith(".weight") and v.ndim == 2 and \
                "proj" in k and v.shape[0] % bn == 0 and \
                v.shape[1] % bk == 0:
            w = v.astype(np.float32)
            o_d, i_d = w.shape
            wb = w.reshape(o_d // bn, bn, i_d // bk, bk)
            amax = np.abs(wb).max(axis=(1, 3))
            s = np.maximum(amax / 448.0, 1e-12).astype(np.float32)
            q = (wb / s[:, None, :, None]).reshape(o_d, i_d)
            tensors[k] = q.astype(ml_dtypes.float8_e4m3fn)
            tensors[k.replace(".weight", ".weight_scale_inv")] = s
        else:
            tensors[k] = v
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    for f in os.listdir(tiny_llama_dir):
        if f != "model.safetensors":
            shutil.copy(os.path.join(tiny_llama_dir, f),
                        os.path.join(out_dir, f))
    with open(os.path.join(out_dir, "config.json")) as f:
        cfg = json.load(f)
    cfg["quantization_config"] = {
        "quant_method": "fp8", "fmt": "e4m3",
        "weight_block_size": [bn, bk]}
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f)

    kw = dict(dtype="float32", max_model_len=64, max_num_seqs=4,
              max_num_batched_tokens=32, block_size=4,
              num_kv_blocks=64)
    p = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    got_llm = LLM(model=out_dir, **kw)  # noqa: F841
    # the loader must have produced block containers for the projs,
    # and dequant must reproduce the original weights to fp8 accuracy
    from vllm_main_modify_tpu.quantization.weights import (
        Fp8BlockWeight, dequant_fp8_block)
    layers = got_llm.engine.engine_core.model_runner.params["layers"]
    assert isinstance(layers["gate_proj"], Fp8BlockWeight)
    orig = np.stack([
        src[f"model.layers.{i}.mlp.gate_proj.weight"].astype(
            np.float32).T for i in range(2)
    ])
    deq = np.asarray(dequant_fp8_block(layers["gate_proj"],
                                       jnp.float32))
    assert rel_err(deq, orig) < 0.03
    # end to end: loads, generates, stays finite (token-exact parity
    # is not expected — random tiny-model logits are near-uniform, so
    # ~2% fp8 weight error legitimately flips greedy argmax)
    got = got_llm.generate(["hello world this"], p)[0]
    assert len(got.outputs[0].token_ids) == 8


def test_int4_w4a8_requant_prefill_interpret():
    """Progressive-requant prefill kernel (T >= 256 tiles) vs its
    exact int32 oracle, plus an accuracy bound vs the fp matmul
    (the 4-bit integer group multiplier adds bounded error on top of
    W4; reference recipe: QServe W4A8 progressive quantization)."""
    from vllm_main_modify_tpu.ops.pallas.int4_matmul import \
        int4_matmul_w4a8_pallas
    from vllm_main_modify_tpu.quantization.int4_dispatch import \
        int4_matmul_w4a8_requant_xla
    from vllm_main_modify_tpu.quantization.weights import \
        quantize_int4_w4a8

    rng = np.random.default_rng(11)
    k_dim, o_dim, g = 1024, 1024, 128
    w = jnp.asarray(rng.standard_normal((k_dim, o_dim)) * 0.05,
                    jnp.float32)
    x = jnp.asarray(rng.standard_normal((1024, k_dim)), jnp.float32)
    qw = quantize_int4_w4a8(w, group_size=g)
    assert qw.requant_m is not None
    # m respects the int8 product bound
    m = np.asarray(qw.requant_m)
    assert m.min() >= 1 and m.max() <= 127
    ref = int4_matmul_w4a8_requant_xla(x, qw)
    got = int4_matmul_w4a8_pallas(x, qw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
    assert rel_err(got, np.asarray(x) @ np.asarray(w)) < 0.15


def test_int4_w4a8_requant_decode_unchanged():
    """Decode tiles (T < 256) keep the exact per-group path even when
    requant arrays are attached."""
    from vllm_main_modify_tpu.ops.pallas.int4_matmul import \
        int4_matmul_w4a8_pallas
    from vllm_main_modify_tpu.quantization.int4_dispatch import \
        int4_matmul_w4a8_xla
    from vllm_main_modify_tpu.quantization.weights import \
        quantize_int4_w4a8

    rng = np.random.default_rng(12)
    w = jnp.asarray(rng.standard_normal((1024, 1024)) * 0.05,
                    jnp.float32)
    x = jnp.asarray(rng.standard_normal((16, 1024)), jnp.float32)
    qw = quantize_int4_w4a8(w, group_size=128)
    ref = int4_matmul_w4a8_xla(x, qw)
    got = int4_matmul_w4a8_pallas(x, qw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_attach_requant_stacked_layers():
    """Stacked [L, ...] weights: per-layer requant arrays match the
    per-layer computation."""
    from vllm_main_modify_tpu.quantization.weights import (
        Int4Weight, attach_requant, quantize_int4_w4a8)

    rng = np.random.default_rng(13)
    ws = [jnp.asarray(rng.standard_normal((256, 512)) * 0.05,
                      jnp.float32) for _ in range(3)]
    qs = [quantize_int4_w4a8(w, group_size=128) for w in ws]
    stacked = attach_requant(Int4Weight(
        packed=jnp.stack([q.packed for q in qs]),
        scales=jnp.stack([q.scales for q in qs]),
        zeros=jnp.stack([q.zeros for q in qs]), w4a8=True))
    for i, q in enumerate(qs):
        np.testing.assert_array_equal(np.asarray(stacked.requant_m[i]),
                                      np.asarray(q.requant_m))
        np.testing.assert_allclose(np.asarray(stacked.requant_s[i]),
                                   np.asarray(q.requant_s))
