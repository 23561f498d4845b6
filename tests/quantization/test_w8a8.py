"""W8A8 (activation x weight 8-bit) matmul paths + pre-quantized
checkpoint loading.

Reference: Fp8LinearOp (vllm/model_executor/layers/quantization/
fp8.py:71,209 — dynamic per-token act quant → cutlass_scaled_mm) and
compressed-tensors INT8 schemes. TPU-native: fp8/int8 MXU dot_general
with f32/s32 accumulation, scales folded in the epilogue.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_main_modify_tpu.quantization import weights as QW


@pytest.fixture(scope="module")
def xw():
    k = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(k)
    x = jax.random.normal(k1, (16, 128), dtype=jnp.float32)
    w = jax.random.normal(k2, (128, 256), dtype=jnp.float32) * 0.1
    return x, w


def test_fp8_w8a8_matmul_close(xw):
    x, w = xw
    qw = QW.quantize_fp8_w8a8(w)
    out = QW.matmul(x, qw)
    ref = x @ w
    rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / \
        np.abs(np.asarray(ref)).max()
    assert rel < 0.08, rel


def test_int8_w8a8_matmul_close(xw):
    x, w = xw
    qw = QW.quantize_int8_w8a8(w)
    out = QW.matmul(x, qw)
    ref = x @ w
    rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / \
        np.abs(np.asarray(ref)).max()
    assert rel < 0.05, rel


def test_static_act_scale_matches_dynamic_scale_shape(xw):
    x, w = xw
    qw0 = QW.quantize_int8_w8a8(w)
    amax = float(jnp.abs(x).max())
    qw = QW.Int8W8A8Weight(qw0.qweight, qw0.scale,
                           jnp.asarray([amax / 127.0]))
    out = QW.matmul(x, qw)
    ref = x @ w
    rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / \
        np.abs(np.asarray(ref)).max()
    assert rel < 0.05, rel


def test_w8a8_stacked_layers(xw):
    """Layer-stacked containers must work under vmap/scan layouts."""
    x, w = xw
    ws = jnp.stack([w, w * 2.0])
    qw = QW.quantize_int8_w8a8(ws)
    assert qw.qweight.shape == (2, 128, 256)
    out0 = QW.matmul(x, jax.tree.map(lambda a: a[0], qw))
    out1 = QW.matmul(x, jax.tree.map(lambda a: a[1], qw))
    ref = np.asarray(x @ w)
    assert np.abs(np.asarray(out0) - ref).max() / np.abs(ref).max() \
        < 0.05
    assert np.abs(np.asarray(out1) - 2 * ref).max() / \
        (2 * np.abs(ref).max()) < 0.05


def _write_prequant_int8(src_dir, dst, per_tensor_input_scale):
    """Rewrite a float tiny-llama checkpoint as compressed-tensors
    style INT8: proj.weight int8 + proj.weight_scale (+input_scale)."""
    import os

    from safetensors import safe_open
    from safetensors.numpy import save_file

    src = os.path.join(src_dir, "model.safetensors")
    out = {}
    with safe_open(src, framework="numpy") as f:
        for name in f.keys():
            t = f.get_tensor(name)
            if (t.ndim == 2 and min(t.shape) >= 64
                    and "embed" not in name and "lm_head" not in name
                    and "norm" not in name):
                tf = t.astype(np.float32)  # [out, in]
                amax = np.abs(tf).max(axis=1)
                scale = np.maximum(amax / 127.0, 1e-8)
                q = np.clip(np.round(tf / scale[:, None]), -127,
                            127).astype(np.int8)
                base = name.rsplit(".weight", 1)[0]
                out[base + ".weight"] = q
                out[base + ".weight_scale"] = scale.astype(np.float32)
                if per_tensor_input_scale:
                    out[base + ".input_scale"] = np.asarray(
                        [0.05], dtype=np.float32)
            else:
                out[name] = t
    os.makedirs(dst, exist_ok=True)
    save_file(out, os.path.join(dst, "model.safetensors"))
    for aux in ("config.json", "tokenizer.json",
                "tokenizer_config.json", "special_tokens_map.json",
                "generation_config.json"):
        p = os.path.join(src_dir, aux)
        if os.path.exists(p):
            import shutil

            shutil.copy(p, os.path.join(dst, aux))
    return dst


def test_prequantized_checkpoint_load(tiny_llama_dir, tmp_path):
    """INT8 checkpoint with weight_scale loads into Int8W8A8Weight and
    the dequantized values round-trip the original weights."""
    from jax.sharding import Mesh

    from vllm_main_modify_tpu.config import ModelConfig
    from vllm_main_modify_tpu.models.loader import load_model_weights
    from vllm_main_modify_tpu.models.registry import create_model

    qdir = _write_prequant_int8(tiny_llama_dir,
                                str(tmp_path / "int8ckpt"), False)
    cfg = ModelConfig(model=qdir, dtype="float32", max_model_len=64,
                      quantization="int8_w8a8")
    model = create_model(cfg)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, cfg, mesh)
    qp = params["layers"]["q_proj"]
    assert isinstance(qp, QW.Int8W8A8Weight)
    assert qp.act_scale is None

    # round-trip vs the float checkpoint
    fcfg = ModelConfig(model=tiny_llama_dir, dtype="float32",
                       max_model_len=64)
    fparams = load_model_weights(create_model(fcfg), fcfg, mesh)
    deq = np.asarray(qp.qweight, dtype=np.float32) * \
        np.asarray(qp.scale)[:, None, :]
    ref = np.asarray(fparams["layers"]["q_proj"], dtype=np.float32)
    assert np.abs(deq - ref).max() <= \
        np.abs(ref).max() / 127.0 + 1e-6


def test_prequantized_with_input_scale(tiny_llama_dir, tmp_path):
    from jax.sharding import Mesh

    from vllm_main_modify_tpu.config import ModelConfig
    from vllm_main_modify_tpu.models.loader import load_model_weights
    from vllm_main_modify_tpu.models.registry import create_model

    qdir = _write_prequant_int8(tiny_llama_dir,
                                str(tmp_path / "int8ckpt_s"), True)
    cfg = ModelConfig(model=qdir, dtype="float32", max_model_len=64,
                      quantization="int8_w8a8")
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(create_model(cfg), cfg, mesh)
    qp = params["layers"]["q_proj"]
    assert qp.act_scale is not None


def test_w8a8_e2e_generates(tiny_llama_dir, tmp_path):
    """End-to-end: W8A8 engine generates sane tokens (greedy matches
    the float engine on most steps — random tiny weights make logit
    gaps small, so just require successful generation + >=60% token
    agreement on the first steps)."""
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    qdir = _write_prequant_int8(tiny_llama_dir,
                                str(tmp_path / "int8ckpt_e2e"), False)
    kw = dict(dtype="float32", max_model_len=64, max_num_seqs=4,
              max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    p = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    ref = LLM(model=tiny_llama_dir, **kw).generate(["hello world"], p)
    out = LLM(model=qdir, quantization="int8_w8a8",
              **kw).generate(["hello world"], p)
    assert len(out[0].outputs[0].token_ids) == 8
    agree = sum(
        a == b for a, b in zip(ref[0].outputs[0].token_ids,
                               out[0].outputs[0].token_ids))
    assert agree >= 4, (ref[0].outputs[0].token_ids,
                        out[0].outputs[0].token_ids)
