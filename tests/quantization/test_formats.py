"""GPTQ/AWQ format repacking vs the per-spec dequant oracle, and
end-to-end quantized model loading from a synthetic checkpoint."""

import json

import numpy as np
import pytest

from vllm_main_modify_tpu.quantization.formats import (AWQ_ORDER,
                                                       dequant_reference,
                                                       repack_awq,
                                                       repack_gptq)


def pack_rows(q):  # GPTQ qweight layout [in/8, out]
    k, o = q.shape
    qr = q.reshape(k // 8, 8, o).astype(np.uint32)
    shifts = (np.arange(8, dtype=np.uint32) * 4).reshape(1, 8, 1)
    return (qr << shifts).sum(axis=1).astype(np.int32)


def pack_cols_order(q, order):  # qzeros/AWQ layout [a, b/8]
    a, b = q.shape
    qr = q.reshape(a, b // 8, 8)[:, :, order].astype(np.uint32)
    shifts = (np.arange(8, dtype=np.uint32) * 4).reshape(1, 1, 8)
    return (qr << shifts).sum(axis=2).astype(np.int32)


def canonical_dequant(packed, scales, zeros, perm=None):
    """Dequant of OUR canonical layout (numpy mirror)."""
    from vllm_main_modify_tpu.quantization.formats import _unpack_cols

    q = _unpack_cols(packed)
    k = q.shape[0]
    g = k // scales.shape[0]
    gidx = np.arange(k) // g
    w = scales[gidx] * (q.astype(np.float32) - zeros[gidx])
    if perm is not None:
        # rows were sorted: canonical w[r] corresponds to input perm[r]
        out = np.empty_like(w)
        out[perm] = w
        return out
    return w


@pytest.mark.parametrize("act_order", [False, True])
def test_gptq_repack(act_order):
    rng = np.random.default_rng(0)
    k, o, g = 64, 32, 16
    q = rng.integers(0, 16, (k, o)).astype(np.int32)
    zeros = rng.integers(1, 15, (k // g, o)).astype(np.int32)
    scales = (rng.random((k // g, o)).astype(np.float32) + 0.5)
    if act_order:
        g_idx = rng.permutation(np.repeat(np.arange(k // g), g))
    else:
        g_idx = np.arange(k) // g

    qweight = pack_rows(q)
    qzeros = pack_cols_order(zeros - 1, np.arange(8))  # v1 +1 quirk
    ref = dequant_reference(q, scales, zeros, g_idx)

    packed, sc, zp, perm = repack_gptq(qweight, qzeros, scales, g_idx)
    got = canonical_dequant(packed, sc, zp, perm)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    if act_order:
        assert perm is not None
    else:
        assert perm is None


def test_awq_repack():
    rng = np.random.default_rng(1)
    k, o, g = 64, 32, 16
    q = rng.integers(0, 16, (k, o)).astype(np.int32)
    zeros = rng.integers(0, 16, (k // g, o)).astype(np.int32)
    scales = (rng.random((k // g, o)).astype(np.float32) + 0.5)

    qweight = pack_cols_order(q, AWQ_ORDER)
    qzeros = pack_cols_order(zeros, AWQ_ORDER)
    ref = dequant_reference(q, scales, zeros)

    packed, sc, zp, perm = repack_awq(qweight, qzeros, scales)
    got = canonical_dequant(packed, sc, zp, perm)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_e2e_quantized_generation(tiny_llama_dir):
    """On-the-fly int8 quantization over the tiny checkpoint must load
    and generate sane output close to the fp32 engine."""
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    p = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    kw = dict(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    ref = LLM(**kw).generate(["hello world this is"], p)[0]
    q = LLM(quantization="int8", **kw).generate(
        ["hello world this is"], p)[0]
    assert len(q.outputs[0].token_ids) == 12
    # int8 per-channel is near-lossless: greedy tokens should mostly
    # agree with fp32 on a 12-token horizon
    agree = sum(a == b for a, b in zip(ref.outputs[0].token_ids,
                                       q.outputs[0].token_ids))
    assert agree >= 8, (ref.outputs[0].token_ids,
                        q.outputs[0].token_ids)


def test_e2e_w4a8_generation(tiny_llama_dir):
    """On-the-fly W4A8 quantization (int4 groups + int8 activations +
    progressive-requant arrays attached at load) must generate through
    the stacked-layer path (weights.py index_layer_weights keeps
    Int4Weight stacked with a traced layer id; the CPU run exercises
    the XLA fallback's _delayer)."""
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    p = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    kw = dict(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    out = LLM(quantization="w4a8", **kw).generate(
        ["hello world this is"], p)[0]
    toks = out.outputs[0].token_ids
    assert len(toks) == 8
    assert all(0 <= t for t in toks)
