"""Parity for the V3-routing MoE families (models/moe_v3.py):
GLM-4.5, dots.llm1, ERNIE 4.5 MoE — logits vs the HF classes
(reference models: vllm glm4_moe.py / dots1.py / ernie45_moe.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

TOKENS = [3, 17, 91, 100, 45, 12, 7, 110, 33, 99]
BASE = dict(vocab_size=128, hidden_size=64, intermediate_size=96,
            moe_intermediate_size=32, num_hidden_layers=3,
            num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, tie_word_embeddings=False)


def _build(tmp_path, cls_name, **kw):
    import torch
    import transformers as tr

    torch.manual_seed(0)
    cfg = getattr(tr, cls_name + "Config")(**kw)
    hf = getattr(tr, cls_name + "ForCausalLM")(cfg).to(
        torch.float32).eval()
    # correction biases initialize to zero — give them real values so
    # the selection-vs-weight split is actually exercised
    sd = hf.state_dict()
    g = torch.Generator().manual_seed(7)
    for k, v in sd.items():
        if "e_score_correction_bias" in k:
            v.copy_(torch.randn(v.shape, generator=g) * 0.5)
    d = tmp_path / cls_name
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def _check(path, hf):
    import torch

    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    from tests.models.test_model_families import run_ours

    got = run_ours(str(path), TOKENS)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_glm4_moe_parity(tmp_path):
    path, hf = _build(tmp_path, "Glm4Moe", **BASE, head_dim=16,
                      n_routed_experts=4, num_experts_per_tok=2,
                      n_shared_experts=1, n_group=2, topk_group=1,
                      first_k_dense_replace=1, use_qk_norm=True,
                      routed_scaling_factor=1.5)
    _check(path, hf)


def test_dots1_parity(tmp_path):
    path, hf = _build(tmp_path, "Dots1", **BASE,
                      n_routed_experts=4, num_experts_per_tok=2,
                      n_shared_experts=1, n_group=2, topk_group=1,
                      first_k_dense_replace=1, norm_topk_prob=True,
                      routed_scaling_factor=2.0)
    _check(path, hf)


def test_ernie45_moe_parity(tmp_path):
    kw = dict(BASE)
    kw.pop("tie_word_embeddings")
    path, hf = _build(tmp_path, "Ernie4_5_Moe", **kw,
                      moe_num_experts=4, moe_k=2,
                      moe_num_shared_experts=1,
                      moe_layer_start_index=1,
                      tie_word_embeddings=True, use_bias=True)
    _check(path, hf)


def test_hunyuan_dense_parity(tmp_path):
    """HunYuanDenseV1: per-head RMS qk norm AFTER rope
    (reference: hunyuan_v1.py:221-227)."""
    path, hf = _build(tmp_path, "HunYuanDenseV1", **BASE, head_dim=16,
                      use_qk_norm=True)
    _check(path, hf)


def test_apertus_parity(tmp_path):
    """Apertus: xIELU MLP with learnable per-layer activation params
    (reference: apertus.py:60-98)."""
    kw = dict(BASE, max_position_embeddings=16384)
    kw.pop("moe_intermediate_size")
    path, hf = _build(tmp_path, "Apertus", **kw)
    _check(path, hf)
