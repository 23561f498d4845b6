"""LongCat-Flash parity vs HF (reference:
vllm/model_executor/models/longcat_flash.py — shortcut MoE with dual
MLA attention and identity zero-experts)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

TOKENS = [3, 17, 51, 60, 45, 12, 7, 33]


def test_longcat_flash_parity(tmp_path):
    import torch
    import transformers

    cfg = transformers.LongcatFlashConfig(
        vocab_size=64, hidden_size=32, num_layers=2,
        num_attention_heads=2, qk_nope_head_dim=8,
        qk_rope_head_dim=4, v_head_dim=8, q_lora_rank=16,
        kv_lora_rank=16, head_dim=4, ffn_hidden_size=48,
        expert_ffn_hidden_size=24, moe_topk=2, n_routed_experts=3,
        zero_expert_num=2, routed_scaling_factor=1.5,
        rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = transformers.LongcatFlashForCausalLM(cfg).to(
        torch.float32).eval()
    # give the zero-expert selection bias some signal
    with torch.no_grad():
        for l in hf.model.layers:
            l.mlp.router.e_score_correction_bias.normal_(0, 0.5)
    d = tmp_path / "tiny-longcat"
    hf.save_pretrained(d, safe_serialization=True)

    from tests.models.test_model_families import run_hf, run_ours

    ref = run_hf(hf, TOKENS)
    got = run_ours(str(d), TOKENS)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)
