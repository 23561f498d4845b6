"""Transformers-backend fallback (reference:
vllm/model_executor/models/transformers.py @ registry.py:330-334):
UNREGISTERED llama-layout architectures must load and match HF logits
through the generic fallback; incompatible architectures must be
refused with a clear reason instead of silently mis-serving."""

import numpy as np
import pytest

from tests.models.test_model_families import run_hf, run_ours
from vllm_main_modify_tpu.models.registry import (_REGISTRY,
                                                  resolve_model_cls)

TOKENS = [3, 17, 91, 2, 45, 12, 7, 15, 33, 9]


def _build(tmp_path, name, cfg_cls, cls_name, **kw):
    import torch
    import transformers

    cfg = cfg_cls(vocab_size=128, hidden_size=32,
                  intermediate_size=64, num_hidden_layers=2,
                  num_attention_heads=4, num_key_value_heads=2, **kw)
    torch.manual_seed(0)
    hf = getattr(transformers, cls_name)(cfg).to(torch.float32).eval()
    path = tmp_path / name
    hf.save_pretrained(path, safe_serialization=True)
    return str(path), hf


@pytest.mark.parametrize("arch", ["helium", "ministral"])
def test_fallback_logit_parity(arch, tmp_path):
    import transformers

    if arch == "helium":
        path, hf = _build(tmp_path, arch, transformers.HeliumConfig,
                          "HeliumForCausalLM", head_dim=8)
        assert "HeliumForCausalLM" not in _REGISTRY
    else:
        path, hf = _build(tmp_path, arch,
                          transformers.MinistralConfig,
                          "MinistralForCausalLM", head_dim=8,
                          sliding_window=8)
        assert "MinistralForCausalLM" not in _REGISTRY
    ref = run_hf(hf, TOKENS)
    got = run_ours(path, TOKENS)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_fallback_rejects_incompatible_math():
    """A config needing math the scaffold lacks must be refused."""
    from vllm_main_modify_tpu.config import ModelConfig

    class FakeHF:
        rms_norm_eps = 1e-6
        hidden_act = "silu"
        hidden_size = 32
        num_attention_heads = 4
        num_hidden_layers = 2
        intermediate_size = 64
        attn_logit_softcapping = 50.0  # gemma2-style: unsupported

    cfg = ModelConfig(model="", dtype="float32", max_model_len=64)
    cfg.architecture = "TotallyNewForCausalLM"
    cfg.hf_config = FakeHF()
    factory = resolve_model_cls("TotallyNewForCausalLM")
    with pytest.raises(ValueError, match="attn_logit_softcapping"):
        factory(cfg)


def test_unknown_non_causal_arch_still_errors():
    with pytest.raises(ValueError, match="not supported"):
        resolve_model_cls("SomethingForImageClassification")
