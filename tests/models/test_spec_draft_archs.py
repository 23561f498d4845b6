"""Speculative DRAFT architecture names resolve to an actionable
error when loaded as a main model (reference registry.py lists them
as draft-worker classes; here spec_decode/ owns them via
speculative_config method auto-detection)."""

import pytest

from vllm_main_modify_tpu.models.registry import (list_supported_archs,
                                                  resolve_model_cls)


@pytest.mark.parametrize("arch", [
    "EagleLlamaForCausalLM", "Eagle3LlamaForCausalLM",
    "DeepSeekMTPModel", "Qwen3NextMTP", "MedusaModel",
    "MLPSpeculatorPreTrainedModel",
])
def test_draft_arch_routes_to_spec_config_error(arch):
    assert arch in list_supported_archs()
    factory = resolve_model_cls(arch)

    class _Cfg:
        architecture = arch

    with pytest.raises(ValueError, match="speculative_config"):
        factory(_Cfg())
