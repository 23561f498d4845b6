"""Registry sweep (reference analogue: tests/models/registry.py +
test_registry.py): every registered key must resolve — the module
imports and the factory/class exists — so wiring regressions in the
long tail can't hide behind lazy imports; error-routing factories
(spec-decode drafts, terratorch) must raise their actionable message;
and the registry covers every key of the reference's table."""

import importlib
import re

import pytest

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.models.registry import (_REGISTRY,
                                                  resolve_model_cls)


@pytest.mark.parametrize("arch", sorted(_REGISTRY))
def test_every_entry_resolves(arch):
    module, attr = _REGISTRY[arch]
    mod = importlib.import_module(module)
    assert hasattr(mod, attr), f"{arch}: {module}.{attr} missing"
    assert callable(getattr(mod, attr))


def test_reference_keys_all_covered():
    ref = open("/root/reference/vllm/model_executor/models/"
               "registry.py").read()
    ref_keys = set(re.findall(r'"(\w+)":\s*\(', ref))
    missing = sorted(ref_keys - set(_REGISTRY))
    assert not missing, f"missing reference keys: {missing}"


def test_draft_archs_route_to_actionable_error():
    cfg = ModelConfig(model="", dtype="float32")
    cfg.architecture = "EagleLlamaForCausalLM"
    with pytest.raises(ValueError, match="speculative-decoding"):
        resolve_model_cls("EagleLlamaForCausalLM")(cfg)


def test_terratorch_routes_to_actionable_error():
    cfg = ModelConfig(model="", dtype="float32")
    for arch in ("PrithviGeoSpatialMAE", "Terratorch"):
        cfg.architecture = arch
        with pytest.raises(ValueError, match="terratorch"):
            resolve_model_cls(arch)(cfg)
