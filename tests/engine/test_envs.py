"""Central env-flag registry (reference: vllm/envs.py): lazy re-read
per access, every flag documented, unknown names rejected."""

import pytest

from vllm_main_modify_tpu import envs


def test_lazy_reread(monkeypatch):
    assert envs.VLLM_SERVER_DEV_MODE is False
    monkeypatch.setenv("VLLM_SERVER_DEV_MODE", "1")
    assert envs.VLLM_SERVER_DEV_MODE is True
    monkeypatch.setenv("VLLM_TPU_PREFILL_BQ", "256")
    assert envs.VLLM_TPU_PREFILL_BQ == 256


def test_every_flag_documented():
    for name, (reader, doc) in envs.ENVIRONMENT_VARIABLES.items():
        assert name.startswith("VLLM_")
        assert doc.strip()
        reader()  # readable with defaults


def test_unknown_flag_rejected():
    with pytest.raises(AttributeError):
        envs.VLLM_NO_SUCH_FLAG
