"""Sleep/wake + weight reload (reference: CuMem sleep mode)."""

import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams


def test_sleep_wake_roundtrip(tiny_llama_dir):
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=32, block_size=4,
              num_kv_blocks=64)
    p = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    before = llm.generate(["hello world"], p)[0].outputs[0].token_ids
    core = llm.engine.engine_core
    core.sleep(level=2)
    assert core.model_runner.params is None
    core.wake_up()
    after = llm.generate(["hello world"], p)[0].outputs[0].token_ids
    assert after == before

    core.reload_weights()
    again = llm.generate(["hello world"], p)[0].outputs[0].token_ids
    assert again == before


def test_save_sharded_state(tiny_llama_dir, tmp_path):
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=32, block_size=4,
              num_kv_blocks=64)
    out = tmp_path / "saved"
    llm.engine.engine_core.save_sharded_state(str(out))
    from safetensors import safe_open

    with safe_open(str(out / "model.safetensors"),
                   framework="numpy") as f:
        keys = list(f.keys())
    assert any("embed_tokens" in k for k in keys)
    assert any("q_proj" in k for k in keys)
