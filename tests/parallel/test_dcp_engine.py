"""DCP (decode context parallel) through the engine on the 8-device
CPU mesh: KV pages shard across the model axis (tiny-llama has only 2
KV heads, so head-sharding at tp=8 is impossible — exactly the DCP
regime) and greedy generations must match the single-shard engine.

Reference: vllm/v1/attention/backends/mla/common.py:487-700 (DCP with
LSE merge), scheduler.py:105-112.
"""

import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

PROMPTS = [
    [7, 9, 11, 13, 15, 17, 19, 21, 23, 25, 27],
    [5, 6, 7, 8],
    [100, 200, 300, 101, 201, 301, 102],
]


def _generate(llm):
    sp = SamplingParams(temperature=0.0, max_tokens=12,
                        ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in PROMPTS], sp)
    return [list(o.outputs[0].token_ids) for o in outs]


def test_dcp8_matches_single_shard(tiny_llama_dir):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    kw = dict(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=64)
    ref = _generate(LLM(**kw))
    llm = LLM(**kw, tensor_parallel_size=8,
              decode_context_parallel_size=8)
    runner = llm.engine.engine_core.model_runner
    assert runner.dcp_size == 8
    # pages really shard across the model axis
    spec = runner.kv_caches.sharding.spec
    assert spec[1] == "model"
    got = _generate(llm)
    llm.engine.engine_core.shutdown()
    assert got == ref


def test_dcp_requires_tp_match(tiny_llama_dir):
    with pytest.raises(ValueError, match="must equal"):
        LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
            max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
            num_kv_blocks=64, tensor_parallel_size=1,
            decode_context_parallel_size=2)
