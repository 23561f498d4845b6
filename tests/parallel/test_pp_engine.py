"""Pipeline parallelism through the engine on the 8-device CPU mesh:
the stacked layer weights and the KV cache shard their layer axis
across the 'stage' mesh axis, the decoder runs as a ring-ppermute
pipeline (parallel/pp.py), and greedy generations must match the
single-stage engine — including with TP and DP composed on the same
mesh.

Reference: vllm/distributed/parallel_state.py:654-829
(IntermediateTensors PP), vllm/distributed/utils.py get_pp_indices.
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


def _need8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")


@pytest.fixture(scope="module")
def ref_outputs(tiny_llama_dir):
    _need8()
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=64)
    out = _generate(llm)
    llm.engine.engine_core.shutdown()
    return out


def test_pp2_tp4_matches_single_stage(tiny_llama_dir, ref_outputs):
    _need8()
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=64, tensor_parallel_size=4,
              pipeline_parallel_size=2)
    runner = llm.engine.engine_core.model_runner
    assert runner.pp_size == 2
    # weights and KV really shard the layer axis on 'stage'
    kv_spec = runner.kv_caches.sharding.spec
    assert kv_spec[0] == "stage"
    q_spec = runner.params["layers"]["q_proj"].sharding.spec
    assert q_spec[0] == "stage"
    got = _generate(llm)
    llm.engine.engine_core.shutdown()
    assert got == ref_outputs


def test_pp2_only_matches(tiny_llama_dir, ref_outputs):
    _need8()
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=64, pipeline_parallel_size=2)
    got = _generate(llm)
    llm.engine.engine_core.shutdown()
    assert got == ref_outputs


def test_pp_rejects_indivisible_layers(tiny_llama_dir):
    _need8()
    with pytest.raises(ValueError, match="divide"):
        LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
            max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
            num_kv_blocks=64, pipeline_parallel_size=3)
