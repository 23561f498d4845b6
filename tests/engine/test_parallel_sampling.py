"""n>1 parallel sampling fan-out (reference: parallel_sampling.py)."""

import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def llm(tiny_llama_dir):
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
               num_kv_blocks=256)


def test_n_greedy_identical(llm):
    p = SamplingParams(n=3, temperature=0.0, max_tokens=6,
                       ignore_eos=True)
    out = llm.generate(["hello world"], p)[0]
    assert len(out.outputs) == 3
    assert [c.index for c in out.outputs] == [0, 1, 2]
    # greedy children agree
    assert (out.outputs[0].token_ids == out.outputs[1].token_ids ==
            out.outputs[2].token_ids)


def test_n_random_seeded_differ(llm):
    p = SamplingParams(n=4, temperature=1.0, seed=11, max_tokens=8,
                       ignore_eos=True)
    out = llm.generate(["a test of"], p)[0]
    assert len(out.outputs) == 4
    seqs = {tuple(c.token_ids) for c in out.outputs}
    # per-child derived seeds → (almost surely) distinct sequences
    assert len(seqs) > 1
    # reproducible
    out2 = llm.generate(["a test of"], p)[0]
    for a, b in zip(out.outputs, out2.outputs):
        assert a.token_ids == b.token_ids


def test_min_tokens_suppresses_stop(llm):
    tok_out = llm.generate(
        ["hello"], SamplingParams(temperature=0.0, max_tokens=4,
                                  ignore_eos=True))[0]
    first = tok_out.outputs[0].token_ids[0]
    p = SamplingParams(temperature=0.0, max_tokens=8, min_tokens=5,
                       stop_token_ids=[first], ignore_eos=True)
    out = llm.generate(["hello"], p)[0]
    # the stop token appears immediately but must not stop before
    # min_tokens
    assert len(out.outputs[0].token_ids) >= 5
