"""Async (one-step-pipelined) scheduling must produce byte-identical
results to the synchronous engine (reference:
tests/v1/core/test_async_scheduler.py)."""

import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

PROMPTS = [
    "hello world this is",
    "a test of the",
    "the tokenizer hello hello world",
]


@pytest.fixture(scope="module")
def llm_pair(tiny_llama_dir):
    kw = dict(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    return (LLM(**kw), LLM(async_scheduling=True, **kw))


def test_greedy_parity_sync_vs_async(llm_pair):
    sync_llm, async_llm = llm_pair
    p = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    sync_out = sync_llm.generate(PROMPTS, p)
    async_out = async_llm.generate(PROMPTS, p)
    for s, a in zip(sync_out, async_out):
        assert s.outputs[0].token_ids == a.outputs[0].token_ids
        assert a.outputs[0].finish_reason == "length"


def test_async_mixed_lengths_and_eos(llm_pair):
    _, async_llm = llm_pair
    params = [
        SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)
        for n in (1, 7, 16)
    ]
    outs = async_llm.generate(PROMPTS, params)
    for out, p in zip(outs, params):
        assert len(out.outputs[0].token_ids) == p.max_tokens


def test_async_seeded_sampling_reproducible(llm_pair):
    _, async_llm = llm_pair
    p = SamplingParams(temperature=0.9, top_k=10, seed=5, max_tokens=8,
                       ignore_eos=True)
    a = async_llm.generate([PROMPTS[0]], p)[0].outputs[0].token_ids
    b = async_llm.generate([PROMPTS[0]], p)[0].outputs[0].token_ids
    assert a == b


def test_async_rejects_structured_outputs(llm_pair):
    from vllm_main_modify_tpu.sampling_params import \
        StructuredOutputParams

    _, async_llm = llm_pair
    p = SamplingParams(
        max_tokens=4,
        structured_outputs=StructuredOutputParams(choice=["a", "b"]))
    with pytest.raises(ValueError, match="async"):
        async_llm.generate(["x"], p)


def test_async_prompt_logprobs(llm_pair):
    """Prompt logprobs must flow through the async (deferred-handle)
    path and match the sync engine exactly."""
    sync_llm, async_llm = llm_pair
    p = SamplingParams(temperature=0.0, max_tokens=2,
                       prompt_logprobs=3, ignore_eos=True)
    s = sync_llm.generate([PROMPTS[2]], p)[0].prompt_logprobs
    a = async_llm.generate([PROMPTS[2]], p)[0].prompt_logprobs
    assert a is not None and len(a) == len(s)
    assert a[0] is None
    for ds, da in zip(s[1:], a[1:]):
        assert set(ds) == set(da)
        for tid in ds:
            assert abs(ds[tid].logprob - da[tid].logprob) < 1e-4
            assert ds[tid].rank == da[tid].rank


def test_async_multistep_preemption_under_kv_pressure(tiny_llama_dir):
    """Async scheduling + multi-step decode + preemption: a preempted
    request's in-flight steps still land their tokens, so the pending
    placeholder count must survive preemption (regression: the count
    went negative and tripped the accounting assert; found by the 8B
    quantized serving bench under KV pressure). Greedy tokens must
    match the unpressured sync engine exactly."""
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    prompts = [{"prompt_token_ids": list(range(3 + i, 99 + i))}
               for i in range(8)]
    sp = SamplingParams(temperature=0.0, max_tokens=16,
                        ignore_eos=True)

    def run(blocks, asy):
        llm = LLM(model=tiny_llama_dir, dtype="float32",
                  max_model_len=128, max_num_seqs=8,
                  max_num_batched_tokens=512, block_size=4,
                  num_kv_blocks=blocks, async_scheduling=asy,
                  num_decode_steps_per_dispatch=8,
                  enable_prefix_caching=False)
        out = [list(o.outputs[0].token_ids)
               for o in llm.generate(prompts, sp)]
        return out, \
            llm.engine.engine_core.scheduler.num_preempted_reqs_total

    ref, _ = run(512, False)
    got, npre = run(130, True)
    assert npre > 0, "KV pressure produced no preemption"
    assert got == ref
