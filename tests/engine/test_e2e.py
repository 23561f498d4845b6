"""End-to-end engine tests: LLM.generate on the tiny Llama checkpoint,
greedy parity vs HuggingFace transformers (SURVEY.md §4 test-pyramid
item 3; reference fixture pattern: tests/conftest.py VllmRunner vs
HfRunner)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

PROMPTS = [
    "hello world this is",
    "a test of the",
    "the tokenizer hello hello world",
]


@pytest.fixture(scope="module")
def llm(tiny_llama_dir):
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
               num_kv_blocks=256)


def hf_greedy(model_dir, prompt_ids: list[int], max_new: int):
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_dir,
                                                 torch_dtype=torch.float32)
    model.eval()
    with torch.no_grad():
        out = model.generate(
            torch.tensor([prompt_ids]), max_new_tokens=max_new,
            do_sample=False, temperature=None, top_p=None, top_k=None,
            eos_token_id=None, pad_token_id=0)
    return out[0, len(prompt_ids):].tolist()


def test_greedy_parity_vs_hf(llm, tiny_llama_dir):
    tok = llm.get_tokenizer()
    max_new = 16
    outs = llm.generate(
        PROMPTS,
        SamplingParams(temperature=0.0, max_tokens=max_new,
                       ignore_eos=True))
    assert len(outs) == len(PROMPTS)
    for prompt, out in zip(PROMPTS, outs):
        ids = tok.encode(prompt)
        ref = hf_greedy(tiny_llama_dir, ids, max_new)
        got = out.outputs[0].token_ids
        assert got == ref, f"prompt {prompt!r}: {got} != {ref}"
        assert out.finished
        assert out.outputs[0].finish_reason == "length"


def test_batch_mixed_lengths(llm):
    params = [
        SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)
        for n in (1, 5, 12)
    ]
    outs = llm.generate(PROMPTS, params)
    for out, p in zip(outs, params):
        assert len(out.outputs[0].token_ids) == p.max_tokens
        if p.max_tokens >= 5:
            # single tokens may be partial-UTF8 bytes the incremental
            # detokenizer holds back, so only longer outputs must have
            # visible text
            assert out.outputs[0].text


def test_stop_token(llm):
    # run greedy once to learn the first generated token, then use it
    # as a stop token
    out0 = llm.generate(
        [PROMPTS[0]],
        SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True))
    first = out0[0].outputs[0].token_ids[0]
    outs = llm.generate(
        [PROMPTS[0]],
        SamplingParams(temperature=0.0, max_tokens=8,
                       stop_token_ids=[first], ignore_eos=True))
    co = outs[0].outputs[0]
    assert co.token_ids == [first]
    assert co.finish_reason == "stop"
    assert co.stop_reason == first


def test_random_sampling_seeded(llm):
    p = SamplingParams(temperature=0.8, top_p=0.9, top_k=20, seed=1234,
                       max_tokens=8, ignore_eos=True)
    out1 = llm.generate([PROMPTS[0]], p)[0].outputs[0].token_ids
    out2 = llm.generate([PROMPTS[0]], p)[0].outputs[0].token_ids
    assert out1 == out2, "same seed must reproduce"
    assert len(out1) == 8


def test_logprobs(llm):
    p = SamplingParams(temperature=0.0, max_tokens=4, logprobs=3,
                       ignore_eos=True)
    out = llm.generate([PROMPTS[0]], p)[0]
    lps = out.outputs[0].logprobs
    assert lps is not None and len(lps) == 4
    for pos, d in enumerate(lps):
        tok = out.outputs[0].token_ids[pos]
        assert tok in d
        # greedy sampled token must be rank 1 (the argmax; vLLM
        # 1-based rank convention)
        assert d[tok].rank == 1
        assert d[tok].logprob <= 0.0


def test_prompt_logprobs_vs_hf(llm, tiny_llama_dir):
    """prompt_logprobs=k returns, per prompt position >= 1, the top-k
    dict plus the actual token's logprob — values checked against an
    HF forward pass (reference: _get_prompt_logprobs_dict,
    vllm/v1/worker/gpu_model_runner.py)."""
    import torch
    from transformers import AutoModelForCausalLM

    tok = llm.get_tokenizer()
    prompt = PROMPTS[2]
    ids = tok.encode(prompt)
    p = SamplingParams(temperature=0.0, max_tokens=2,
                       prompt_logprobs=3, ignore_eos=True)
    out = llm.generate([prompt], p)[0]
    plp = out.prompt_logprobs
    assert plp is not None and len(plp) == len(ids)
    assert plp[0] is None

    model = AutoModelForCausalLM.from_pretrained(
        tiny_llama_dir, torch_dtype=torch.float32)
    model.eval()
    with torch.no_grad():
        logits = model(torch.tensor([ids])).logits[0]
    ref_lp = torch.log_softmax(logits.float(), dim=-1)
    for pos in range(1, len(ids)):
        d = plp[pos]
        actual = ids[pos]
        assert actual in d
        # top-3 + possibly the actual token
        assert 3 <= len(d) <= 4
        want = float(ref_lp[pos - 1, actual])
        assert abs(d[actual].logprob - want) < 5e-2, (pos, d[actual])
        if d[actual].rank == 1:
            # argmax token must agree with HF
            assert actual == int(torch.argmax(logits[pos - 1]))


def test_prompt_logprobs_chunked(llm):
    """A prompt longer than max_num_batched_tokens exercises the
    multi-chunk accumulator path."""
    prompt = "hello world this is a test of the tokenizer " * 12
    tok = llm.get_tokenizer()
    n = len(tok.encode(prompt))
    assert 64 < n <= 120  # > max_num_batched_tokens: at least 2 chunks
    p = SamplingParams(temperature=0.0, max_tokens=2,
                       prompt_logprobs=2, ignore_eos=True)
    out = llm.generate([prompt], p)[0]
    plp = out.prompt_logprobs
    assert plp is not None and len(plp) == n
    assert plp[0] is None
    assert all(d for d in plp[1:])


def test_prefix_cache_reuse(llm):
    """Second generation sharing a long prefix must report cached
    tokens AND produce identical tokens (regression: double-counted
    cache-hit blocks aliased pages in the block table)."""
    long_prompt = "hello world this is a test of the tokenizer " * 4
    p = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    first = llm.generate([long_prompt], p)[0]
    out = llm.generate([long_prompt], p)[0]
    assert out.num_cached_tokens > 0
    assert out.outputs[0].token_ids == first.outputs[0].token_ids


def test_warm_engine_repeat_identical(llm):
    """Repeated greedy generation on a warm engine must be identical
    to the first (regression for the same aliasing bug at short
    prompt lengths)."""
    p = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    a = llm.generate(["hello again"], p)[0].outputs[0].token_ids
    b = llm.generate(["hello again"], p)[0].outputs[0].token_ids
    assert a == b
