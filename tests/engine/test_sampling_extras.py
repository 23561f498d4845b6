"""Penalties, logit_bias, allowed_token_ids, bad_words (reference:
vllm/v1/sample/ops/penalties.py, bad_words.py, logits processors)."""

import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

PROMPT = "hello world this is"


@pytest.fixture(scope="module")
def llm(tiny_llama_dir):
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
               num_kv_blocks=256)


def test_repetition_penalty_changes_output(llm):
    base = llm.generate([PROMPT], SamplingParams(
        temperature=0.0, max_tokens=16, ignore_eos=True))[0]
    pen = llm.generate([PROMPT], SamplingParams(
        temperature=0.0, max_tokens=16, repetition_penalty=1.8,
        ignore_eos=True))[0]
    b, p = base.outputs[0].token_ids, pen.outputs[0].token_ids
    assert b != p
    # strong repetition penalty → more distinct tokens
    assert len(set(p)) >= len(set(b))


def test_presence_penalty_reduces_repeats(llm):
    pen = llm.generate([PROMPT], SamplingParams(
        temperature=0.0, max_tokens=20, presence_penalty=1.9,
        frequency_penalty=1.9, ignore_eos=True))[0]
    toks = pen.outputs[0].token_ids
    # with heavy presence+frequency penalties a greedy loop cannot
    # emit the same token many times
    most_common = max(toks.count(t) for t in set(toks))
    assert most_common <= 4


def test_logit_bias_forces_token(llm):
    target = 123
    out = llm.generate([PROMPT], SamplingParams(
        temperature=0.0, max_tokens=4, ignore_eos=True,
        logit_bias={target: 100.0}))[0]
    assert all(t == target for t in out.outputs[0].token_ids)
    # negative bias bans it
    base = llm.generate([PROMPT], SamplingParams(
        temperature=0.0, max_tokens=4, ignore_eos=True))[0]
    first = base.outputs[0].token_ids[0]
    banned = llm.generate([PROMPT], SamplingParams(
        temperature=0.0, max_tokens=4, ignore_eos=True,
        logit_bias={first: -1000.0}))[0]
    assert banned.outputs[0].token_ids[0] != first


def test_allowed_token_ids(llm):
    allowed = [5, 6, 7, 8]
    out = llm.generate([PROMPT], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True,
        allowed_token_ids=allowed))[0]
    assert all(t in allowed for t in out.outputs[0].token_ids)


def test_bad_words_single_token(llm):
    base = llm.generate([PROMPT], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True))[0]
    first = base.outputs[0].token_ids[0]
    out = llm.generate([PROMPT], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True,
        extra_args={"bad_words_token_ids": [[first]]}))[0]
    assert first not in out.outputs[0].token_ids


def test_bad_words_sequence(llm):
    """Multi-token bad word: the final token is banned only after its
    prefix appears."""
    base = llm.generate([PROMPT], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True))[0]
    t0, t1 = base.outputs[0].token_ids[:2]
    out = llm.generate([PROMPT], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True,
        extra_args={"bad_words_token_ids": [[t0, t1]]}))[0]
    toks = out.outputs[0].token_ids
    # the pair (t0, t1) must never appear adjacently
    assert all(not (a == t0 and b == t1)
               for a, b in zip(toks, toks[1:]))
    # but t0 itself is still allowed
    assert toks[0] == t0


def test_bad_words_text_plumbing(llm):
    """String bad_words get tokenized by the processor."""
    req = llm.engine.processor.process_inputs(
        "probe", PROMPT,
        SamplingParams(max_tokens=2, bad_words=["hello world"]))
    seqs = req.sampling_params.extra_args["bad_words_token_ids"]
    assert seqs and all(isinstance(s, list) and s for s in seqs)
