"""Beam search over the engine (reference: vllm/beam_search.py +
LLM.beam_search in vllm/entrypoints/llm.py).

Structure follows the reference's V1 approach: beam search is an
*entrypoint-level* loop, not an engine mode — each step submits every
live beam as a 1-token generation with ``logprobs=2*beam_width``,
expands, and keeps the best ``beam_width`` by cumulative logprob.
Prefix caching makes the repeated prefixes cheap (each beam's KV
re-prefill hits the radix cache), which is exactly how the reference
gets away with the same design.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class BeamSearchParams:
    """Reference: vllm/sampling_params.py BeamSearchParams."""

    beam_width: int = 4
    max_tokens: int = 16
    ignore_eos: bool = False
    temperature: float = 0.0
    length_penalty: float = 1.0
    include_stop_str_in_output: bool = False


@dataclass
class BeamSearchSequence:
    """One live or completed beam (reference: vllm/beam_search.py:14).
    ``tokens`` includes the prompt."""

    tokens: list[int]
    cum_logprob: float = 0.0
    text: Optional[str] = None
    finish_reason: Optional[str] = None
    logprobs: list[dict] = field(default_factory=list)


@dataclass
class BeamSearchOutput:
    sequences: list[BeamSearchSequence]


def get_beam_search_score(tokens: list[int], cum_logprob: float,
                          eos_token_id: int,
                          length_penalty: float = 1.0) -> float:
    """Reference: vllm/beam_search.py get_beam_search_score — the
    effective length excludes a trailing EOS."""
    seq_len = len(tokens)
    if tokens and tokens[-1] == eos_token_id:
        seq_len -= 1
    return cum_logprob / (seq_len**length_penalty)


def create_sort_beams_key_function(eos_token_id: int,
                                   length_penalty: float):
    def key(seq: BeamSearchSequence) -> float:
        return get_beam_search_score(seq.tokens, seq.cum_logprob,
                                     eos_token_id, length_penalty)

    return key


def beam_search(llm, prompts, params: BeamSearchParams
                ) -> list[BeamSearchOutput]:
    """Drives ``llm`` (entrypoints.llm.LLM) — see LLM.beam_search."""
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    tokenizer = llm.get_tokenizer()
    eos = tokenizer.eos_token_id
    if eos is None:
        eos = -1
    sort_key = create_sort_beams_key_function(eos,
                                              params.length_penalty)
    width = params.beam_width
    # the reference requests 2*width logprobs so enough unique
    # candidates survive EOS/duplicate filtering
    step_params = SamplingParams(max_tokens=1, logprobs=2 * width,
                                 temperature=params.temperature,
                                 ignore_eos=True)

    states = []
    for prompt in prompts:
        if isinstance(prompt, str):
            ids = tokenizer(prompt)["input_ids"]
        else:
            ids = list(prompt)
        states.append({
            "prompt_len": len(ids),
            "beams": [BeamSearchSequence(tokens=ids)],
            "completed": [],
        })

    for _ in range(params.max_tokens):
        flat: list[tuple[int, BeamSearchSequence]] = [
            (si, b) for si, st in enumerate(states)
            for b in st["beams"]
        ]
        if not flat:
            break
        outs = llm.generate([b.tokens for _, b in flat], step_params)
        for (si, beam), out in zip(flat, outs):
            st = states[si]
            comp = out.outputs[0]
            if not comp.logprobs:
                continue
            for tok, lp in comp.logprobs[0].items():
                new = BeamSearchSequence(
                    tokens=beam.tokens + [int(tok)],
                    cum_logprob=beam.cum_logprob + lp.logprob,
                    logprobs=beam.logprobs + [comp.logprobs[0]])
                if int(tok) == eos and not params.ignore_eos:
                    new.finish_reason = "stop"
                    st["completed"].append(new)
                else:
                    st.setdefault("next", []).append(new)
        for st in states:
            nxt = sorted(st.pop("next", []), key=sort_key,
                         reverse=True)
            st["beams"] = nxt[:width]

    results = []
    for st in states:
        pool = st["completed"] + st["beams"]
        pool.sort(key=sort_key, reverse=True)
        best = pool[:width]
        for seq in best:
            gen = seq.tokens[st["prompt_len"]:]
            if (seq.finish_reason == "stop"
                    and not params.include_stop_str_in_output
                    and gen and gen[-1] == eos):
                gen = gen[:-1]
            seq.text = tokenizer.decode(gen)
        results.append(BeamSearchOutput(sequences=best))
    return results
