"""E2E guided decoding: the bitmask must force even a random-weight
model to emit schema-valid output (reference test style:
tests/v1/entrypoints/llm/test_guided_generate.py)."""

import json

import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import (SamplingParams,
                                                  StructuredOutputParams)
from vllm_main_modify_tpu.structured_output.audit_tracker import \
    configure_audit_tracker


@pytest.fixture(scope="module")
def llm(tiny_llama_dir):
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
               num_kv_blocks=256)


def test_guided_json_schema(llm):
    schema = {
        "type": "object",
        "properties": {
            "a": {"type": "integer"},
            "b": {"enum": ["x", "y"]},
        },
        "required": ["a", "b"],
    }
    p = SamplingParams(
        temperature=0.0, max_tokens=60,
        structured_outputs=StructuredOutputParams(json_schema=schema))
    out = llm.generate(["make json:"], p)[0]
    text = out.outputs[0].text
    doc = json.loads(text)
    assert isinstance(doc["a"], int)
    assert doc["b"] in ("x", "y")


def test_guided_choice(llm):
    p = SamplingParams(
        temperature=0.8, seed=7, max_tokens=20,
        structured_outputs=StructuredOutputParams(
            choice=["hello world", "a test"]))
    out = llm.generate(["pick:"], p)[0]
    assert out.outputs[0].text in ("hello world", "a test")


def test_guided_regex(llm):
    p = SamplingParams(
        temperature=0.0, max_tokens=30,
        structured_outputs=StructuredOutputParams(
            regex=r"[0-9]{3}-[0-9]{4}"))
    out = llm.generate(["number:"], p)[0]
    import re

    assert re.fullmatch(r"[0-9]{3}-[0-9]{4}", out.outputs[0].text), \
        out.outputs[0].text


def test_unconstrained_alongside_guided(llm):
    """Mixed batch: guided + free requests in one step."""
    ps = [
        SamplingParams(temperature=0.0, max_tokens=10,
                       structured_outputs=StructuredOutputParams(
                           choice=["aa", "bb"])),
        SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True),
    ]
    outs = llm.generate(["p1:", "p2:"], ps)
    assert outs[0].outputs[0].text in ("aa", "bb")
    assert len(outs[1].outputs[0].token_ids) == 10


def test_invalid_spec_rejected(llm):
    # grammars ARE supported (EBNF PDA backend) — an undefined rule
    # must still fail fast at submission
    p = SamplingParams(
        max_tokens=5,
        structured_outputs=StructuredOutputParams(
            grammar="root ::= something"))
    with pytest.raises(ValueError, match="never defined"):
        llm.generate(["x"], p)


def test_audit_trail_recorded(tiny_llama_dir):
    tracker = configure_audit_tracker(enabled=True,
                                      record_full_events=True)
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=32, block_size=4,
              num_kv_blocks=128)
    p = SamplingParams(
        temperature=0.0, max_tokens=10,
        structured_outputs=StructuredOutputParams(
            choice=["hello", "world"]))
    out = llm.generate(["go:"], p)[0]
    trails = tracker.get_all_trails()
    assert len(trails) == 1
    trail = next(iter(trails.values()))
    assert trail.end_time is not None
    assert len(trail.accepted_tokens) >= 1
    types = {e.event_type.value for e in trail.events}
    assert "token_accept" in types
    assert "bitmask_update" in types
    stats = tracker.stats()
    assert stats["num_trails"] == 1
    assert stats["total_accepted_tokens"] >= 1
    # reset global tracker for other tests
    configure_audit_tracker(enabled=False)
