"""Tool-call + reasoning parsers (reference:
tests/entrypoints/openai/tool_parsers/, tests/reasoning/)."""

import json

import pytest

from vllm_main_modify_tpu.entrypoints.openai.tool_parsers import (
    get_tool_parser)
from vllm_main_modify_tpu.reasoning import get_reasoning_parser


def test_hermes_parser():
    p = get_tool_parser("hermes")
    text = ('I will check.\n<tool_call>\n{"name": "get_weather", '
            '"arguments": {"city": "Paris"}}\n</tool_call>')
    r = p.extract(text)
    assert r.tools_called
    assert r.tool_calls[0].name == "get_weather"
    assert json.loads(r.tool_calls[0].arguments) == {"city": "Paris"}
    assert r.content == "I will check."
    r2 = p.extract("no tools here")
    assert not r2.tools_called and r2.content == "no tools here"


def test_hermes_multiple_calls():
    p = get_tool_parser("hermes")
    text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
            '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>')
    r = p.extract(text)
    assert [c.name for c in r.tool_calls] == ["a", "b"]
    assert r.content is None


def test_llama3_json_parser():
    p = get_tool_parser("llama3_json")
    r = p.extract('{"name": "search", "parameters": {"q": "tpu"}}')
    assert r.tools_called
    assert r.tool_calls[0].name == "search"
    assert json.loads(r.tool_calls[0].arguments) == {"q": "tpu"}
    r2 = p.extract("plain text answer")
    assert not r2.tools_called and r2.content == "plain text answer"


def test_mistral_parser():
    p = get_tool_parser("mistral")
    r = p.extract('[TOOL_CALLS] [{"name": "f", "arguments": {"a": 2}}]')
    assert r.tools_called and r.tool_calls[0].name == "f"
    r2 = p.extract("regular reply")
    assert not r2.tools_called


def test_unknown_parser_rejected():
    with pytest.raises(ValueError, match="unknown tool parser"):
        get_tool_parser("nope")


def test_reasoning_parser():
    p = get_reasoning_parser("deepseek_r1")
    r = p.extract("<think>step 1... step 2...</think>The answer is 4.")
    assert r.reasoning_content == "step 1... step 2..."
    assert r.content == "The answer is 4."
    # missing opening tag (R1 quirk)
    r2 = p.extract("hmm, thinking</think>42")
    assert r2.reasoning_content == "hmm, thinking"
    assert r2.content == "42"
    r3 = p.extract("no think tags")
    assert r3.reasoning_content is None
    assert r3.content == "no think tags"
