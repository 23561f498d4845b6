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


# -------------------------------------------------------------------
# wave-2 tool parsers (reference: openai/tool_parsers/ breadth)


def test_pythonic_parser():
    p = get_tool_parser("pythonic")
    r = p.extract('[get_weather(city="SF", units=2), ping()]')
    assert r.tools_called and len(r.tool_calls) == 2
    import json
    assert json.loads(r.tool_calls[0].arguments) == {
        "city": "SF", "units": 2}
    assert r.tool_calls[1].name == "ping"
    assert not p.extract("just text").tools_called


def test_granite_parser():
    p = get_tool_parser("granite")
    r = p.extract('<|tool_call|>[{"name": "f", "arguments": '
                  '{"x": 1}}]')
    assert r.tools_called and r.tool_calls[0].name == "f"
    # bare array also accepted
    r2 = p.extract('[{"name": "g", "arguments": {}}]')
    assert r2.tools_called and r2.tool_calls[0].name == "g"


def test_granite_20b_fc_parser():
    p = get_tool_parser("granite-20b-fc")
    r = p.extract('<function_call> {"name": "a", "arguments": '
                  '{"k": "v"}}<function_call> {"name": "b", '
                  '"arguments": {}}')
    assert [c.name for c in r.tool_calls] == ["a", "b"]


def test_jamba_parser():
    p = get_tool_parser("jamba")
    r = p.extract('sure!<tool_calls>[{"name": "f", "arguments": '
                  '{"q": 7}}]</tool_calls>')
    assert r.tools_called and r.content == "sure!"


def test_internlm_parser():
    p = get_tool_parser("internlm")
    r = p.extract('I will call.<|action_start|><|plugin|>'
                  '{"name": "search", "parameters": {"q": "tpu"}}'
                  '<|action_end|>')
    assert r.tools_called
    assert r.tool_calls[0].name == "search"
    assert r.content == "I will call."


def test_deepseek_v3_parser():
    p = get_tool_parser("deepseek_v3")
    text = ("ok<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
            "<｜tool▁sep｜>get_time\n```json\n{\"tz\": \"UTC\"}\n```"
            "<｜tool▁call▁end｜><｜tool▁calls▁end｜>")
    r = p.extract(text)
    assert r.tools_called and r.tool_calls[0].name == "get_time"
    import json
    assert json.loads(r.tool_calls[0].arguments) == {"tz": "UTC"}
    assert r.content == "ok"


def test_qwen3_coder_parser():
    p = get_tool_parser("qwen3_coder")
    r = p.extract("<tool_call><function=read_file>"
                  "<parameter=path>/tmp/x</parameter>"
                  "<parameter=limit>5</parameter>"
                  "</function></tool_call>")
    assert r.tools_called
    import json
    args = json.loads(r.tool_calls[0].arguments)
    assert args == {"path": "/tmp/x", "limit": 5}


def test_glm4_moe_parser():
    p = get_tool_parser("glm45")
    r = p.extract("<tool_call>lookup\n<arg_key>id</arg_key>"
                  "<arg_value>42</arg_value></tool_call>")
    assert r.tools_called and r.tool_calls[0].name == "lookup"
    import json
    assert json.loads(r.tool_calls[0].arguments) == {"id": 42}


def test_phi4_mini_parser():
    p = get_tool_parser("phi4_mini_json")
    r = p.extract('functools[{"name": "calc", "arguments": '
                  '{"a": 1}}]')
    assert r.tools_called and r.tool_calls[0].name == "calc"


def test_reasoning_parser_variants():
    p = get_reasoning_parser("exaone4")
    r = p.extract("<thought>deep</thought>shallow")
    assert r.reasoning_content == "deep" and r.content == "shallow"

    p = get_reasoning_parser("mistral")
    r = p.extract("[THINK]a[/THINK]b")
    assert r.reasoning_content == "a" and r.content == "b"

    p = get_reasoning_parser("granite")
    r = p.extract("Here is my thought process: ponder. "
                  "Here is my response: reply.")
    assert r.reasoning_content == "ponder." and r.content == "reply."

    p = get_reasoning_parser("hunyuan_a13b")
    r = p.extract("<think>t</think><answer>a</answer>")
    assert r.reasoning_content == "t" and r.content == "a"
    r2 = p.extract("<think>t</think>plain tail")
    assert r2.content == "plain tail"

    p = get_reasoning_parser("seed_oss")
    r = p.extract("<seed:think>x</seed:think>y")
    assert r.reasoning_content == "x" and r.content == "y"


def test_kimi_k2_parser():
    p = get_tool_parser("kimi_k2")
    text = ("pre<|tool_calls_section_begin|>"
            "<|tool_call_begin|>functions.get_weather:0"
            "<|tool_call_argument_begin|>{\"city\": \"SF\"}"
            "<|tool_call_end|><|tool_calls_section_end|>")
    r = p.extract(text)
    assert r.tools_called and r.tool_calls[0].name == "get_weather"
    assert json.loads(r.tool_calls[0].arguments) == {"city": "SF"}
    assert r.content == "pre"


def test_longcat_parser():
    p = get_tool_parser("longcat")
    r = p.extract('say<longcat_tool_call>{"name": "f", "arguments":'
                  ' {"x": 1}}</longcat_tool_call>')
    assert r.tools_called and r.tool_calls[0].name == "f"
    assert json.loads(r.tool_calls[0].arguments) == {"x": 1}


def test_step3_parser():
    p = get_tool_parser("step3")
    text = ("<｜tool_calls_begin｜><｜tool_call_begin｜>function"
            "<｜tool_sep｜><steptml:invoke name=\"add\">"
            "<steptml:parameter name=\"a\">3</steptml:parameter>"
            "<steptml:parameter name=\"b\">txt</steptml:parameter>"
            "</steptml:invoke><｜tool_call_end｜><｜tool_calls_end｜>")
    r = p.extract(text)
    assert r.tools_called and r.tool_calls[0].name == "add"
    assert json.loads(r.tool_calls[0].arguments) == {"a": 3,
                                                     "b": "txt"}


def test_seed_oss_tool_parser():
    p = get_tool_parser("seed_oss")
    text = ("<seed:tool_call><function=go>"
            "<parameter=dir>north</parameter></function>"
            "</seed:tool_call>")
    r = p.extract(text)
    assert r.tools_called and r.tool_calls[0].name == "go"
    assert json.loads(r.tool_calls[0].arguments) == {"dir": "north"}


def test_deepseek_v31_parser():
    p = get_tool_parser("deepseek_v31")
    text = ("think<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>lookup"
            "<｜tool▁sep｜>{\"q\": \"x\"}<｜tool▁call▁end｜>"
            "<｜tool▁calls▁end｜>")
    r = p.extract(text)
    assert r.tools_called and r.tool_calls[0].name == "lookup"
    assert r.content == "think"


def test_openai_harmony_parser():
    p = get_tool_parser("openai")
    text = ("<|channel|>analysis<|message|>hmm<|end|>"
            "<|channel|>commentary to=functions.get_time "
            "<|constrain|>json<|message|>{\"tz\": \"UTC\"}<|call|>")
    r = p.extract(text)
    assert r.tools_called and r.tool_calls[0].name == "get_time"
    assert json.loads(r.tool_calls[0].arguments) == {"tz": "UTC"}


def test_gptoss_reasoning_parser():
    p = get_reasoning_parser("gptoss")
    r = p.extract("<|channel|>analysis<|message|>ponder<|end|>"
                  "<|channel|>final<|message|>reply<|return|>")
    assert r.reasoning_content == "ponder" and r.content == "reply"
    r2 = p.extract("no channels at all")
    assert r2.reasoning_content is None and r2.content


# ---- streaming extraction (reference: extract_tool_calls_streaming
# in vllm/entrypoints/openai/tool_parsers/*.py) ----------------------


def _stream(extractor, text, chunk=3):
    deltas = []
    for i in range(0, len(text), chunk):
        deltas += extractor.push(text[i:i + chunk])
    deltas += extractor.finish()
    return deltas


def _join_content(deltas, key="content"):
    return "".join(d.get(key, "") for d in deltas)


def test_streaming_hermes_no_marker_leak():
    from vllm_main_modify_tpu.entrypoints.openai.tool_parsers import (
        HermesToolParser, StreamingExtractor)

    text = ('I will look that up. <tool_call>{"name": "get_weather", '
            '"arguments": {"city": "SF"}}</tool_call>')
    for chunk in (1, 3, 7, len(text)):
        ex = StreamingExtractor(HermesToolParser())
        deltas = _stream(ex, text, chunk)
        content = _join_content(deltas)
        assert "<tool_call" not in content
        assert "get_weather" not in content
        assert content.strip() == "I will look that up."
        calls = [c for d in deltas for c in d.get("tool_calls", [])]
        assert len(calls) == 1
        assert calls[0]["function"]["name"] == "get_weather"
        assert json.loads(
            calls[0]["function"]["arguments"]) == {"city": "SF"}
        assert calls[0]["index"] == 0
        assert ex.tools_called


def test_streaming_hermes_two_calls_indices():
    from vllm_main_modify_tpu.entrypoints.openai.tool_parsers import (
        HermesToolParser, StreamingExtractor)

    text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
            '<tool_call>{"name": "b", "arguments": {"x": 1}}'
            '</tool_call>')
    ex = StreamingExtractor(HermesToolParser())
    deltas = _stream(ex, text, 5)
    calls = [c for d in deltas for c in d.get("tool_calls", [])]
    assert [c["function"]["name"] for c in calls] == ["a", "b"]
    assert [c["index"] for c in calls] == [0, 1]
    assert _join_content(deltas).strip() == ""


def test_streaming_mistral():
    from vllm_main_modify_tpu.entrypoints.openai.tool_parsers import (
        MistralToolParser, StreamingExtractor)

    text = ('Sure. [TOOL_CALLS] [{"name": "f", '
            '"arguments": {"k": 2}}]')
    ex = StreamingExtractor(MistralToolParser())
    deltas = _stream(ex, text, 4)
    content = _join_content(deltas)
    assert "[TOOL_CALLS]" not in content
    calls = [c for d in deltas for c in d.get("tool_calls", [])]
    assert calls and calls[0]["function"]["name"] == "f"


def test_streaming_llama3_json_holds_whole_object():
    from vllm_main_modify_tpu.entrypoints.openai.tool_parsers import (
        Llama3JsonToolParser, StreamingExtractor)

    text = '{"name": "lookup", "parameters": {"q": "x"}}'
    ex = StreamingExtractor(Llama3JsonToolParser())
    deltas = _stream(ex, text, 6)
    # nothing of the JSON leaks as content; one call at the end
    assert _join_content(deltas) == ""
    calls = [c for d in deltas for c in d.get("tool_calls", [])]
    assert calls and calls[0]["function"]["name"] == "lookup"


def test_streaming_llama3_json_plain_content_streams():
    from vllm_main_modify_tpu.entrypoints.openai.tool_parsers import (
        Llama3JsonToolParser, StreamingExtractor)

    ex = StreamingExtractor(Llama3JsonToolParser())
    first = ex.push("Hello the weather ")
    assert first and first[0]["content"]
    deltas = first + ex.push("is nice.") + ex.finish()
    assert _join_content(deltas) == "Hello the weather is nice."
    assert not ex.tools_called


def test_streaming_reasoning_think_tags():
    from vllm_main_modify_tpu.entrypoints.openai.tool_parsers import \
        StreamingExtractor
    from vllm_main_modify_tpu.reasoning import get_reasoning_parser

    rp = get_reasoning_parser("deepseek_r1")
    text = "<think>step one. step two.</think>The answer is 42."
    for chunk in (1, 4, 9):
        ex = StreamingExtractor(None, rp)
        deltas = _stream(ex, text, chunk)
        content = _join_content(deltas)
        reasoning = _join_content(deltas, "reasoning_content")
        assert "<think>" not in content and "</think>" not in content
        assert content == "The answer is 42."
        assert reasoning == "step one. step two."


def test_streaming_reasoning_plus_tools():
    from vllm_main_modify_tpu.entrypoints.openai.tool_parsers import (
        HermesToolParser, StreamingExtractor)
    from vllm_main_modify_tpu.reasoning import get_reasoning_parser

    rp = get_reasoning_parser("qwen3")
    text = ('<think>must call the API</think>Calling now. '
            '<tool_call>{"name": "api", "arguments": {}}</tool_call>')
    ex = StreamingExtractor(HermesToolParser(), rp)
    deltas = _stream(ex, text, 5)
    assert _join_content(deltas, "reasoning_content") == \
        "must call the API"
    content = _join_content(deltas)
    assert "<tool_call" not in content and "think" not in content
    calls = [c for d in deltas for c in d.get("tool_calls", [])]
    assert calls and calls[0]["function"]["name"] == "api"


def test_whisper_translate_task_prompt():
    """/v1/audio/translations forces <|translate|> while
    /v1/audio/transcriptions forces <|transcribe|> (reference: the
    separate audio task routes; repo previously aliased translations
    to the transcription handler with no task token)."""
    from vllm_main_modify_tpu.entrypoints.openai.api_server import \
        OpenAIServer

    class FakeTok:
        unk_token_id = 0
        TOKENS = {"<|startoftranscript|>": 50258, "<|en|>": 50259,
                  "<|de|>": 50261, "<|transcribe|>": 50359,
                  "<|translate|>": 50358, "<|notimestamps|>": 50363}

        def convert_tokens_to_ids(self, t):
            return self.TOKENS.get(t, 0)

    class FakeEngine:
        tokenizer = FakeTok()

    srv = object.__new__(OpenAIServer)
    srv.engine = FakeEngine()
    trans = srv._whisper_task_prompt("transcribe", None)
    transl = srv._whisper_task_prompt("translate", "de")
    assert trans == [50258, 50359, 50363]
    assert transl == [50258, 50261, 50358, 50363]
    # non-whisper tokenizer -> None (model default prompt applies)
    srv.engine.tokenizer = type("T", (), {
        "unk_token_id": 0,
        "convert_tokens_to_ids": lambda self, t: 0})()
    assert srv._whisper_task_prompt("translate", None) is None
