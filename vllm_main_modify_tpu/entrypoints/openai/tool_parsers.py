"""Tool-call parsers: model-specific output → OpenAI tool_calls.

Reference: vllm/entrypoints/openai/tool_parsers/ (20+ parsers). The
three dominant formats are implemented; the registry mirrors the
reference's named lookup (``--tool-call-parser``).

- hermes:      <tool_call>{"name": ..., "arguments": {...}}</tool_call>
- llama3_json: a bare {"name": ..., "parameters": {...}} JSON object
- mistral:     [TOOL_CALLS] [{"name": ..., "arguments": {...}}, ...]
"""

from __future__ import annotations

import json
import re
import uuid
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class ToolCall:
    name: str
    arguments: str  # JSON-encoded
    id: str = field(default_factory=lambda: f"call_{uuid.uuid4().hex}")

    def to_openai(self) -> dict:
        return {
            "id": self.id,
            "type": "function",
            "function": {"name": self.name,
                         "arguments": self.arguments},
        }


@dataclass
class ExtractedToolCalls:
    tools_called: bool
    tool_calls: list[ToolCall]
    content: Optional[str]  # remaining non-tool text


class HermesToolParser:
    """<tool_call>...</tool_call> blocks (Hermes/Qwen templates)."""

    PATTERN = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>",
                         re.DOTALL)
    START_MARKERS = ("<tool_call>", )

    def extract(self, text: str) -> ExtractedToolCalls:
        calls = []
        for m in self.PATTERN.finditer(text):
            try:
                obj = json.loads(m.group(1))
            except json.JSONDecodeError:
                continue
            calls.append(
                ToolCall(name=obj.get("name", ""),
                         arguments=json.dumps(
                             obj.get("arguments", obj.get(
                                 "parameters", {})))))
        content = self.PATTERN.sub("", text).strip() or None
        return ExtractedToolCalls(bool(calls), calls, content)


class Llama3JsonToolParser:
    """Bare JSON object with name/parameters (Llama-3.x json tools)."""

    HOLD_IF_PREFIX = ("{", )

    def extract(self, text: str) -> ExtractedToolCalls:
        stripped = text.strip()
        # the model may emit ';'-separated multiple calls
        parts = [p for p in stripped.split(";") if p.strip()]
        calls = []
        for part in parts:
            try:
                obj = json.loads(part)
            except json.JSONDecodeError:
                return ExtractedToolCalls(False, [], text)
            if not isinstance(obj, dict) or "name" not in obj:
                return ExtractedToolCalls(False, [], text)
            calls.append(
                ToolCall(name=obj["name"],
                         arguments=json.dumps(
                             obj.get("parameters",
                                     obj.get("arguments", {})))))
        return ExtractedToolCalls(bool(calls), calls,
                                  None if calls else text)


class MistralToolParser:
    """[TOOL_CALLS] [ {...}, ... ] prefix format."""

    PREFIX = "[TOOL_CALLS]"
    START_MARKERS = ("[TOOL_CALLS]", )

    def extract(self, text: str) -> ExtractedToolCalls:
        idx = text.find(self.PREFIX)
        if idx < 0:
            return ExtractedToolCalls(False, [], text)
        payload = text[idx + len(self.PREFIX):].strip()
        try:
            arr = json.loads(payload)
        except json.JSONDecodeError:
            return ExtractedToolCalls(False, [], text)
        if isinstance(arr, dict):
            arr = [arr]
        calls = [
            ToolCall(name=o.get("name", ""),
                     arguments=json.dumps(o.get("arguments", {})))
            for o in arr if isinstance(o, dict)
        ]
        content = text[:idx].strip() or None
        return ExtractedToolCalls(bool(calls), calls, content)


class PythonicToolParser:
    """Python-call-list format: ``[get_weather(city="SF"), f(x=3)]``
    (reference: tool_parsers/pythonic_tool_parser.py; Llama-4
    pythonic templates)."""

    HOLD_IF_PREFIX = ("[", )

    def extract(self, text: str) -> ExtractedToolCalls:
        import ast

        stripped = text.strip()
        # models sometimes wrap the list in markdown fences
        m = re.search(r"\[.*\]", stripped, re.DOTALL)
        if not m:
            return ExtractedToolCalls(False, [], text)
        try:
            node = ast.parse(m.group(0), mode="eval").body
        except SyntaxError:
            return ExtractedToolCalls(False, [], text)
        if not isinstance(node, ast.List):
            return ExtractedToolCalls(False, [], text)
        calls = []
        for el in node.elts:
            if not (isinstance(el, ast.Call)
                    and isinstance(el.func, ast.Name)):
                return ExtractedToolCalls(False, [], text)
            try:
                args = {kw.arg: ast.literal_eval(kw.value)
                        for kw in el.keywords}
            except (ValueError, SyntaxError):
                return ExtractedToolCalls(False, [], text)
            calls.append(ToolCall(name=el.func.id,
                                  arguments=json.dumps(args)))
        return ExtractedToolCalls(bool(calls), calls, None)


class JsonArrayToolParser:
    """A (possibly prefixed) JSON array of {name, arguments} objects —
    Granite 3.x ``<|tool_call|>``, xLAM, Jamba/Hunyuan
    ``<tool_calls>`` blocks (reference: granite_tool_parser.py,
    xlam_tool_parser.py, jamba_tool_parser.py)."""

    HOLD_IF_PREFIX = ("[", "`")

    def __init__(self, prefixes: tuple = ("<|tool_call|>", ),
                 strip_tags: tuple = ()) -> None:
        self.prefixes = prefixes
        self.strip_tags = strip_tags

    def extract(self, text: str) -> ExtractedToolCalls:
        payload = text
        content = None
        for open_t, close_t in self.strip_tags:
            i = payload.find(open_t)
            if i >= 0:
                content = payload[:i].strip() or None
                payload = payload[i + len(open_t):]
                j = payload.find(close_t)
                if j >= 0:
                    payload = payload[:j]
                break
        for p in self.prefixes:
            i = payload.find(p)
            if i >= 0:
                content = payload[:i].strip() or None
                payload = payload[i + len(p):]
                break
        payload = payload.strip()
        m = re.search(r"\[.*\]", payload, re.DOTALL)
        if not m:
            return ExtractedToolCalls(False, [], text)
        try:
            arr = json.loads(m.group(0))
        except json.JSONDecodeError:
            return ExtractedToolCalls(False, [], text)
        if not isinstance(arr, list):
            return ExtractedToolCalls(False, [], text)
        calls = []
        for o in arr:
            if not isinstance(o, dict) or "name" not in o:
                return ExtractedToolCalls(False, [], text)
            calls.append(
                ToolCall(name=o["name"],
                         arguments=json.dumps(
                             o.get("arguments",
                                   o.get("parameters", {})))))
        return ExtractedToolCalls(bool(calls), calls, content)


def _granite_parser():
    return JsonArrayToolParser(prefixes=("<|tool_call|>", ))


def _xlam_parser():
    return JsonArrayToolParser(prefixes=("```json", "```"))


def _jamba_parser():
    return JsonArrayToolParser(
        strip_tags=(("<tool_calls>", "</tool_calls>"), ))


class InternLM2ToolParser:
    """``<|action_start|><|plugin|>{json}<|action_end|>`` (reference:
    internlm2_tool_parser.py)."""

    PATTERN = re.compile(
        r"<\|action_start\|><\|plugin\|>\s*(.*?)\s*<\|action_end\|>",
        re.DOTALL)
    START_MARKERS = ("<|action_start|>", )

    def extract(self, text: str) -> ExtractedToolCalls:
        m = self.PATTERN.search(text)
        if not m:
            return ExtractedToolCalls(False, [], text)
        try:
            obj = json.loads(m.group(1))
        except json.JSONDecodeError:
            return ExtractedToolCalls(False, [], text)
        call = ToolCall(name=obj.get("name", ""),
                        arguments=json.dumps(
                            obj.get("parameters",
                                    obj.get("arguments", {}))))
        content = text[:m.start()].strip() or None
        return ExtractedToolCalls(True, [call], content)


class DeepSeekV3ToolParser:
    """DeepSeek-V3 unicode-delimited blocks (reference:
    deepseekv3_tool_parser.py):
    ``<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function<｜tool▁sep｜>
    NAME\\n```json\\n{...}\\n```<｜tool▁call▁end｜>...``"""

    BLOCK = re.compile(
        r"<｜tool▁call▁begin｜>function<｜tool▁sep｜>([^\n]+)\n"
        r"```json\n(.*?)\n```<｜tool▁call▁end｜>", re.DOTALL)
    START_MARKERS = ("<｜tool▁calls▁begin｜>", )

    def extract(self, text: str) -> ExtractedToolCalls:
        start = text.find("<｜tool▁calls▁begin｜>")
        if start < 0:
            return ExtractedToolCalls(False, [], text)
        calls = []
        for m in self.BLOCK.finditer(text):
            try:
                args = json.loads(m.group(2))
            except json.JSONDecodeError:
                continue
            calls.append(ToolCall(name=m.group(1).strip(),
                                  arguments=json.dumps(args)))
        content = text[:start].strip() or None
        return ExtractedToolCalls(bool(calls), calls, content)


class Qwen3CoderToolParser:
    """XML function/parameter format (reference:
    qwen3coder_tool_parser.py):
    ``<tool_call><function=NAME><parameter=KEY>VALUE</parameter>...
    </function></tool_call>``"""

    CALL = re.compile(r"<tool_call>\s*<function=([^>]+)>(.*?)"
                      r"</function>\s*</tool_call>", re.DOTALL)
    START_MARKERS = ("<tool_call>", )
    PARAM = re.compile(r"<parameter=([^>]+)>(.*?)</parameter>",
                       re.DOTALL)

    def extract(self, text: str) -> ExtractedToolCalls:
        calls = []
        for m in self.CALL.finditer(text):
            args = {}
            for pm in self.PARAM.finditer(m.group(2)):
                val = pm.group(2).strip()
                try:  # numbers/objects parse; else keep the string
                    val = json.loads(val)
                except json.JSONDecodeError:
                    pass
                args[pm.group(1).strip()] = val
            calls.append(ToolCall(name=m.group(1).strip(),
                                  arguments=json.dumps(args)))
        content = self.CALL.sub("", text).strip() or None
        return ExtractedToolCalls(bool(calls), calls, content)


class GLM4MoeToolParser:
    """GLM-4.5 arg_key/arg_value format (reference:
    glm4_moe_tool_parser.py): ``<tool_call>NAME\\n<arg_key>K</arg_key>
    <arg_value>V</arg_value>...</tool_call>``"""

    CALL = re.compile(r"<tool_call>\s*([^\n<]+)(.*?)</tool_call>",
                      re.DOTALL)
    START_MARKERS = ("<tool_call>", )
    KV = re.compile(r"<arg_key>(.*?)</arg_key>\s*"
                    r"<arg_value>(.*?)</arg_value>", re.DOTALL)

    def extract(self, text: str) -> ExtractedToolCalls:
        calls = []
        for m in self.CALL.finditer(text):
            args = {}
            for km in self.KV.finditer(m.group(2)):
                val = km.group(2).strip()
                try:
                    val = json.loads(val)
                except json.JSONDecodeError:
                    pass
                args[km.group(1).strip()] = val
            calls.append(ToolCall(name=m.group(1).strip(),
                                  arguments=json.dumps(args)))
        content = self.CALL.sub("", text).strip() or None
        return ExtractedToolCalls(bool(calls), calls, content)


class Phi4MiniJsonToolParser:
    """``functools[{...}, ...]`` (reference:
    phi4mini_tool_parser.py)."""

    START_MARKERS = ("functools[", )

    def extract(self, text: str) -> ExtractedToolCalls:
        idx = text.find("functools[")
        if idx < 0:
            return ExtractedToolCalls(False, [], text)
        payload = text[idx + len("functools"):]
        m = re.search(r"\[.*\]", payload, re.DOTALL)
        if not m:
            return ExtractedToolCalls(False, [], text)
        try:
            arr = json.loads(m.group(0))
        except json.JSONDecodeError:
            return ExtractedToolCalls(False, [], text)
        calls = [
            ToolCall(name=o.get("name", ""),
                     arguments=json.dumps(o.get("arguments", {})))
            for o in arr if isinstance(o, dict)
        ]
        content = text[:idx].strip() or None
        return ExtractedToolCalls(bool(calls), calls, content)


class Granite20bFCToolParser:
    """``<function_call> {json}`` repeated (reference:
    granite_20b_fc_tool_parser.py)."""

    BLOCK = re.compile(r"<function_call>\s*(\{.*?\})(?=\s*(?:"
                       r"<function_call>|$))", re.DOTALL)
    START_MARKERS = ("<function_call>", )

    def extract(self, text: str) -> ExtractedToolCalls:
        calls = []
        first = text.find("<function_call>")
        if first < 0:
            return ExtractedToolCalls(False, [], text)
        for m in self.BLOCK.finditer(text):
            try:
                obj = json.loads(m.group(1))
            except json.JSONDecodeError:
                continue
            calls.append(
                ToolCall(name=obj.get("name", ""),
                         arguments=json.dumps(
                             obj.get("arguments", {}))))
        content = text[:first].strip() or None
        return ExtractedToolCalls(bool(calls), calls, content)


class KimiK2ToolParser:
    """Kimi-K2 section format (reference: kimi_k2_tool_parser.py):
    ``<|tool_calls_section_begin|><|tool_call_begin|>functions.NAME:IDX
    <|tool_call_argument_begin|>{json}<|tool_call_end|>...``"""

    BLOCK = re.compile(
        r"<\|tool_call_begin\|>\s*(?P<id>.+?:\d+)\s*"
        r"<\|tool_call_argument_begin\|>\s*(?P<args>.*?)\s*"
        r"<\|tool_call_end\|>", re.DOTALL)
    START_MARKERS = ("<|tool_calls_section_begin|>", )

    def extract(self, text: str) -> ExtractedToolCalls:
        start = text.find("<|tool_calls_section_begin|>")
        if start < 0:
            return ExtractedToolCalls(False, [], text)
        calls = []
        for m in self.BLOCK.finditer(text):
            tc_id = m.group("id").strip()
            # id is "functions.NAME:IDX" — recover NAME
            name = tc_id.split(":", 1)[0]
            if "." in name:
                name = name.split(".", 1)[1]
            try:
                args = json.loads(m.group("args"))
            except json.JSONDecodeError:
                continue
            calls.append(ToolCall(name=name,
                                  arguments=json.dumps(args),
                                  id=tc_id))
        content = text[:start].strip() or None
        return ExtractedToolCalls(bool(calls), calls, content)


class LongcatToolParser:
    """``<longcat_tool_call>{json}</longcat_tool_call>`` (reference:
    longcat_tool_parser.py; content is a {name, arguments} object)."""

    BLOCK = re.compile(
        r"<longcat_tool_call>(.*?)(?:</longcat_tool_call>|$)",
        re.DOTALL)
    START_MARKERS = ("<longcat_tool_call>", )

    def extract(self, text: str) -> ExtractedToolCalls:
        first = text.find("<longcat_tool_call>")
        if first < 0:
            return ExtractedToolCalls(False, [], text)
        calls = []
        for m in self.BLOCK.finditer(text):
            try:
                obj = json.loads(m.group(1).strip())
            except json.JSONDecodeError:
                continue
            if not isinstance(obj, dict) or "name" not in obj:
                continue
            calls.append(
                ToolCall(name=obj["name"],
                         arguments=json.dumps(
                             obj.get("arguments",
                                     obj.get("parameters", {})))))
        content = text[:first].strip() or None
        return ExtractedToolCalls(bool(calls), calls, content)


class Step3ToolParser:
    """Step-3 steptml invokes inside a unicode-delimited block
    (reference: step3_tool_parser.py): ``<｜tool_calls_begin｜>
    <｜tool_call_begin｜>function<｜tool_sep｜><steptml:invoke
    name="N"><steptml:parameter name="K">V</steptml:parameter>
    </steptml:invoke><｜tool_call_end｜>...``. Parameter values are
    plain text; JSON-decode where possible (the reference casts via
    the tool schema, which is not available at this layer)."""

    INVOKE = re.compile(r'<steptml:invoke name="([^"]+)">(.*?)'
                        r"</steptml:invoke>", re.DOTALL)
    START_MARKERS = ("<｜tool_calls_begin｜>", )
    PARAM = re.compile(r'<steptml:parameter name="([^"]+)">'
                       r"([^<]*)</steptml:parameter>")

    def extract(self, text: str) -> ExtractedToolCalls:
        start = text.find("<｜tool_calls_begin｜>")
        if start < 0:
            return ExtractedToolCalls(False, [], text)
        calls = []
        for m in self.INVOKE.finditer(text):
            args = {}
            for pm in self.PARAM.finditer(m.group(2)):
                val = pm.group(2).strip()
                try:
                    val = json.loads(val)
                except json.JSONDecodeError:
                    pass
                args[pm.group(1)] = val
            calls.append(ToolCall(name=m.group(1),
                                  arguments=json.dumps(args)))
        content = text[:start].strip() or None
        return ExtractedToolCalls(bool(calls), calls, content)


class SeedOssToolParser(Qwen3CoderToolParser):
    """Seed-OSS function/parameter XML inside ``<seed:tool_call>``
    (reference: seed_oss_tool_parser.py)."""

    CALL = re.compile(r"<seed:tool_call>\s*<function=([^>]+)>(.*?)"
                      r"</function>\s*</seed:tool_call>", re.DOTALL)
    START_MARKERS = ("<seed:tool_call>", )


class DeepSeekV31ToolParser:
    """DeepSeek-V3.1 compact blocks (reference:
    deepseekv31_tool_parser.py): ``<｜tool▁call▁begin｜>NAME
    <｜tool▁sep｜>{json}<｜tool▁call▁end｜>`` — no 'function' keyword
    or json fence, unlike V3."""

    BLOCK = re.compile(r"<｜tool▁call▁begin｜>(?P<name>.*?)"
                       r"<｜tool▁sep｜>(?P<args>.*?)<｜tool▁call▁end｜>",
                       re.DOTALL)
    START_MARKERS = ("<｜tool▁calls▁begin｜>", )

    def extract(self, text: str) -> ExtractedToolCalls:
        start = text.find("<｜tool▁calls▁begin｜>")
        if start < 0:
            return ExtractedToolCalls(False, [], text)
        calls = []
        for m in self.BLOCK.finditer(text):
            try:
                args = json.loads(m.group("args"))
            except json.JSONDecodeError:
                continue
            calls.append(ToolCall(name=m.group("name").strip(),
                                  arguments=json.dumps(args)))
        content = text[:start].strip() or None
        return ExtractedToolCalls(bool(calls), calls, content)


class OpenAIHarmonyToolParser:
    """GPT-OSS harmony commentary channel (reference:
    openai_tool_parser.py, which decodes via the harmony library;
    this parses the rendered text form): ``<|channel|>commentary
    to=functions.NAME <|constrain|>json<|message|>{args}<|call|>``."""

    BLOCK = re.compile(
        r"<\|channel\|>commentary to=(?:functions\.)?([\w.-]+)"
        r".*?<\|message\|>(.*?)(?:<\|call\|>|$)", re.DOTALL)
    START_MARKERS = ("<|channel|>", )

    def extract(self, text: str) -> ExtractedToolCalls:
        calls = []
        for m in self.BLOCK.finditer(text):
            try:
                args = json.loads(m.group(2).strip())
            except json.JSONDecodeError:
                continue
            calls.append(ToolCall(name=m.group(1),
                                  arguments=json.dumps(args)))
        if not calls:
            return ExtractedToolCalls(False, [], text)
        # final-channel text (if any) is the user-visible content
        fm = re.search(r"<\|channel\|>final<\|message\|>(.*?)"
                       r"(?:<\|return\|>|<\|end\|>|$)", text, re.DOTALL)
        content = fm.group(1).strip() if fm else None
        return ExtractedToolCalls(True, calls, content or None)


TOOL_PARSERS = {
    "hermes": HermesToolParser,
    "llama3_json": Llama3JsonToolParser,
    "llama4_json": Llama3JsonToolParser,
    "mistral": MistralToolParser,
    "pythonic": PythonicToolParser,
    "llama4_pythonic": PythonicToolParser,
    "granite": _granite_parser,
    "granite-20b-fc": Granite20bFCToolParser,
    "xlam": _xlam_parser,
    "jamba": _jamba_parser,
    "hunyuan_a13b": _jamba_parser,
    "minimax": _jamba_parser,
    "internlm": InternLM2ToolParser,
    "deepseek_v3": DeepSeekV3ToolParser,
    "qwen3_coder": Qwen3CoderToolParser,
    "glm4_moe": GLM4MoeToolParser,
    "glm45": GLM4MoeToolParser,
    "phi4_mini_json": Phi4MiniJsonToolParser,
    "kimi_k2": KimiK2ToolParser,
    "longcat": LongcatToolParser,
    "step3": Step3ToolParser,
    "seed_oss": SeedOssToolParser,
    "qwen3_xml": Qwen3CoderToolParser,
    "deepseek_v31": DeepSeekV31ToolParser,
    "openai": OpenAIHarmonyToolParser,
}


def get_tool_parser(name: str):
    if name not in TOOL_PARSERS:
        raise ValueError(
            f"unknown tool parser {name!r}; known: "
            f"{sorted(TOOL_PARSERS)}")
    return TOOL_PARSERS[name]()


class StreamingExtractor:
    """Incremental tool-call + reasoning extraction over a growing
    response (reference: per-parser ``extract_tool_calls_streaming``
    in vllm/entrypoints/openai/tool_parsers/*.py).

    Generic across every registered parser: each push re-runs the
    batch ``extract()`` on the accumulated text and emits only the
    monotone delta, while holding back any tail that could be the
    start of a tool-call marker — so streamed responses never leak raw
    ``<tool_call>``-style text to clients. Parsers opt into streaming
    content via ``START_MARKERS`` (in-text region markers) and/or
    ``HOLD_IF_PREFIX`` (whole-output prefixes that *may* be a call);
    a parser with neither buffers content until finish (safe default).
    Complete tool calls stream as one delta each (name + arguments),
    in OpenAI ``delta.tool_calls`` format."""

    def __init__(self, tool_parser=None, reasoning_parser=None):
        self.tp = tool_parser
        self.rp = reasoning_parser
        self.acc = ""
        self.n_reason = 0
        self.n_content = 0
        self.n_calls = 0
        self.tools_called = False
        markers = list(getattr(tool_parser, "START_MARKERS", ()))
        if isinstance(tool_parser, JsonArrayToolParser):
            markers += list(tool_parser.prefixes)
            markers += [o for o, _ in tool_parser.strip_tags]
        # a partial reasoning START tag must not leak as content
        for attr in ("START", "END"):
            m = getattr(reasoning_parser, attr, None)
            if m:
                markers.append(m)
        self.markers = [m for m in markers if m]
        self.hold_prefixes = tuple(
            getattr(tool_parser, "HOLD_IF_PREFIX", ()))
        self.buffer_all = (
            tool_parser is not None
            and not getattr(tool_parser, "START_MARKERS", ())
            and not self.hold_prefixes)

    # ------------------------------------------------------------------

    def _hold(self, content: str) -> str:
        """Trim ``content`` to the part that is safely plain text."""
        if self.buffer_all:
            return ""
        s = content.lstrip()
        for p in self.hold_prefixes:
            # the whole output may still turn out to be a tool call
            if s.startswith(p) or (s and p.startswith(s)):
                return ""
        # cut at the first marker occurrence (an incomplete tool
        # region the batch parser didn't consume yet)
        cut = len(content)
        for m in self.markers:
            i = content.find(m)
            if 0 <= i < cut:
                cut = i
        content = content[:cut]
        # hold back a trailing PARTIAL marker
        best = 0
        for m in self.markers:
            for k in range(min(len(m) - 1, len(content)), 0, -1):
                if content.endswith(m[:k]):
                    best = max(best, k)
                    break
        return content[:-best] if best else content

    @staticmethod
    def _trim_partial(text: str, markers) -> str:
        """Strip a trailing PARTIAL occurrence of any marker."""
        best = 0
        for m in markers:
            if not m:
                continue
            for k in range(min(len(m) - 1, len(text)), 0, -1):
                if text.endswith(m[:k]):
                    best = max(best, k)
                    break
        return text[:-best] if best else text

    def _state(self, final: bool = False):
        text = self.acc
        reasoning = ""
        if self.rp is not None:
            ro = self.rp.extract(text)
            reasoning = ro.reasoning_content or ""
            text = ro.content or ""
            if not final:
                # an in-flight "</thi" must not leak as reasoning
                reasoning = self._trim_partial(
                    reasoning,
                    (getattr(self.rp, "END", None), ))
        calls: list[ToolCall] = []
        content = text
        if self.tp is not None:
            et = self.tp.extract(text)
            calls = et.tool_calls
            content = et.content or ""
        if not final:
            content = self._hold(content)
        return reasoning, content, calls

    def _emit(self, reasoning, content, calls) -> list[dict]:
        out = []
        if self.n_reason < len(reasoning):
            out.append(
                {"reasoning_content": reasoning[self.n_reason:]})
            self.n_reason = len(reasoning)
        if self.n_content < len(content):
            out.append({"content": content[self.n_content:]})
            self.n_content = len(content)
        if self.n_calls < len(calls):
            self.tools_called = True
            out.append({"tool_calls": [{
                "index": self.n_calls + j,
                "id": c.id,
                "type": "function",
                "function": {"name": c.name,
                             "arguments": c.arguments},
            } for j, c in enumerate(calls[self.n_calls:])]})
            self.n_calls = len(calls)
        return out

    # ------------------------------------------------------------------

    def push(self, delta_text: str) -> list[dict]:
        """Consume a text delta; returns DeltaMessage field dicts."""
        if not delta_text:
            return []
        self.acc += delta_text
        return self._emit(*self._state())

    def finish(self) -> list[dict]:
        """Flush everything the final extraction settles on."""
        return self._emit(*self._state(final=True))
