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


TOOL_PARSERS = {
    "hermes": HermesToolParser,
    "llama3_json": Llama3JsonToolParser,
    "mistral": MistralToolParser,
}


def get_tool_parser(name: str):
    if name not in TOOL_PARSERS:
        raise ValueError(
            f"unknown tool parser {name!r}; known: "
            f"{sorted(TOOL_PARSERS)}")
    return TOOL_PARSERS[name]()
