"""Reasoning-content parsers (thinking models).

Reference: vllm/reasoning/ (12 parser files) — split a model's output
into ``reasoning_content`` (the <think> block) and ``content``.
DeepSeek-R1 and Qwen3 share the <think></think> convention.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional


@dataclass
class ReasoningOutput:
    reasoning_content: Optional[str]
    content: Optional[str]


class ThinkTagReasoningParser:
    """<think>...</think> (deepseek_r1, qwen3)."""

    START = "<think>"
    END = "</think>"

    def extract(self, text: str) -> ReasoningOutput:
        end = text.find(self.END)
        if end < 0:
            # R1-style outputs may omit the opening tag; if an
            # unterminated think block is all we have, it is reasoning
            if self.START in text:
                reasoning = text.split(self.START, 1)[1]
                return ReasoningOutput(reasoning.strip() or None, None)
            return ReasoningOutput(None, text)
        before = text[:end]
        if self.START in before:
            before = before.split(self.START, 1)[1]
        content = text[end + len(self.END):]
        return ReasoningOutput(before.strip() or None,
                               content.strip() or None)


def _tag_parser(start: str, end: str):
    """Parametrized tag-pair parser factory (reference: the per-model
    files in vllm/reasoning/ differing only in delimiters)."""

    def make() -> ThinkTagReasoningParser:
        p = ThinkTagReasoningParser()
        p.START, p.END = start, end
        return p

    return make


class GraniteReasoningParser:
    """Granite 3.x prose delimiters (reference:
    granite_reasoning_parser.py): 'Here is my thought process:' ...
    'Here is my response:'."""

    THOUGHT = re.compile(
        r"(?:Here is my thought process:|Here's my thought process:)"
        r"\s*(.*?)\s*"
        r"(?:Here is my response:|Here's my response:)\s*(.*)",
        re.DOTALL)

    def extract(self, text: str) -> ReasoningOutput:
        m = self.THOUGHT.search(text)
        if not m:
            return ReasoningOutput(None, text)
        return ReasoningOutput(m.group(1).strip() or None,
                               m.group(2).strip() or None)


class HunyuanReasoningParser:
    """<think>...</think><answer>...</answer> (reference:
    hunyuan_a13b_reasoning_parser.py)."""

    PAT = re.compile(r"<think>\s*(.*?)\s*</think>\s*"
                     r"(?:<answer>\s*(.*?)\s*</answer>|(.*))",
                     re.DOTALL)

    def extract(self, text: str) -> ReasoningOutput:
        m = self.PAT.search(text)
        if not m:
            return ReasoningOutput(None, text)
        content = m.group(2) if m.group(2) is not None else m.group(3)
        return ReasoningOutput(m.group(1).strip() or None,
                               (content or "").strip() or None)


class GptOssReasoningParser:
    """GPT-OSS harmony channels (reference:
    gptoss_reasoning_parser.py): the ``analysis`` channel is
    reasoning, the ``final`` channel is content."""

    CHAN = re.compile(r"<\|channel\|>(\w+)<\|message\|>(.*?)"
                      r"(?=<\|channel\|>|<\|end\|>|<\|return\|>|$)",
                      re.DOTALL)

    def extract(self, text: str) -> ReasoningOutput:
        reasoning, content = [], []
        matched = False
        for m in self.CHAN.finditer(text):
            matched = True
            (reasoning if m.group(1) == "analysis" else
             content).append(m.group(2).strip())
        if not matched:
            return ReasoningOutput(None, text)
        return ReasoningOutput("\n".join(reasoning) or None,
                               "\n".join(content) or None)


REASONING_PARSERS = {
    "deepseek_r1": ThinkTagReasoningParser,
    "deepseek_v3": ThinkTagReasoningParser,
    "qwen3": ThinkTagReasoningParser,
    "glm45": ThinkTagReasoningParser,
    "step3": ThinkTagReasoningParser,
    "olmo3": ThinkTagReasoningParser,
    "kimi": ThinkTagReasoningParser,
    "exaone4": _tag_parser("<thought>", "</thought>"),
    "seed_oss": _tag_parser("<seed:think>", "</seed:think>"),
    "mistral": _tag_parser("[THINK]", "[/THINK]"),
    "granite": GraniteReasoningParser,
    "hunyuan_a13b": HunyuanReasoningParser,
    "gptoss": GptOssReasoningParser,
    "openai_gptoss": GptOssReasoningParser,
}


def get_reasoning_parser(name: str):
    if name not in REASONING_PARSERS:
        raise ValueError(
            f"unknown reasoning parser {name!r}; known: "
            f"{sorted(REASONING_PARSERS)}")
    return REASONING_PARSERS[name]()
