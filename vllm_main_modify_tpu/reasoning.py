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


REASONING_PARSERS = {
    "deepseek_r1": ThinkTagReasoningParser,
    "qwen3": ThinkTagReasoningParser,
}


def get_reasoning_parser(name: str):
    if name not in REASONING_PARSERS:
        raise ValueError(
            f"unknown reasoning parser {name!r}; known: "
            f"{sorted(REASONING_PARSERS)}")
    return REASONING_PARSERS[name]()
