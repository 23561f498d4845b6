"""Incremental detokenization.

Reference: vllm/v1/engine/detokenizer.py — ``FastIncrementalDetokenizer``
(:165) wraps HF tokenizers' ``DecodeStream``; a slow fallback re-decodes
a sliding window. Both variants are reproduced here.
"""

from __future__ import annotations

from typing import Optional

from vllm_main_modify_tpu.sampling_params import SamplingParams


class BaseIncrementalDetokenizer:
    """Common stop-string logic over an incrementally decoded stream."""

    def __init__(self, params: SamplingParams) -> None:
        self.output_text = ""
        self.token_ids: list[int] = []
        self.stop = params.stop or []
        self.include_stop_str_in_output = params.include_stop_str_in_output
        # longest stop string bounds how much text a stop can span
        self.stop_buffer = max((len(s) for s in self.stop), default=0)

    def update(self, new_token_ids: list[int]) -> Optional[str]:
        """Append tokens; returns the matched stop string if the text
        hit one (the engine truncates output there)."""
        if not new_token_ids:
            return None
        offset_before = len(self.output_text)
        for tok in new_token_ids:
            self.token_ids.append(tok)
            self.output_text += self._decode_next(tok)
        if not self.stop:
            return None
        # search only the tail that could contain a new stop match
        search_start = max(0, offset_before - self.stop_buffer)
        for s in self.stop:
            idx = self.output_text.find(s, search_start)
            if idx != -1:
                end = idx + (len(s) if self.include_stop_str_in_output
                             else 0)
                self.output_text = self.output_text[:end]
                return s
        return None

    def get_next_output_text(self, buffered: int = 0) -> str:
        """Text safe to stream (holds back `buffered` chars that might
        belong to a partial stop string)."""
        hold = self.stop_buffer if buffered == 0 else buffered
        if hold and self.stop:
            return self.output_text[:len(self.output_text) - hold]
        return self.output_text

    def _decode_next(self, token_id: int) -> str:
        raise NotImplementedError


class FastIncrementalDetokenizer(BaseIncrementalDetokenizer):
    """tokenizers.DecodeStream-backed (reference: detokenizer.py:165)."""

    def __init__(self, tokenizer, params: SamplingParams) -> None:
        super().__init__(params)
        from tokenizers.decoders import DecodeStream

        self._stream = DecodeStream(
            skip_special_tokens=params.skip_special_tokens)
        self._tk = tokenizer.backend_tokenizer if hasattr(
            tokenizer, "backend_tokenizer") else tokenizer

    def _decode_next(self, token_id: int) -> str:
        return self._stream.step(self._tk, token_id) or ""


class SlowIncrementalDetokenizer(BaseIncrementalDetokenizer):
    """Sliding-window re-decode fallback for tokenizers without a fast
    backend (reference: detokenizer.py slow path)."""

    WINDOW = 8

    def __init__(self, tokenizer, params: SamplingParams) -> None:
        super().__init__(params)
        self.tokenizer = tokenizer
        self.skip_special = params.skip_special_tokens
        self._prefix_text = ""

    def _decode_next(self, token_id: int) -> str:
        window = self.token_ids[-self.WINDOW:]
        text = self.tokenizer.decode(
            window, skip_special_tokens=self.skip_special)
        prev = self.tokenizer.decode(
            window[:-1], skip_special_tokens=self.skip_special)
        if text.endswith("�"):
            return ""  # wait for more bytes of a multi-byte char
        return text[len(prev):]


def make_detokenizer(tokenizer, params: SamplingParams):
    if not params.detokenize:
        return None
    try:
        return FastIncrementalDetokenizer(tokenizer, params)
    except Exception:
        return SlowIncrementalDetokenizer(tokenizer, params)
