"""Per-request sampling parameters.

Reference: vllm/sampling_params.py (SamplingParams, ~600 LoC). The TPU
sampler consumes these through a fixed-shape, padded metadata struct
(see sample/metadata.py), so this class stays a plain host-side record.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum
from typing import Any, Optional, Sequence, Union


class RequestOutputKind(IntEnum):
    CUMULATIVE = 0  # full text so far on every yield
    DELTA = 1  # only newly generated text
    FINAL_ONLY = 2  # nothing until finished


@dataclass
class StructuredOutputParams:
    """Constrained-decoding spec (reference: vllm/sampling_params.py
    StructuredOutputsParams)."""

    json_schema: Optional[Union[str, dict]] = None
    regex: Optional[str] = None
    grammar: Optional[str] = None
    choice: Optional[Sequence[str]] = None
    json_object: bool = False


@dataclass
class SamplingParams:
    n: int = 1
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0  # 0 = disabled
    min_p: float = 0.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    max_tokens: Optional[int] = 16
    min_tokens: int = 0
    stop: Optional[Union[str, list[str]]] = None
    stop_token_ids: Optional[list[int]] = None
    ignore_eos: bool = False
    seed: Optional[int] = None
    logprobs: Optional[int] = None  # num top logprobs to return
    prompt_logprobs: Optional[int] = None
    detokenize: bool = True
    skip_special_tokens: bool = True
    spaces_between_special_tokens: bool = True
    include_stop_str_in_output: bool = False
    logit_bias: Optional[dict[int, float]] = None
    allowed_token_ids: Optional[list[int]] = None
    bad_words: Optional[list[str]] = None
    output_kind: RequestOutputKind = RequestOutputKind.CUMULATIVE
    structured_outputs: Optional[StructuredOutputParams] = None
    extra_args: Optional[dict[str, Any]] = None

    def __post_init__(self) -> None:
        if isinstance(self.stop, str):
            self.stop = [self.stop]
        elif self.stop is None:
            self.stop = []
        if self.stop_token_ids is None:
            self.stop_token_ids = []
        self._verify()

    def _verify(self) -> None:
        if self.n < 1:
            raise ValueError(f"n must be >= 1, got {self.n}")
        if self.temperature < 0.0:
            raise ValueError(
                f"temperature must be non-negative, got {self.temperature}")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if self.top_k < 0:
            raise ValueError(
                f"top_k must be 0 (disable) or positive, got {self.top_k}")
        if not 0.0 <= self.min_p <= 1.0:
            raise ValueError(f"min_p must be in [0, 1], got {self.min_p}")
        if not -2.0 <= self.presence_penalty <= 2.0:
            raise ValueError("presence_penalty must be in [-2, 2]")
        if not -2.0 <= self.frequency_penalty <= 2.0:
            raise ValueError("frequency_penalty must be in [-2, 2]")
        if self.repetition_penalty <= 0.0:
            raise ValueError("repetition_penalty must be positive")
        if self.max_tokens is not None and self.max_tokens < 1:
            raise ValueError(f"max_tokens must be >= 1, got {self.max_tokens}")
        if self.min_tokens < 0:
            raise ValueError("min_tokens must be >= 0")
        if self.logprobs is not None and self.logprobs < 0:
            raise ValueError("logprobs must be >= 0")

    @property
    def sampling_type(self) -> str:
        return "greedy" if self.temperature == 0.0 else "random"

    @property
    def all_stop_token_ids(self) -> list[int]:
        return self.stop_token_ids or []

    def clone(self) -> "SamplingParams":
        import copy

        return copy.deepcopy(self)


@dataclass
class PoolingParams:
    """Params for embedding/pooling requests
    (reference: vllm/pooling_params.py)."""

    dimensions: Optional[int] = None
    normalize: bool = True
    activation: Optional[str] = None
    task: str = "embed"  # embed | classify | score
