"""OpenAI-compatible protocol models.

Reference: vllm/entrypoints/openai/protocol.py (pydantic request/
response dataclasses for /v1/completions and /v1/chat/completions).
Subset covering the serving surface; unknown fields are accepted and
ignored like the reference does.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Literal, Optional, Union

from pydantic import BaseModel, ConfigDict, Field

from vllm_main_modify_tpu.sampling_params import (RequestOutputKind,
                                                  SamplingParams,
                                                  StructuredOutputParams)


def random_uuid() -> str:
    return str(uuid.uuid4().hex)


class OpenAIBaseModel(BaseModel):
    model_config = ConfigDict(extra="allow")


class ErrorResponse(OpenAIBaseModel):
    object: str = "error"
    message: str
    type: str
    code: int


class ModelCard(OpenAIBaseModel):
    id: str
    object: str = "model"
    created: int = Field(default_factory=lambda: int(time.time()))
    owned_by: str = "vllm-main-modify-tpu"


class ModelList(OpenAIBaseModel):
    object: str = "list"
    data: list[ModelCard] = Field(default_factory=list)


class UsageInfo(OpenAIBaseModel):
    prompt_tokens: int = 0
    completion_tokens: int = 0
    total_tokens: int = 0


class ResponseFormat(OpenAIBaseModel):
    type: Literal["text", "json_object", "json_schema"] = "text"
    json_schema: Optional[dict] = None


class StreamOptions(OpenAIBaseModel):
    include_usage: bool = False


class _SamplingFields(OpenAIBaseModel):
    max_tokens: Optional[int] = None
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    top_k: Optional[int] = None
    min_p: Optional[float] = None
    n: int = 1
    seed: Optional[int] = None
    stop: Optional[Union[str, list[str]]] = None
    stop_token_ids: Optional[list[int]] = None
    presence_penalty: Optional[float] = None
    frequency_penalty: Optional[float] = None
    repetition_penalty: Optional[float] = None
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    stream: bool = False
    stream_options: Optional[StreamOptions] = None
    logit_bias: Optional[dict[str, float]] = None
    response_format: Optional[ResponseFormat] = None
    guided_json: Optional[Union[str, dict]] = None
    guided_regex: Optional[str] = None
    guided_choice: Optional[list[str]] = None
    guided_grammar: Optional[str] = None  # EBNF (GBNF) grammar

    def to_sampling_params(self, default_max_tokens: int,
                           stream: bool) -> SamplingParams:
        structured = None
        if self.guided_json is not None:
            structured = StructuredOutputParams(
                json_schema=self.guided_json)
        elif self.guided_regex is not None:
            structured = StructuredOutputParams(regex=self.guided_regex)
        elif self.guided_choice is not None:
            structured = StructuredOutputParams(choice=self.guided_choice)
        elif self.guided_grammar is not None:
            structured = StructuredOutputParams(
                grammar=self.guided_grammar)
        elif self.response_format is not None:
            if self.response_format.type == "json_schema":
                schema = self.response_format.json_schema or {}
                if "schema" in schema:
                    schema = schema["schema"]
                structured = StructuredOutputParams(json_schema=schema)
            elif self.response_format.type == "json_object":
                structured = StructuredOutputParams(json_object=True)
        return SamplingParams(
            n=1,
            max_tokens=self.max_tokens or default_max_tokens,
            temperature=(self.temperature
                         if self.temperature is not None else 1.0),
            top_p=self.top_p if self.top_p is not None else 1.0,
            top_k=self.top_k if self.top_k and self.top_k > 0 else 0,
            min_p=self.min_p or 0.0,
            seed=self.seed,
            stop=self.stop,
            stop_token_ids=self.stop_token_ids,
            presence_penalty=self.presence_penalty or 0.0,
            frequency_penalty=self.frequency_penalty or 0.0,
            repetition_penalty=self.repetition_penalty or 1.0,
            ignore_eos=self.ignore_eos,
            skip_special_tokens=self.skip_special_tokens,
            logit_bias={int(k): v for k, v in self.logit_bias.items()}
            if self.logit_bias else None,
            structured_outputs=structured,
            output_kind=(RequestOutputKind.DELTA
                         if stream else RequestOutputKind.FINAL_ONLY),
        )


class CompletionRequest(_SamplingFields):
    model: Optional[str] = None
    prompt: Union[str, list[str], list[int], list[list[int]]] = ""
    echo: bool = False
    logprobs: Optional[int] = None

    def to_sampling_params(self, default_max_tokens: int):
        sp = super().to_sampling_params(default_max_tokens, self.stream)
        if self.logprobs is not None:
            sp.logprobs = self.logprobs
        return sp


class ChatMessage(OpenAIBaseModel):
    role: str
    content: Optional[Union[str, list[dict]]] = None
    name: Optional[str] = None
    tool_calls: Optional[list[dict]] = None


class ChatCompletionRequest(_SamplingFields):
    model: Optional[str] = None
    messages: list[ChatMessage] = Field(default_factory=list)
    logprobs: bool = False
    top_logprobs: Optional[int] = None
    tools: Optional[list[dict]] = None
    tool_choice: Optional[Union[str, dict]] = None
    chat_template: Optional[str] = None
    add_generation_prompt: bool = True

    def to_sampling_params(self, default_max_tokens: int):
        sp = super().to_sampling_params(default_max_tokens, self.stream)
        if self.logprobs:
            sp.logprobs = self.top_logprobs or 0
        return sp


class CompletionChoice(OpenAIBaseModel):
    index: int
    text: str
    finish_reason: Optional[str] = None
    logprobs: Optional[dict] = None


class CompletionResponse(OpenAIBaseModel):
    id: str = Field(default_factory=lambda: f"cmpl-{random_uuid()}")
    object: str = "text_completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: list[CompletionChoice] = Field(default_factory=list)
    usage: Optional[UsageInfo] = None


class ChatCompletionChoice(OpenAIBaseModel):
    index: int
    message: ChatMessage
    finish_reason: Optional[str] = None
    logprobs: Optional[dict] = None


class ChatCompletionResponse(OpenAIBaseModel):
    id: str = Field(default_factory=lambda: f"chatcmpl-{random_uuid()}")
    object: str = "chat.completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: list[ChatCompletionChoice] = Field(default_factory=list)
    usage: Optional[UsageInfo] = None


class DeltaMessage(OpenAIBaseModel):
    role: Optional[str] = None
    content: Optional[str] = None
    reasoning_content: Optional[str] = None
    # [{"index", "id", "type", "function": {"name", "arguments"}}]
    tool_calls: Optional[list[dict]] = None


class ChatCompletionStreamChoice(OpenAIBaseModel):
    index: int
    delta: DeltaMessage
    finish_reason: Optional[str] = None


class ChatCompletionStreamResponse(OpenAIBaseModel):
    id: str = Field(default_factory=lambda: f"chatcmpl-{random_uuid()}")
    object: str = "chat.completion.chunk"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: list[ChatCompletionStreamChoice] = Field(
        default_factory=list)
    usage: Optional[UsageInfo] = None


class TokenizeRequest(OpenAIBaseModel):
    model: Optional[str] = None
    prompt: Optional[str] = None
    messages: Optional[list[ChatMessage]] = None
    add_special_tokens: bool = True


class TokenizeResponse(OpenAIBaseModel):
    count: int
    max_model_len: int
    tokens: list[int]


class DetokenizeRequest(OpenAIBaseModel):
    model: Optional[str] = None
    tokens: list[int] = Field(default_factory=list)


class DetokenizeResponse(OpenAIBaseModel):
    prompt: str


class EmbeddingRequest(OpenAIBaseModel):
    model: Optional[str] = None
    input: Union[str, list[str], list[int], list[list[int]]] = ""
    encoding_format: Literal["float", "base64"] = "float"
    dimensions: Optional[int] = None


class EmbeddingData(OpenAIBaseModel):
    object: str = "embedding"
    index: int
    embedding: Union[list[float], str]


class EmbeddingResponse(OpenAIBaseModel):
    object: str = "list"
    data: list[EmbeddingData] = Field(default_factory=list)
    model: str = ""
    usage: UsageInfo = Field(default_factory=UsageInfo)


class ResponsesRequest(_SamplingFields):
    """/v1/responses (reference: vllm/entrypoints/openai/
    api_server.py create_responses + serving_responses.py)."""

    model: Optional[str] = None
    input: Union[str, list[dict]] = ""
    instructions: Optional[str] = None
    max_output_tokens: Optional[int] = None
    previous_response_id: Optional[str] = None
    background: bool = False
    store: bool = True
    metadata: Optional[dict] = None

    def to_sampling_params(self, default_max_tokens: int):
        if self.max_output_tokens is not None:
            self.max_tokens = self.max_output_tokens
        return super().to_sampling_params(default_max_tokens,
                                          self.stream)
