"""Input processor: validate + tokenize → EngineCoreRequest.

Reference: vllm/v1/engine/processor.py ``Processor.process_inputs``
(:326) — parameter validation, tokenization, and construction of the
engine-core request record.
"""

from __future__ import annotations

import time
from typing import Optional, Union

from vllm_main_modify_tpu.config import EngineConfig
from vllm_main_modify_tpu.engine.types import EngineCoreRequest
from vllm_main_modify_tpu.sampling_params import (PoolingParams,
                                                  SamplingParams)


class Processor:

    def __init__(self, config: EngineConfig, tokenizer) -> None:
        self.config = config
        self.tokenizer = tokenizer
        self.max_model_len = config.model_config.max_model_len
        self.eos_token_id = None
        if tokenizer is not None:
            self.eos_token_id = tokenizer.eos_token_id
        # Bidirectional-span models (Gemma3 image blocks, PaliGemma
        # prefix-LM) need their whole span inside ONE prefill chunk;
        # a span larger than max_num_batched_tokens could never be
        # scheduled (the mm-boundary trim would return 0 forever), so
        # such requests must be rejected here at ingest. The flags are
        # class attributes, readable without instantiating the model.
        self._bidir_mm = False
        self._prefix_lm = False
        try:
            from vllm_main_modify_tpu.models.registry import \
                resolve_model_cls

            cls = resolve_model_cls(config.model_config.architecture)
            self._bidir_mm = bool(getattr(cls, "bidir_mm_spans",
                                          False))
            self._prefix_lm = bool(getattr(cls, "prefix_lm", False))
            # BART family: the prompt is the ENCODER input; the
            # decoder side starts from decoder_start_token_id
            # (reference: vllm encoder-decoder prompt handling,
            # vllm/inputs/preprocess.py)
            self._text_enc_dec = bool(getattr(cls, "is_text_enc_dec",
                                              False))
        except Exception:  # noqa: BLE001 — unknown arch fails later
            self._text_enc_dec = False

    def process_inputs(
        self,
        request_id: str,
        prompt: Union[str, list[int], dict],
        params: Optional[Union[SamplingParams, PoolingParams]] = None,
        arrival_time: Optional[float] = None,
        priority: int = 0,
        lora_request=None,
        trace_headers: Optional[dict[str, str]] = None,
    ) -> EngineCoreRequest:
        mm_inputs = None
        mm_salt = None
        if isinstance(prompt, dict):
            prompt_text = prompt.get("prompt")
            token_ids = prompt.get("prompt_token_ids")
            if token_ids is None:
                # audio requests may omit the decoder prompt entirely
                # (default task tokens come from the generation config)
                token_ids = (self._tokenize(prompt_text)
                             if prompt_text is not None else [])
            embeds = prompt.get("prompt_embeds")
            if embeds is not None:
                # precomputed prompt embeddings (reference:
                # EmbedsPrompt, vllm/inputs/data.py:92): the whole
                # prompt arrives as [T, H] vectors; placeholder token
                # ids fill the stream and the embeds ride the
                # mm-buffer scatter path. Hashed into cache_salt so
                # prefix caching never aliases different embeds.
                import hashlib as _hl

                import numpy as _np

                if not self.config.model_config.enable_prompt_embeds:
                    raise ValueError(
                        f"request {request_id}: prompt_embeds given "
                        "but enable_prompt_embeds is off")
                arr = _np.asarray(embeds, dtype=_np.float32)
                if arr.ndim != 2 or arr.shape[1] != \
                        self.config.model_config.hidden_size:
                    raise ValueError(
                        f"request {request_id}: prompt_embeds must "
                        "be [T, hidden_size], got "
                        f"{tuple(arr.shape)}")
                if token_ids is None or not token_ids:
                    token_ids = [0] * arr.shape[0]
                if len(token_ids) != arr.shape[0]:
                    raise ValueError(
                        f"request {request_id}: prompt_token_ids "
                        f"length {len(token_ids)} != prompt_embeds "
                        f"rows {arr.shape[0]}")
                h = _hl.sha256(arr.tobytes()).hexdigest()
                mm_inputs = [{"embeds": arr, "offset": 0,
                              "num_tokens": arr.shape[0],
                              "hash": h[:24]}]
                mm_salt = h[:16]
            mm_data = prompt.get("multi_modal_data")
            if embeds is not None and mm_data:
                raise ValueError(
                    f"request {request_id}: prompt_embeds and "
                    "multi_modal_data are mutually exclusive")
            if mm_data and "audio" in mm_data:
                from vllm_main_modify_tpu.multimodal.audio import (
                    AUDIO_EMBED_ARCHS, build_audio_embeds_inputs,
                    build_audio_inputs)

                mc = self.config.model_config
                if mc.architecture in AUDIO_EMBED_ARCHS:
                    # decoder-only audio (Qwen2-Audio): embedding
                    # merge, not Whisper cross-attention
                    token_ids, mm_inputs, mm_salt = \
                        build_audio_embeds_inputs(
                            token_ids, mm_data["audio"], mc)
                else:
                    token_ids, mm_inputs, mm_salt = \
                        build_audio_inputs(
                            token_ids, mm_data["audio"], mc)
            elif mm_data:
                if not self.config.model_config.is_multimodal:
                    raise ValueError(
                        f"request {request_id}: multi_modal_data "
                        "given but the model is text-only")
                from vllm_main_modify_tpu.multimodal import \
                    build_mm_inputs

                token_ids, mm_inputs, mm_salt = build_mm_inputs(
                    token_ids, mm_data.get("image"),
                    self.config.model_config,
                    videos=mm_data.get("video"))
        elif isinstance(prompt, str):
            prompt_text = prompt
            token_ids = self._tokenize(prompt)
        else:
            prompt_text = None
            token_ids = list(prompt)

        if self._text_enc_dec and mm_inputs is None:
            # text encoder-decoder (BART family): the tokenized
            # prompt feeds the ENCODER; decoding starts from
            # decoder_start_token_id (or an explicit decoder prompt)
            import numpy as np

            hf = self.config.model_config.hf_config
            enc_ids = list(token_ids)
            if not enc_ids:
                raise ValueError(
                    f"request {request_id}: empty encoder prompt")
            if len(enc_ids) > self.max_model_len:
                raise ValueError(
                    f"request {request_id}: encoder prompt "
                    f"({len(enc_ids)} tokens) exceeds "
                    f"max_model_len={self.max_model_len}")
            dec = None
            if isinstance(prompt, dict):
                dec = prompt.get("decoder_prompt_token_ids")
            if dec is None:
                start = getattr(hf, "decoder_start_token_id", None)
                if start is None:
                    start = self.eos_token_id or 0
                dec = [int(start)]
            token_ids = list(dec)
            mm_inputs = [{
                "encoder_input_ids": np.asarray(enc_ids, np.int32)
            }]

        if not token_ids:
            raise ValueError(f"request {request_id}: empty prompt")
        if len(token_ids) >= self.max_model_len:
            raise ValueError(
                f"request {request_id}: prompt ({len(token_ids)} tokens) "
                f"exceeds max_model_len={self.max_model_len}")
        mbt = self.config.scheduler_config.max_num_batched_tokens
        if self._prefix_lm and len(token_ids) > mbt:
            raise ValueError(
                f"request {request_id}: prefix-LM prompt "
                f"({len(token_ids)} tokens) exceeds "
                f"max_num_batched_tokens={mbt}; the bidirectional "
                "prompt must fit in one prefill step")
        enc_budget = getattr(self.config.scheduler_config,
                             "max_num_encoder_input_tokens", 0)
        if enc_budget and mm_inputs:
            for mm in mm_inputs:
                if "offset" in mm and int(mm.get("offset", -1)) >= 0 \
                        and int(mm["num_tokens"]) > enc_budget:
                    raise ValueError(
                        f"request {request_id}: image block "
                        f"({mm['num_tokens']} tokens) exceeds "
                        f"max_num_encoder_input_tokens={enc_budget} "
                        "and could never be scheduled")
        if self._bidir_mm and mm_inputs:
            for mm in mm_inputs:
                nt = int(mm.get("num_tokens", 0))
                if nt > mbt:
                    raise ValueError(
                        f"request {request_id}: bidirectional image "
                        f"block ({nt} tokens) exceeds "
                        f"max_num_batched_tokens={mbt} and can never "
                        "be scheduled whole")

        sampling_params = None
        pooling_params = None
        if isinstance(params, PoolingParams):
            pooling_params = params
        else:
            sampling_params = params or SamplingParams()
            sampling_params = self._clamp_max_tokens(
                sampling_params, len(token_ids))
            if sampling_params.structured_outputs is not None:
                if self.config.scheduler_config.async_scheduling:
                    raise ValueError(
                        "structured outputs are incompatible with "
                        "async scheduling (the grammar must observe "
                        "token N before masking step N+1)")
                # fail fast on unsupported/invalid specs (reference:
                # structured-output validation processor.py:222)
                so = sampling_params.structured_outputs
                if so.grammar is not None:
                    # EBNF: validate the grammar parses (PDA backend)
                    from vllm_main_modify_tpu.structured_output.ebnf \
                        import _EBNFParser

                    _EBNFParser(so.grammar).parse()
                else:
                    from vllm_main_modify_tpu.structured_output \
                        .manager import spec_to_regex

                    spec_to_regex(so)
            if sampling_params.bad_words and self.tokenizer is not None:
                # tokenize bad words (both with and without a leading
                # space — reference: vllm/v1/sample/ops/bad_words.py)
                seqs = []
                for w in sampling_params.bad_words:
                    for variant in (w, " " + w):
                        ids = self.tokenizer.encode(
                            variant, add_special_tokens=False)
                        if ids and ids not in seqs:
                            seqs.append(ids)
                extra = dict(sampling_params.extra_args or {})
                extra["bad_words_token_ids"] = seqs
                sampling_params.extra_args = extra

        return EngineCoreRequest(
            request_id=request_id,
            prompt_token_ids=token_ids,
            sampling_params=sampling_params,
            pooling_params=pooling_params,
            eos_token_id=self.eos_token_id,
            arrival_time=arrival_time if arrival_time is not None else
            time.monotonic(),
            priority=priority,
            lora_name=(lora_request.lora_name
                       if lora_request is not None else None),
            lora_path=(lora_request.lora_path
                       if lora_request is not None else None),
            prompt=prompt_text,
            trace_headers=trace_headers,
            mm_inputs=mm_inputs,
            # image content feeds the prefix-cache key: identical text
            # with different images must never share KV blocks
            cache_salt=mm_salt,
        )

    def _tokenize(self, text: str) -> list[int]:
        if self.tokenizer is None:
            raise ValueError("no tokenizer loaded; pass prompt_token_ids")
        return self.tokenizer.encode(text)

    def _clamp_max_tokens(self, sp: SamplingParams,
                          prompt_len: int) -> SamplingParams:
        budget = self.max_model_len - prompt_len
        if sp.max_tokens is None or sp.max_tokens > budget:
            sp = sp.clone()
            sp.max_tokens = budget
        return sp
