"""Offline inference entrypoint: the ``LLM`` class.

Reference: vllm/entrypoints/llm.py — ``LLM.generate`` batch API over
the synchronous engine. Construction mirrors the reference's
engine-args path but builds :class:`EngineConfig` directly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from tqdm.auto import tqdm

from vllm_main_modify_tpu.config import (CacheConfig, CompilationConfig,
                                         DeviceConfig, EngineConfig,
                                         LoadConfig, LoRAConfig,
                                         ModelConfig, ParallelConfig,
                                         SchedulerConfig,
                                         SpeculativeConfig)
from vllm_main_modify_tpu.engine.llm_engine import LLMEngine
from vllm_main_modify_tpu.outputs import (PoolingRequestOutput,
                                          RequestOutput)
from vllm_main_modify_tpu.sampling_params import (PoolingParams,
                                                  SamplingParams)


class LLM:

    def __init__(
        self,
        model: str,
        tokenizer: Optional[str] = None,
        dtype: str = "bfloat16",
        max_model_len: int = 2048,
        max_num_seqs: int = 64,
        max_num_batched_tokens: int = 1024,
        block_size: int = 16,
        kv_cache_dtype: str = "auto",
        tensor_parallel_size: int = 1,
        data_parallel_size: int = 1,
        engine_multiprocess: bool = False,
        enable_prefix_caching: bool = True,
        num_kv_blocks: Optional[int] = None,
        load_format: str = "auto",
        seed: int = 0,
        trust_remote_code: bool = False,
        async_scheduling: bool = False,
        num_decode_steps_per_dispatch: int = 8,
        speculative_config: Optional[dict] = None,
        enable_lora: bool = False,
        max_loras: int = 4,
        max_lora_rank: int = 16,
        quantization: Optional[str] = None,
        mesh=None,
        **kwargs,
    ) -> None:
        config = EngineConfig(
            model_config=ModelConfig(model=model, tokenizer=tokenizer,
                                     dtype=dtype,
                                     max_model_len=max_model_len,
                                     seed=seed,
                                     quantization=quantization,
                                     trust_remote_code=trust_remote_code,
                                     mm_image_size=kwargs.pop(
                                         "mm_image_size", None),
                                     enable_prompt_embeds=kwargs.pop(
                                         "enable_prompt_embeds",
                                         False)),
            cache_config=CacheConfig(
                block_size=block_size,
                num_gpu_blocks=num_kv_blocks,
                cache_dtype=kv_cache_dtype,
                enable_prefix_caching=enable_prefix_caching,
                disable_hybrid_kv=kwargs.pop("disable_hybrid_kv",
                                             False)),
            scheduler_config=SchedulerConfig(
                max_num_batched_tokens=max_num_batched_tokens,
                max_num_seqs=max_num_seqs,
                max_model_len=max_model_len,
                async_scheduling=async_scheduling,
                num_decode_steps_per_dispatch=(
                    num_decode_steps_per_dispatch),
                max_num_encoder_input_tokens=kwargs.pop(
                    "max_num_encoder_input_tokens", 16384)),
            parallel_config=ParallelConfig(
                tensor_parallel_size=tensor_parallel_size,
                data_parallel_size=data_parallel_size,
                engine_multiprocess=engine_multiprocess,
                decode_context_parallel_size=kwargs.pop(
                    "decode_context_parallel_size", 1),
                pipeline_parallel_size=kwargs.pop(
                    "pipeline_parallel_size", 1),
                enable_eplb=kwargs.pop("enable_eplb", False),
                num_redundant_experts=kwargs.pop(
                    "num_redundant_experts", 0),
                eplb_window=kwargs.pop("eplb_window", 32)),
            load_config=LoadConfig(load_format=load_format),
            lora_config=LoRAConfig(enable_lora=enable_lora,
                                   max_loras=max_loras,
                                   max_lora_rank=max_lora_rank),
            speculative_config=SpeculativeConfig(
                **(speculative_config or {})),
            kv_transfer_config=kwargs.pop("kv_transfer_config", None),
        )
        self.engine = LLMEngine(config, mesh=mesh)
        self._counter = self.engine.request_counter

    def get_tokenizer(self):
        return self.engine.tokenizer

    def generate(
        self,
        prompts: Union[str, Sequence[Union[str, list[int], dict]]],
        sampling_params: Optional[Union[SamplingParams,
                                        Sequence[SamplingParams]]] = None,
        use_tqdm: bool = False,
        lora_request=None,
    ) -> list[RequestOutput]:
        if isinstance(prompts, str):
            prompts = [prompts]
        n = len(prompts)
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, SamplingParams):
            params_list = [sampling_params] * n
        else:
            assert len(sampling_params) == n
            params_list = list(sampling_params)

        order: list[str] = []
        for prompt, params in zip(prompts, params_list):
            rid = str(next(self._counter))
            order.append(rid)
            self.engine.add_request(rid, prompt, params,
                                    lora_request=lora_request)

        finished: dict[str, RequestOutput] = {}
        pbar = tqdm(total=n, desc="generate") if use_tqdm else None
        while self.engine.has_unfinished_requests():
            for out in self.engine.step():
                if out.finished:
                    finished[out.request_id] = out
                    if pbar is not None:
                        pbar.update(1)
        if pbar is not None:
            pbar.close()
        return [finished[rid] for rid in order]

    def classify(
        self,
        prompts: Union[str, Sequence[str]],
    ) -> list[PoolingRequestOutput]:
        """Classification over a *ForSequenceClassification model
        (reference: LLM.classify): returns softmax probs per prompt."""
        return self.embed(prompts,
                          PoolingParams(task="classify"))

    def score(
        self,
        text_1: Union[str, Sequence[str]],
        text_2: Union[str, Sequence[str]],
    ) -> list[float]:
        """Similarity scores for text pairs (reference: LLM.score).
        Cross-encoders (BERT-family *ForSequenceClassification) run
        each PAIR through the model in one sequence; embedding models
        fall back to cosine similarity of normalized embeddings."""
        import numpy as np

        if isinstance(text_1, str):
            text_1 = [text_1]
        if isinstance(text_2, str):
            text_2 = [text_2]
        if len(text_1) == 1 and len(text_2) > 1:
            text_1 = list(text_1) * len(text_2)
        assert len(text_1) == len(text_2), \
            "text_1/text_2 length mismatch"
        arch = self.engine.config.model_config.architecture
        if "ForSequenceClassification" in (arch or ""):
            # cross-encoder: tokenize the pair into one sequence
            # (token types inferred from [SEP] in-model)
            tok = self.get_tokenizer()
            prompts = [
                tok(a, b)["input_ids"]
                for a, b in zip(text_1, text_2)
            ]
            outs = self.embed(prompts, PoolingParams(
                task="score", activation="none"))
            return [float(np.asarray(o.data).reshape(-1)[0])
                    for o in outs]
        embeds = self.embed(list(text_1) + list(text_2))
        n = len(text_1)
        a = np.asarray([e.data for e in embeds[:n]])
        b = np.asarray([e.data for e in embeds[n:]])
        return [float(x) for x in (a * b).sum(axis=1)]

    def rerank(
        self,
        query: str,
        documents: Sequence[str],
    ) -> list[tuple[int, float]]:
        """(index, relevance) sorted best-first (reference: the
        /rerank serving path over embed models)."""
        scores = self.score([query] * len(documents), list(documents))
        order = sorted(range(len(documents)),
                       key=lambda i: scores[i], reverse=True)
        return [(i, scores[i]) for i in order]

    def beam_search(
        self,
        prompts: Sequence[Union[str, list[int]]],
        params=None,
    ):
        """Beam search (reference: LLM.beam_search,
        vllm/entrypoints/llm.py + vllm/beam_search.py)."""
        from vllm_main_modify_tpu.beam_search import (BeamSearchParams,
                                                      beam_search)

        return beam_search(self, prompts,
                           params or BeamSearchParams())

    def embed(
        self,
        prompts: Union[str, Sequence[Union[str, list[int]]]],
        pooling_params: Optional[PoolingParams] = None,
    ) -> list[PoolingRequestOutput]:
        """Embedding requests over a pooling model (reference:
        LLM.embed, vllm/entrypoints/llm.py)."""
        if isinstance(prompts, str):
            prompts = [prompts]
        params = pooling_params or PoolingParams()
        order: list[str] = []
        for prompt in prompts:
            rid = str(next(self._counter))
            order.append(rid)
            self.engine.add_request(rid, prompt, params)
        finished: dict[str, PoolingRequestOutput] = {}
        while self.engine.has_unfinished_requests():
            for out in self.engine.step():
                if isinstance(out, PoolingRequestOutput):
                    finished[out.request_id] = out
        return [finished[rid] for rid in order]
