"""Synchronous engine: frontend + core in one process.

Reference: vllm/v1/engine/llm_engine.py ``LLMEngine`` (:45) — the
offline-batch engine: add_request / step / has_unfinished_requests.
"""

from __future__ import annotations

import logging
from typing import Optional, Union

from vllm_main_modify_tpu.config import EngineConfig
from vllm_main_modify_tpu.engine.core import EngineCore
from vllm_main_modify_tpu.engine.output_processor import OutputProcessor
from vllm_main_modify_tpu.engine.processor import Processor
from vllm_main_modify_tpu.outputs import RequestOutput
from vllm_main_modify_tpu.sampling_params import (PoolingParams,
                                                  SamplingParams)
from vllm_main_modify_tpu.utils import Counter

logger = logging.getLogger(__name__)


def get_tokenizer(model_config):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(
        model_config.tokenizer,
        trust_remote_code=model_config.trust_remote_code)


class LLMEngine:

    def __init__(self, config: EngineConfig, tokenizer=None,
                 mesh=None) -> None:
        self.config = config
        if tokenizer is None and config.model_config.tokenizer:
            tokenizer = get_tokenizer(config.model_config)
        self.tokenizer = tokenizer

        structured_output_manager = None
        if tokenizer is not None:
            from vllm_main_modify_tpu.structured_output import \
                StructuredOutputManager

            structured_output_manager = StructuredOutputManager(
                tokenizer, config.model_config.vocab_size)
        self.processor = Processor(config, tokenizer)
        self.output_processor = OutputProcessor(tokenizer)
        from vllm_main_modify_tpu.engine.core_client import \
            make_engine_core_client

        self.engine_core = make_engine_core_client(
            config, structured_output_manager=structured_output_manager,
            mesh=mesh)
        self.request_counter = Counter()

    @classmethod
    def from_config(cls, config: EngineConfig, **kw) -> "LLMEngine":
        return cls(config, **kw)

    # ------------------------------------------------------------------

    def add_request(
        self,
        request_id: str,
        prompt: Union[str, list[int], dict],
        params: Optional[Union[SamplingParams, PoolingParams]] = None,
        **kwargs,
    ) -> None:
        request = self.processor.process_inputs(request_id, prompt,
                                                params, **kwargs)
        n = (request.sampling_params.n
             if request.sampling_params is not None else 1)
        if n <= 1:
            self.output_processor.add_request(request)
            self.engine_core.add_request(request)
            return
        # n>1: fan out child requests, aggregate under the parent
        # (reference: vllm/v1/engine/parallel_sampling.py)
        import copy

        for i in range(n):
            child = copy.copy(request)
            child.request_id = f"{request_id}_PAR_{i}"
            sp = request.sampling_params.clone()
            sp.n = 1
            if sp.seed is not None:
                sp.seed = sp.seed + i
            child.sampling_params = sp
            self.output_processor.add_request(child, parent_id=request_id,
                                              index=i, parent_n=n)
            self.engine_core.add_request(child)

    def abort_request(self, request_ids) -> None:
        if isinstance(request_ids, str):
            request_ids = [request_ids]
        self.output_processor.abort_requests(request_ids)
        self.engine_core.abort_requests(request_ids)

    def step(self) -> list[RequestOutput]:
        core_outputs = self.engine_core.step()
        result = self.output_processor.process_outputs(
            core_outputs.outputs)
        if result.reqs_to_abort:
            # stop-string hit: core must release KV + batch row
            self.engine_core.abort_requests(result.reqs_to_abort)
        return result.request_outputs

    def has_unfinished_requests(self) -> bool:
        return self.engine_core.has_unfinished_requests()

    def get_num_unfinished_requests(self) -> int:
        core = self.engine_core
        if hasattr(core, "get_num_unfinished_requests"):
            return core.get_num_unfinished_requests()
        return core.scheduler.get_num_unfinished_requests()

    def reset_prefix_cache(self) -> bool:
        return self.engine_core.reset_prefix_cache()
