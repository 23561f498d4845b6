"""check_recompilation (reference: VLLM_XLA_CHECK_RECOMPILATION,
_verify_num_xla_graphs tpu_model_runner.py:329): a compile after the
capture phase raises."""

import pytest

from vllm_main_modify_tpu.config import (CacheConfig, CompilationConfig,
                                         EngineConfig, LoadConfig,
                                         ModelConfig, SchedulerConfig)
from vllm_main_modify_tpu.engine.llm_engine import LLMEngine
from vllm_main_modify_tpu.sampling_params import SamplingParams


def test_recompile_after_capture_raises(tiny_llama_dir):
    cfg = EngineConfig(
        model_config=ModelConfig(model=tiny_llama_dir, dtype="float32",
                                 max_model_len=64),
        cache_config=CacheConfig(block_size=4, num_gpu_blocks=64),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=32,
                                         max_num_seqs=4,
                                         max_model_len=64),
        load_config=LoadConfig(load_format="auto"),
        compilation_config=CompilationConfig(check_recompilation=True),
    )
    engine = LLMEngine(cfg)
    runner = engine.engine_core.model_runner
    # simulate end-of-capture: whatever compiled so far is the budget
    runner._compile_baseline = runner.num_compilations

    engine.add_request("warm", "hello world",
                       SamplingParams(temperature=0.0, max_tokens=2,
                                      ignore_eos=True))
    # greedy decode needs a fresh (bucket, statics) compile -> raises
    with pytest.raises(RuntimeError, match="recompilation"):
        while engine.has_unfinished_requests():
            engine.step()
