"""Multi-API-server scale-out (reference: vllm serve
--api-server-count): ONE shared engine-core process (ROUTER socket),
several frontend AsyncLLM instances with RouterClients — outputs
route back to the owning frontend and match a local engine."""

import asyncio
import multiprocessing as mp
import os

import pytest

from vllm_main_modify_tpu.config import EngineConfig, ModelConfig
from vllm_main_modify_tpu.sampling_params import SamplingParams


def _config(model_dir: str) -> EngineConfig:
    from vllm_main_modify_tpu.config import (CacheConfig,
                                             SchedulerConfig)

    return EngineConfig(
        model_config=ModelConfig(model=model_dir, dtype="float32",
                                 max_model_len=128),
        cache_config=CacheConfig(block_size=4, num_gpu_blocks=256),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=8,
                                         max_model_len=128))


def _core_proc(model_dir: str, addr: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    from vllm_main_modify_tpu.engine.core_client import \
        run_engine_core_router

    run_engine_core_router(_config(model_dir), addr)


def test_two_frontends_one_core(tiny_llama_dir, tmp_path):
    from vllm_main_modify_tpu.engine.async_llm import AsyncLLM
    from vllm_main_modify_tpu.engine.core_client import RouterClient
    from vllm_main_modify_tpu.entrypoints.llm import LLM

    addr = f"ipc://{tmp_path}/core.sock"
    ctx = mp.get_context("spawn")
    proc = ctx.Process(target=_core_proc,
                       args=(tiny_llama_dir, addr), daemon=True)
    proc.start()
    try:
        config = _config(tiny_llama_dir)
        fe1 = AsyncLLM(config, engine_core=RouterClient(addr))
        fe2 = AsyncLLM(config, engine_core=RouterClient(addr))

        async def gen(engine, prompt, rid):
            out = None
            async for o in engine.generate(
                    prompt,
                    SamplingParams(temperature=0.0, max_tokens=8,
                                   ignore_eos=True), rid):
                out = o
            return list(out.outputs[0].token_ids)

        async def both():
            return await asyncio.gather(
                gen(fe1, "hello world test", "fe1-0"),
                gen(fe2, "a different prompt", "fe2-0"),
                gen(fe1, "hello world test", "fe1-1"),
            )

        got1, got2, got1b = asyncio.run(both())
        fe1.shutdown = lambda: None  # core is shared; don't kill it
        fe2.shutdown = lambda: None

        # reference output from a local single-process engine
        llm = LLM(model=tiny_llama_dir, dtype="float32",
                  max_model_len=128, max_num_seqs=8,
                  max_num_batched_tokens=64, block_size=4,
                  num_kv_blocks=256)
        p = SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True)
        ref1 = llm.generate(["hello world test"], p)[0]
        ref2 = llm.generate(["a different prompt"], p)[0]
        assert got1 == list(ref1.outputs[0].token_ids)
        assert got1b == list(ref1.outputs[0].token_ids)
        assert got2 == list(ref2.outputs[0].token_ids)
    finally:
        proc.terminate()
        proc.join(timeout=10)
