

def test_crash_dumps_scheduler_state(tiny_llama_dir, tmp_path,
                                     monkeypatch):
    """Engine-core death writes a scheduler-state snapshot for
    postmortems (reference capability: dump_engine_exception)."""
    import asyncio
    import glob
    import json
    import os

    from vllm_main_modify_tpu.config import (CacheConfig, EngineConfig,
                                             LoadConfig, ModelConfig,
                                             SchedulerConfig)
    from vllm_main_modify_tpu.engine.async_llm import (AsyncLLM,
                                                       EngineDeadError)
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    config = EngineConfig(
        model_config=ModelConfig(model=tiny_llama_dir,
                                 dtype="float32", max_model_len=128),
        cache_config=CacheConfig(block_size=4, num_gpu_blocks=64),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4,
                                         max_model_len=128),
        load_config=LoadConfig(load_format="auto"),
    )
    eng = AsyncLLM(config)
    before = set(glob.glob("/tmp/vllm_tpu_crash_*.json"))

    def boom(*a, **k):
        raise RuntimeError("injected step failure")

    eng.engine_core.step = boom

    async def run():
        with __import__("pytest").raises(EngineDeadError):
            async for _ in eng.generate(
                    "hello", SamplingParams(max_tokens=4,
                                            ignore_eos=True), "r1"):
                pass

    asyncio.new_event_loop().run_until_complete(run())
    new = set(glob.glob("/tmp/vllm_tpu_crash_*.json")) - before
    assert new, "no crash dump written"
    doc = json.load(open(sorted(new)[-1]))
    assert "injected step failure" in doc["error"]
    assert "requests" in doc and "kv_usage" in doc
    for p in new:
        os.unlink(p)
    eng.shutdown()
