"""Background-process engine core + DP load balancing (reference:
EngineCoreProc core.py:454, SyncMPClient core_client.py:597,
DPEngineCoreProc :948)."""

import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams


def test_mp_engine_matches_inproc(tiny_llama_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=10,
                        ignore_eos=True)
    prompts = ["hello world this is", "a test of the"]
    inproc = LLM(model=tiny_llama_dir, dtype="float32",
                 max_model_len=128, max_num_seqs=8,
                 max_num_batched_tokens=64, block_size=4,
                 num_kv_blocks=128)
    ref = [o.outputs[0].token_ids
           for o in inproc.generate(prompts, sp)]
    del inproc
    mp_llm = LLM(model=tiny_llama_dir, dtype="float32",
                 max_model_len=128, max_num_seqs=8,
                 max_num_batched_tokens=64, block_size=4,
                 num_kv_blocks=128, engine_multiprocess=True)
    got = [o.outputs[0].token_ids
           for o in mp_llm.generate(prompts, sp)]
    assert got == ref
    # engine survives a second batch (socket/process reuse)
    got2 = [o.outputs[0].token_ids
            for o in mp_llm.generate(prompts, sp)]
    assert got2 == ref
    mp_llm.engine.engine_core.shutdown()


def test_dp_engines_balance_and_match(tiny_llama_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=8,
                        ignore_eos=True)
    prompts = [f"prompt number {i} words" for i in range(6)]
    base = LLM(model=tiny_llama_dir, dtype="float32",
               max_model_len=128, max_num_seqs=8,
               max_num_batched_tokens=64, block_size=4,
               num_kv_blocks=128)
    ref = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    del base
    dp = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
             max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
             num_kv_blocks=128, data_parallel_size=2)
    client = dp.engine.engine_core
    assert len(client.engines) == 2
    got = [o.outputs[0].token_ids for o in dp.generate(prompts, sp)]
    assert got == ref
    # both engines took requests (least-loaded round robin)
    # loads drain to zero after completion
    assert client.get_num_unfinished_requests() == 0
    client.shutdown()


def test_elastic_scale_up_down(tiny_llama_dir):
    """Elastic DP scaling (reference: /scale_elastic_ep +
    v1/engine/utils.py elastic EP): grow spawns engines, shrink
    drains and reaps; generation stays correct throughout."""
    sp = SamplingParams(temperature=0.0, max_tokens=6,
                        ignore_eos=True)
    prompts = [f"scale test {i}" for i in range(4)]
    base = LLM(model=tiny_llama_dir, dtype="float32",
               max_model_len=128, max_num_seqs=8,
               max_num_batched_tokens=64, block_size=4,
               num_kv_blocks=128)
    ref = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    del base

    dp = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
             max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
             num_kv_blocks=128, data_parallel_size=2)
    client = dp.engine.engine_core
    assert client.num_engines == 2

    # scale UP to 3 and serve
    client.scale(3)
    assert client.num_engines == 3
    got = [o.outputs[0].token_ids for o in dp.generate(prompts, sp)]
    assert got == ref

    # scale DOWN to 1: victims drain and are reaped
    client.scale(1)
    got = [o.outputs[0].token_ids for o in dp.generate(prompts, sp)]
    assert got == ref
    assert client.num_engines == 1
    live = [e for e in client.engines if e is not None]
    assert len(live) == 1
    client.shutdown()


def test_dp_steps_concurrently(tiny_llama_dir):
    """dp=2 engines step in parallel: wall time for a batch spread
    over both engines must be well under the sum of two serial dp=1
    runs (the round-3 client stepped engines sequentially)."""
    import time

    sp = SamplingParams(temperature=0.0, max_tokens=24,
                        ignore_eos=True)
    prompts = [f"prompt number {i} words" for i in range(8)]
    kw = dict(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)

    dp1 = LLM(**kw, engine_multiprocess=True)
    dp1.generate(prompts[:2], sp)  # warm compiles
    t0 = time.monotonic()
    dp1.generate(prompts, sp)
    t_dp1 = time.monotonic() - t0
    dp1.engine.engine_core.shutdown()

    dp2 = LLM(**kw, data_parallel_size=2)
    dp2.generate(prompts[:4], sp)  # warm both engines
    # wall-clock ratio: retry a couple of times so transient machine
    # load (parallel CI shards) can't flake the comparison
    for attempt in range(3):
        t0 = time.monotonic()
        out = dp2.generate(prompts, sp)
        t_dp2 = time.monotonic() - t0
        if t_dp2 < 0.8 * t_dp1:
            break
        time.sleep(1.0)
    dp2.engine.engine_core.shutdown()

    assert len(out) == len(prompts)
    # with 8 prompts and max_num_seqs=4, dp=1 runs two serial batches
    # while dp=2 runs one per engine concurrently; require a solid
    # win (sequential stepping gave none)
    assert t_dp2 < 0.8 * t_dp1, (t_dp1, t_dp2)
