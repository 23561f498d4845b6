"""Cascade attention through the engine (reference:
gpu_model_runner.py:1293): requests sharing a prefix-cached prompt
prefix serve via the two-pass shared-prefix read and produce EXACTLY
the tokens of the non-cascade engine."""

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

COMMON = list(range(3, 43))  # 40 shared tokens = 10 pages @ block 4


def _gen(llm, prompts):
    sp = SamplingParams(temperature=0.0, max_tokens=8,
                        ignore_eos=True)
    return [list(o.outputs[0].token_ids)
            for o in llm.generate(prompts, sp)]


def test_cascade_engine_matches(tiny_llama_dir):
    prompts = [{"prompt_token_ids": COMMON + [50 + i, 60 + i]}
               for i in range(4)]
    kw = dict(model=tiny_llama_dir, dtype="float32",
              max_model_len=128, max_num_seqs=8,
              max_num_batched_tokens=256, block_size=4,
              num_kv_blocks=256)
    base = LLM(**kw)
    base.engine.engine_core.scheduler.enable_cascade = False
    ref = _gen(base, prompts)

    llm = LLM(**kw)
    core = llm.engine.engine_core
    assert core.scheduler.enable_cascade  # XLA single-group decoder
    # warm the prefix cache so the prompts share their first pages
    _gen(llm, prompts)
    got = _gen(llm, prompts)
    runner = core.model_runner
    assert runner.cascade_steps > 0, "cascade path never engaged"
    assert got == ref
