"""Multi-step decode chunks (SchedulerOutput.num_decode_steps > 1)
must be token-identical to single-step execution, in both sync and
async modes. TPU-native analogue of the reference's multi-step
execution (vllm/v1/worker/tpu_model_runner.py:981) — here K decode
iterations run inside one jitted lax.scan with on-device chaining.
"""

import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

PROMPTS = [
    "hello world this is",
    "a test of the",
    "the tokenizer hello hello world",
    "world test a of",
]


@pytest.fixture(scope="module")
def llms(tiny_llama_dir):
    kw = dict(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    return {
        "single": LLM(num_decode_steps_per_dispatch=1, **kw),
        "multi": LLM(num_decode_steps_per_dispatch=4, **kw),
        "multi_async": LLM(num_decode_steps_per_dispatch=4,
                           async_scheduling=True, **kw),
    }


def test_greedy_parity_multi_vs_single(llms):
    p = SamplingParams(temperature=0.0, max_tokens=13, ignore_eos=True)
    ref = llms["single"].generate(PROMPTS, p)
    for name in ("multi", "multi_async"):
        out = llms[name].generate(PROMPTS, p)
        for r, o in zip(ref, out):
            assert r.outputs[0].token_ids == o.outputs[0].token_ids, \
                name


def test_max_tokens_not_multiple_of_chunk(llms):
    # 5 tokens with K=4: the second chunk overruns and the scheduler
    # must discard the surplus tokens at the stop check
    p = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    ref = llms["single"].generate(PROMPTS, p)
    for name in ("multi", "multi_async"):
        out = llms[name].generate(PROMPTS, p)
        for r, o in zip(ref, out):
            assert len(o.outputs[0].token_ids) == 5
            assert r.outputs[0].token_ids == o.outputs[0].token_ids
            assert o.outputs[0].finish_reason == "length"


def test_mixed_lengths(llms):
    params = [
        SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)
        for n in (2, 9, 17, 4)
    ]
    for name in ("multi", "multi_async"):
        outs = llms[name].generate(PROMPTS, params)
        for out, p in zip(outs, params):
            assert len(out.outputs[0].token_ids) == p.max_tokens


def test_seeded_sampling_parity(llms):
    p = SamplingParams(temperature=0.8, top_k=20, seed=7,
                       max_tokens=12, ignore_eos=True)
    ref = llms["single"].generate(PROMPTS, p)
    for name in ("multi", "multi_async"):
        out = llms[name].generate(PROMPTS, p)
        for r, o in zip(ref, out):
            assert r.outputs[0].token_ids == o.outputs[0].token_ids, \
                name


def test_logprobs_requests_fall_back(llms):
    # logprobs force the single-step path; results must still be right
    p = SamplingParams(temperature=0.0, max_tokens=6, logprobs=3,
                       ignore_eos=True)
    ref = llms["single"].generate(PROMPTS[:2], p)
    out = llms["multi"].generate(PROMPTS[:2], p)
    for r, o in zip(ref, out):
        assert r.outputs[0].token_ids == o.outputs[0].token_ids
        assert o.outputs[0].logprobs is not None


def test_scheduler_emits_chunks(llms):
    """The multi engine must actually take the chunked path."""
    core = llms["multi"].engine.engine_core
    runner = core.model_runner
    assert runner.decode_chunk_steps == 4
    p = SamplingParams(temperature=0.0, max_tokens=9, ignore_eos=True)
    llms["multi"].generate(PROMPTS, p)
    assert any(k[0] == "decode_chunk" for k in runner._compiled_keys
               if isinstance(k, tuple)), \
        "decode-chunk path never executed"
