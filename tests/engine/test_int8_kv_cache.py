"""int8 KV cache engine e2e (reference capability:
vllm/v1/attention/backends/pallas.py:29,335-343 int8 kv-cache mode,
here with dynamic per-token scales — ops/kv_cache.py QuantizedKV):
greedy output tracks the bf16-cache run, the cache carry is a
QuantizedKV pytree, and chunked prefill + multi-step decode both ride
the quantized write paths."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams


def test_int8_kv_generates_close_to_fp32(tiny_llama_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=16,
                        ignore_eos=True)
    kw = dict(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    base = LLM(**kw)
    ref = base.generate(["hello world this is"], sp)[0]
    del base
    q = LLM(**kw, kv_cache_dtype="int8")
    got = q.generate(["hello world this is"], sp)[0]
    runner = q.engine.engine_core.model_runner
    import jax.numpy as jnp

    from vllm_main_modify_tpu.ops.kv_cache import QuantizedKV

    assert isinstance(runner.kv_caches, QuantizedKV)
    assert runner.kv_caches.data.dtype == jnp.int8
    assert runner.kv_caches.scales.dtype == jnp.float32
    # per-token int8 is a finer quantization than fp8-e4m3 scale-1.0;
    # greedy paths should stay together at least as long
    a, b = got.outputs[0].token_ids, ref.outputs[0].token_ids
    assert a[:4] == b[:4], (a, b)
    assert len(a) == 16


def test_int8_kv_chunked_prefill_and_batch(tiny_llama_dir):
    """Chunked prefill (prompt > max_num_batched_tokens) and a
    multi-request batch, all through the paged quantized write."""
    sp = SamplingParams(temperature=0.0, max_tokens=8,
                        ignore_eos=True)
    kw = dict(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=32, block_size=4,
              num_kv_blocks=256, kv_cache_dtype="int8")
    q = LLM(**kw)
    prompts = [
        "the quick brown fox jumps over the lazy dog " * 2,
        "hello",
        "one two three four five six seven",
    ]
    outs = q.generate(prompts, sp)
    assert len(outs) == 3
    for o in outs:
        assert len(o.outputs[0].token_ids) == 8


def test_int8_kv_page_bytes_accounts_scales(tiny_llama_dir):
    kw = dict(model=tiny_llama_dir, dtype="bfloat16", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=32, block_size=4,
              num_kv_blocks=32)
    bf = LLM(**kw)
    runner = bf.engine.engine_core.model_runner
    pb_bf16 = runner.page_bytes()
    kv_heads, kv_dim, kv_layers = runner.model.kv_cache_spec()
    del bf
    q = LLM(**kw, kv_cache_dtype="int8")
    pb_int8 = q.engine.engine_core.model_runner.page_bytes()
    # int8 data is half of bf16, plus 2*page*4 scale bytes per layer
    assert pb_int8 == pb_bf16 // 2 + kv_layers * 2 * 4 * 4


def test_int8_kv_greedy_prefix_consistency(tiny_llama_dir):
    """Decoding the same prompt twice (second run hits the prefix
    cache over quantized pages) gives identical tokens."""
    sp = SamplingParams(temperature=0.0, max_tokens=12,
                       ignore_eos=True)
    q = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
            max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
            num_kv_blocks=256, kv_cache_dtype="int8",
            enable_prefix_caching=True)
    a = q.generate(["repeat after me: zig zag"], sp)[0]
    b = q.generate(["repeat after me: zig zag"], sp)[0]
    assert a.outputs[0].token_ids == b.outputs[0].token_ids
