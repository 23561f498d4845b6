"""fp8 KV cache (reference: cache_config.cache_dtype +
Fp8KVCacheMethod): engine generates coherently with an e4m3 cache;
page accounting halves; junk dtypes rejected."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams


def test_fp8_kv_generates_close_to_bf16(tiny_llama_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=16,
                        ignore_eos=True)
    base = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
               num_kv_blocks=256)
    ref = base.generate(["hello world this is"], sp)[0]
    del base
    fp8 = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256, kv_cache_dtype="fp8")
    got = fp8.generate(["hello world this is"], sp)[0]
    runner = fp8.engine.engine_core.model_runner
    import jax.numpy as jnp

    assert runner.kv_caches.dtype == jnp.float8_e4m3fn
    # quantization perturbs logits; with a random tiny model greedy
    # paths usually stay together for the first tokens
    a, b = got.outputs[0].token_ids, ref.outputs[0].token_ids
    assert a[:4] == b[:4], (a, b)
    assert len(a) == 16


def test_fp8_page_bytes_halved(tiny_llama_dir):
    kw = dict(model=tiny_llama_dir, dtype="bfloat16", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=32, block_size=4,
              num_kv_blocks=32)
    bf = LLM(**kw)
    pb_bf16 = bf.engine.engine_core.model_runner.page_bytes()
    del bf
    f8 = LLM(**kw, kv_cache_dtype="fp8_e5m2")
    pb_fp8 = f8.engine.engine_core.model_runner.page_bytes()
    assert pb_fp8 * 2 == pb_bf16


def test_unknown_cache_dtype_rejected(tiny_llama_dir):
    with pytest.raises(ValueError, match="kv cache dtype"):
        LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
            max_num_seqs=4, max_num_batched_tokens=32, block_size=4,
            num_kv_blocks=32, kv_cache_dtype="int3")
