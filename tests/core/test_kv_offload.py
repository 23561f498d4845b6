"""Host-RAM KV offload tier (reference: vllm/v1/kv_offload/)."""

import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.kv_offload.manager import (KVOffloadIndex,
                                                     KVOffloadStore)
from vllm_main_modify_tpu.sampling_params import SamplingParams
import numpy as np


def test_index_store_lru_consistency():
    """Same op stream + same capacity → same membership."""
    idx = KVOffloadIndex(3)
    store = KVOffloadStore(3)
    ops = [b"a", b"b", b"c", b"d", b"a", b"e"]
    for i, h in enumerate(ops):
        idx.add(h)
        store.put(h, np.full(2, i))
    for h in [b"a", b"b", b"c", b"d", b"e"]:
        assert idx.has(h) == (store.get(h) is not None), h
    assert len(idx) == len(store) == 3


def test_offload_extends_prefix_cache(tiny_llama_dir):
    """A prefix evicted from the tiny device cache must be restored
    from host and produce identical output."""
    # tiny device cache (32 blocks) forces eviction between requests
    # max_model_len must fit the device pool (startup liveness check:
    # engine/core.py); 26 pages - null = 100 tokens
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=100,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=26)
    core = llm.engine.engine_core
    # enable offload manually (tiny config)
    from vllm_main_modify_tpu.kv_offload.manager import KVOffloadIndex

    core.scheduler.offload_index = KVOffloadIndex(64)
    core.model_runner.init_kv_offload(64)

    p = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    long_a = "hello world this is a test of the tokenizer " * 2
    long_b = "a test of the a test of the a test of the"
    first = llm.generate([long_a], p)[0]
    # churn the device cache so long_a's blocks evict to host
    for i in range(4):
        llm.generate([long_b + f" hello {i}"], p)
        llm.generate([f"the tokenizer {i} " * 6], p)
    idx = core.scheduler.offload_index
    assert idx.num_saves > 0, "no blocks were offloaded"

    again = llm.generate([long_a], p)[0]
    assert again.outputs[0].token_ids == first.outputs[0].token_ids
    assert idx.num_hits > 0, "offload never produced a hit"
    # offload-restored tokens count as cached
    assert again.num_cached_tokens > 0
