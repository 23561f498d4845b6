"""Benchmark harness smoke tests (reference: vllm bench latency /
throughput, vllm/benchmarks/)."""

import pytest

from vllm_main_modify_tpu.benchmarks.metrics import (RequestRecord,
                                                     compute_metrics)
from vllm_main_modify_tpu.benchmarks.offline import (benchmark_latency,
                                                     benchmark_throughput)
from vllm_main_modify_tpu.entrypoints.llm import LLM


@pytest.fixture(scope="module")
def llm(tiny_llama_dir):
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
               num_kv_blocks=256)


def test_benchmark_latency(llm):
    r = benchmark_latency(llm, batch_size=2, input_len=8, output_len=4,
                          num_iters=2, num_warmup=1)
    assert r["avg_latency_s"] > 0
    assert len(r["latencies_s"]) == 2
    assert r["tokens_per_s"] > 0


def test_benchmark_throughput(llm):
    r = benchmark_throughput(llm, num_prompts=6, input_len=8,
                             output_len=4)
    assert r["requests_per_s"] > 0
    assert r["output_tokens_per_s"] > 0


def test_metrics_percentiles():
    recs = []
    for i in range(10):
        r = RequestRecord(prompt_tokens=5, output_tokens=4,
                          start=0.0, first_token=0.1 + i * 0.01,
                          end=1.0 + i * 0.1, itls=[0.05, 0.06, 0.07])
        recs.append(r)
    m = compute_metrics(recs, duration=2.0)
    assert m["completed"] == 10
    assert m["request_throughput"] == 5.0
    assert 0.1 <= m["ttft"]["mean"] <= 0.2
    assert m["ttft"]["p99"] >= m["ttft"]["median"]
    assert m["itl"]["mean"] == pytest.approx(0.06)


def test_dataset_samplers(tmp_path):
    """Reference: vllm/benchmarks/datasets.py sampler semantics."""
    import json

    import numpy as np

    from vllm_main_modify_tpu.benchmarks.datasets import (
        RandomDataset, RandomMultiModalDataset, ShareGPTDataset,
        SonnetDataset, build_dataset, is_valid_sequence)

    rd = RandomDataset(seed=0, input_len=64, output_len=16,
                       range_ratio=0.25, vocab_size=1000)
    reqs = rd.sample(8)
    assert len(reqs) == 8
    for r in reqs:
        assert 48 <= r.prompt_len <= 80
        assert 12 <= r.expected_output_len <= 20
        assert max(r.prompt) < 1000

    # sharegpt: filter + oversample-by-cycling
    sg = tmp_path / "sharegpt.json"
    convs = [{"conversations": [
        {"from": "human", "value": "hello " * n},
        {"from": "gpt", "value": "world " * n},
    ]} for n in (1, 8, 2000)]  # first too short, last too long
    sg.write_text(json.dumps(convs))
    ds = ShareGPTDataset(str(sg), tokenize=lambda t: t.split())
    reqs = ds.sample(4)
    assert len(reqs) == 4
    assert all(r.prompt_len == 8 for r in reqs)
    assert not is_valid_sequence(1, 1)

    sn = tmp_path / "sonnet.txt"
    sn.write_text("\n".join(f"line {i} of the poem" for i in range(40)))
    so = SonnetDataset(str(sn), tokenize=lambda t: t.split(),
                       input_len=20, output_len=7)
    r = so.sample(2)[0]
    assert r.prompt_len >= 20 and r.expected_output_len == 7

    mm = build_dataset("random-mm", seed=1, input_len=16,
                       output_len=4, vocab_size=100, image_size=16)
    r = mm.sample(2)[0]
    assert r.multi_modal_data["image"].shape == (3, 16, 16)
