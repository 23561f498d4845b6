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
