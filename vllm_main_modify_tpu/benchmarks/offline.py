"""Offline latency / throughput benchmarks.

Reference: vllm/benchmarks/latency.py (batch-of-N greedy decode,
warmup + repeated timed iterations) and throughput.py (sampled
workloads through the sync engine).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


def random_prompts(vocab_size: int, num: int, input_len: int,
                   seed: int = 0) -> list[list[int]]:
    rng = np.random.default_rng(seed)
    return [
        rng.integers(1, max(vocab_size - 1, 2),
                     size=input_len).tolist() for _ in range(num)
    ]


def benchmark_latency(llm, batch_size: int, input_len: int,
                      output_len: int, num_iters: int = 3,
                      num_warmup: int = 1) -> dict:
    """Latency of one batch of ``batch_size`` greedy requests
    (reference: vllm/benchmarks/latency.py)."""
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    vocab = llm.engine.config.model_config.vocab_size
    params = SamplingParams(temperature=0.0, max_tokens=output_len,
                            ignore_eos=True)

    def run_once(seed):
        prompts = random_prompts(vocab, batch_size, input_len, seed)
        t0 = time.perf_counter()
        llm.generate(prompts, params)
        return time.perf_counter() - t0

    for i in range(num_warmup):
        run_once(i)
    lat = [run_once(100 + i) for i in range(num_iters)]
    arr = np.asarray(lat)
    return {
        "avg_latency_s": float(arr.mean()),
        "latencies_s": [round(v, 4) for v in lat],
        "p50_s": float(np.percentile(arr, 50)),
        "p99_s": float(np.percentile(arr, 99)),
        "tokens_per_s": batch_size * output_len / float(arr.mean()),
    }


def benchmark_throughput(llm, num_prompts: int, input_len: int,
                         output_len: int,
                         dataset: str = "random",
                         dataset_path: str = None) -> dict:
    """Total-throughput run (reference:
    vllm/benchmarks/throughput.py + datasets.py samplers)."""
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    vocab = llm.engine.config.model_config.vocab_size
    if dataset == "random" and dataset_path is None:
        prompts = random_prompts(vocab, num_prompts, input_len,
                                 seed=0)
        per_out = [output_len] * num_prompts
    else:
        from vllm_main_modify_tpu.benchmarks.datasets import \
            build_dataset

        kw = {}
        if dataset in ("sharegpt", "sonnet"):
            tok = llm.engine.tokenizer
            kw = dict(path=dataset_path,
                      tokenize=lambda t: tok.encode(
                          t, add_special_tokens=False))
        elif dataset == "random":
            kw = dict(input_len=input_len, output_len=output_len,
                      vocab_size=vocab)
        reqs = build_dataset(dataset, **kw).sample(num_prompts)
        prompts = [
            r.prompt if isinstance(r.prompt, str) else
            {"prompt_token_ids": r.prompt} for r in reqs
        ]
        per_out = [r.expected_output_len for r in reqs]
    params = [SamplingParams(temperature=0.0, max_tokens=o,
                             ignore_eos=True) for o in per_out]
    # warmup (compiles)
    llm.generate(prompts[:4], params[:4])
    t0 = time.perf_counter()
    outs = llm.generate(prompts, params)
    dt = time.perf_counter() - t0
    total_out = sum(len(o.outputs[0].token_ids) for o in outs)
    total_in = sum(len(o.prompt_token_ids) for o in outs)
    return {
        "duration_s": round(dt, 3),
        "requests_per_s": num_prompts / dt,
        "output_tokens_per_s": total_out / dt,
        "total_tokens_per_s": (total_in + total_out) / dt,
    }
