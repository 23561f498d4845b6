"""Headline benchmark: replicates the reference's TPU CI perf test —
Qwen2.5-1.5B bf16, 64 prompts x (500-token prefill + 50-token greedy
decode), max_num_seqs 32, max_model_len 1024 (reference:
tests/v1/tpu/test_perf.py:56-73; baseline 1.7 s +- 0.20 on v6e).

Weights are dummy-initialized (no network egress in this environment) —
identical compute/memory traffic to real weights.

The WORKLOAD (64 prompts x 500+50, max_model_len 1024, greedy)
matches the reference test exactly; the ENGINE knobs differ where our
engine profits from them: max_num_batched_tokens 8192 (vs the
reference's 1024 — fewer prefill dispatches, same compute), 16 decode
steps fused per device dispatch (the reference dispatches per step),
and max_num_seqs 64 (vs the reference's 32 — the whole workload
decodes in one continuous-batching wave, so the per-step weight
stream serves 2x the tokens). Tuned on v5e via BENCH_MBT /
BENCH_DECODE_STEPS / BENCH_SEQS sweeps.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": x}
vs_baseline = baseline_seconds / measured_seconds  (>1.0 = faster than
the reference on its own hardware).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# honor a cpu request even though the axon TPU plugin overrides
# JAX_PLATFORMS at import time (same workaround as tests/conftest.py)
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax

    jax.config.update("jax_platforms", "cpu")
# NOTE: do NOT enable jax_compilation_cache_dir here — on the axon
# remote-compile platform it slows every compile ~150x (measured
# 0.8s -> 133.8s for one matmul) and writes no cache files.

# Same-class-chip baseline: the bench chip is v5e-class (16 GB HBM),
# so compare against the reference's historical v5e number 1.4 s ±
# 0.30 (tests/v1/tpu/test_perf.py:62-64), not the v6e 1.7 s.
BASELINE_S = 1.4

NUM_PROMPTS = 64
PREFIX_LEN = 500
DECODE_LEN = 50
# 64: decode the whole 64-prompt workload in ONE continuous-batching
# wave — same weight stream serves 2x the tokens per decode step
# (v5e r5: 1.30s at 32 seqs -> 1.06s at 64)
MAX_NUM_SEQS = int(os.environ.get("BENCH_SEQS", "64"))
MAX_MODEL_LEN = 1024
MAX_BATCHED_TOKENS = int(os.environ.get("BENCH_MBT", "8192"))

SMOKE = os.environ.get("BENCH_SMOKE", "0") == "1"


def qwen25_15b_config():
    """Qwen2.5-1.5B-Instruct dims (HF Qwen/Qwen2.5-1.5B-Instruct)."""
    from vllm_main_modify_tpu.config import ModelConfig

    cfg = ModelConfig(model="", dtype="bfloat16",
                      max_model_len=MAX_MODEL_LEN)
    cfg.architecture = "LlamaForCausalLM"
    cfg.vocab_size = 151936
    cfg.hidden_size = 1536
    cfg.num_layers = 28
    cfg.num_attention_heads = 12
    cfg.num_kv_heads = 2
    cfg.head_dim = 128
    cfg.intermediate_size = 8960
    cfg.attention_bias = True  # Qwen2 q/k/v biases
    cfg.rope_theta = 1000000.0
    cfg.tie_word_embeddings = True
    return cfg


def smoke_config():
    from vllm_main_modify_tpu.config import ModelConfig

    cfg = ModelConfig(model="", dtype="float32",
                      max_model_len=MAX_MODEL_LEN)
    cfg.architecture = "LlamaForCausalLM"
    cfg.vocab_size = 2048
    cfg.hidden_size = 128
    cfg.num_layers = 2
    cfg.num_attention_heads = 4
    cfg.num_kv_heads = 2
    cfg.head_dim = 32
    cfg.intermediate_size = 256
    return cfg


def run_batch(core, rng, num_prompts: int) -> None:
    from vllm_main_modify_tpu.engine.types import EngineCoreRequest
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    vocab = core.config.model_config.vocab_size
    for i in range(num_prompts):
        prompt = rng.integers(1, vocab - 1, size=PREFIX_LEN).tolist()
        core.add_request(
            EngineCoreRequest(
                request_id=f"bench-{time.monotonic_ns()}-{i}",
                prompt_token_ids=prompt,
                sampling_params=SamplingParams(temperature=0.0,
                                               max_tokens=DECODE_LEN,
                                               ignore_eos=True),
            ))
    while core.has_unfinished_requests():
        core.step()


def llama3_8b_config(dtype="bfloat16", quantization=None):
    """Llama-3-8B dims (HF meta-llama/Meta-Llama-3-8B)."""
    from vllm_main_modify_tpu.config import ModelConfig

    cfg = ModelConfig(model="", dtype=dtype,
                      max_model_len=MAX_MODEL_LEN,
                      quantization=quantization)
    cfg.architecture = "LlamaForCausalLM"
    cfg.vocab_size = 128256
    cfg.hidden_size = 4096
    cfg.num_layers = 32
    cfg.num_attention_heads = 32
    cfg.num_kv_heads = 8
    cfg.head_dim = 128
    cfg.intermediate_size = 14336
    cfg.rope_theta = 500000.0
    return cfg


# quantized 8B serving workload (north star: BASELINE.md — Llama-3-8B
# GPTQ-INT4 and FP8 W8A8 + FP8-KV tokens/s/chip; methodology per
# vllm/benchmarks/serve.py:84-95 TTFT/ITL percentiles)
Q_PROMPTS = int(os.environ.get("BENCH_Q_PROMPTS", "32"))
Q_PREFIX = 512
Q_DECODE = 128


def run_serving(core, rng, num_prompts: int, prefix: int,
                decode: int) -> dict:
    """Drive one batch, recording per-request token arrival times.
    Returns tokens/s (output tokens over wall), TTFT p50 (request
    submit → first token), mean ITL."""
    from vllm_main_modify_tpu.engine.types import EngineCoreRequest
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    vocab = core.config.model_config.vocab_size
    t_start = time.monotonic()
    arrivals: dict[str, list[float]] = {}
    for i in range(num_prompts):
        rid = f"q-{time.monotonic_ns()}-{i}"
        arrivals[rid] = []
        core.add_request(EngineCoreRequest(
            request_id=rid,
            prompt_token_ids=rng.integers(
                1, vocab - 1, size=prefix).tolist(),
            sampling_params=SamplingParams(temperature=0.0,
                                           max_tokens=decode,
                                           ignore_eos=True)))
    while core.has_unfinished_requests():
        out = core.step()
        now = time.monotonic()
        for o in out.outputs:
            if o.new_token_ids:
                arrivals[o.request_id].extend(
                    [now] * len(o.new_token_ids))
    t_end = time.monotonic()
    total_tokens = sum(len(a) for a in arrivals.values())
    ttfts = sorted(a[0] - t_start for a in arrivals.values() if a)
    itls = [(a[-1] - a[0]) / (len(a) - 1)
            for a in arrivals.values() if len(a) > 1]
    return {
        "tokens_per_s": total_tokens / (t_end - t_start),
        "ttft_p50_ms": ttfts[len(ttfts) // 2] * 1e3,
        "itl_mean_ms": (sum(itls) / len(itls)) * 1e3,
        "wall_s": t_end - t_start,
    }


def run_serving_poisson(core, rng, num_prompts: int, prefix: int,
                        decode: int, rate: float) -> dict:
    """Poisson arrivals at ``rate`` req/s through the engine loop
    (reference methodology: vllm/benchmarks/serve.py:84-95
    request_rate + TTFT/TPOT/ITL percentiles). The burst variant
    (run_serving) measures capacity; this measures latency under a
    realistic arrival process."""
    from vllm_main_modify_tpu.engine.types import EngineCoreRequest
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    vocab = core.config.model_config.vocab_size
    t0 = time.monotonic()
    arrive_at = np.cumsum(rng.exponential(1.0 / rate, num_prompts))
    prompts = [rng.integers(1, vocab - 1, size=prefix).tolist()
               for _ in range(num_prompts)]
    submitted = 0
    submit_t: dict[str, float] = {}
    arrivals: dict[str, list[float]] = {}
    while submitted < num_prompts or core.has_unfinished_requests():
        now = time.monotonic() - t0
        while submitted < num_prompts and \
                arrive_at[submitted] <= now:
            rid = f"p-{submitted}"
            submit_t[rid] = time.monotonic()
            arrivals[rid] = []
            core.add_request(EngineCoreRequest(
                request_id=rid,
                prompt_token_ids=prompts[submitted],
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=decode,
                    ignore_eos=True)))
            submitted += 1
        if not core.has_unfinished_requests():
            nxt = arrive_at[submitted] - (time.monotonic() - t0)
            if nxt > 0:
                time.sleep(min(nxt, 0.02))
            continue
        out = core.step()
        tnow = time.monotonic()
        for o in out.outputs:
            if o.new_token_ids:
                arrivals[o.request_id].extend(
                    [tnow] * len(o.new_token_ids))
    wall = time.monotonic() - t0
    ttfts = np.asarray(sorted(
        a[0] - submit_t[r] for r, a in arrivals.items() if a))
    itls = np.asarray([(a[-1] - a[0]) / (len(a) - 1)
                       for a in arrivals.values() if len(a) > 1])
    total = sum(len(a) for a in arrivals.values())

    def pct(x, p):
        return float(np.percentile(x, p)) if len(x) else 0.0

    return {
        "rate_rps": rate,
        "tokens_per_s": total / wall,
        "ttft_p50_ms": pct(ttfts, 50) * 1e3,
        "ttft_p90_ms": pct(ttfts, 90) * 1e3,
        "ttft_p99_ms": pct(ttfts, 99) * 1e3,
        "itl_p50_ms": pct(itls, 50) * 1e3,
        "itl_p90_ms": pct(itls, 90) * 1e3,
        "itl_p99_ms": pct(itls, 99) * 1e3,
    }


def bench_quant(tag: str, quantization: str, cache_dtype: str,
                results: dict, steps: int | None = None) -> None:
    """One quantized 8B serving config: dummy weights (identical
    compute/memory traffic), one warmup batch, one measured batch."""
    import numpy as np

    from vllm_main_modify_tpu.config import (CacheConfig, EngineConfig,
                                             LoadConfig,
                                             SchedulerConfig)
    from vllm_main_modify_tpu.engine.core import EngineCore

    prompts = Q_PROMPTS
    core = None
    while True:  # OOM-adaptive: fp8-8B weights ~14.7 GB on 16 GB HBM
        config = EngineConfig(
            model_config=llama3_8b_config(quantization=quantization),
            # quantized KV keeps 32-token pages: its decode write is
            # a page-RMW whose traffic scales with the page size
            # (999 -> 897 tok/s at 128 pages on fp8_w8a8+int8kv)
            cache_config=CacheConfig(block_size=int(
                os.environ.get("BENCH_BLOCK",
                               "32" if cache_dtype != "auto"
                               else "128")),
                                     cache_dtype=cache_dtype,
                                     enable_prefix_caching=False),
            scheduler_config=SchedulerConfig(
                max_num_batched_tokens=MAX_BATCHED_TOKENS,
                max_num_seqs=prompts,
                max_model_len=MAX_MODEL_LEN,
                async_scheduling=True,
                num_decode_steps_per_dispatch=steps or int(
                    os.environ.get("BENCH_DECODE_STEPS", "16"))),
            load_config=LoadConfig(load_format="dummy"),
        )
        try:
            core = EngineCore(config)
            rng = np.random.default_rng(1)
            t0 = time.monotonic()
            # TWO warmup rounds (same as main()): the drain tail of
            # round 1 compiles shrinking-batch buckets; round 2 hits
            # the remaining mixed prefill+decode variants. Without
            # this, compiles leak into the measured run (round-3 TTFT
            # p50 "17.5 s" was mostly XLA compile time).
            run_serving(core, rng, prompts, Q_PREFIX, Q_DECODE)
            run_serving(core, rng, prompts, Q_PREFIX, Q_DECODE)
            break
        except Exception as e:  # noqa: BLE001
            if core is not None:
                core.shutdown()
                core = None
            if "RESOURCE_EXHAUSTED" in repr(e) and prompts > 4:
                prompts //= 2
                print(f"# {tag}: OOM, retrying with {prompts} "
                      "prompts", file=sys.stderr)
                continue
            raise
    print(f"# {tag} warmup (incl. compiles): "
          f"{time.monotonic() - t0:.1f}s", file=sys.stderr)
    m = run_serving(core, rng, prompts, Q_PREFIX, Q_DECODE)
    print(f"# {tag} ({prompts} prompts): {m}", file=sys.stderr)
    results[f"{tag}_tokens_per_s_chip"] = round(m["tokens_per_s"], 1)
    results[f"{tag}_ttft_p50_ms"] = round(m["ttft_p50_ms"], 1)
    results[f"{tag}_itl_mean_ms"] = round(m["itl_mean_ms"], 2)
    results[f"{tag}_num_prompts"] = prompts
    # Poisson-arrival latency at two request rates (reference
    # methodology: vllm/benchmarks/serve.py request_rate) — the burst
    # above is a queueing-artifact TTFT; these are the honest numbers
    for rate in (float(os.environ.get("BENCH_RATE1", "4")),
                 float(os.environ.get("BENCH_RATE2", "8"))):
        p = run_serving_poisson(core, rng, prompts, Q_PREFIX,
                                Q_DECODE, rate)
        print(f"# {tag} poisson@{rate}: {p}", file=sys.stderr)
        key = f"{tag}_poisson{rate:g}"
        for k in ("ttft_p50_ms", "ttft_p90_ms", "ttft_p99_ms",
                  "itl_p50_ms", "itl_p90_ms", "itl_p99_ms",
                  "tokens_per_s"):
            results[f"{key}_{k}"] = round(p[k], 2)
    core.shutdown()
    del core


def main() -> None:
    import numpy as np

    from vllm_main_modify_tpu.config import (CacheConfig, EngineConfig,
                                             LoadConfig,
                                             SchedulerConfig)
    from vllm_main_modify_tpu.engine.core import EngineCore

    num_prompts = 4 if SMOKE else NUM_PROMPTS
    config = EngineConfig(
        model_config=smoke_config() if SMOKE else qwen25_15b_config(),
        cache_config=CacheConfig(
            # 128-token pages: the attention kernels issue one DMA
            # per page per stream block, so page 32 costs 4x the
            # scalar DMA issue rate (measured 1.8 -> 1.1 ms/layer on
            # prefill attention, headline 1.34 -> 1.30 s)
            block_size=int(os.environ.get("BENCH_BLOCK", "128")),
            num_gpu_blocks=(1024 if SMOKE else int(
                os.environ.get("BENCH_BLOCKS", "0")) or None),
            enable_prefix_caching=False),
        scheduler_config=SchedulerConfig(
            max_num_batched_tokens=MAX_BATCHED_TOKENS,
            max_num_seqs=MAX_NUM_SEQS,
            max_model_len=MAX_MODEL_LEN,
            async_scheduling=os.environ.get("BENCH_ASYNC",
                                            "1") == "1",
            num_decode_steps_per_dispatch=int(
                os.environ.get("BENCH_DECODE_STEPS", "16"))),
        load_config=LoadConfig(load_format="dummy"),
    )
    core = EngineCore(config)
    rng = np.random.default_rng(0)

    # warmup: two full batches — the second catches shape variants
    # that only appear after the pipeline is primed (prev-token
    # chaining combos)
    t0 = time.monotonic()
    run_batch(core, rng, num_prompts)
    if not SMOKE:
        run_batch(core, rng, num_prompts)
    warmup_s = time.monotonic() - t0
    print(f"# warmup (incl. compiles): {warmup_s:.1f}s",
          file=sys.stderr)

    iters = 1 if SMOKE else 3
    times = []
    for _ in range(iters):
        t0 = time.monotonic()
        run_batch(core, rng, num_prompts)
        times.append(time.monotonic() - t0)
    value = sum(times) / len(times)
    print(f"# runs: {[f'{t:.2f}' for t in times]}", file=sys.stderr)
    core.shutdown()
    del core

    results = {
        "metric":
        "e2e_latency_qwen2.5-1.5b_64x(500prefill+50decode)",
        "value": round(value, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / value, 3),
    }
    # Emit the headline JSON IMMEDIATELY so the driver always parses a
    # result even if it kills us mid-quant-config (round 3 lost its
    # number to exactly that). Each quant config re-prints the full
    # enriched dict; the last complete JSON line wins.
    print(json.dumps(results), flush=True)

    # north-star quantized 8B serving (BASELINE.md): skip any config
    # that would blow the wall-clock budget so the driver always gets
    # the JSON line. Roofline context: docs/perf_v5e.md.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2200"))
    t_start = time.monotonic()
    if not SMOKE and os.environ.get("BENCH_QUANT", "1") == "1":
        # steps=4: per-4-token streaming emission (a real streaming
        # client sees <=4-token bursts; costs ~4% tokens/s vs the
        # 16-step dispatch fusion)
        for tag, quant, kv, steps in (
                ("int4_w4a8", "gptq_w4a8", "auto", None),
                ("fp8_w8a8_int8kv", "fp8_w8a8", "int8", None),
                ("int4_w4a8_steps4", "gptq_w4a8", "auto", 4),
                ("int4_w4a8_int8kv", "gptq_w4a8", "int8", None),
                ("fp8_w8a8_fp8kv", "fp8_w8a8", "fp8", None)):
            if time.monotonic() - t_start > budget_s:
                print(f"# skipping {tag}: over budget",
                      file=sys.stderr)
                continue
            try:
                bench_quant(tag, quant, kv, results, steps=steps)
            except Exception as e:  # noqa: BLE001
                print(f"# {tag} failed: {e!r}", file=sys.stderr)
            print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
