"""Per-phase wall-clock decomposition of the async decode loop on the
8B int4 workload (mirrors bench.bench_quant).

Usage: python -m vllm_main_modify_tpu.benchmarks.profile_decode (run from the
repo root); env: PROF_MODEL=qwen | PROF_LAYERS=N | PROF_KV=int8 |
PROF_TRACE=1 (writes a jax.profiler trace to /tmp/jaxtrace).."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))  # repo root
import bench  # noqa: E402
from bench import (MAX_BATCHED_TOKENS, MAX_MODEL_LEN, Q_DECODE,  # noqa
                   Q_PREFIX, llama3_8b_config, run_serving)

from vllm_main_modify_tpu.config import (CacheConfig, EngineConfig,  # noqa
                                         LoadConfig, SchedulerConfig)
from vllm_main_modify_tpu.engine.core import EngineCore  # noqa

PROMPTS = 32
if os.environ.get("PROF_MODEL") == "qwen":
    _mc = bench.qwen25_15b_config()
else:
    _mc = llama3_8b_config(quantization="gptq_w4a8")
    _mc.num_layers = int(os.environ.get("PROF_LAYERS", "32"))
config = EngineConfig(
    model_config=_mc,
    cache_config=CacheConfig(
        block_size=int(os.environ.get("PROF_BLOCK", "32")),
        cache_dtype=os.environ.get("PROF_KV", "auto"),
        enable_prefix_caching=False),
    scheduler_config=SchedulerConfig(
        max_num_batched_tokens=MAX_BATCHED_TOKENS,
        max_num_seqs=PROMPTS, max_model_len=MAX_MODEL_LEN,
        async_scheduling=True,
        num_decode_steps_per_dispatch=int(
            os.environ.get("PROF_STEPS", "16"))),
    load_config=LoadConfig(load_format="dummy"),
)
core = EngineCore(config)
rng = np.random.default_rng(1)
t0 = time.monotonic()
run_serving(core, rng, PROMPTS, Q_PREFIX, Q_DECODE)
run_serving(core, rng, PROMPTS, Q_PREFIX, Q_DECODE)
print(f"warmup {time.monotonic()-t0:.1f}s", flush=True)

if os.environ.get("PROF_TRACE"):
    from vllm_main_modify_tpu.engine.types import EngineCoreRequest
    from vllm_main_modify_tpu.sampling_params import SamplingParams
    vocab = core.config.model_config.vocab_size
    for i in range(PROMPTS):
        core.add_request(EngineCoreRequest(
            request_id=f"t-{i}",
            prompt_token_ids=rng.integers(1, vocab - 1,
                                          size=Q_PREFIX).tolist(),
            sampling_params=SamplingParams(temperature=0.0,
                                           max_tokens=Q_DECODE,
                                           ignore_eos=True)))
    # drive past prefill so the traced region is pure decode chunks
    # (PROF_TRACE_PREFILL=1: trace the prefill chunks instead)
    n_skip = 0 if os.environ.get("PROF_TRACE_PREFILL") else 4
    for _ in range(n_skip):
        core.step()
    import jax
    with jax.profiler.trace("/tmp/jaxtrace"):
        for _ in range(3):
            core.step()
    while core.has_unfinished_requests():
        core.step()
    print("trace written", flush=True)
    core.shutdown()
    sys.exit(0)

# instrument: wrap schedule / dispatch / get / update
sched = core.scheduler
runner = core.model_runner
T = {"schedule": [], "prepare": [], "dispatch": [], "get": [],
     "update": [], "iter": []}

orig_schedule = sched.schedule
orig_update = sched.update_from_output
orig_exec_async = runner.execute_model_async
orig_prepare = runner._prepare_decode_chunk


def timed(name, fn):
    def w(*a, **k):
        t = time.monotonic()
        r = fn(*a, **k)
        T[name].append(time.monotonic() - t)
        return r
    return w


sched.schedule = timed("schedule", orig_schedule)
sched.update_from_output = timed("update", orig_update)
runner._prepare_decode_chunk = timed("prepare", orig_prepare)
runner.execute_model_async = timed("dispatch", orig_exec_async)


class TimedHandle:
    def __init__(self, h):
        self.h = h

    def get(self):
        t = time.monotonic()
        r = self.h.get()
        T["get"].append(time.monotonic() - t)
        return r


_orig = runner.execute_model_async


def exec_wrap(so):
    h = _orig(so)
    return TimedHandle(h) if hasattr(h, "get") else h


runner.execute_model_async = timed("dispatch", exec_wrap)

# measured run with per-iteration wall
from vllm_main_modify_tpu.engine.types import EngineCoreRequest  # noqa
from vllm_main_modify_tpu.sampling_params import SamplingParams  # noqa

vocab = core.config.model_config.vocab_size
for i in range(PROMPTS):
    core.add_request(EngineCoreRequest(
        request_id=f"x-{i}",
        prompt_token_ids=rng.integers(1, vocab - 1,
                                      size=Q_PREFIX).tolist(),
        sampling_params=SamplingParams(temperature=0.0,
                                       max_tokens=Q_DECODE,
                                       ignore_eos=True)))
t_run = time.monotonic()
while core.has_unfinished_requests():
    t = time.monotonic()
    core.step()
    T["iter"].append(time.monotonic() - t)
wall = time.monotonic() - t_run
print(f"wall {wall:.2f}s  iters {len(T['iter'])}")
for k, v in T.items():
    if not v:
        continue
    a = np.asarray(v) * 1e3
    print(f"{k:9s} n={len(a):4d} sum={a.sum()/1e3:7.2f}s "
          f"mean={a.mean():7.1f}ms p50={np.percentile(a,50):7.1f} "
          f"p90={np.percentile(a,90):7.1f} max={a.max():8.1f}")
core.shutdown()
