"""HTTP serving benchmark (reference: vllm/benchmarks/serve.py —
``vllm bench serve``): drives an OpenAI-compatible endpoint with a
Poisson/all-at-once request stream and reports TTFT/TPOT/ITL/E2EL
percentiles + throughput.
"""

from __future__ import annotations

import asyncio
import json
import time
from typing import Optional

import aiohttp
import numpy as np

from vllm_main_modify_tpu.benchmarks.metrics import (RequestRecord,
                                                     compute_metrics)


async def _one_request(session: aiohttp.ClientSession, url: str,
                       prompt: str, output_len: int,
                       record: RequestRecord) -> None:
    payload = {
        "prompt": prompt,
        "max_tokens": output_len,
        "temperature": 0,
        "ignore_eos": True,
        "stream": True,
    }
    record.start = time.perf_counter()
    last = record.start
    async with session.post(url, json=payload) as resp:
        async for line in resp.content:
            line = line.decode().strip()
            if not line.startswith("data: "):
                continue
            body = line[len("data: "):]
            if body == "[DONE]":
                break
            now = time.perf_counter()
            if record.first_token is None:
                record.first_token = now
            else:
                record.itls.append(now - last)
            last = now
            chunk = json.loads(body)
            record.output_tokens += 1
            if chunk["choices"][0].get("finish_reason"):
                break
    record.end = time.perf_counter()


async def run_serve_benchmark(base_url: str, prompts: list[str],
                              output_len: int,
                              request_rate: Optional[float] = None,
                              percentiles=(50, 90, 99)) -> dict:
    """request_rate: requests/s Poisson arrivals; None = all at once
    (reference: vllm/benchmarks/serve.py request_rate semantics)."""
    url = base_url.rstrip("/") + "/v1/completions"
    records = [RequestRecord(prompt_tokens=len(p.split()))
               for p in prompts]
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()

    async with aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=None)) as session:
        tasks = []
        for prompt, record in zip(prompts, records):
            if request_rate is not None:
                await asyncio.sleep(rng.exponential(1 / request_rate))
            tasks.append(
                asyncio.create_task(
                    _one_request(session, url, prompt, output_len,
                                 record)))
        await asyncio.gather(*tasks)
    duration = time.perf_counter() - t0
    return compute_metrics(records, duration, percentiles)
