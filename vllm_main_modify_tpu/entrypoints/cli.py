"""CLI: serve / bench (reference: vllm/entrypoints/cli/main.py —
``vllm serve|bench|...``). Flags are generated from the config
dataclasses' fields (reference pattern: vllm/engine/arg_utils.py)."""

from __future__ import annotations

import argparse
import asyncio
import os
import sys


def _add_engine_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("model", nargs="?", default=None)
    p.add_argument("--model", dest="model_opt", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32", "float16"])
    p.add_argument("--max-model-len", type=int, default=2048)
    p.add_argument("--max-num-seqs", type=int, default=64)
    p.add_argument("--num-decode-steps", type=int, default=8,
                   help="decode iterations per device dispatch "
                   "(multi-step decode; 1 disables)")
    p.add_argument("--max-num-batched-tokens", type=int, default=1024)
    p.add_argument("--block-size", type=int, default=16)
    p.add_argument("--kv-cache-dtype", default="auto",
                   choices=["auto", "bfloat16", "float32", "fp8",
                            "fp8_e4m3", "fp8_e5m2"])
    p.add_argument("--tensor-parallel-size", "-tp", type=int, default=1)
    p.add_argument("--gpu-memory-utilization", type=float, default=0.9)
    p.add_argument("--no-enable-prefix-caching", action="store_true")
    p.add_argument("--num-kv-blocks", type=int, default=None)
    p.add_argument("--load-format", default="auto",
                   choices=["auto", "safetensors", "dummy"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--trust-remote-code", action="store_true")
    p.add_argument("--served-model-name", default=None)
    p.add_argument("--quantization", "-q", default=None)
    # JSON dict, e.g. '{"method": "eagle", "draft_model": "...",
    # "num_speculative_tokens": 4}' (reference: vllm serve
    # --speculative-config, vllm/engine/arg_utils.py)
    p.add_argument("--speculative-config", default=None)


def _build_config(args):
    import json as _json

    from vllm_main_modify_tpu.config import (CacheConfig, EngineConfig,
                                             LoadConfig, ModelConfig,
                                             ParallelConfig,
                                             SchedulerConfig,
                                             SpeculativeConfig)

    model = args.model_opt or args.model
    if not model:
        raise SystemExit("error: model path required")
    spec_kwargs = {}
    if args.speculative_config:
        spec_kwargs = _json.loads(args.speculative_config)
    return EngineConfig(
        model_config=ModelConfig(model=model, tokenizer=args.tokenizer,
                                 dtype=args.dtype,
                                 max_model_len=args.max_model_len,
                                 seed=args.seed,
                                 quantization=args.quantization,
                                 trust_remote_code=args.trust_remote_code),
        speculative_config=SpeculativeConfig(**spec_kwargs),
        cache_config=CacheConfig(
            block_size=args.block_size,
            num_gpu_blocks=args.num_kv_blocks,
            gpu_memory_utilization=args.gpu_memory_utilization,
            cache_dtype=args.kv_cache_dtype,
            enable_prefix_caching=not args.no_enable_prefix_caching),
        scheduler_config=SchedulerConfig(
            max_num_batched_tokens=args.max_num_batched_tokens,
            max_num_seqs=args.max_num_seqs,
            max_model_len=args.max_model_len,
            num_decode_steps_per_dispatch=args.num_decode_steps),
        parallel_config=ParallelConfig(
            tensor_parallel_size=args.tensor_parallel_size),
        load_config=LoadConfig(load_format=args.load_format),
    )


def _run_api_server_process(config, addr, args) -> None:
    """One frontend of a multi-API-server deployment: RouterClient
    to the shared engine core + SO_REUSEPORT HTTP listener."""
    from vllm_main_modify_tpu.engine.async_llm import AsyncLLM
    from vllm_main_modify_tpu.engine.core_client import RouterClient
    from vllm_main_modify_tpu.entrypoints.openai.api_server import \
        run_server

    client = RouterClient(addr)
    engine = AsyncLLM(config, engine_core=client)
    asyncio.run(
        run_server(engine, host=args.host, port=args.port,
                   served_model_name=args.served_model_name,
                   tool_call_parser=args.tool_call_parser,
                   reasoning_parser=args.reasoning_parser,
                   reuse_port=True))


def cmd_serve(args) -> None:
    from vllm_main_modify_tpu.engine.async_llm import AsyncLLM
    from vllm_main_modify_tpu.entrypoints.openai.api_server import \
        run_server

    config = _build_config(args)
    n_api = getattr(args, "api_server_count", 1) or 1
    if n_api > 1:
        # multi-API-server scale-out (reference: vllm serve
        # --api-server-count): ONE headless engine-core process, N
        # frontend processes sharing the port via SO_REUSEPORT
        import multiprocessing as mp

        from vllm_main_modify_tpu.engine.core_client import \
            run_engine_core_router

        addr = f"ipc:///tmp/vllm_tpu_core_{os.getpid()}.sock"
        ctx = mp.get_context("spawn")
        core_proc = ctx.Process(target=run_engine_core_router,
                                args=(config, addr), daemon=True)
        core_proc.start()
        servers = [ctx.Process(target=_run_api_server_process,
                               args=(config, addr, args), daemon=True)
                   for _ in range(n_api)]
        for p in servers:
            p.start()
        try:
            for p in servers:
                p.join()
        finally:
            core_proc.terminate()
        return
    engine = AsyncLLM(config)
    asyncio.run(
        run_server(engine, host=args.host, port=args.port,
                   served_model_name=args.served_model_name,
                   tool_call_parser=args.tool_call_parser,
                   reasoning_parser=args.reasoning_parser))


def cmd_run_batch(args) -> None:
    """OpenAI batch-file processing (reference: vllm run-batch,
    vllm/entrypoints/openai/run_batch.py): input JSONL of
    {custom_id, method, url, body}; output JSONL of
    {id, custom_id, response, error}. Each line dispatches through
    the REAL server app in-process, so behavior (templating,
    multimodal, errors) is identical to serving."""
    import json
    import uuid

    from aiohttp.test_utils import TestClient, TestServer

    from vllm_main_modify_tpu.engine.async_llm import AsyncLLM
    from vllm_main_modify_tpu.entrypoints.openai.api_server import \
        OpenAIServer

    config = _build_config(args)
    engine = AsyncLLM(config)
    server = OpenAIServer(engine,
                          served_model_name=args.served_model_name
                          or config.model_config.model)
    app = server.build_app()

    async def run() -> None:
        client = TestClient(TestServer(app))
        await client.start_server()
        out_lines = []
        with open(args.input_file) as f:
            lines = [json.loads(ln) for ln in f if ln.strip()]
        for item in lines:
            cid = item.get("custom_id")
            url = item.get("url", "/v1/chat/completions")
            try:
                resp = await client.post(url, json=item.get("body",
                                                            {}))
                body = await resp.json()
                out_lines.append({
                    "id": f"batch_req_{uuid.uuid4().hex[:16]}",
                    "custom_id": cid,
                    "response": {"status_code": resp.status,
                                 "body": body},
                    "error": None,
                })
            except Exception as e:  # noqa: BLE001
                out_lines.append({
                    "id": f"batch_req_{uuid.uuid4().hex[:16]}",
                    "custom_id": cid,
                    "response": None,
                    "error": {"message": str(e)},
                })
        with open(args.output_file, "w") as f:
            for ln in out_lines:
                f.write(json.dumps(ln) + "\n")
        await client.close()
        engine.shutdown()

    asyncio.run(run())
    print(f"wrote {args.output_file}")


def _build_llm(args):
    from vllm_main_modify_tpu.entrypoints.llm import LLM

    model = args.model_opt or args.model
    if not model:
        raise SystemExit("error: model path required")
    return LLM(model=model, tokenizer=args.tokenizer, dtype=args.dtype,
               max_model_len=args.max_model_len,
               max_num_seqs=args.max_num_seqs,
               max_num_batched_tokens=args.max_num_batched_tokens,
               block_size=args.block_size,
               tensor_parallel_size=args.tensor_parallel_size,
               enable_prefix_caching=not args.no_enable_prefix_caching,
               num_kv_blocks=args.num_kv_blocks,
               load_format=args.load_format, seed=args.seed,
               trust_remote_code=args.trust_remote_code,
               async_scheduling=True)


def cmd_bench_latency(args) -> None:
    import json

    from vllm_main_modify_tpu.benchmarks.offline import \
        benchmark_latency

    llm = _build_llm(args)
    result = benchmark_latency(llm, args.batch_size, args.input_len,
                               args.output_len, args.num_iters)
    print(json.dumps(result, indent=2))


def cmd_bench_throughput(args) -> None:
    import json

    from vllm_main_modify_tpu.benchmarks.offline import \
        benchmark_throughput

    llm = _build_llm(args)
    result = benchmark_throughput(llm, args.num_prompts,
                                  args.input_len, args.output_len,
                                  dataset=args.dataset_name,
                                  dataset_path=args.dataset_path)
    print(json.dumps(result, indent=2))


def cmd_bench_serve(args) -> None:
    import json

    from vllm_main_modify_tpu.benchmarks.offline import random_prompts
    from vllm_main_modify_tpu.benchmarks.serve_bench import \
        run_serve_benchmark

    prompts = ["hello world " * max(args.input_len // 2, 1)
               ] * args.num_prompts
    result = asyncio.run(
        run_serve_benchmark(args.base_url, prompts, args.output_len,
                            args.request_rate))
    print(json.dumps(result, indent=2))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="vllm-tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    serve = sub.add_parser("serve", help="start the OpenAI server")
    _add_engine_args(serve)
    serve.add_argument("--host", default="0.0.0.0")
    serve.add_argument("--port", type=int, default=8000)
    serve.add_argument("--api-server-count", type=int, default=1,
                       dest="api_server_count")
    serve.add_argument("--tool-call-parser", default=None)
    serve.add_argument("--reasoning-parser", default=None)
    serve.set_defaults(func=cmd_serve)

    rb = sub.add_parser("run-batch",
                        help="process an OpenAI batch file")
    _add_engine_args(rb)
    rb.add_argument("-i", "--input-file", required=True)
    rb.add_argument("-o", "--output-file", required=True)
    rb.set_defaults(func=cmd_run_batch)

    bench = sub.add_parser("bench", help="benchmarks")
    bench_sub = bench.add_subparsers(dest="bench_command",
                                     required=True)

    lat = bench_sub.add_parser("latency")
    _add_engine_args(lat)
    lat.add_argument("--batch-size", type=int, default=8)
    lat.add_argument("--input-len", type=int, default=128)
    lat.add_argument("--output-len", type=int, default=32)
    lat.add_argument("--num-iters", type=int, default=3)
    lat.set_defaults(func=cmd_bench_latency)

    thr = bench_sub.add_parser("throughput")
    _add_engine_args(thr)
    thr.add_argument("--num-prompts", type=int, default=64)
    thr.add_argument("--input-len", type=int, default=128)
    thr.add_argument("--output-len", type=int, default=32)
    thr.add_argument("--dataset-name", default="random",
                     choices=["random", "sharegpt", "sonnet"],
                     help="request sampler (reference: vllm bench "
                          "--dataset-name)")
    thr.add_argument("--dataset-path", default=None,
                     help="ShareGPT json / sonnet txt file")
    thr.set_defaults(func=cmd_bench_throughput)

    srv = bench_sub.add_parser("serve")
    srv.add_argument("--base-url", default="http://localhost:8000")
    srv.add_argument("--num-prompts", type=int, default=32)
    srv.add_argument("--input-len", type=int, default=128)
    srv.add_argument("--output-len", type=int, default=32)
    srv.add_argument("--request-rate", type=float, default=None)
    srv.set_defaults(func=cmd_bench_serve)

    args = parser.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
