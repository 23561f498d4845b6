"""True multi-process multihost execution: 2 jax.distributed processes
x 4 virtual CPU devices, one global 8-device tp mesh, leader running
the real async multi-step engine and fanning every dispatch out over
ZMQ to a follower replaying it in ``worker_loop``. Tokens must match a
single-process run of the identical config bit-for-bit.

Reference analogue being replaced: MultiprocExecutor's WorkerProc fleet
with shared-memory broadcast (vllm/v1/executor/multiproc_executor.py:82).
"""

import json
import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_fanout(tmp_path):
    out_path = str(tmp_path / "leader_out.json")
    coord, zmq_port = _free_port(), _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))) + os.pathsep +
                         env.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER,
             str(rank),
             str(coord),
             str(zmq_port), out_path],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT) for rank in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for rank, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{log[-4000:]}"

    with open(out_path) as f:
        distributed = json.load(f)
    assert set(distributed) == {"r0", "r1", "r2"}
    assert all(len(v) == 10 for v in distributed.values()), distributed

    # single-process reference on the same 8-device mesh (conftest
    # already forces 8 virtual CPU devices in this process)
    single = _single_process_reference()
    assert distributed == single, (distributed, single)


def _single_process_reference():
    from vllm_main_modify_tpu.config import (CacheConfig, EngineConfig,
                                             LoadConfig, ModelConfig,
                                             ParallelConfig,
                                             SchedulerConfig)
    from vllm_main_modify_tpu.engine.core import EngineCore
    from vllm_main_modify_tpu.engine.types import EngineCoreRequest
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    mc = ModelConfig(model="", dtype="float32", max_model_len=128)
    mc.architecture = "LlamaForCausalLM"
    mc.vocab_size = 512
    mc.hidden_size = 64
    mc.num_layers = 2
    mc.num_attention_heads = 8
    mc.num_kv_heads = 8
    mc.head_dim = 8
    mc.intermediate_size = 128
    config = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=4, num_gpu_blocks=256,
                                 enable_prefix_caching=False),
        scheduler_config=SchedulerConfig(
            max_num_batched_tokens=64, max_num_seqs=4,
            max_model_len=128, async_scheduling=True,
            num_decode_steps_per_dispatch=4),
        parallel_config=ParallelConfig(tensor_parallel_size=8),
        load_config=LoadConfig(load_format="dummy"),
    )
    core = EngineCore(config)
    prompts = [[7, 11, 13, 17, 19], [23, 29, 31], [37, 41, 43, 47]]
    for i, p in enumerate(prompts):
        core.add_request(
            EngineCoreRequest(request_id=f"r{i}", prompt_token_ids=p,
                              sampling_params=SamplingParams(
                                  temperature=0.0, max_tokens=10,
                                  ignore_eos=True)))
    outputs: dict[str, list[int]] = {}
    while core.has_unfinished_requests():
        for o in core.step().outputs:
            outputs.setdefault(o.request_id,
                               []).extend(o.new_token_ids)
    return outputs
