"""Subprocess entry for the true multi-process multihost test: two
jax.distributed processes x 4 virtual CPU devices each form one global
8-device GSPMD mesh; process 0 runs the real engine (scheduler + async
multi-step dispatch) and publishes each dispatch over ZMQ; process 1
replays them in ``worker_loop``. Both processes must execute the
identical device programs in the same order or jax.distributed hangs /
errors — which is exactly the property under test.

Usage: python distributed_worker.py <rank> <coord_port> <zmq_port> <out_json>
"""

import json
import os
import sys
import time

rank = int(sys.argv[1])
coord_port = sys.argv[2]
zmq_port = sys.argv[3]
out_path = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{coord_port}", num_processes=2,
                           process_id=rank)
assert len(jax.devices()) == 8, jax.devices()
assert jax.local_device_count() == 4

from vllm_main_modify_tpu.config import (CacheConfig, EngineConfig,  # noqa: E402
                                         LoadConfig, ModelConfig,
                                         ParallelConfig, SchedulerConfig)
from vllm_main_modify_tpu.engine.core import EngineCore  # noqa: E402
from vllm_main_modify_tpu.engine.types import EngineCoreRequest  # noqa: E402
from vllm_main_modify_tpu.parallel.multihost import (StepBroadcaster,  # noqa: E402
                                                     worker_loop)
from vllm_main_modify_tpu.sampling_params import SamplingParams  # noqa: E402

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
    scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                     max_num_seqs=4, max_model_len=128,
                                     async_scheduling=True,
                                     num_decode_steps_per_dispatch=4),
    parallel_config=ParallelConfig(tensor_parallel_size=8),
    load_config=LoadConfig(load_format="dummy"),
)

# identical collective init on both processes (params + KV alloc)
core = EngineCore(config)

ready_file = out_path + ".ready"
if rank == 0:
    broadcaster = StepBroadcaster(is_leader=True, world_size=2,
                                  endpoint=f"tcp://127.0.0.1:{zmq_port}")
    core.model_runner.step_broadcaster = broadcaster
    # wait for the follower's SUB socket (ZMQ slow-joiner)
    for _ in range(600):
        if os.path.exists(ready_file):
            break
        time.sleep(0.1)
    else:
        raise TimeoutError("follower never became ready")
    time.sleep(1.0)

    prompts = [[7, 11, 13, 17, 19], [23, 29, 31], [37, 41, 43, 47]]
    for i, p in enumerate(prompts):
        core.add_request(
            EngineCoreRequest(request_id=f"r{i}", prompt_token_ids=p,
                              sampling_params=SamplingParams(
                                  temperature=0.0, max_tokens=10,
                                  ignore_eos=True)))
    outputs = {}
    deadline = time.monotonic() + 300
    while core.has_unfinished_requests():
        assert time.monotonic() < deadline, "leader stalled"
        for o in core.step().outputs:
            outputs.setdefault(o.request_id,
                               []).extend(o.new_token_ids)
    broadcaster.publish_shutdown()
    with open(out_path, "w") as f:
        json.dump(outputs, f)
else:
    broadcaster = StepBroadcaster(is_leader=False, world_size=2,
                                  connect=f"tcp://127.0.0.1:{zmq_port}")
    with open(ready_file, "w") as f:
        f.write("ok")
    worker_loop(core.model_runner, broadcaster)

broadcaster.close()
print(f"rank {rank} done", flush=True)
