"""KV event publishing (reference: vllm/distributed/kv_events.py):
BlockStored/BlockRemoved batches over ZMQ PUB with seq numbers +
replay."""

import json
import time

import pytest

zmq = pytest.importorskip("zmq")

from vllm_main_modify_tpu.config import (CacheConfig, EngineConfig,
                                         LoadConfig, ModelConfig,
                                         SchedulerConfig)
from vllm_main_modify_tpu.engine.llm_engine import LLMEngine
from vllm_main_modify_tpu.kv_events import KVEventsConfig
from vllm_main_modify_tpu.sampling_params import SamplingParams


def test_zmq_kv_events(tiny_llama_dir):
    port = 25557
    cfg = EngineConfig(
        model_config=ModelConfig(model=tiny_llama_dir, dtype="float32",
                                 max_model_len=128),
        cache_config=CacheConfig(block_size=4, num_gpu_blocks=64),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=8,
                                         max_model_len=128),
        load_config=LoadConfig(load_format="auto"),
        kv_events_config=KVEventsConfig(
            enable_kv_cache_events=True,
            endpoint=f"tcp://127.0.0.1:{port}",
            replay_endpoint=f"tcp://127.0.0.1:{port + 1}"),
    )
    engine = LLMEngine(cfg)

    ctx = zmq.Context.instance()
    sub = ctx.socket(zmq.SUB)
    sub.connect(f"tcp://127.0.0.1:{port}")
    sub.setsockopt(zmq.SUBSCRIBE, b"kv-events")
    time.sleep(0.3)  # PUB/SUB join

    engine.add_request("r1", "hello world this is a test",
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True))
    while engine.has_unfinished_requests():
        engine.step()

    batches = []
    deadline = time.time() + 3
    poller = zmq.Poller()
    poller.register(sub, zmq.POLLIN)
    while time.time() < deadline:
        if poller.poll(100):
            topic, seq, payload = sub.recv_multipart()
            batches.append((int.from_bytes(seq, "big"),
                            json.loads(payload)))
        elif batches:
            break
    assert batches, "no kv event batches received"
    seqs = [s for s, _ in batches]
    assert seqs == sorted(seqs)
    kinds = {e["type"] for _, b in batches for e in b["events"]}
    assert "BlockStored" in kinds
    stored = [e for _, b in batches for e in b["events"]
              if e["type"] == "BlockStored"]
    assert all(e["block_hash"] for e in stored)

    # replay side channel returns batches from a given seq
    req = ctx.socket(zmq.REQ)
    req.connect(f"tcp://127.0.0.1:{port + 1}")
    req.send((0).to_bytes(8, "big"))
    frames = req.recv_multipart()
    assert frames and frames[0] != b""
    replayed = json.loads(frames[0])
    assert replayed["events"]
    sub.close(linger=0)
    req.close(linger=0)
