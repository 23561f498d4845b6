"""Prefill/decode disaggregation: two engines, KV blocks shipped from
the prefill engine to the decode engine (reference capability:
kv_transfer/kv_connector/v1/ + tests/v1/kv_connector/).

Flow (what a P/D proxy does): run the prompt on the PRODUCER with
max_tokens=1, then send the same prompt to the CONSUMER — whose
offload tier now holds the producer's blocks, so all full prompt
blocks restore instead of recomputing. Greedy output must equal a
single-engine run, and the consumer must actually have restored
remote blocks (offload hits > 0)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.kv_transfer import KVTransferConfig
from vllm_main_modify_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from tests.conftest import _save_tiny_tokenizer

    cfg = LlamaConfig(vocab_size=512, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=128)
    torch.manual_seed(0)
    m = LlamaForCausalLM(cfg).to(torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-pd"
    m.save_pretrained(path, safe_serialization=True)
    _save_tiny_tokenizer(path)
    return str(path)


def _mk(model_dir, role, channel):
    return LLM(model=model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
               num_kv_blocks=128,
               kv_transfer_config=KVTransferConfig(
                   kv_role=role, transport="inproc", channel=channel))


def test_pd_disagg_two_engines(model_dir):
    prompt_ids = list(np.random.default_rng(0).integers(
        1, 500, size=21))  # 5 full blocks of 4 + remainder
    prompt = [{"prompt_token_ids": [int(t) for t in prompt_ids]}]

    # single-engine reference
    ref_llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
                  max_num_seqs=8, max_num_batched_tokens=64,
                  block_size=4, num_kv_blocks=128)
    ref = ref_llm.generate(prompt, SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))[0]
    ref_ids = ref.outputs[0].token_ids

    producer = _mk(model_dir, "kv_producer", "pd-test")
    consumer = _mk(model_dir, "kv_consumer", "pd-test")

    # 1) prefill engine: one token, KV ships on prompt completion
    pout = producer.generate(prompt, SamplingParams(
        temperature=0.0, max_tokens=1, ignore_eos=True))[0]
    assert pout.outputs[0].token_ids == ref_ids[:1]
    pcore = producer.engine.engine_core
    assert pcore.kv_connector.blocks_sent >= 5

    # 2) decode engine: same prompt — blocks restore from the wire
    cout = consumer.generate(prompt, SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))[0]
    assert cout.outputs[0].token_ids == ref_ids

    ccore = consumer.engine.engine_core
    assert ccore.kv_connector.blocks_received >= 5
    # the restore path actually consumed remote blocks
    assert ccore.kv_offload_index.num_hits >= 4


def test_zmq_transport_roundtrip():
    """The production transport moves block payloads over TCP."""
    zmq = pytest.importorskip("zmq")  # noqa: F841
    from vllm_main_modify_tpu.kv_transfer.connector import (
        ZmqTransport, decode_blocks, encode_blocks)

    addr = "tcp://127.0.0.1:25871"
    consumer = ZmqTransport(recv_addr=addr)
    producer = ZmqTransport(send_addr=addr)
    pairs = [(b"h1", np.arange(12, dtype=np.float32).reshape(3, 4))]
    producer.send(encode_blocks(pairs))
    import time
    got = []
    for _ in range(100):
        got = consumer.recv_all()
        if got:
            break
        time.sleep(0.02)
    assert len(got) == 1
    h, arr = decode_blocks(got[0])[0]
    assert h == b"h1"
    np.testing.assert_array_equal(
        arr, np.arange(12, dtype=np.float32).reshape(3, 4))
    producer.close()
    consumer.close()


def test_wire_codec_roundtrip_and_rejects_malformed():
    """Block payloads cross a network boundary: the codec must round-
    trip every dtype used by the KV tiers WITHOUT executable content,
    and reject malformed/pickled input instead of executing it."""
    import pickle

    import jax.numpy as jnp

    from vllm_main_modify_tpu.kv_transfer.connector import (
        decode_blocks, encode_blocks)

    pairs = [
        (b"\x01" * 32, np.arange(24, dtype=np.float32).reshape(2, 3, 4)),
        (b"h2", np.ones((4, 8), dtype=np.asarray(
            jnp.zeros(1, jnp.bfloat16)).dtype)),
        (b"h3", np.arange(8, dtype=np.int8)),
    ]
    out = decode_blocks(encode_blocks(pairs))
    assert len(out) == 3
    for (h0, a0), (h1, a1) in zip(pairs, out):
        assert h0 == h1 and a0.dtype == a1.dtype
        np.testing.assert_array_equal(a0, a1)

    # a pickle payload (the old wire format / an attacker's payload)
    # must raise, never unpickle
    with pytest.raises(ValueError):
        decode_blocks(pickle.dumps([(b"h", np.zeros(2))]))
    # truncated payload
    good = encode_blocks(pairs[:1])
    with pytest.raises(ValueError):
        decode_blocks(good[:len(good) // 2])


def test_pd_consumer_without_data_recomputes(model_dir):
    """A consumer whose KV never arrives must still be correct (local
    recompute, no waiting)."""
    consumer = _mk(model_dir, "kv_consumer", "pd-empty")
    prompt = [{"prompt_token_ids": [7, 9, 11, 13, 15, 17]}]
    out = consumer.generate(prompt, SamplingParams(
        temperature=0.0, max_tokens=4, ignore_eos=True))[0]
    ref_llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
                  max_num_seqs=8, max_num_batched_tokens=64,
                  block_size=4, num_kv_blocks=128)
    ref = ref_llm.generate(prompt, SamplingParams(
        temperature=0.0, max_tokens=4, ignore_eos=True))[0]
    assert out.outputs[0].token_ids == ref.outputs[0].token_ids
