"""Logit parity vs HuggingFace (the reference's correctness strategy:
vLLM-vs-HF comparison, tests/conftest.py HfRunner/VllmRunner)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.models.loader import load_model_weights
from vllm_main_modify_tpu.models.registry import create_model

PAGE = 8
NUM_PAGES = 16


@pytest.fixture(scope="module")
def setup(tiny_llama_dir):
    cfg = ModelConfig(model=tiny_llama_dir, dtype="float32",
                      max_model_len=128)
    model = create_model(cfg)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, cfg, mesh)
    num_kv, head_dim, num_layers = model.kv_cache_spec()
    kv = jnp.zeros((num_layers, NUM_PAGES, PAGE, 2 * num_kv, head_dim),
                   jnp.float32)
    return cfg, model, params, kv


def hf_logits(tiny_llama_dir, token_ids):
    import torch
    from transformers import LlamaForCausalLM

    hf = LlamaForCausalLM.from_pretrained(tiny_llama_dir,
                                          torch_dtype=torch.float32)
    hf.eval()
    with torch.no_grad():
        out = hf(torch.tensor([token_ids]))
    return out.logits[0].numpy()


def make_meta(q_lens, seq_lens_v, pages_per_seq):
    """Packs per-seq metadata; pages assigned sequentially from 1."""
    n = len(q_lens)
    max_pages = max(pages_per_seq)
    bt = np.zeros((n, max_pages), np.int32)
    nxt = 1
    slots = []
    qsl = np.zeros(n + 1, np.int32)
    for i in range(n):
        qsl[i + 1] = qsl[i] + q_lens[i]
        pages = list(range(nxt, nxt + pages_per_seq[i]))
        nxt += pages_per_seq[i]
        bt[i, :pages_per_seq[i]] = pages
        start = seq_lens_v[i] - q_lens[i]
        for t in range(start, seq_lens_v[i]):
            slots.append(pages[t // PAGE] * PAGE + t % PAGE)
    return (jnp.asarray(bt), jnp.asarray(qsl),
            jnp.asarray(np.array(seq_lens_v, np.int32)),
            jnp.asarray(np.array(slots, np.int32)),
            jnp.asarray(np.array([n], np.int32)))


def test_prefill_parity(setup, tiny_llama_dir):
    cfg, model, params, kv = setup
    rng = np.random.default_rng(0)
    token_ids = rng.integers(0, cfg.vocab_size, 12).tolist()

    bt, qsl, sl, slots, ns = make_meta([12], [12], [2])
    meta = AttentionMetadata(bt, qsl, sl, slots, ns)
    hidden, kv2 = model(params, jnp.asarray(token_ids),
                        jnp.arange(12), kv, meta, use_pallas=False)
    logits = np.asarray(model.compute_logits(params, hidden))
    ref = hf_logits(tiny_llama_dir, token_ids)
    np.testing.assert_allclose(logits, ref, rtol=2e-4, atol=2e-4)


def test_decode_parity(setup, tiny_llama_dir):
    """Prefill 12 tokens, then decode 3 more one at a time; logits of
    each decode step must match HF full-context forward."""
    cfg, model, params, kv = setup
    rng = np.random.default_rng(1)
    token_ids = rng.integers(0, cfg.vocab_size, 16).tolist()
    ref = hf_logits(tiny_llama_dir, token_ids)

    bt, qsl, sl, slots, ns = make_meta([12], [12], [3])
    meta = AttentionMetadata(bt, qsl, sl, slots, ns)
    hidden, kv = model(params, jnp.asarray(token_ids[:12]),
                       jnp.arange(12), kv, meta, use_pallas=False)
    logits = np.asarray(model.compute_logits(params, hidden))
    np.testing.assert_allclose(logits[-1], ref[11], rtol=2e-4,
                               atol=2e-4)

    for step in range(3):
        pos = 12 + step
        slot = (pos // PAGE + 1) * PAGE + pos % PAGE
        meta = AttentionMetadata(
            bt, jnp.asarray([0, 1], jnp.int32),
            jnp.asarray([pos + 1], jnp.int32),
            jnp.asarray([slot], jnp.int32),
            jnp.asarray([1], jnp.int32))
        hidden, kv = model(params,
                           jnp.asarray([token_ids[pos]]),
                           jnp.asarray([pos]), kv, meta,
                           use_pallas=False)
        logits = np.asarray(model.compute_logits(params, hidden))
        np.testing.assert_allclose(logits[0], ref[pos], rtol=2e-4,
                                   atol=2e-4)


def test_batched_mixed_parity(setup, tiny_llama_dir):
    """Two requests packed ragged in one step (prefill+prefill)."""
    cfg, model, params, kv = setup
    rng = np.random.default_rng(2)
    a = rng.integers(0, cfg.vocab_size, 9).tolist()
    b = rng.integers(0, cfg.vocab_size, 14).tolist()

    bt, qsl, sl, slots, ns = make_meta([9, 14], [9, 14], [2, 2])
    meta = AttentionMetadata(bt, qsl, sl, slots, ns)
    ids = jnp.asarray(a + b)
    pos = jnp.asarray(list(range(9)) + list(range(14)))
    hidden, _ = model(params, ids, pos, kv, meta, use_pallas=False)
    logits = np.asarray(model.compute_logits(params, hidden))
    ref_a = hf_logits(tiny_llama_dir, a)
    ref_b = hf_logits(tiny_llama_dir, b)
    np.testing.assert_allclose(logits[:9], ref_a, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(logits[9:], ref_b, rtol=2e-4, atol=2e-4)
