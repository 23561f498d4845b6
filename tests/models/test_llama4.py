"""Llama 4 text parity (reference: vllm llama4.py): interleaved rope +
post-rope weightless qk norm, chunked local attention, NoPE layers
with temperature tuning, sigmoid-on-input top-k MoE + shared expert."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

TOKENS = [3, 17, 91, 100, 45, 12, 7, 110, 33, 99, 54, 2]


def _build(tmp_path, **over):
    import torch
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    torch.manual_seed(0)
    kw = dict(vocab_size=128, hidden_size=64, intermediate_size=96,
              intermediate_size_mlp=128, num_hidden_layers=4,
              num_attention_heads=4, num_key_value_heads=2,
              head_dim=16, num_local_experts=4, num_experts_per_tok=1,
              interleave_moe_layer_step=2, attention_chunk_size=8,
              max_position_embeddings=128, use_qk_norm=True,
              attn_temperature_tuning=True, floor_scale=4.0,
              tie_word_embeddings=False)
    kw.update(over)
    hf = Llama4ForCausalLM(Llama4TextConfig(**kw)).to(
        torch.float32).eval()
    d = tmp_path / "llama4"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def test_llama4_logit_parity(tmp_path):
    """12 tokens with chunk size 8 — crosses a chunk boundary, hits
    NoPE layer 4 (temp tuning active via tiny floor_scale) and both
    MoE layers."""
    import torch

    path, hf = _build(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    from tests.models.test_model_families import run_ours

    got = run_ours(str(path), TOKENS)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_llama4_kv_groups(tmp_path):
    path, _ = _build(tmp_path)
    from vllm_main_modify_tpu.config import ModelConfig
    from vllm_main_modify_tpu.models.registry import create_model

    model = create_model(ModelConfig(model=str(path), dtype="float32",
                                     max_model_len=64))
    groups = model.kv_cache_groups()
    assert [g.kind for g in groups] == ["full", "window"]
    assert groups[1].window == 8  # attention_chunk_size
    assert groups[0].layer_ids == (3, )  # the NoPE layer


def test_chunked_attention_mask_oracle():
    """chunk_size masking in the XLA path vs a dense oracle."""
    import jax.numpy as jnp

    from vllm_main_modify_tpu.ops.attention import \
        ragged_paged_attention_xla

    rng = np.random.RandomState(0)
    T, Hq, Hk, D, page, C = 10, 2, 2, 8, 4, 4
    q = jnp.asarray(rng.randn(T, Hq, D), jnp.float32)
    kv = jnp.asarray(rng.randn(8, page, 2 * Hk, D), jnp.float32)
    bt = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
    qsl = jnp.asarray([0, T], jnp.int32)
    seq_lens = jnp.asarray([T], jnp.int32)
    out = ragged_paged_attention_xla(q, kv, bt, qsl, seq_lens, 0.5,
                                     chunk_size=C)
    k = np.asarray(kv)[1:4, :, 0::2, :].reshape(3 * page, Hk, D)[:T]
    v = np.asarray(kv)[1:4, :, 1::2, :].reshape(3 * page, Hk, D)[:T]
    for t in range(T):
        lo = (t // C) * C
        for h in range(Hq):
            s = (np.asarray(q)[t, h] @ k[lo:t + 1, h].T) * 0.5
            p = np.exp(s - s.max())
            p /= p.sum()
            expect = p @ v[lo:t + 1, h]
            np.testing.assert_allclose(np.asarray(out)[t, h], expect,
                                       atol=1e-5)


def test_chunked_attention_pallas_interpret():
    import jax.numpy as jnp

    from vllm_main_modify_tpu.ops.attention import \
        ragged_paged_attention_xla
    from vllm_main_modify_tpu.ops.pallas.ragged_attn import \
        ragged_paged_attention_pallas

    rng = np.random.RandomState(1)
    T, Hq, Hk, D, page, C = 16, 4, 2, 8, 4, 4
    q = jnp.asarray(rng.randn(T, Hq, D), jnp.float32)
    kv = jnp.asarray(rng.randn(16, page, 2 * Hk, D), jnp.float32)
    bt = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    qsl = jnp.asarray([0, 10, 16], jnp.int32)
    seq_lens = jnp.asarray([12, 6], jnp.int32)
    want = ragged_paged_attention_xla(q, kv, bt, qsl, seq_lens, 0.35,
                                      chunk_size=C)
    got = ragged_paged_attention_pallas(
        q, kv.reshape(16, page, 2 * Hk * D), bt, qsl, seq_lens, 0.35,
        num_kv_heads=Hk, interpret=True, chunk_size=C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
