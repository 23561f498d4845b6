"""GPT-OSS parity: attention sinks, alternating sliding/full layers,
yarn rope with attention scaling, MoE with router bias + interleaved
gate/up experts + per-expert biases + swigluoai clamp — logits must
match HF GptOssForCausalLM (reference model:
vllm/model_executor/models/gpt_oss.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

TOKENS = [3, 17, 91, 200, 45, 12, 7, 150, 33, 99]


def _build(tmp_path, **over):
    import torch
    from transformers import GptOssConfig, GptOssForCausalLM

    torch.manual_seed(0)
    kw = dict(vocab_size=256, hidden_size=64, intermediate_size=32,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, head_dim=16,
              num_local_experts=4, num_experts_per_tok=2,
              sliding_window=8, max_position_embeddings=128,
              tie_word_embeddings=False)
    kw.update(over)
    hf = GptOssForCausalLM(GptOssConfig(**kw)).to(torch.float32).eval()
    d = tmp_path / "gpt-oss"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def test_gpt_oss_logit_parity(tmp_path):
    import torch

    path, hf = _build(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    from tests.models.test_model_families import run_ours

    got = run_ours(str(path), TOKENS)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_gpt_oss_kv_groups(tmp_path):
    """Alternating layer_types must map onto full+window KV groups."""
    path, _ = _build(tmp_path)
    from vllm_main_modify_tpu.config import ModelConfig
    from vllm_main_modify_tpu.models.registry import create_model

    model = create_model(ModelConfig(model=str(path), dtype="float32",
                                     max_model_len=64))
    groups = model.kv_cache_groups()
    assert [g.kind for g in groups] == ["full", "window"]
    assert groups[1].window == 8
    assert groups[1].layer_ids == (0, )  # layer 0 is sliding
    assert groups[0].layer_ids == (1, )


def test_sinks_xla_oracle():
    """The sink denominator math against a direct dense softmax with a
    concatenated sink logit (HF eager_attention_forward shape)."""
    import jax.numpy as jnp

    from vllm_main_modify_tpu.ops.attention import \
        ragged_paged_attention_xla

    rng = np.random.RandomState(0)
    T, Hq, Hk, D, page = 6, 4, 2, 8, 4
    q = jnp.asarray(rng.randn(T, Hq, D), jnp.float32)
    kv = jnp.asarray(rng.randn(8, page, 2 * Hk, D), jnp.float32)
    bt = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
    qsl = jnp.asarray([0, T], jnp.int32)
    seq_lens = jnp.asarray([T], jnp.int32)
    sinks = jnp.asarray(rng.randn(Hq), jnp.float32)
    out = ragged_paged_attention_xla(q, kv, bt, qsl, seq_lens, 0.5,
                                     sinks=sinks)

    # dense oracle
    k = np.asarray(kv)[1:3, :, 0::2, :].reshape(2 * page, Hk, D)[:T]
    v = np.asarray(kv)[1:3, :, 1::2, :].reshape(2 * page, Hk, D)[:T]
    group = Hq // Hk
    for t in range(T):
        for h in range(Hq):
            scores = (np.asarray(q)[t, h] @
                      k[:t + 1, h // group].T) * 0.5
            logits = np.concatenate([scores,
                                     [np.asarray(sinks)[h]]])
            p = np.exp(logits - logits.max())
            p /= p.sum()
            expect = p[:-1] @ v[:t + 1, h // group]
            np.testing.assert_allclose(np.asarray(out)[t, h], expect,
                                       atol=1e-5)


def test_sinks_pallas_interpret():
    """Pallas kernel sink finalization vs the XLA oracle."""
    import jax.numpy as jnp

    from vllm_main_modify_tpu.ops.attention import \
        ragged_paged_attention_xla
    from vllm_main_modify_tpu.ops.pallas.ragged_attn import \
        ragged_paged_attention_pallas

    rng = np.random.RandomState(1)
    T, Hq, Hk, D, page = 16, 4, 2, 8, 4
    q = jnp.asarray(rng.randn(T, Hq, D), jnp.float32)
    kv = jnp.asarray(rng.randn(16, page, 2 * Hk, D), jnp.float32)
    bt = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    qsl = jnp.asarray([0, 10, 16], jnp.int32)
    seq_lens = jnp.asarray([12, 6], jnp.int32)
    sinks = jnp.asarray(rng.randn(Hq), jnp.float32)
    want = ragged_paged_attention_xla(q, kv, bt, qsl, seq_lens, 0.35,
                                      sinks=sinks)
    got = ragged_paged_attention_pallas(
        q, kv.reshape(16, page, 2 * Hk * D), bt, qsl, seq_lens, 0.35,
        num_kv_heads=Hk, interpret=True, sinks=sinks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
