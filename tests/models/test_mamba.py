"""Mamba-1 SSM parity vs HuggingFace (reference test pattern:
tests/models/language/generation/test_hybrid.py). Exercises the
segmented-scan mixer three ways:

1. single-shot prefill logit parity,
2. chunked prefill (6 + 4 tokens) — cross-chunk conv tail + SSM state
   carry must reproduce the single-shot logits,
3. decode continuation (prefill 9, decode 1) == full-prefill position.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vllm_main_modify_tpu.config import ModelConfig  # noqa: E402
from vllm_main_modify_tpu.layers.attention import (  # noqa: E402
    AttentionMetadata, KVGroupMeta)
from vllm_main_modify_tpu.models.loader import \
    load_model_weights  # noqa: E402
from vllm_main_modify_tpu.models.registry import \
    create_model  # noqa: E402

TOKENS = [3, 17, 91, 200, 45, 12, 7, 150, 33, 99]


def build_checkpoint(tmp_path, falcon: bool):
    import torch
    import transformers

    if falcon:
        cfg = transformers.FalconMambaConfig(
            vocab_size=256, hidden_size=64, num_hidden_layers=2,
            state_size=8, conv_kernel=4, intermediate_size=128,
            time_step_rank=4, use_bias=False, use_conv_bias=True)
        cls = transformers.FalconMambaForCausalLM
    else:
        cfg = transformers.MambaConfig(
            vocab_size=256, hidden_size=64, num_hidden_layers=2,
            state_size=8, conv_kernel=4, intermediate_size=128,
            time_step_rank=4, use_bias=True, use_conv_bias=True)
        cls = transformers.MambaForCausalLM
    torch.manual_seed(0)
    model = cls(cfg).to(torch.float32).eval()
    path = tmp_path / ("falcon_mamba" if falcon else "mamba")
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def make_meta(chunk_lens, t_pad=16, r_pad=4):
    """Packed single/multi-request metadata for one chunk."""
    n = len(chunk_lens)
    qsl = np.zeros(r_pad + 1, np.int32)
    for i, cl in enumerate(chunk_lens):
        qsl[i + 1] = qsl[i] + cl
    qsl[n + 1:] = qsl[n]
    return AttentionMetadata(
        block_tables=jnp.zeros((r_pad, 4), jnp.int32),
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.zeros(r_pad, jnp.int32),
        slot_mapping=jnp.full(t_pad, -1, jnp.int32),
        num_seqs=jnp.asarray([n], jnp.int32),
        groups=(KVGroupMeta(block_tables=None, slot_mapping=None,
                            state_slots=jnp.asarray(
                                list(range(1, n + 1)) + [0] *
                                (r_pad - n), dtype=jnp.int32)), ),
    )


def run_ours(model_dir, chunks):
    """Feed TOKENS in ``chunks`` pieces, return logits of the final
    chunk's positions."""
    from jax.sharding import Mesh

    config = ModelConfig(model=model_dir, dtype="float32",
                         max_model_len=128)
    model = create_model(config)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, config, mesh)
    n_slots = 4
    conv = jnp.zeros((model.L, n_slots, model.d_conv - 1,
                      model.d_inner), jnp.float32)
    ssm = jnp.zeros((model.L, n_slots, model.d_inner, model.d_state),
                    jnp.float32)
    kv = (jnp.zeros((0, 2, 8, 0), jnp.float32), (conv, ssm))
    t_pad = 16
    off = 0
    for chunk in chunks:
        ids = TOKENS[off:off + chunk]
        off += chunk
        meta = make_meta([chunk], t_pad=t_pad)
        ids_p = jnp.asarray(ids + [0] * (t_pad - chunk), jnp.int32)
        pos = jnp.asarray(list(range(off - chunk, off)) + [0] *
                          (t_pad - chunk), jnp.int32)
        hidden, kv = model(params, ids_p, pos, kv, meta,
                           use_pallas=False)
    logits = model.compute_logits(params, hidden[:chunk])
    return np.asarray(logits)


@pytest.mark.parametrize("falcon", [False, True])
def test_mamba_prefill_parity(falcon, tmp_path):
    import torch

    path, hf = build_checkpoint(tmp_path, falcon)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_ours(path, [len(TOKENS)])
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_mamba_chunked_state_carry(tmp_path):
    import torch

    path, hf = build_checkpoint(tmp_path, False)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_ours(path, [6, 4])  # last chunk covers positions 6..9
    np.testing.assert_allclose(got, ref[6:], atol=2e-3, rtol=2e-3)


def test_mamba_decode_step(tmp_path):
    import torch

    path, hf = build_checkpoint(tmp_path, False)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_ours(path, [9, 1])
    np.testing.assert_allclose(got, ref[9:], atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------------
# Mamba-2 (SSD)


def build_mamba2(tmp_path):
    import torch
    import transformers

    cfg = transformers.Mamba2Config(
        vocab_size=256, hidden_size=32, num_hidden_layers=2,
        state_size=8, conv_kernel=4, expand=2, num_heads=4,
        head_dim=16, n_groups=2, chunk_size=8,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.Mamba2ForCausalLM(cfg).to(
        torch.float32).eval()
    path = tmp_path / "mamba2"
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def run_mamba2(model_dir, chunks):
    from jax.sharding import Mesh

    config = ModelConfig(model=model_dir, dtype="float32",
                         max_model_len=128)
    model = create_model(config)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, config, mesh)
    n_slots = 4
    conv = jnp.zeros((model.L, n_slots, model.d_conv - 1,
                      model.conv_dim), jnp.float32)
    ssm = jnp.zeros((model.L, n_slots, model.num_heads,
                     model.head_dim_m, model.d_state), jnp.float32)
    kv = (jnp.zeros((0, 2, 8, 0), jnp.float32), (conv, ssm))
    t_pad = 16
    off = 0
    for chunk in chunks:
        ids = TOKENS[off:off + chunk]
        off += chunk
        meta = make_meta([chunk], t_pad=t_pad)
        ids_p = jnp.asarray(ids + [0] * (t_pad - chunk), jnp.int32)
        pos = jnp.asarray(list(range(off - chunk, off)) + [0] *
                          (t_pad - chunk), jnp.int32)
        hidden, kv = model(params, ids_p, pos, kv, meta,
                           use_pallas=False)
    logits = model.compute_logits(params, hidden[:chunk])
    return np.asarray(logits)


def test_mamba2_prefill_parity(tmp_path):
    import torch

    path, hf = build_mamba2(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_mamba2(path, [len(TOKENS)])
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_mamba2_chunked_state_carry(tmp_path):
    import torch

    path, hf = build_mamba2(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_mamba2(path, [6, 3, 1])  # prefill chunks + decode step
    np.testing.assert_allclose(got, ref[9:], atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------------
# Bamba: mamba2 + attention hybrid


def build_bamba(tmp_path):
    import torch
    import transformers

    cfg = transformers.BambaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, mamba_n_heads=4, mamba_d_head=16,
        mamba_n_groups=2, mamba_d_state=8, mamba_d_conv=4,
        mamba_expand=2, attn_layer_indices=[1],
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.BambaForCausalLM(cfg).to(
        torch.float32).eval()
    path = tmp_path / "bamba"
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def run_bamba(model_dir, chunks):
    from jax.sharding import Mesh

    config = ModelConfig(model=model_dir, dtype="float32",
                         max_model_len=128)
    model = create_model(config)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, config, mesh)
    n_slots = 4
    la, lm = len(model.attn_ids), len(model.mamba_ids)
    page = 8
    kv0 = jnp.zeros((la, 8, page, 2 * model.num_kv, model.head_dim),
                    jnp.float32)
    conv = jnp.zeros((lm, n_slots, model.d_conv - 1, model.conv_dim),
                     jnp.float32)
    ssm = jnp.zeros((lm, n_slots, model.m_heads, model.m_head_dim,
                     model.d_state), jnp.float32)
    kv = (kv0, (conv, ssm))
    t_pad = 16
    bt = np.zeros((4, 4), np.int32)
    bt[0] = [1, 2, 0, 0]
    off = 0
    for chunk in chunks:
        ids = TOKENS[off:off + chunk]
        off += chunk
        meta = make_meta([chunk], t_pad=t_pad)
        sm = np.full(t_pad, -1, np.int32)
        for j in range(chunk):
            pos = off - chunk + j
            sm[j] = (1 + pos // page) * page + pos % page
        meta = meta._replace(
            block_tables=jnp.asarray(bt),
            seq_lens=jnp.asarray([off, 0, 0, 0], jnp.int32),
            slot_mapping=jnp.asarray(sm))
        ids_p = jnp.asarray(ids + [0] * (t_pad - chunk), jnp.int32)
        pos = jnp.asarray(list(range(off - chunk, off)) + [0] *
                          (t_pad - chunk), jnp.int32)
        hidden, kv = model(params, ids_p, pos, kv, meta,
                           use_pallas=False)
    logits = model.compute_logits(params, hidden[:chunk])
    return np.asarray(logits)


def test_bamba_prefill_parity(tmp_path):
    import torch

    path, hf = build_bamba(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_bamba(path, [len(TOKENS)])
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_bamba_chunked_state_carry(tmp_path):
    import torch

    path, hf = build_bamba(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_bamba(path, [7, 3])
    np.testing.assert_allclose(got, ref[7:], atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------------
# GraniteMoeHybrid (Granite 4.0): mamba2 + nope-attention + fused MoE


def build_gmh(tmp_path):
    import torch
    import transformers

    cfg = transformers.GraniteMoeHybridConfig(
        vocab_size=256, hidden_size=64, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_local_experts=4,
        num_experts_per_tok=2, shared_intermediate_size=48,
        mamba_n_heads=4, mamba_d_head=32, mamba_n_groups=2,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
        layer_types=["mamba", "attention"],
        max_position_embeddings=128, embedding_multiplier=2.0,
        residual_multiplier=0.5, logits_scaling=3.0,
        attention_multiplier=0.1, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.GraniteMoeHybridForCausalLM(cfg).to(
        torch.float32).eval()
    path = tmp_path / "gmh"
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def test_granitemoehybrid_parity(tmp_path):
    import torch

    path, hf = build_gmh(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_bamba(path, [len(TOKENS)])
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------------
# FalconH1: parallel attention + mamba2 every layer, µP multipliers


def build_falcon_h1(tmp_path):
    import torch
    import transformers

    cfg = transformers.FalconH1Config(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, mamba_d_ssm=64, mamba_n_heads=4,
        mamba_d_head=16, mamba_n_groups=2, mamba_d_state=8,
        mamba_d_conv=4, mamba_expand=2, max_position_embeddings=128,
        embedding_multiplier=2.0, attention_in_multiplier=0.9,
        attention_out_multiplier=1.1, key_multiplier=0.8,
        ssm_in_multiplier=1.2, ssm_out_multiplier=0.7,
        ssm_multipliers=[1.1, 0.9, 1.2, 0.8, 1.05],
        mlp_multipliers=[1.3, 0.6], lm_head_multiplier=0.5,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.FalconH1ForCausalLM(cfg).to(
        torch.float32).eval()
    path = tmp_path / "falcon_h1"
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def run_falcon_h1(model_dir, chunks):
    return run_bamba(model_dir, chunks)  # same dual-group harness


def test_falcon_h1_parity(tmp_path):
    import torch

    path, hf = build_falcon_h1(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_falcon_h1(path, [len(TOKENS)])
    np.testing.assert_allclose(got, ref, atol=3e-3, rtol=3e-3)


def test_falcon_h1_chunked(tmp_path):
    import torch

    path, hf = build_falcon_h1(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_falcon_h1(path, [6, 4])
    np.testing.assert_allclose(got, ref[6:], atol=3e-3, rtol=3e-3)


# ---------------------------------------------------------------------
# Jamba: hybrid attention + mamba + MoE


def build_jamba(tmp_path):
    import torch
    import transformers

    cfg = transformers.JambaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, mamba_d_state=8, mamba_d_conv=4,
        mamba_expand=2, mamba_dt_rank=4, num_experts=4,
        num_experts_per_tok=2, expert_layer_period=2,
        expert_layer_offset=1, attn_layer_period=4,
        attn_layer_offset=2, use_mamba_kernels=False)
    torch.manual_seed(0)
    model = transformers.JambaForCausalLM(cfg).to(
        torch.float32).eval()
    path = tmp_path / "jamba"
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def run_jamba(model_dir, chunks):
    from jax.sharding import Mesh

    config = ModelConfig(model=model_dir, dtype="float32",
                         max_model_len=128)
    model = create_model(config)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, config, mesh)
    n_slots = 4
    la = len(model.attn_ids)
    lm = len(model.mamba_ids)
    page = 8
    kv0 = jnp.zeros((la, 8, page, 2 * model.num_kv, model.head_dim),
                    jnp.float32)
    conv = jnp.zeros((lm, n_slots, model.d_conv - 1, model.d_inner),
                     jnp.float32)
    ssm = jnp.zeros((lm, n_slots, model.d_inner, model.d_state),
                    jnp.float32)
    kv = (kv0, (conv, ssm))
    t_pad = 16
    bt = np.zeros((4, 4), np.int32)
    bt[0] = [1, 2, 0, 0]
    off = 0
    for chunk in chunks:
        ids = TOKENS[off:off + chunk]
        off += chunk
        meta = make_meta([chunk], t_pad=t_pad)
        sm = np.full(t_pad, -1, np.int32)
        for j in range(chunk):
            pos = off - chunk + j
            sm[j] = (1 + pos // page) * page + pos % page
        meta = meta._replace(
            block_tables=jnp.asarray(bt),
            seq_lens=jnp.asarray([off, 0, 0, 0], jnp.int32),
            slot_mapping=jnp.asarray(sm))
        ids_p = jnp.asarray(ids + [0] * (t_pad - chunk), jnp.int32)
        pos = jnp.asarray(list(range(off - chunk, off)) + [0] *
                          (t_pad - chunk), jnp.int32)
        hidden, kv = model(params, ids_p, pos, kv, meta,
                           use_pallas=False)
    logits = model.compute_logits(params, hidden[:chunk])
    return np.asarray(logits)


def test_jamba_prefill_parity(tmp_path):
    import torch

    path, hf = build_jamba(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_jamba(path, [len(TOKENS)])
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_jamba_chunked_state_carry(tmp_path):
    import torch

    path, hf = build_jamba(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_jamba(path, [6, 4])
    np.testing.assert_allclose(got, ref[6:], atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------------------
# Nemotron-H: M/*/- mixer pattern (trust-remote-code; oracle composed
# from HF Mamba2Mixer + hand torch attention/relu²-MLP)
# ---------------------------------------------------------------------------

NH_PATTERN = "M*-M"


def build_nemotron_h(tmp_path):
    import json

    import safetensors.torch as stt
    import torch
    from transformers import Mamba2Config
    from transformers.models.mamba2.modeling_mamba2 import Mamba2Mixer

    torch.manual_seed(0)
    H, I, nh, hd, st, dc = 64, 96, 4, 16, 8, 4
    m2cfg = Mamba2Config(hidden_size=H, num_heads=nh, head_dim=hd,
                         expand=1, state_size=st, conv_kernel=dc,
                         n_groups=1, use_bias=False,
                         use_conv_bias=True, rms_norm=True,
                         layer_norm_epsilon=1e-5)
    sd = {}
    mixers = {}
    for l, kind in enumerate(NH_PATTERN):
        p = f"backbone.layers.{l}."
        sd[p + "norm.weight"] = torch.rand(H) * 0.5 + 0.75
        if kind == "M":
            mx = Mamba2Mixer(m2cfg, layer_idx=l).to(torch.float32)
            for k, v in mx.state_dict().items():
                if v.dtype.is_floating_point:
                    v.data = torch.randn_like(v) * 0.2
            # A_log/dt_bias need sane ranges
            mx.A_log.data = torch.log(torch.rand(nh) * 8 + 1)
            mx.dt_bias.data = torch.rand(nh)
            mx.eval()
            mixers[l] = mx
            for k, v in mx.state_dict().items():
                sd[p + "mixer." + k] = v.clone()
        elif kind == "*":
            sd[p + "mixer.q_proj.weight"] = torch.randn(nh * hd, H) * 0.1
            sd[p + "mixer.k_proj.weight"] = torch.randn(2 * hd, H) * 0.1
            sd[p + "mixer.v_proj.weight"] = torch.randn(2 * hd, H) * 0.1
            sd[p + "mixer.o_proj.weight"] = torch.randn(H, nh * hd) * 0.1
        else:
            sd[p + "mixer.up_proj.weight"] = torch.randn(I, H) * 0.1
            sd[p + "mixer.down_proj.weight"] = torch.randn(H, I) * 0.1
    sd["backbone.embed_tokens.weight"] = torch.randn(256, H) * 0.2
    sd["backbone.norm_f.weight"] = torch.rand(H) * 0.5 + 0.75
    sd["lm_head.weight"] = torch.randn(256, H) * 0.2
    d = tmp_path / "nemotron_h"
    d.mkdir()
    stt.save_file({k: v.contiguous() for k, v in sd.items()},
                  str(d / "model.safetensors"))
    cfg = dict(model_type="llama",
               architectures=["NemotronHForCausalLM"],
               vocab_size=256, hidden_size=H, intermediate_size=I,
               num_hidden_layers=len(NH_PATTERN),
               num_attention_heads=nh, num_key_value_heads=2,
               head_dim=hd, hybrid_override_pattern=NH_PATTERN,
               mamba_num_heads=nh, mamba_head_dim=hd,
               ssm_state_size=st, conv_kernel=dc, n_groups=1,
               use_conv_bias=True, use_bias=False, mlp_bias=False,
               rms_norm_eps=1e-5, max_position_embeddings=128,
               tie_word_embeddings=False)
    (d / "config.json").write_text(json.dumps(cfg))
    return str(d), sd, mixers


def _nh_oracle(sd, mixers, tokens):
    import torch
    import torch.nn.functional as F

    def rmsnorm(x, w):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-5)
        return v * w

    T = len(tokens)
    with torch.no_grad():
        x = sd["backbone.embed_tokens.weight"][torch.tensor(tokens)]
        for l, kind in enumerate(NH_PATTERN):
            p = f"backbone.layers.{l}."
            h = rmsnorm(x, sd[p + "norm.weight"])
            if kind == "M":
                mix = mixers[l].torch_forward(
                    h[None], cache_params=None, cache_position=None,
                    attention_mask=None)[0]
            elif kind == "*":
                q = (h @ sd[p + "mixer.q_proj.weight"].T).reshape(
                    T, 4, 16)
                k = (h @ sd[p + "mixer.k_proj.weight"].T).reshape(
                    T, 2, 16)
                v = (h @ sd[p + "mixer.v_proj.weight"].T).reshape(
                    T, 2, 16)
                k = k.repeat_interleave(2, dim=1)
                v = v.repeat_interleave(2, dim=1)
                s = torch.einsum("qhd,khd->hqk", q, k) / 4.0
                mask = torch.triu(torch.full((T, T), float("-inf")),
                                  diagonal=1)
                o = torch.einsum(
                    "hqk,khd->qhd",
                    F.softmax(s + mask, dim=-1), v).reshape(T, -1)
                mix = o @ sd[p + "mixer.o_proj.weight"].T
            else:
                y = F.relu(h @ sd[p + "mixer.up_proj.weight"].T) ** 2
                mix = y @ sd[p + "mixer.down_proj.weight"].T
            x = x + mix
        x = rmsnorm(x, sd["backbone.norm_f.weight"])
        return (x @ sd["lm_head.weight"].T).numpy()


def run_nemotron_h(model_dir, chunks):
    return run_bamba(model_dir, chunks)


def test_nemotron_h_prefill_parity(tmp_path):
    path, sd, mixers = build_nemotron_h(tmp_path)
    ref = _nh_oracle(sd, mixers, TOKENS)
    got = run_nemotron_h(path, [len(TOKENS)])
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_nemotron_h_chunked_state_carry(tmp_path):
    path, sd, mixers = build_nemotron_h(tmp_path)
    ref = _nh_oracle(sd, mixers, TOKENS)
    got = run_nemotron_h(path, [7, 3])
    np.testing.assert_allclose(got[:, :], ref[7:], atol=2e-3,
                               rtol=2e-3)


# ---------------------------------------------------------------------------
# LFM2: gated short-conv + attention hybrid (HF parity)
# ---------------------------------------------------------------------------


def build_lfm2(tmp_path):
    import torch
    import transformers

    cfg = transformers.Lfm2Config(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        layer_types=["conv", "full_attention", "conv",
                     "full_attention"],
        conv_L_cache=3, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.Lfm2ForCausalLM(cfg).to(torch.float32).eval()
    path = tmp_path / "lfm2"
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def run_lfm2(model_dir, chunks):
    from jax.sharding import Mesh

    config = ModelConfig(model=model_dir, dtype="float32",
                         max_model_len=128)
    model = create_model(config)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, config, mesh)
    n_slots = 4
    la, lc = len(model.attn_ids), len(model.conv_ids)
    page = 8
    kv0 = jnp.zeros((la, 8, page, 2 * model.num_kv, model.head_dim),
                    jnp.float32)
    conv = jnp.zeros((lc, n_slots, model.d_conv - 1, model.hidden),
                     jnp.float32)
    kv = (kv0, (conv, ))
    t_pad = 16
    bt = np.zeros((4, 4), np.int32)
    bt[0] = [1, 2, 0, 0]
    off = 0
    for chunk in chunks:
        ids = TOKENS[off:off + chunk]
        off += chunk
        meta = make_meta([chunk], t_pad=t_pad)
        sm = np.full(t_pad, -1, np.int32)
        for j in range(chunk):
            pos = off - chunk + j
            sm[j] = (1 + pos // page) * page + pos % page
        meta = meta._replace(
            block_tables=jnp.asarray(bt),
            seq_lens=jnp.asarray([off, 0, 0, 0], jnp.int32),
            slot_mapping=jnp.asarray(sm))
        ids_p = jnp.asarray(ids + [0] * (t_pad - chunk), jnp.int32)
        pos = jnp.asarray(list(range(off - chunk, off)) + [0] *
                          (t_pad - chunk), jnp.int32)
        hidden, kv = model(params, ids_p, pos, kv, meta,
                           use_pallas=False)
    logits = model.compute_logits(params, hidden[:chunk])
    return np.asarray(logits)


def test_lfm2_prefill_parity(tmp_path):
    import torch

    path, hf = build_lfm2(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_lfm2(path, [len(TOKENS)])
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_lfm2_chunked_state_carry(tmp_path):
    import torch

    path, hf = build_lfm2(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_lfm2(path, [6, 4])
    np.testing.assert_allclose(got, ref[6:], atol=2e-3, rtol=2e-3)


def test_fresh_request_ignores_stale_slot_state(tmp_path):
    """A request's FIRST chunk must not fold a reused slot's stale
    state (slots are never zeroed on free): running with a dirty
    slot + fresh_req=True must equal running with a zero slot."""
    import jax.numpy as jnp

    from vllm_main_modify_tpu.layers.mamba import build_seg_info

    path, hf = build_checkpoint(tmp_path, falcon=False)
    from jax.sharding import Mesh

    config = ModelConfig(model=path, dtype="float32",
                         max_model_len=128)
    model = create_model(config)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    from vllm_main_modify_tpu.models.loader import load_model_weights

    params = load_model_weights(model, config, mesh)
    n_slots = 2
    conv0 = jnp.zeros((model.L, n_slots, model.d_conv - 1,
                       model.d_inner), jnp.float32)
    ssm0 = jnp.zeros((model.L, n_slots, model.d_inner, model.d_state),
                     jnp.float32)
    rng = np.random.default_rng(0)
    conv_dirty = conv0 + jnp.asarray(
        rng.standard_normal(conv0.shape), jnp.float32)
    ssm_dirty = ssm0 + jnp.asarray(
        rng.standard_normal(ssm0.shape), jnp.float32)

    t_pad = 16
    chunk = 6
    ids_p = jnp.asarray(TOKENS[:chunk] + [0] * (t_pad - chunk),
                        jnp.int32)
    pos = jnp.asarray(list(range(chunk)) + [0] * (t_pad - chunk),
                      jnp.int32)

    def run(conv, ssm, fresh):
        meta = make_meta([chunk], t_pad=t_pad)
        meta = meta._replace(groups=(meta.groups[0]._replace(
            state_fresh=jnp.asarray([fresh, 0, 0, 0], jnp.int32)), ))
        kv = (jnp.zeros((0, 2, 8, 0), jnp.float32), (conv, ssm))
        hidden, _ = model(params, ids_p, pos, kv, meta,
                          use_pallas=False)
        return np.asarray(hidden[:chunk])

    clean = run(conv0, ssm0, fresh=0)
    dirty_fresh = run(conv_dirty, ssm_dirty, fresh=1)
    dirty_carry = run(conv_dirty, ssm_dirty, fresh=0)
    np.testing.assert_allclose(dirty_fresh, clean, atol=1e-5)
    assert np.abs(dirty_carry - clean).max() > 1e-3  # control


# ---------------------------------------------------------------------------
# Qwen3-Next: gated DeltaNet + gated attention hybrid (HF parity)
# ---------------------------------------------------------------------------


def build_qwen3_next(tmp_path):
    import torch
    import transformers

    cfg = transformers.Qwen3NextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4, num_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=32,
        shared_expert_intermediate_size=48, decoder_sparse_step=1,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention", "full_attention"],
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.Qwen3NextForCausalLM(cfg).to(
        torch.float32).eval()
    path = tmp_path / "qwen3next"
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def run_qwen3_next(model_dir, chunks):
    from jax.sharding import Mesh

    config = ModelConfig(model=model_dir, dtype="float32",
                         max_model_len=128)
    model = create_model(config)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, config, mesh)
    n_slots = 4
    la, lm = len(model.attn_ids), len(model.linear_ids)
    page = 8
    kv0 = jnp.zeros((la, 8, page, 2 * model.num_kv, model.head_dim),
                    jnp.float32)
    conv = jnp.zeros((lm, n_slots, model.d_conv - 1, model.conv_dim),
                     jnp.float32)
    ssm = jnp.zeros((lm, n_slots, model.hv, model.dk, model.dv),
                    jnp.float32)
    kv = (kv0, (conv, ssm))
    t_pad = 16
    bt = np.zeros((4, 4), np.int32)
    bt[0] = [1, 2, 0, 0]
    off = 0
    for chunk in chunks:
        ids = TOKENS[off:off + chunk]
        off += chunk
        meta = make_meta([chunk], t_pad=t_pad)
        sm = np.full(t_pad, -1, np.int32)
        for j in range(chunk):
            pos = off - chunk + j
            sm[j] = (1 + pos // page) * page + pos % page
        meta = meta._replace(
            block_tables=jnp.asarray(bt),
            seq_lens=jnp.asarray([off, 0, 0, 0], jnp.int32),
            slot_mapping=jnp.asarray(sm))
        ids_p = jnp.asarray(ids + [0] * (t_pad - chunk), jnp.int32)
        pos = jnp.asarray(list(range(off - chunk, off)) + [0] *
                          (t_pad - chunk), jnp.int32)
        hidden, kv = model(params, ids_p, pos, kv, meta,
                           use_pallas=False)
    logits = model.compute_logits(params, hidden[:chunk])
    return np.asarray(logits)


def test_qwen3_next_prefill_parity(tmp_path):
    import torch

    path, hf = build_qwen3_next(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_qwen3_next(path, [len(TOKENS)])
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_qwen3_next_chunked_state_carry(tmp_path):
    import torch

    path, hf = build_qwen3_next(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_qwen3_next(path, [6, 4])
    np.testing.assert_allclose(got, ref[6:], atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------------------
# MiniMax: lightning attention + full attention hybrid (HF parity)
# ---------------------------------------------------------------------------


def build_minimax(tmp_path):
    import torch
    import transformers

    cfg = transformers.MiniMaxConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, num_local_experts=4,
        num_experts_per_tok=2, block_size=8,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention", "full_attention"],
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.MiniMaxForCausalLM(cfg).to(
        torch.float32).eval()
    path = tmp_path / "minimax"
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def run_minimax(model_dir, chunks):
    from jax.sharding import Mesh

    config = ModelConfig(model=model_dir, dtype="float32",
                         max_model_len=128)
    model = create_model(config)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, config, mesh)
    n_slots = 4
    la, lm = len(model.attn_ids), len(model.linear_ids)
    page = 8
    kv0 = jnp.zeros((la, 8, page, 2 * model.num_kv, model.head_dim),
                    jnp.float32)
    ssm = jnp.zeros((lm, n_slots, model.num_q, model.head_dim,
                     model.head_dim), jnp.float32)
    kv = (kv0, (ssm, ))
    t_pad = 16
    bt = np.zeros((4, 4), np.int32)
    bt[0] = [1, 2, 0, 0]
    off = 0
    for chunk in chunks:
        ids = TOKENS[off:off + chunk]
        off += chunk
        meta = make_meta([chunk], t_pad=t_pad)
        sm = np.full(t_pad, -1, np.int32)
        for j in range(chunk):
            pos = off - chunk + j
            sm[j] = (1 + pos // page) * page + pos % page
        meta = meta._replace(
            block_tables=jnp.asarray(bt),
            seq_lens=jnp.asarray([off, 0, 0, 0], jnp.int32),
            slot_mapping=jnp.asarray(sm))
        ids_p = jnp.asarray(ids + [0] * (t_pad - chunk), jnp.int32)
        pos = jnp.asarray(list(range(off - chunk, off)) + [0] *
                          (t_pad - chunk), jnp.int32)
        hidden, kv = model(params, ids_p, pos, kv, meta,
                           use_pallas=False)
    logits = model.compute_logits(params, hidden[:chunk])
    return np.asarray(logits)


def test_minimax_prefill_parity(tmp_path):
    import torch

    path, hf = build_minimax(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_minimax(path, [len(TOKENS)])
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_minimax_chunked_state_carry(tmp_path):
    import torch

    path, hf = build_minimax(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_minimax(path, [6, 4])
    np.testing.assert_allclose(got, ref[6:], atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------------
# Zamba2: mamba2 backbone + cyclically-shared 2H-wide transformer
# blocks with per-use adapters (checkpoint stores each tied block once,
# at its first hybrid layer — saved here by data_ptr dedup, matching
# the hub layout)


def build_zamba2(tmp_path, ngroups=1):
    import safetensors.torch as stt
    import torch
    import transformers

    cfg = transformers.Zamba2Config(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=6, num_attention_heads=4,
        num_key_value_heads=4, mamba_d_state=16, mamba_d_conv=4,
        mamba_expand=2, mamba_ngroups=ngroups, n_mamba_heads=4,
        num_mem_blocks=2, use_mem_rope=True,
        use_shared_attention_adapter=True, adapter_rank=8,
        max_position_embeddings=128, chunk_size=8,
        layers_block_type=["mamba", "hybrid", "mamba", "hybrid",
                           "mamba", "hybrid"])
    torch.manual_seed(0)
    model = transformers.Zamba2ForCausalLM(cfg).to(torch.float32).eval()
    path = tmp_path / f"zamba2-g{ngroups}"
    path.mkdir()
    seen, sd = set(), {}
    for k, v in model.state_dict().items():
        p = v.data_ptr()
        if p in seen:
            continue  # tied block alias: keep first-usage path only
        seen.add(p)
        sd[k] = v.contiguous()
    stt.save_file(sd, str(path / "model.safetensors"))
    cfg.architectures = ["Zamba2ForCausalLM"]
    cfg.save_pretrained(path)
    return str(path), model


def run_zamba2(model_dir, chunks):
    from jax.sharding import Mesh

    config = ModelConfig(model=model_dir, dtype="float32",
                         max_model_len=128)
    model = create_model(config)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, config, mesh)
    n_slots = 4
    page = 8
    kv0 = jnp.zeros((model.G, 8, page, 2 * model.num_kv,
                     model.head_dim), jnp.float32)
    conv = jnp.zeros((model.L, n_slots, model.d_conv - 1,
                      model.conv_dim), jnp.float32)
    ssm = jnp.zeros((model.L, n_slots, model.m_heads,
                     model.m_head_dim, model.d_state), jnp.float32)
    kv = (kv0, (conv, ssm))
    t_pad = 16
    bt = np.zeros((4, 4), np.int32)
    bt[0] = [1, 2, 0, 0]
    off = 0
    for chunk in chunks:
        ids = TOKENS[off:off + chunk]
        off += chunk
        meta = make_meta([chunk], t_pad=t_pad)
        sm = np.full(t_pad, -1, np.int32)
        for j in range(chunk):
            pos = off - chunk + j
            sm[j] = (1 + pos // page) * page + pos % page
        meta = meta._replace(
            block_tables=jnp.asarray(bt),
            seq_lens=jnp.asarray([off, 0, 0, 0], jnp.int32),
            slot_mapping=jnp.asarray(sm))
        ids_p = jnp.asarray(ids + [0] * (t_pad - chunk), jnp.int32)
        pos = jnp.asarray(list(range(off - chunk, off)) + [0] *
                          (t_pad - chunk), jnp.int32)
        hidden, kv = model(params, ids_p, pos, kv, meta,
                           use_pallas=False)
    logits = model.compute_logits(params, hidden[:chunk])
    return np.asarray(logits)


def test_zamba2_prefill_parity(tmp_path):
    import torch

    path, hf = build_zamba2(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_zamba2(path, [len(TOKENS)])
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_zamba2_chunked_state_carry(tmp_path):
    import torch

    path, hf = build_zamba2(tmp_path)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_zamba2(path, [7, 3])
    np.testing.assert_allclose(got, ref[7:], atol=2e-3, rtol=2e-3)


def test_zamba2_grouped_norm_parity(tmp_path):
    """mamba_ngroups=2: the gated norm variance is per-group
    (Zamba2RMSNormGated group_size = d_inner // ngroups)."""
    import torch

    path, hf = build_zamba2(tmp_path, ngroups=2)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = run_zamba2(path, [len(TOKENS)])
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_zamba2_engine_greedy_match(tmp_path):
    """Full engine drive: hybrid layers hold BOTH an attention-KV page
    chain (group 0) and a mamba state slot (group 1) — the overlapping
    group bookkeeping only gets exercised through the runner."""
    import torch

    from tests.conftest import _save_tiny_tokenizer
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    path, hf = build_zamba2(tmp_path)
    import pathlib
    _save_tiny_tokenizer(pathlib.Path(path))
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=64)
    prompts = [[3, 17, 91, 200, 45], [7, 150, 33]]
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                        SamplingParams(temperature=0.0, max_tokens=8,
                                       ignore_eos=True))
    for p, o in zip(prompts, outs):
        with torch.no_grad():
            gen = hf.generate(input_ids=torch.tensor([p]),
                              max_new_tokens=8, do_sample=False,
                              eos_token_id=None, pad_token_id=0)
        assert list(o.outputs[0].token_ids) == gen[0, len(p):].tolist()
