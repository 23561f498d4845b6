"""Parity for Llama-graph variants (models/llama_variants.py):
Solar (bskcn), TeleFLM (µP), TeleChat2 (layout + o/down biases),
MiniCPM (scalars, dense + MoE), Orion (LayerNorm llama).

These are trust-remote-code families; parity comes from checkpoint
CONVERSION of tiny HF Llama/Mixtral models plus a manual torch oracle
that re-runs the HF layer modules with the variant's residual
arithmetic applied outside them."""

import json
import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")

TOKENS = [3, 17, 91, 200, 45, 12, 7, 150, 33, 99]
KW = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
          num_hidden_layers=2, num_attention_heads=4,
          num_key_value_heads=2, max_position_embeddings=128,
          tie_word_embeddings=False)


def _build_llama(tmp_path):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(**KW)).to(torch.float32).eval()
    d = tmp_path / "src-llama"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def _write(dst, tensors, cfg_extra, archs):
    import safetensors.numpy as stn

    dst.mkdir(exist_ok=True)
    stn.save_file(tensors, str(dst / "model.safetensors"))
    cfg = dict(KW, model_type="llama", architectures=archs,
               rms_norm_eps=1e-6, rope_theta=10000.0, **cfg_extra)
    (dst / "config.json").write_text(json.dumps(cfg))


def _run_ours(model_dir):
    from tests.models.test_model_families import run_ours

    return run_ours(str(model_dir), TOKENS)


def _oracle(hf, residual_mult=1.0, embed_mult=1.0, logits_mult=1.0,
            o_bias=None, down_bias=None, bskcn=None, norm_fn=None):
    """Manual layer loop over the HF Llama modules, with the variant's
    scalar multipliers / extra biases / Solar skip-blending applied in
    the residual arithmetic (the parts HF's black-box forward can't
    express)."""
    import torch

    m = hf.model
    ids = torch.tensor([TOKENS])
    T = ids.shape[1]
    with torch.no_grad():
        x = m.embed_tokens(ids) * embed_mult
        pe = m.rotary_emb(x, torch.arange(T)[None])
        mask = torch.triu(
            torch.full((T, T), float("-inf")), diagonal=1)[None, None]
        s1 = s2 = None
        for li, lyr in enumerate(m.layers):
            if bskcn is not None:
                b1, b2, b3, b4, tv = bskcn
                if li in b3:
                    x = s1 * tv + x * (1 - tv)
                if li in b4:
                    x = s2 * tv + x * (1 - tv)
                if li in b1:
                    s1 = x.clone()
                if li in b2:
                    s2 = x.clone()
            h = norm_fn(x, lyr.input_layernorm) if norm_fn else \
                lyr.input_layernorm(x)
            attn_out = lyr.self_attn(hidden_states=h,
                                     position_embeddings=pe,
                                     attention_mask=mask)[0]
            if o_bias is not None:
                attn_out = attn_out + o_bias[li]
            x = x + attn_out * residual_mult
            h = norm_fn(x, lyr.post_attention_layernorm) if norm_fn \
                else lyr.post_attention_layernorm(x)
            mlp_out = lyr.mlp(h)
            if down_bias is not None:
                mlp_out = mlp_out + down_bias[li]
            x = x + mlp_out * residual_mult
        x = norm_fn(x, m.norm) if norm_fn else m.norm(x)
        logits = hf.lm_head(x) * logits_mult
    return logits[0].float().numpy()


def _llama_sd(src_dir):
    import safetensors.numpy as stn

    return stn.load_file(str(src_dir / "model.safetensors"))


def test_minicpm_neutral_matches_llama(tmp_path):
    import torch

    src, hf = _build_llama(tmp_path)
    dst = tmp_path / "minicpm"
    # neutral scalars: scale_emb=1, scale_depth=sqrt(L), dmb=hidden
    _write(dst, _llama_sd(src),
           dict(scale_emb=1.0, scale_depth=math.sqrt(2),
                dim_model_base=64), ["MiniCPMForCausalLM"])
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    np.testing.assert_allclose(_run_ours(dst), ref, atol=2e-3,
                               rtol=2e-3)


def test_minicpm_scalars(tmp_path):
    src, hf = _build_llama(tmp_path)
    dst = tmp_path / "minicpm-s"
    _write(dst, _llama_sd(src),
           dict(scale_emb=2.0, scale_depth=1.4, dim_model_base=32),
           ["MiniCPMForCausalLM"])
    ref = _oracle(hf, residual_mult=1.4 / math.sqrt(2),
                  embed_mult=2.0, logits_mult=32 / 64)
    np.testing.assert_allclose(_run_ours(dst), ref, atol=2e-3,
                               rtol=2e-3)


def test_teleflm_mup(tmp_path):
    src, hf = _build_llama(tmp_path)
    dst = tmp_path / "teleflm"
    _write(dst, _llama_sd(src),
           dict(use_mup=True, input_mult=3.0, output_mult=0.5,
                mup_scale_factor=2.0), ["TeleFLMForCausalLM"])
    ref = _oracle(hf, embed_mult=3.0, logits_mult=0.5 / 2.0)
    np.testing.assert_allclose(_run_ours(dst), ref, atol=2e-3,
                               rtol=2e-3)


def test_solar_bskcn(tmp_path):
    src, hf = _build_llama(tmp_path)
    dst = tmp_path / "solar"
    bskcn = dict(bskcn_1=[0], bskcn_2=[], bskcn_3=[1], bskcn_4=[],
                 bskcn_tv=[0.9, 0.8])
    _write(dst, _llama_sd(src), bskcn, ["SolarForCausalLM"])
    ref = _oracle(hf, bskcn=([0], [], [1], [], 0.8))
    np.testing.assert_allclose(_run_ours(dst), ref, atol=2e-3,
                               rtol=2e-3)


def test_telechat2_layout_and_biases(tmp_path):
    import torch

    src, hf = _build_llama(tmp_path)
    sd = _llama_sd(src)
    rng = np.random.RandomState(7)
    out = {"transformer.word_embeddings.weight":
           sd["model.embed_tokens.weight"],
           "transformer.ln_f.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    o_biases, d_biases = [], []
    for l in range(KW["num_hidden_layers"]):
        p = f"model.layers.{l}."
        e = f"transformer.h.{l}."
        k = sd[p + "self_attn.k_proj.weight"].reshape(2, 16, 64)
        v = sd[p + "self_attn.v_proj.weight"].reshape(2, 16, 64)
        # per-head k/v interleave (telechat2.py:76-92)
        out[e + "self_attention.key_value.weight"] = np.stack(
            [k, v], axis=1).reshape(-1, 64)
        out[e + "self_attention.query.weight"] = \
            sd[p + "self_attn.q_proj.weight"]
        out[e + "self_attention.dense.weight"] = \
            sd[p + "self_attn.o_proj.weight"]
        ob = rng.randn(64).astype(np.float32) * 0.1
        db = rng.randn(64).astype(np.float32) * 0.1
        out[e + "self_attention.dense.bias"] = ob
        out[e + "mlp.down_proj.bias"] = db
        o_biases.append(torch.tensor(ob))
        d_biases.append(torch.tensor(db))
        for name in ("gate_proj", "up_proj", "down_proj"):
            out[e + f"mlp.{name}.weight"] = sd[p + f"mlp.{name}.weight"]
        out[e + "input_layernorm.weight"] = \
            sd[p + "input_layernorm.weight"]
        out[e + "post_attention_layernorm.weight"] = \
            sd[p + "post_attention_layernorm.weight"]
    dst = tmp_path / "telechat2"
    _write(dst, out, {}, ["TeleChat2ForCausalLM"])
    ref = _oracle(hf, o_bias=o_biases, down_bias=d_biases)
    np.testing.assert_allclose(_run_ours(dst), ref, atol=2e-3,
                               rtol=2e-3)


def test_orion_layernorm(tmp_path):
    import torch
    import torch.nn.functional as F

    src, hf = _build_llama(tmp_path)
    sd = dict(_llama_sd(src))
    rng = np.random.RandomState(3)
    # add LayerNorm biases + re-center weights (llama RMSNorm weights
    # work fine as LN weights for a parity check)
    biases = {}
    for key in list(sd):
        if "layernorm" in key or key == "model.norm.weight":
            b = rng.randn(64).astype(np.float32) * 0.05
            sd[key.replace(".weight", ".bias")] = b
            biases[key.replace(".weight", "")] = torch.tensor(b)
    dst = tmp_path / "orion"
    _write(dst, sd, {}, ["OrionForCausalLM"])

    def ln(x, mod):
        name = [k for k, v in _mods.items() if v is mod][0]
        return F.layer_norm(x, (64, ), mod.weight, biases[name], 1e-6)

    _mods = {"model.layers.0.input_layernorm":
             hf.model.layers[0].input_layernorm,
             "model.layers.0.post_attention_layernorm":
             hf.model.layers[0].post_attention_layernorm,
             "model.layers.1.input_layernorm":
             hf.model.layers[1].input_layernorm,
             "model.layers.1.post_attention_layernorm":
             hf.model.layers[1].post_attention_layernorm,
             "model.norm": hf.model.norm}
    ref = _oracle(hf, norm_fn=ln)
    np.testing.assert_allclose(_run_ours(dst), ref, atol=2e-3,
                               rtol=2e-3)


def test_minicpm_moe_from_mixtral(tmp_path):
    """MiniCPM-MoE layout = Mixtral experts re-keyed under
    ``mlp.experts.{e}.w1/w2/w3`` + ``mlp.gate`` with neutral scalars:
    logits must match HF Mixtral exactly."""
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(0)
    cfg = MixtralConfig(**KW, num_local_experts=4,
                        num_experts_per_tok=2)
    hf = MixtralForCausalLM(cfg).to(torch.float32).eval()
    d = tmp_path / "src-mixtral"
    hf.save_pretrained(d, safe_serialization=True)
    import safetensors.numpy as stn

    sd = stn.load_file(str(d / "model.safetensors"))
    out = {}
    for k, val in sd.items():
        k2 = k.replace("block_sparse_moe.gate", "mlp.gate")
        k2 = k2.replace("block_sparse_moe.experts", "mlp.experts")
        out[k2] = val
    dst = tmp_path / "minicpm-moe"
    dst.mkdir()
    stn.save_file(out, str(dst / "model.safetensors"))
    cj = dict(KW, model_type="llama", architectures=
              ["MiniCPMForCausalLM"], rms_norm_eps=1e-5,
              rope_theta=10000.0, num_experts=4,
              num_experts_per_tok=2, scale_emb=1.0,
              scale_depth=math.sqrt(2), dim_model_base=64)
    (dst / "config.json").write_text(json.dumps(cj))
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    np.testing.assert_allclose(_run_ours(dst), ref, atol=2e-3,
                               rtol=2e-3)


def test_registry_aliases():
    from vllm_main_modify_tpu.models.registry import resolve_model_cls

    for arch in ("MiMoForCausalLM", "GritLM", "SolarForCausalLM",
                 "OrionForCausalLM", "TeleChat2ForCausalLM",
                 "TeleFLMForCausalLM", "MiniCPMForCausalLM"):
        assert resolve_model_cls(arch) is not None


def test_chatglm_layout_and_half_rope(tmp_path):
    """ChatGLM2/3: packed query_key_value + fused dense_h_to_4h +
    half-dim interleaved rope vs a manual torch oracle."""
    import torch
    import torch.nn.functional as F

    import safetensors.torch as stt

    torch.manual_seed(0)
    H, I, nh, kvh, hd, V, L = 64, 96, 4, 2, 16, 256, 2
    qd, kd = nh * hd, kvh * hd
    sd = {}
    sd["transformer.embedding.word_embeddings.weight"] = \
        torch.randn(V, H) * 0.2
    sd["transformer.encoder.final_layernorm.weight"] = \
        torch.rand(H) * 0.5 + 0.75
    sd["transformer.output_layer.weight"] = torch.randn(V, H) * 0.2
    for l in range(L):
        p = f"transformer.encoder.layers.{l}."
        sd[p + "input_layernorm.weight"] = torch.rand(H) * 0.5 + 0.75
        sd[p + "post_attention_layernorm.weight"] = \
            torch.rand(H) * 0.5 + 0.75
        sd[p + "self_attention.query_key_value.weight"] = \
            torch.randn(qd + 2 * kd, H) * 0.1
        sd[p + "self_attention.query_key_value.bias"] = \
            torch.randn(qd + 2 * kd) * 0.1
        sd[p + "self_attention.dense.weight"] = \
            torch.randn(H, qd) * 0.1
        sd[p + "mlp.dense_h_to_4h.weight"] = \
            torch.randn(2 * I, H) * 0.1
        sd[p + "mlp.dense_4h_to_h.weight"] = torch.randn(H, I) * 0.1
    d = tmp_path / "chatglm"
    d.mkdir()
    stt.save_file({k: v.contiguous() for k, v in sd.items()},
                  str(d / "model.safetensors"))
    import json

    cfg = dict(model_type="llama", architectures=["ChatGLMModel"],
               hidden_size=H, num_attention_heads=nh,
               num_layers=L, padded_vocab_size=V, vocab_size=V,
               ffn_hidden_size=I, kv_channels=hd,
               multi_query_attention=True, multi_query_group_num=kvh,
               layernorm_epsilon=1e-5, add_qkv_bias=True,
               add_bias_linear=False, original_rope=True,
               rope_ratio=1.0, max_position_embeddings=128,
               num_hidden_layers=L, tie_word_embeddings=False)
    (d / "config.json").write_text(json.dumps(cfg))

    # torch oracle
    def rmsnorm(x, w):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-5)
        return v * w

    def glm_rope(x, pos):
        rot = hd // 2
        inv = 1.0 / (10000.0 ** (torch.arange(0, rot, 2).float() /
                                 rot))
        ang = pos[:, None].float() * inv[None]
        cos, sin = ang.cos()[:, None], ang.sin()[:, None]
        xr, xp = x[..., :rot], x[..., rot:]
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
        o = torch.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                        dim=-1).reshape(xr.shape)
        return torch.cat([o, xp], dim=-1)

    T = len(TOKENS)
    with torch.no_grad():
        x = sd["transformer.embedding.word_embeddings.weight"][
            torch.tensor(TOKENS)]
        pos = torch.arange(T)
        for l in range(L):
            p = f"transformer.encoder.layers.{l}."
            h = rmsnorm(x, sd[p + "input_layernorm.weight"])
            qkv = h @ sd[p + "self_attention.query_key_value"
                         ".weight"].T + \
                sd[p + "self_attention.query_key_value.bias"]
            q = qkv[:, :qd].reshape(T, nh, hd)
            k = qkv[:, qd:qd + kd].reshape(T, kvh, hd)
            v = qkv[:, qd + kd:].reshape(T, kvh, hd)
            q, k = glm_rope(q, pos), glm_rope(k, pos)
            k = k.repeat_interleave(nh // kvh, dim=1)
            v = v.repeat_interleave(nh // kvh, dim=1)
            s = torch.einsum("qhd,khd->hqk", q, k) / (hd ** 0.5)
            mask = torch.triu(torch.full((T, T), float("-inf")),
                              diagonal=1)
            o = torch.einsum("hqk,khd->qhd",
                             F.softmax(s + mask, -1), v).reshape(T, -1)
            x = x + o @ sd[p + "self_attention.dense.weight"].T
            h = rmsnorm(x, sd[p + "post_attention_layernorm.weight"])
            gu = h @ sd[p + "mlp.dense_h_to_4h.weight"].T
            y = F.silu(gu[:, :I]) * gu[:, I:]
            x = x + y @ sd[p + "mlp.dense_4h_to_h.weight"].T
        x = rmsnorm(x, sd["transformer.encoder.final_layernorm"
                          ".weight"])
        ref = (x @ sd["transformer.output_layer.weight"].T).numpy()

    got = _run_ours(d)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_minicpm3_mla_from_deepseek(tmp_path):
    """MiniCPM3 = DeepSeek-V2 MLA + absorbed µP scalars. Oracle: HF
    DeepseekV2 run on a checkpoint with the scalars PRE-applied to its
    weights (mathematically identical — branch outputs scale at their
    output projections)."""
    import torch
    import transformers
    import safetensors.numpy as stn

    kw = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=4, max_position_embeddings=128,
              tie_word_embeddings=False, kv_lora_rank=32,
              q_lora_rank=48, qk_nope_head_dim=16, qk_rope_head_dim=8,
              v_head_dim=16, n_routed_experts=None,
              first_k_dense_replace=2, topk_method="greedy",
              aux_loss_alpha=0.0)
    torch.manual_seed(0)
    cfg = transformers.DeepseekV2Config(**kw)
    hf = transformers.DeepseekV2ForCausalLM(cfg).to(
        torch.float32).eval()
    d = tmp_path / "minicpm3"
    hf.save_pretrained(d, safe_serialization=True)

    scale_emb, scale_depth, dmb = 2.0, 1.4, 32
    s = scale_depth / math.sqrt(2)
    # oracle: pre-scale the HF weights the same way the loader absorbs
    with torch.no_grad():
        hf.model.embed_tokens.weight.mul_(scale_emb)
        for lyr in hf.model.layers:
            lyr.self_attn.o_proj.weight.mul_(s)
            lyr.mlp.down_proj.weight.mul_(s)
        hf.lm_head.weight.mul_(32 / 64)
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()

    raw = json.loads((d / "config.json").read_text())
    raw.update(architectures=["MiniCPM3ForCausalLM"],
               scale_emb=scale_emb, scale_depth=scale_depth,
               dim_model_base=dmb,
               rope_interleave=True)  # align with HF DeepseekV2 rope
    (d / "config.json").write_text(json.dumps(raw))
    got = _run_ours(d)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)
