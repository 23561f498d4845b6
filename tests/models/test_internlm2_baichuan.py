"""InternLM2 / Baichuan parity via checkpoint CONVERSION: these are
trust-remote-code families (no HF classes in this environment), but
they share the Llama graph — so we convert a tiny HF Llama checkpoint
into their tensor layouts (fused interleaved wqkv / W_pack, renamed
keys) and require logits identical to HF Llama on the original."""

import json

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


def _convert(src_dir, dst_dir, arch: str):
    """Re-key a llama checkpoint into internlm2/baichuan layout."""
    import safetensors.numpy as stn

    sd = stn.load_file(str(src_dir / "model.safetensors"))
    h, kvh, hd = 64, 2, 16
    g = 4 // kvh  # q heads per kv head
    out = {}
    for l in range(KW["num_hidden_layers"]):
        p = f"model.layers.{l}."
        q = sd[p + "self_attn.q_proj.weight"]  # [qd, H]
        k = sd[p + "self_attn.k_proj.weight"]
        v = sd[p + "self_attn.v_proj.weight"]
        if arch == "internlm2":
            # per-kv-head interleave: [kvh, g+2, hd, H]
            qh = q.reshape(kvh, g, hd, h)
            kh = k.reshape(kvh, 1, hd, h)
            vh = v.reshape(kvh, 1, hd, h)
            wqkv = np.concatenate([qh, kh, vh], axis=1).reshape(-1, h)
            out[p + "attention.wqkv.weight"] = wqkv
            out[p + "attention.wo.weight"] = \
                sd[p + "self_attn.o_proj.weight"]
            out[p + "feed_forward.w1.weight"] = \
                sd[p + "mlp.gate_proj.weight"]
            out[p + "feed_forward.w3.weight"] = \
                sd[p + "mlp.up_proj.weight"]
            out[p + "feed_forward.w2.weight"] = \
                sd[p + "mlp.down_proj.weight"]
            out[p + "attention_norm.weight"] = \
                sd[p + "input_layernorm.weight"]
            out[p + "ffn_norm.weight"] = \
                sd[p + "post_attention_layernorm.weight"]
        elif arch == "baichuan":  # W_pack = [q; k; v]
            out[p + "self_attn.W_pack.weight"] = np.concatenate(
                [q, k, v], axis=0)
            for name in ("self_attn.o_proj", "mlp.gate_proj",
                         "mlp.up_proj", "mlp.down_proj",
                         "input_layernorm",
                         "post_attention_layernorm"):
                out[p + name + ".weight"] = sd[p + name + ".weight"]
        elif arch == "exaone":
            e = f"transformer.h.{l}."
            out[e + "attn.attention.q_proj.weight"] = q
            out[e + "attn.attention.k_proj.weight"] = k
            out[e + "attn.attention.v_proj.weight"] = v
            out[e + "attn.attention.out_proj.weight"] = \
                sd[p + "self_attn.o_proj.weight"]
            out[e + "mlp.c_fc_0.weight"] = \
                sd[p + "mlp.gate_proj.weight"]
            out[e + "mlp.c_fc_1.weight"] = \
                sd[p + "mlp.up_proj.weight"]
            out[e + "mlp.c_proj.weight"] = \
                sd[p + "mlp.down_proj.weight"]
            out[e + "ln_1.weight"] = sd[p + "input_layernorm.weight"]
            out[e + "ln_2.weight"] = \
                sd[p + "post_attention_layernorm.weight"]
        else:  # qwen v1: fused biased c_attn, w2=gate / w1=up
            e = f"transformer.h.{l}."
            out[e + "attn.c_attn.weight"] = np.concatenate(
                [q, k, v], axis=0)
            out[e + "attn.c_attn.bias"] = np.zeros(
                q.shape[0] + 2 * k.shape[0], np.float32)
            out[e + "attn.c_proj.weight"] = \
                sd[p + "self_attn.o_proj.weight"]
            out[e + "mlp.w2.weight"] = sd[p + "mlp.gate_proj.weight"]
            out[e + "mlp.w1.weight"] = sd[p + "mlp.up_proj.weight"]
            out[e + "mlp.c_proj.weight"] = \
                sd[p + "mlp.down_proj.weight"]
            out[e + "ln_1.weight"] = sd[p + "input_layernorm.weight"]
            out[e + "ln_2.weight"] = \
                sd[p + "post_attention_layernorm.weight"]
    if arch in ("exaone", "qwen_v1"):
        out["transformer.wte.weight"] = \
            sd["model.embed_tokens.weight"]
        out["transformer.ln_f.weight"] = sd["model.norm.weight"]
        out["lm_head.weight"] = sd["lm_head.weight"]
        archs = ["ExaoneForCausalLM"] if arch == "exaone" else \
            ["QWenLMHeadModel"]
    elif arch == "internlm2":
        out["model.tok_embeddings.weight"] = \
            sd["model.embed_tokens.weight"]
        out["model.norm.weight"] = sd["model.norm.weight"]
        out["output.weight"] = sd["lm_head.weight"]
        archs = ["InternLM2ForCausalLM"]
    else:
        out["model.embed_tokens.weight"] = \
            sd["model.embed_tokens.weight"]
        out["model.norm.weight"] = sd["model.norm.weight"]
        out["lm_head.weight"] = sd["lm_head.weight"]
        archs = ["BaiChuanForCausalLM"]
    dst_dir.mkdir(exist_ok=True)
    stn.save_file(out, str(dst_dir / "model.safetensors"))
    cfg = dict(KW, model_type="llama", architectures=archs,
               rms_norm_eps=1e-6, rope_theta=10000.0)
    (dst_dir / "config.json").write_text(json.dumps(cfg))


def _run_ours(model_dir):
    from tests.models.test_model_families import run_ours

    return run_ours(str(model_dir), TOKENS)


@pytest.mark.parametrize("arch", ["internlm2", "baichuan", "exaone", "qwen_v1"])
def test_converted_checkpoint_parity(arch, tmp_path):
    import torch

    src, hf = _build_llama(tmp_path)
    dst = tmp_path / arch
    _convert(src, dst, arch)
    with torch.no_grad():
        ref = hf(torch.tensor([TOKENS])).logits[0].float().numpy()
    got = _run_ours(dst)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_baichuan_13b_alibi_runs(tmp_path):
    """The ALiBi variant (no remote-code reference available here)
    must at least run deterministically end to end; the ALiBi math
    itself is HF-parity-tested via BLOOM."""
    src, _ = _build_llama(tmp_path)
    dst = tmp_path / "baichuan13b"
    _convert(src, dst, "baichuan")
    raw = json.loads((dst / "config.json").read_text())
    raw["architectures"] = ["BaichuanForCausalLM"]
    (dst / "config.json").write_text(json.dumps(raw))
    a = _run_ours(dst)
    b = _run_ours(dst)
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)