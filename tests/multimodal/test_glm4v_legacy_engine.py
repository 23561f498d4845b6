"""Legacy GLM-4V through the engine: EVA2CLIP post-norm tower +
conv-downsample GLU projector over ChatGLM; greedy matches a
hand-stitched torch oracle (reference:
vllm/model_executor/models/glm4v.py — upstream is remote-code-only).
"""

import json

import numpy as np
import pytest
import torch

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 250
S = 32  # patch 8 -> grid 4 -> conv/2 -> 2x2 -> 2 + 4 = 6 tokens
VD = 32
H = 64
I_ = 96
NH, KVH, HD = 4, 2, 16
NTOK = 6


@pytest.fixture(scope="module")
def glm4v_dir(tmp_path_factory):
    from safetensors.torch import save_file

    g = torch.Generator().manual_seed(0)

    def rand(*shape, s=0.08):
        return torch.randn(*shape, generator=g) * s

    sd = {}
    # ---- ChatGLM decoder (layout per models/llama_variants.py) ----
    sd["transformer.embedding.word_embeddings.weight"] = rand(256, H,
                                                              s=0.2)
    sd["transformer.encoder.final_layernorm.weight"] = \
        torch.rand(H, generator=g) * 0.5 + 0.75
    sd["transformer.output_layer.weight"] = rand(256, H, s=0.2)
    qd, kd = NH * HD, KVH * HD
    for l in range(2):
        p = f"transformer.encoder.layers.{l}."
        sd[p + "input_layernorm.weight"] = \
            torch.rand(H, generator=g) * 0.5 + 0.75
        sd[p + "post_attention_layernorm.weight"] = \
            torch.rand(H, generator=g) * 0.5 + 0.75
        sd[p + "self_attention.query_key_value.weight"] = \
            rand(qd + 2 * kd, H)
        sd[p + "self_attention.query_key_value.bias"] = \
            rand(qd + 2 * kd)
        sd[p + "self_attention.dense.weight"] = rand(H, qd)
        sd[p + "mlp.dense_h_to_4h.weight"] = rand(2 * I_, H)
        sd[p + "mlp.dense_4h_to_h.weight"] = rand(H, I_)
    # ---- EVA2CLIP tower ----
    v = "transformer.vision."
    sd[v + "patch_embedding.proj.weight"] = rand(VD, 3, 8, 8)
    sd[v + "patch_embedding.proj.bias"] = rand(VD)
    sd[v + "patch_embedding.cls_embedding"] = rand(1, VD)
    sd[v + "patch_embedding.position_embedding.weight"] = rand(17, VD)
    for l in range(2):
        p = v + f"transformer.layers.{l}."
        sd[p + "input_layernorm.weight"] = \
            torch.rand(VD, generator=g) * 0.5 + 0.75
        sd[p + "input_layernorm.bias"] = rand(VD)
        sd[p + "attention.query_key_value.weight"] = rand(3 * VD, VD)
        sd[p + "attention.query_key_value.bias"] = rand(3 * VD)
        sd[p + "attention.dense.weight"] = rand(VD, VD)
        sd[p + "attention.dense.bias"] = rand(VD)
        sd[p + "post_attention_layernorm.weight"] = \
            torch.rand(VD, generator=g) * 0.5 + 0.75
        sd[p + "post_attention_layernorm.bias"] = rand(VD)
        sd[p + "mlp.fc1.weight"] = rand(2 * VD, VD)
        sd[p + "mlp.fc1.bias"] = rand(2 * VD)
        sd[p + "mlp.fc2.weight"] = rand(VD, 2 * VD)
        sd[p + "mlp.fc2.bias"] = rand(VD)
    sd[v + "conv.weight"] = rand(H, VD, 2, 2)
    sd[v + "conv.bias"] = rand(H)
    sd[v + "boi"] = rand(1, 1, H)
    sd[v + "eoi"] = rand(1, 1, H)
    sd[v + "linear_proj.linear_proj.weight"] = rand(H, H)
    sd[v + "linear_proj.norm1.weight"] = \
        torch.rand(H, generator=g) * 0.5 + 0.75
    sd[v + "linear_proj.norm1.bias"] = rand(H)
    sd[v + "linear_proj.gate_proj.weight"] = rand(I_, H)
    sd[v + "linear_proj.dense_h_to_4h.weight"] = rand(I_, H)
    sd[v + "linear_proj.dense_4h_to_h.weight"] = rand(H, I_)

    path = tmp_path_factory.mktemp("models") / "tiny-glm4v"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: t.contiguous() for k, t in sd.items()},
              str(path / "model.safetensors"))
    cfg = dict(
        model_type="llama", architectures=["GLM4VForCausalLM"],
        hidden_size=H, num_attention_heads=NH, num_layers=2,
        padded_vocab_size=256, vocab_size=256, ffn_hidden_size=I_,
        kv_channels=HD, multi_query_attention=True,
        multi_query_group_num=KVH, layernorm_epsilon=1e-5,
        add_qkv_bias=True, add_bias_linear=False, original_rope=True,
        rope_ratio=1.0, max_position_embeddings=128,
        num_hidden_layers=2, tie_word_embeddings=False,
        image_token_id=IMG_TOK,
        vision_config=dict(hidden_size=VD, num_heads=4,
                           num_hidden_layers=2, intermediate_size=64,
                           image_size=S, patch_size=8,
                           num_positions=17, scaling_factor=8.0))
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), {k: t.float() for k, t in sd.items()}


def _tower(sd, pix):
    v = "transformer.vision."
    x = torch.nn.functional.conv2d(
        pix[None], sd[v + "patch_embedding.proj.weight"],
        sd[v + "patch_embedding.proj.bias"], stride=8)
    x = x.flatten(2).transpose(1, 2)
    x = torch.cat([sd[v + "patch_embedding.cls_embedding"][None], x],
                  1)
    x = x + sd[v + "patch_embedding.position_embedding.weight"][None]
    for l in range(2):
        p = v + f"transformer.layers.{l}."
        t = x.shape[1]
        qkv = (x @ sd[p + "attention.query_key_value.weight"].T +
               sd[p + "attention.query_key_value.bias"]).reshape(
                   1, t, 3, 4, VD // 4)
        q, k, val = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        s = torch.einsum("nqhd,nkhd->nhqk", q, k) * (VD // 4)**-0.5
        a = torch.softmax(s, -1)
        o = torch.einsum("nhqk,nkhd->nqhd", a, val).reshape(1, t, VD)
        o = o @ sd[p + "attention.dense.weight"].T + \
            sd[p + "attention.dense.bias"]
        x = x + torch.nn.functional.layer_norm(
            o, (VD, ), sd[p + "input_layernorm.weight"],
            sd[p + "input_layernorm.bias"], 1e-5)
        m = torch.nn.functional.gelu(
            x @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"])
        m = m @ sd[p + "mlp.fc2.weight"].T + sd[p + "mlp.fc2.bias"]
        x = x + torch.nn.functional.layer_norm(
            m, (VD, ), sd[p + "post_attention_layernorm.weight"],
            sd[p + "post_attention_layernorm.bias"], 1e-5)
    x = x[:, 1:].reshape(1, 4, 4, VD).permute(0, 3, 1, 2)
    x = torch.nn.functional.conv2d(x, sd[v + "conv.weight"],
                                   sd[v + "conv.bias"], stride=2)
    x = x.flatten(2).transpose(1, 2)  # [1, 4, H]
    x = x @ sd[v + "linear_proj.linear_proj.weight"].T
    x = torch.nn.functional.gelu(torch.nn.functional.layer_norm(
        x, (H, ), sd[v + "linear_proj.norm1.weight"],
        sd[v + "linear_proj.norm1.bias"], 1e-5))
    x = torch.nn.functional.silu(
        x @ sd[v + "linear_proj.gate_proj.weight"].T) * \
        (x @ sd[v + "linear_proj.dense_h_to_4h.weight"].T)
    x = x @ sd[v + "linear_proj.dense_4h_to_h.weight"].T
    x = torch.cat([sd[v + "boi"], x, sd[v + "eoi"]], 1)
    return (x / 8.0)[0]


def _decoder_greedy(sd, emb, n_new, embed_table):
    """ChatGLM decoder greedy over inputs embeddings (half-dim
    interleaved rope, MQA, swiglu fused dense_h_to_4h)."""
    qd, kd = NH * HD, KVH * HD

    def rms(x, w):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-5)
        return v * w

    def rope(x, pos):
        rot = HD // 2
        inv = 1.0 / (10000.0**(torch.arange(0, rot, 2).float() / rot))
        ang = pos[:, None].float() * inv[None]
        cos, sin = ang.cos()[:, None], ang.sin()[:, None]
        xr, xp = x[..., :rot], x[..., rot:]
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
        o = torch.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                        dim=-1).reshape(xr.shape)
        return torch.cat([o, xp], -1)

    out_ids = []
    x0 = emb
    for _ in range(n_new):
        T = x0.shape[0]
        pos = torch.arange(T)
        x = x0
        for l in range(2):
            p = f"transformer.encoder.layers.{l}."
            res = x
            h = rms(x, sd[p + "input_layernorm.weight"])
            qkv = h @ sd[p + "self_attention.query_key_value"
                         ".weight"].T + \
                sd[p + "self_attention.query_key_value.bias"]
            q = qkv[:, :qd].reshape(T, NH, HD)
            k = qkv[:, qd:qd + kd].reshape(T, KVH, HD)
            v = qkv[:, qd + kd:].reshape(T, KVH, HD)
            q, k = rope(q, pos), rope(k, pos)
            k = k.repeat_interleave(NH // KVH, dim=1)
            v = v.repeat_interleave(NH // KVH, dim=1)
            s = torch.einsum("qhd,khd->hqk", q, k) * HD**-0.5
            mask = torch.full((T, T), float("-inf")).triu(1)
            a = torch.softmax(s + mask, -1)
            o = torch.einsum("hqk,khd->qhd", a, v).reshape(T, qd)
            x = res + o @ sd[p + "self_attention.dense.weight"].T
            res = x
            h = rms(x, sd[p + "post_attention_layernorm.weight"])
            gu = h @ sd[p + "mlp.dense_h_to_4h.weight"].T
            h = torch.nn.functional.silu(gu[:, :I_]) * gu[:, I_:]
            x = res + h @ sd[p + "mlp.dense_4h_to_h.weight"].T
        x = rms(x, sd["transformer.encoder.final_layernorm.weight"])
        logits = x @ sd["transformer.output_layer.weight"].T
        nxt = int(logits[-1].argmax())
        out_ids.append(nxt)
        x0 = torch.cat([x0, embed_table[nxt][None]], 0)
    return out_ids


def test_glm4v_legacy_matches_oracle(glm4v_dir):
    path, sd = glm4v_dir
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    engine = LLM(model=path, dtype="float32", max_model_len=128,
                 max_num_seqs=2, max_num_batched_tokens=64,
                 block_size=4, num_kv_blocks=128)
    out = engine.generate(
        [{"prompt_token_ids": [5, IMG_TOK, 9, 42],
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    with torch.no_grad():
        img = _tower(sd, torch.tensor(pix))  # [6, H]
        table = sd["transformer.embedding.word_embeddings.weight"]
        ids = [5] + [IMG_TOK] * NTOK + [9, 42]
        emb = table[torch.tensor(ids)].clone()
        emb[1:1 + NTOK] = img
        ref = _decoder_greedy(sd, emb, 8, table)
    assert list(out.outputs[0].token_ids) == ref
