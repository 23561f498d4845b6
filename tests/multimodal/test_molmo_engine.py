"""Molmo through the engine: CLIP ViT with two-layer feature concat +
2x2 attention pooling + SwiGLU projector over the OLMo-style decoder
(fused att_proj/ff_proj, full-width q/k norms, MulAndSilu MLP); greedy
matches a hand-stitched torch oracle (reference:
vllm/model_executor/models/molmo.py — upstream is remote-code-only)."""

import json

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 300  # lives in the new_embedding range (>= 256)
S = 32  # patch 8 → grid 4 → pooled 2 → 4 tokens
VD = 32
VH = 2
VL = 3  # vit layers; VIT_LAYERS [-2, -9] → layers 1 and 0
H = 64
NH = 4
NKV = 2
DH = 16
FF = 128  # fused ff width (halves of 64)
NTOK = 4


@pytest.fixture(scope="module", params=[False, True],
                ids=["norm_before", "norm_after"])
def molmo_dir(tmp_path_factory, request):
    import torch
    from safetensors.torch import save_file

    norm_after = request.param
    g = torch.Generator().manual_seed(3 if norm_after else 0)

    def rand(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    qd, kd = NH * DH, NKV * DH
    sd = {"model.transformer.wte.embedding": rand(256, H),
          "model.transformer.wte.new_embedding": rand(128, H),
          "model.transformer.ln_f.weight": torch.ones(H) + rand(H),
          "model.transformer.ff_out.weight": rand(256, H)}
    for i in range(2):
        p = f"model.transformer.blocks.{i}."
        sd[p + "attn_norm.weight"] = torch.ones(H) + rand(H)
        sd[p + "ff_norm.weight"] = torch.ones(H) + rand(H)
        sd[p + "att_proj.weight"] = rand(qd + 2 * kd, H)
        sd[p + "att_proj.bias"] = rand(qd + 2 * kd)
        sd[p + "attn_out.weight"] = rand(H, qd)
        sd[p + "q_norm.weight"] = torch.ones(qd) + rand(qd)
        sd[p + "k_norm.weight"] = torch.ones(kd) + rand(kd)
        sd[p + "ff_proj.weight"] = rand(FF, H)
        sd[p + "ff_out.weight"] = rand(H, FF // 2)
    vb = "model.vision_backbone."
    sd[vb + "image_vit.class_embedding"] = rand(VD)
    sd[vb + "image_vit.positional_embedding"] = rand(17, VD)
    sd[vb + "image_vit.patch_embedding.weight"] = rand(VD, 3 * 64)
    sd[vb + "image_vit.pre_ln.weight"] = torch.ones(VD) + rand(VD)
    sd[vb + "image_vit.pre_ln.bias"] = rand(VD)
    for i in range(VL):
        p = vb + f"image_vit.transformer.resblocks.{i}."
        for n in ("wq", "wk", "wv", "wo"):
            sd[p + f"attention.{n}.weight"] = rand(VD, VD)
            sd[p + f"attention.{n}.bias"] = rand(VD)
        sd[p + "attention_norm.weight"] = torch.ones(VD) + rand(VD)
        sd[p + "attention_norm.bias"] = rand(VD)
        sd[p + "ffn_norm.weight"] = torch.ones(VD) + rand(VD)
        sd[p + "ffn_norm.bias"] = rand(VD)
        sd[p + "feed_forward.w1.weight"] = rand(2 * VD, VD)
        sd[p + "feed_forward.w1.bias"] = rand(2 * VD)
        sd[p + "feed_forward.w2.weight"] = rand(VD, 2 * VD)
        sd[p + "feed_forward.w2.bias"] = rand(VD)
    for n in ("wq", "wk", "wv"):
        sd[vb + f"image_pooling_2d.{n}.weight"] = rand(VD, 2 * VD)
        sd[vb + f"image_pooling_2d.{n}.bias"] = rand(VD)
    sd[vb + "image_pooling_2d.wo.weight"] = rand(VD, VD)
    sd[vb + "image_pooling_2d.wo.bias"] = rand(VD)
    sd[vb + "image_projector.w1.weight"] = rand(FF // 2, VD)
    sd[vb + "image_projector.w3.weight"] = rand(FF // 2, VD)
    sd[vb + "image_projector.w2.weight"] = rand(H, FF // 2)

    path = tmp_path_factory.mktemp("models") / \
        f"tiny-molmo-{norm_after}"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(path / "model.safetensors"))
    cfg = {
        "architectures": ["MolmoForCausalLM"],
        "model_type": "molmo",
        "vocab_size": 256, "embedding_size": 256, "hidden_size": H,
        "intermediate_size": FF, "num_hidden_layers": 2,
        "num_attention_heads": NH, "num_key_value_heads": NKV,
        "max_position_embeddings": 128, "rope_theta": 10000.0,
        "layer_norm_eps": 1e-5, "layer_norm_type": "rms",
        "qkv_bias": True, "attention_layer_norm": True,
        "norm_after": norm_after,
        "image_token_index": IMG_TOK,
        "vision_config": {"image_emb_dim": VD, "image_num_heads": VH,
                          "image_num_key_value_heads": VH,
                          "image_num_layers": VL,
                          "image_mlp_dim": 2 * VD,
                          "image_patch_size": 8,
                          "image_default_input_size": [S, S],
                          "image_norm_eps": 1e-5},
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), {k: v.float() for k, v in sd.items()}, \
        norm_after


def _vit_attn(sd, prefix, q_in, kv_in):
    import torch

    dh = VD // VH
    tq, tk = q_in.shape[0], kv_in.shape[0]
    q = (q_in @ sd[prefix + "wq.weight"].T +
         sd[prefix + "wq.bias"]).reshape(tq, VH, dh)
    k = (kv_in @ sd[prefix + "wk.weight"].T +
         sd[prefix + "wk.bias"]).reshape(tk, VH, dh)
    v = (kv_in @ sd[prefix + "wv.weight"].T +
         sd[prefix + "wv.bias"]).reshape(tk, VH, dh)
    s = torch.einsum("qhd,khd->hqk", q, k) * dh**-0.5
    o = torch.einsum("hqk,khd->qhd", torch.softmax(s, -1),
                     v).reshape(tq, VD)
    return o @ sd[prefix + "wo.weight"].T + sd[prefix + "wo.bias"]


def _tower(sd, pix):
    import torch

    g = 4
    vb = "model.vision_backbone."
    ln = torch.nn.functional.layer_norm
    x = pix.reshape(3, g, 8, g, 8).permute(1, 3, 0, 2, 4).reshape(
        g * g, 3 * 64)
    x = x @ sd[vb + "image_vit.patch_embedding.weight"].T
    x = torch.cat([sd[vb + "image_vit.class_embedding"][None], x], 0)
    x = x + sd[vb + "image_vit.positional_embedding"]
    x = ln(x, (VD, ), sd[vb + "image_vit.pre_ln.weight"],
           sd[vb + "image_vit.pre_ln.bias"], 1e-5)
    feats = []
    for i in range(VL):
        p = vb + f"image_vit.transformer.resblocks.{i}."
        h = ln(x, (VD, ), sd[p + "attention_norm.weight"],
               sd[p + "attention_norm.bias"], 1e-5)
        x = x + _vit_attn(sd, p + "attention.", h, h)
        h = ln(x, (VD, ), sd[p + "ffn_norm.weight"],
               sd[p + "ffn_norm.bias"], 1e-5)
        h = h @ sd[p + "feed_forward.w1.weight"].T + \
            sd[p + "feed_forward.w1.bias"]
        h = h * torch.sigmoid(1.702 * h)
        x = x + (h @ sd[p + "feed_forward.w2.weight"].T +
                 sd[p + "feed_forward.w2.bias"])
        feats.append(x)
    # VIT_LAYERS [-2, -9] → [1, 0] for 3 layers
    f = torch.cat([feats[-2 % VL], feats[-9 % VL]], -1)[1:]
    f = f.reshape(2, 2, 2, 2, 2 * VD).permute(0, 2, 1, 3, 4).reshape(
        4, 4, 2 * VD)
    outs = []
    for b in range(4):
        blk = f[b]
        q = blk.mean(0, keepdim=True)
        outs.append(
            _vit_attn(sd, vb + "image_pooling_2d.", q, blk)[0])
    pooled = torch.stack(outs)
    y = torch.nn.functional.silu(
        pooled @ sd[vb + "image_projector.w1.weight"].T) * \
        (pooled @ sd[vb + "image_projector.w3.weight"].T)
    return y @ sd[vb + "image_projector.w2.weight"].T


def _text_oracle(sd, ids_seed, img, n_new, norm_after):
    import torch

    qd, kd = NH * DH, NKV * DH

    def rms(x, w):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-5)
        return v * w

    def rope(x, pos):
        half = DH // 2
        inv = 1.0 / 10000.0**(torch.arange(half) / half)
        ang = pos[:, None].float() * inv[None]
        cos, sin = ang.cos()[:, None], ang.sin()[:, None]
        x1, x2 = x[..., :half], x[..., half:]
        return torch.cat([x1 * cos - x2 * sin,
                          x2 * cos + x1 * sin], -1)

    embed = torch.cat([sd["model.transformer.wte.embedding"],
                       sd["model.transformer.wte.new_embedding"]], 0)
    ids = list(ids_seed)
    for _ in range(n_new):
        T = len(ids)
        pos = torch.arange(T)
        x = embed[torch.tensor(ids)].clone()
        x[1:1 + NTOK] = img
        for i in range(2):
            p = f"model.transformer.blocks.{i}."
            res = x
            h = x if norm_after else rms(x,
                                         sd[p + "attn_norm.weight"])
            qkv = h @ sd[p + "att_proj.weight"].T + \
                sd[p + "att_proj.bias"]
            q, k, v = qkv[:, :qd], qkv[:, qd:qd + kd], \
                qkv[:, qd + kd:]
            q = rms(q, sd[p + "q_norm.weight"]).reshape(T, NH, DH)
            k = rms(k, sd[p + "k_norm.weight"]).reshape(T, NKV, DH)
            v = v.reshape(T, NKV, DH)
            q, k = rope(q, pos), rope(k, pos)
            group = NH // NKV
            mask = torch.full((T, T), float("-inf")).triu(1)
            outs = []
            for hh in range(NH):
                kv_h = hh // group
                s = (q[:, hh] @ k[:, kv_h].T) * DH**-0.5
                outs.append(torch.softmax(s + mask, -1) @ v[:, kv_h])
            o = torch.cat(outs, -1) @ sd[p + "attn_out.weight"].T
            if norm_after:
                o = rms(o, sd[p + "attn_norm.weight"])
            x = res + o
            res = x
            h = x if norm_after else rms(x, sd[p + "ff_norm.weight"])
            gu = h @ sd[p + "ff_proj.weight"].T
            y = gu[:, :FF // 2] * torch.nn.functional.silu(
                gu[:, FF // 2:])
            y = y @ sd[p + "ff_out.weight"].T
            if norm_after:
                y = rms(y, sd[p + "ff_norm.weight"])
            x = res + y
        x = rms(x, sd["model.transformer.ln_f.weight"])
        logits = x @ sd["model.transformer.ff_out.weight"].T
        ids.append(int(logits[-1].argmax()))
    return ids[len(ids_seed):]


def test_molmo_matches_oracle(molmo_dir):
    import torch

    path, sd, norm_after = molmo_dir
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    engine = LLM(model=path, dtype="float32", max_model_len=128,
                 max_num_seqs=2, max_num_batched_tokens=64,
                 block_size=4, num_kv_blocks=128, mm_image_size=S)
    out = engine.generate(
        [{"prompt_token_ids": [5, IMG_TOK, 9, 42],
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    with torch.no_grad():
        img = _tower(sd, torch.tensor(pix))
        ids = [5] + [IMG_TOK] * NTOK + [9, 42]
        ref = _text_oracle(sd, ids, img, 8, norm_after)
    assert list(out.outputs[0].token_ids) == ref
