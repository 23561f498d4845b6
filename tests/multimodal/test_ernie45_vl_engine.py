"""ERNIE-4.5-VL MoE through the engine: Qwen2-VL-style ViT +
variable-resolution resampler over the modality-routed MoE decoder
with the ERNIE 3D rope; greedy matches a hand-stitched torch oracle
(reference: vllm/model_executor/models/ernie45_vl.py +
ernie45_vl_moe.py — upstream is remote-code-only)."""

import json

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 250
S = 32  # patch 8 → grid 4; sconv 2 → 4 tokens
VD = 32  # vision width
VH = 2
H = 64
NH = 4
NKV = 2
DH = 16
FA = 2  # freq_allocation
E = 4
MI = 48
NTOK = 4
SD = VD * 4  # resampler spatial dim


@pytest.fixture(scope="module")
def ernie_dir(tmp_path_factory):
    import torch
    from safetensors.torch import save_file

    g = torch.Generator().manual_seed(0)

    def rand(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {"model.embed_tokens.weight": rand(256, H),
          "model.norm.weight": torch.ones(H) + rand(H),
          "lm_head.weight": rand(256, H)}
    for i in range(2):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = torch.ones(H) + rand(H)
        sd[p + "post_attention_layernorm.weight"] = \
            torch.ones(H) + rand(H)
        sd[p + "self_attn.q_proj.weight"] = rand(NH * DH, H)
        sd[p + "self_attn.k_proj.weight"] = rand(NKV * DH, H)
        sd[p + "self_attn.v_proj.weight"] = rand(NKV * DH, H)
        sd[p + "self_attn.o_proj.weight"] = rand(H, NH * DH)
        if i == 0:  # dense
            sd[p + "mlp.gate_proj.weight"] = rand(128, H)
            sd[p + "mlp.up_proj.weight"] = rand(128, H)
            sd[p + "mlp.down_proj.weight"] = rand(H, 128)
        else:  # moe
            sd[p + "mlp.gate.weight"] = rand(E, H)
            sd[p + "mlp.gate.weight_1"] = rand(E, H)
            sd[p + "mlp.moe_statics.e_score_correction_bias"] = \
                rand(2, E)
            for e in range(2 * E):
                q = p + f"mlp.experts.{e}."
                sd[q + "gate_proj.weight"] = rand(MI, H)
                sd[q + "up_proj.weight"] = rand(MI, H)
                sd[q + "down_proj.weight"] = rand(H, MI)
            sd[p + "mlp.shared_experts.gate_proj.weight"] = \
                rand(MI, H)
            sd[p + "mlp.shared_experts.up_proj.weight"] = rand(MI, H)
            sd[p + "mlp.shared_experts.down_proj.weight"] = \
                rand(H, MI)
    # vision
    sd["vision_model.patch_embed.proj.weight"] = rand(VD, 3 * 64)
    for i in range(2):
        p = f"vision_model.blocks.{i}."
        sd[p + "norm1.weight"] = torch.ones(VD) + rand(VD)
        sd[p + "norm1.bias"] = rand(VD)
        sd[p + "norm2.weight"] = torch.ones(VD) + rand(VD)
        sd[p + "norm2.bias"] = rand(VD)
        sd[p + "attn.qkv.weight"] = rand(3 * VD, VD)
        sd[p + "attn.qkv.bias"] = rand(3 * VD)
        sd[p + "attn.proj.weight"] = rand(VD, VD)
        sd[p + "attn.proj.bias"] = rand(VD)
        sd[p + "mlp.fc1.weight"] = rand(2 * VD, VD)
        sd[p + "mlp.fc1.bias"] = rand(2 * VD)
        sd[p + "mlp.fc2.weight"] = rand(VD, 2 * VD)
        sd[p + "mlp.fc2.bias"] = rand(VD)
    sd["vision_model.ln.weight"] = torch.ones(VD) + rand(VD)
    sd["vision_model.ln.bias"] = rand(VD)
    rs = "model.resampler_model."
    sd[rs + "spatial_linear1.weight"] = rand(SD, SD)
    sd[rs + "spatial_linear1.bias"] = rand(SD)
    sd[rs + "spatial_linear2.weight"] = rand(SD, SD)
    sd[rs + "spatial_linear2.bias"] = rand(SD)
    sd[rs + "spatial_norm.weight"] = torch.ones(SD) + rand(SD)
    sd[rs + "spatial_norm.bias"] = rand(SD)
    sd[rs + "temporal_linear1.weight"] = rand(SD, 2 * SD)
    sd[rs + "temporal_linear1.bias"] = rand(SD)
    sd[rs + "temporal_linear2.weight"] = rand(SD, SD)
    sd[rs + "temporal_linear2.bias"] = rand(SD)
    sd[rs + "temporal_norm.weight"] = torch.ones(SD) + rand(SD)
    sd[rs + "temporal_norm.bias"] = rand(SD)
    sd[rs + "mlp.weight"] = rand(H, SD)
    sd[rs + "mlp.bias"] = rand(H)
    sd[rs + "after_norm.weight"] = torch.ones(H) + rand(H)

    path = tmp_path_factory.mktemp("models") / "tiny-ernie45vl"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(path / "model.safetensors"))
    cfg = {
        "architectures": ["Ernie4_5_VLMoeForConditionalGeneration"],
        "model_type": "ernie4_5_moe_vl",
        "vocab_size": 256, "hidden_size": H,
        "intermediate_size": 128, "num_hidden_layers": 2,
        "num_attention_heads": NH, "num_key_value_heads": NKV,
        "head_dim": DH, "max_position_embeddings": 128,
        "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
        "tie_word_embeddings": False, "use_bias": False,
        "freq_allocation": FA,
        "moe_num_experts": [E, E], "moe_k": 2,
        "moe_intermediate_size": [MI, MI],
        "moe_layer_start_index": [1, 1],
        "moe_num_shared_experts": 1,
        "im_patch_id": IMG_TOK,
        "pixel_hidden_size": VD, "spatial_conv_size": 2,
        "temporal_conv_size": 2, "use_temporal_conv": True,
        "vision_config": {"depth": 2, "embed_dim": VD,
                          "num_heads": VH, "patch_size": 8,
                          "spatial_merge_size": 2, "mlp_ratio": 2,
                          "hidden_size": VD},
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), {k: v.float() for k, v in sd.items()}


def _tower(sd, pix):
    import torch

    g, m, dh = 4, 2, VD // VH
    # merge-group raster patchify
    x = pix.reshape(3, g, 8, g, 8).permute(1, 3, 0, 2, 4).reshape(
        g * g, 3 * 64)
    idx = torch.arange(g * g).reshape(g // m, m, g // m, m).permute(
        0, 2, 1, 3).reshape(-1)
    x = x[idx] @ sd["vision_model.patch_embed.proj.weight"].T
    hh = (torch.arange(g)[:, None] * torch.ones(
        g, dtype=torch.long)).reshape(-1)[idx]
    ww = (torch.ones(g, dtype=torch.long)[:, None] *
          torch.arange(g)).reshape(-1)[idx]
    half = dh // 4
    inv = 1.0 / 10000.0**(torch.arange(0, dh // 2, 2).float() /
                          (dh // 2))
    ang = torch.cat([hh[:, None] * inv[None, :half],
                     ww[:, None] * inv[None, :half]], -1)
    cos, sin = ang.cos()[:, None], ang.sin()[:, None]
    ln = torch.nn.functional.layer_norm

    def rot(z):
        d2 = z.shape[-1] // 2
        z1, z2 = z[..., :d2], z[..., d2:]
        return torch.cat([z1 * cos - z2 * sin, z2 * cos + z1 * sin],
                         -1)

    t = x.shape[0]
    for i in range(2):
        p = f"vision_model.blocks.{i}."
        h = ln(x, (VD, ), sd[p + "norm1.weight"],
               sd[p + "norm1.bias"], 1e-6)
        qkv = (h @ sd[p + "attn.qkv.weight"].T +
               sd[p + "attn.qkv.bias"]).reshape(t, 3, VH, dh)
        q, k, v = rot(qkv[:, 0]), rot(qkv[:, 1]), qkv[:, 2]
        s = torch.einsum("qhd,khd->hqk", q, k) * dh**-0.5
        o = torch.einsum("hqk,khd->qhd", torch.softmax(s, -1),
                         v).reshape(t, VD)
        x = x + (o @ sd[p + "attn.proj.weight"].T +
                 sd[p + "attn.proj.bias"])
        h = ln(x, (VD, ), sd[p + "norm2.weight"],
               sd[p + "norm2.bias"], 1e-6)
        h = h @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"]
        h = h * torch.sigmoid(1.702 * h)
        x = x + (h @ sd[p + "mlp.fc2.weight"].T +
                 sd[p + "mlp.fc2.bias"])
    x = ln(x, (VD, ), sd["vision_model.ln.weight"],
           sd["vision_model.ln.bias"], 1e-6)
    rs = "model.resampler_model."
    x = x.reshape(-1, SD)
    x = x @ sd[rs + "spatial_linear1.weight"].T + \
        sd[rs + "spatial_linear1.bias"]
    x = torch.nn.functional.gelu(x)
    x = x @ sd[rs + "spatial_linear2.weight"].T + \
        sd[rs + "spatial_linear2.bias"]
    x = ln(x, (SD, ), sd[rs + "spatial_norm.weight"],
           sd[rs + "spatial_norm.bias"], 1e-6)
    x = torch.cat([x, x], -1)
    x = x @ sd[rs + "temporal_linear1.weight"].T + \
        sd[rs + "temporal_linear1.bias"]
    x = torch.nn.functional.gelu(x)
    x = x @ sd[rs + "temporal_linear2.weight"].T + \
        sd[rs + "temporal_linear2.bias"]
    x = ln(x, (SD, ), sd[rs + "temporal_norm.weight"],
           sd[rs + "temporal_norm.bias"], 1e-6)
    x = x @ sd[rs + "mlp.weight"].T + sd[rs + "mlp.bias"]
    v = x.float()
    v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-6)
    return v * sd[rs + "after_norm.weight"]


def _mrope_positions(n):
    pos = np.zeros((3, n), np.int64)
    pos[:, 0] = 0
    pos[0, 1:5] = 1
    pos[1, 1:5] = 1 + np.array([0, 0, 1, 1])
    pos[2, 1:5] = 1 + np.array([0, 1, 0, 1])
    nxt = 3
    for j in range(5, n):
        pos[:, j] = nxt
        nxt += 1
    return pos


def _text_oracle(sd, ids_seed, img, n_new):
    import torch

    def rms(x, w):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-6)
        return v * w

    hd2 = DH // 2
    inv = 1.0 / 10000.0**(torch.arange(hd2).float() * 2.0 / DH)
    axis = np.empty(hd2, np.int64)
    axis[:hd2 - FA:2] = 1
    axis[1:hd2 - FA:2] = 2
    axis[hd2 - FA:] = 0

    def moe_half(h, gate_w, bias, prefix, off):
        logits = h @ gate_w.T
        probs = torch.softmax(logits, -1)
        choice = probs + bias
        _, experts = choice.topk(2, -1)
        w = probs.gather(1, experts)
        w = w / w.sum(-1, keepdim=True).clamp_min(1e-20)
        out = torch.zeros_like(h)
        for kk in range(2):
            for e in range(E):
                m = (experts[:, kk] == e)[:, None]
                q = prefix + f"mlp.experts.{e + off}."
                ge = torch.nn.functional.silu(
                    h @ sd[q + "gate_proj.weight"].T) * \
                    (h @ sd[q + "up_proj.weight"].T)
                out = out + m * w[:, kk:kk + 1] * (
                    ge @ sd[q + "down_proj.weight"].T)
        return out

    ids = list(ids_seed)
    for _ in range(n_new):
        T = len(ids)
        pos3 = torch.tensor(_mrope_positions(T))
        psel = pos3[torch.tensor(axis)].T.float()  # [T, hd2]
        ang = psel * inv[None]
        cos, sin = ang.cos()[:, None], ang.sin()[:, None]

        def rope(x):
            xr = x.reshape(*x.shape[:-1], hd2, 2)
            re, im = xr[..., 0], xr[..., 1]
            return torch.stack([re * cos - im * sin,
                                re * sin + im * cos],
                               -1).reshape(x.shape)

        x = sd["model.embed_tokens.weight"][torch.tensor(ids)].clone()
        x[1:1 + NTOK] = img
        vis_mask = torch.tensor(
            [1 <= j < 1 + NTOK for j in range(T)])[:, None]
        for i in range(2):
            p = f"model.layers.{i}."
            res = x
            h = rms(x, sd[p + "input_layernorm.weight"])
            q = (h @ sd[p + "self_attn.q_proj.weight"].T).reshape(
                T, NH, DH)
            k = (h @ sd[p + "self_attn.k_proj.weight"].T).reshape(
                T, NKV, DH)
            v = (h @ sd[p + "self_attn.v_proj.weight"].T).reshape(
                T, NKV, DH)
            q, k = rope(q), rope(k)
            group = NH // NKV
            mask = torch.full((T, T), float("-inf")).triu(1)
            outs = []
            for hh in range(NH):
                kv_h = hh // group
                s = (q[:, hh] @ k[:, kv_h].T) * DH**-0.5
                outs.append(torch.softmax(s + mask, -1) @ v[:, kv_h])
            o = torch.cat(outs, -1)
            x = res + o @ sd[p + "self_attn.o_proj.weight"].T
            res = x
            h = rms(x, sd[p + "post_attention_layernorm.weight"])
            if i == 0:
                y = torch.nn.functional.silu(
                    h @ sd[p + "mlp.gate_proj.weight"].T) * \
                    (h @ sd[p + "mlp.up_proj.weight"].T)
                y = y @ sd[p + "mlp.down_proj.weight"].T
            else:
                bias = sd[p +
                          "mlp.moe_statics.e_score_correction_bias"]
                yt = moe_half(h, sd[p + "mlp.gate.weight"], bias[0],
                              p, 0)
                yv = moe_half(h, sd[p + "mlp.gate.weight_1"],
                              bias[1], p, E)
                y = torch.where(vis_mask, yv, yt)
                sh = torch.nn.functional.silu(
                    h @ sd[p +
                           "mlp.shared_experts.gate_proj.weight"].T
                ) * (h @ sd[p +
                            "mlp.shared_experts.up_proj.weight"].T)
                y = y + sh @ \
                    sd[p + "mlp.shared_experts.down_proj.weight"].T
            x = res + y
        x = rms(x, sd["model.norm.weight"])
        logits = x @ sd["lm_head.weight"].T
        ids.append(int(logits[-1].argmax()))
    return ids[len(ids_seed):]


def test_ernie45_vl_matches_oracle(ernie_dir):
    import torch

    path, sd = ernie_dir
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
        ref = _text_oracle(sd, ids, img, 8)
    assert list(out.outputs[0].token_ids) == ref
