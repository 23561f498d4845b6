"""Keye-VL + Keye-VL-1.5 through the engine: SigLIP tower with
row-major 2D rope + mlp_AR merge projector over a Qwen3 decoder with
standard mrope; greedy matches a hand-stitched torch oracle
(reference: vllm/model_executor/models/keye.py + keye_vl1_5.py —
upstream is remote-code-only)."""

import json

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 250
S = 32  # patch 8 → grid 4, merge 2 → 4 tokens
VW = 32
VH = 2  # vision head_dim 16
H = 64
NH = 4
NKV = 2
DH = 16
SEC = (4, 2, 2)  # mrope sections over head_dim/2
NTOK = 4


def _make_dir(tmp_path_factory, arch, model_type):
    import torch
    from safetensors.torch import save_file

    g = torch.Generator().manual_seed(0 if "1_5" not in arch else 7)

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
        sd[p + "self_attn.q_norm.weight"] = torch.ones(DH) + rand(DH)
        sd[p + "self_attn.k_norm.weight"] = torch.ones(DH) + rand(DH)
        sd[p + "mlp.gate_proj.weight"] = rand(128, H)
        sd[p + "mlp.up_proj.weight"] = rand(128, H)
        sd[p + "mlp.down_proj.weight"] = rand(H, 128)
    p0 = "visual.vision_model."
    sd[p0 + "embeddings.patch_embedding.weight"] = rand(VW, 3, 8, 8)
    sd[p0 + "embeddings.patch_embedding.bias"] = rand(VW)
    sd[p0 + "embeddings.position_embedding.weight"] = rand(16, VW)
    for i in range(2):
        p = p0 + f"encoder.layers.{i}."
        for n in ("q", "k", "v"):
            sd[p + f"self_attn.{n}_proj.weight"] = rand(VW, VW)
            sd[p + f"self_attn.{n}_proj.bias"] = rand(VW)
        sd[p + "self_attn.out_proj.weight"] = rand(VW, VW)
        sd[p + "self_attn.out_proj.bias"] = rand(VW)
        sd[p + "layer_norm1.weight"] = torch.ones(VW) + rand(VW)
        sd[p + "layer_norm1.bias"] = rand(VW)
        sd[p + "layer_norm2.weight"] = torch.ones(VW) + rand(VW)
        sd[p + "layer_norm2.bias"] = rand(VW)
        sd[p + "mlp.fc1.weight"] = rand(2 * VW, VW)
        sd[p + "mlp.fc1.bias"] = rand(2 * VW)
        sd[p + "mlp.fc2.weight"] = rand(VW, 2 * VW)
        sd[p + "mlp.fc2.bias"] = rand(VW)
    sd[p0 + "post_layernorm.weight"] = torch.ones(VW) + rand(VW)
    sd[p0 + "post_layernorm.bias"] = rand(VW)
    pn = 4 * VW if "1_5" in arch else VW
    sd["mlp_AR.pre_norm.weight"] = torch.ones(pn) + rand(pn)
    sd["mlp_AR.pre_norm.bias"] = rand(pn)
    sd["mlp_AR.linear_1.weight"] = rand(4 * VW, 4 * VW)
    sd["mlp_AR.linear_1.bias"] = rand(4 * VW)
    sd["mlp_AR.linear_2.weight"] = rand(H, 4 * VW)
    sd["mlp_AR.linear_2.bias"] = rand(H)

    path = tmp_path_factory.mktemp("models") / f"tiny-{model_type}"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(path / "model.safetensors"))
    cfg = {
        "architectures": [arch], "model_type": model_type,
        "vocab_size": 256, "hidden_size": H,
        "intermediate_size": 128, "num_hidden_layers": 2,
        "num_attention_heads": NH, "num_key_value_heads": NKV,
        "head_dim": DH, "max_position_embeddings": 128,
        "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
        "tie_word_embeddings": False,
        "rope_scaling": {"type": "mrope",
                         "mrope_section": list(SEC)},
        "image_token_id": IMG_TOK,
        "vision_config": {"hidden_size": VW, "intermediate_size":
                          2 * VW, "num_hidden_layers": 2,
                          "num_attention_heads": VH,
                          "image_size": S, "patch_size": 8,
                          "layer_norm_eps": 1e-6,
                          "spatial_merge_size": 2},
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), {k: v.float() for k, v in sd.items()}


def _tower(sd, pix, norm_after_merge):
    import torch

    g, m, dh = 4, 2, VW // VH
    p0 = "visual.vision_model."
    ln = torch.nn.functional.layer_norm
    x = torch.nn.functional.conv2d(
        pix[None], sd[p0 + "embeddings.patch_embedding.weight"],
        sd[p0 + "embeddings.patch_embedding.bias"], stride=8)
    x = x.flatten(2).permute(0, 2, 1)[0]  # [16, VW] row-major
    x = x + sd[p0 + "embeddings.position_embedding.weight"]
    pid = torch.arange(g * g)
    hpos, wpos = pid // g, pid % g
    half = dh // 4
    inv = 1.0 / 10000.0**(torch.arange(0, dh // 2, 2).float() /
                          (dh // 2))
    ang = torch.cat([hpos[:, None] * inv[None, :half],
                     wpos[:, None] * inv[None, :half]], -1)
    cos, sin = ang.cos()[:, None], ang.sin()[:, None]

    def rot(z):
        d2 = z.shape[-1] // 2
        z1, z2 = z[..., :d2], z[..., d2:]
        return torch.cat([z1 * cos - z2 * sin, z2 * cos + z1 * sin],
                         -1)

    t = x.shape[0]
    for i in range(2):
        p = p0 + f"encoder.layers.{i}."
        h = ln(x, (VW, ), sd[p + "layer_norm1.weight"],
               sd[p + "layer_norm1.bias"], 1e-6)
        q = (h @ sd[p + "self_attn.q_proj.weight"].T +
             sd[p + "self_attn.q_proj.bias"]).reshape(t, VH, dh)
        k = (h @ sd[p + "self_attn.k_proj.weight"].T +
             sd[p + "self_attn.k_proj.bias"]).reshape(t, VH, dh)
        v = (h @ sd[p + "self_attn.v_proj.weight"].T +
             sd[p + "self_attn.v_proj.bias"]).reshape(t, VH, dh)
        q, k = rot(q), rot(k)
        s = torch.einsum("qhd,khd->hqk", q, k) * dh**-0.5
        o = torch.einsum("hqk,khd->qhd", torch.softmax(s, -1),
                         v).reshape(t, VW)
        x = x + (o @ sd[p + "self_attn.out_proj.weight"].T +
                 sd[p + "self_attn.out_proj.bias"])
        h = ln(x, (VW, ), sd[p + "layer_norm2.weight"],
               sd[p + "layer_norm2.bias"], 1e-6)
        h = torch.nn.functional.gelu(
            h @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"],
            approximate="tanh")
        x = x + (h @ sd[p + "mlp.fc2.weight"].T +
                 sd[p + "mlp.fc2.bias"])
    x = ln(x, (VW, ), sd[p0 + "post_layernorm.weight"],
           sd[p0 + "post_layernorm.bias"], 1e-6)
    pnw, pnb = sd["mlp_AR.pre_norm.weight"], sd["mlp_AR.pre_norm.bias"]
    if not norm_after_merge:
        x = ln(x, (VW, ), pnw, pnb, 1e-5)
    x = x.reshape(g // m, m, g // m, m, VW).permute(
        0, 2, 1, 3, 4).reshape(-1, 4 * VW)
    if norm_after_merge:
        x = ln(x, (4 * VW, ), pnw, pnb, 1e-5)
    x = torch.nn.functional.gelu(
        x @ sd["mlp_AR.linear_1.weight"].T +
        sd["mlp_AR.linear_1.bias"])
    return x @ sd["mlp_AR.linear_2.weight"].T + \
        sd["mlp_AR.linear_2.bias"]


def _mrope_positions(n):
    """[3, n] for the prompt [5, IMG*4, 9, 42] + generated tail."""
    pos = np.zeros((3, n), np.int64)
    pos[:, 0] = 0
    # image: t=1 grid 2x2 starting at st_idx 1
    pos[0, 1:5] = 1
    pos[1, 1:5] = 1 + np.array([0, 0, 1, 1])
    pos[2, 1:5] = 1 + np.array([0, 1, 0, 1])
    nxt = 3  # st_idx after image = 1 + max(1, 2, 2)
    for j in range(5, n):
        pos[:, j] = nxt
        nxt += 1
    return pos


def _text_oracle(sd, ids_seed, img, n_new):
    import torch

    def rms(x, w, eps=1e-6):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps)
        return v * w

    ids = list(ids_seed)
    inv = 1.0 / 10000.0**(torch.arange(0, DH, 2).float() / DH)
    sec_id = np.repeat(np.arange(3), SEC)  # [DH/2]
    for _ in range(n_new):
        T = len(ids)
        pos3 = torch.tensor(_mrope_positions(T))
        # per-frequency section positions → angles [T, DH/2]
        psel = pos3.T[:, torch.tensor(sec_id)].float()  # [T, DH/2]
        ang = psel * inv[None]
        cos, sin = ang.cos()[:, None], ang.sin()[:, None]

        def rope(x):
            d2 = DH // 2
            x1, x2 = x[..., :d2], x[..., d2:]
            return torch.cat([x1 * cos - x2 * sin,
                              x2 * cos + x1 * sin], -1)

        x = sd["model.embed_tokens.weight"][torch.tensor(ids)].clone()
        x[1:1 + NTOK] = img
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
            q = rms(q, sd[p + "self_attn.q_norm.weight"])
            k = rms(k, sd[p + "self_attn.k_norm.weight"])
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
            y = torch.nn.functional.silu(
                h @ sd[p + "mlp.gate_proj.weight"].T) * \
                (h @ sd[p + "mlp.up_proj.weight"].T)
            x = res + y @ sd[p + "mlp.down_proj.weight"].T
        x = rms(x, sd["model.norm.weight"])
        logits = x @ sd["lm_head.weight"].T
        ids.append(int(logits[-1].argmax()))
    return ids[len(ids_seed):]


@pytest.mark.parametrize("arch,model_type", [
    ("KeyeForConditionalGeneration", "keye"),
    ("KeyeVL1_5ForConditionalGeneration", "keye_vl_1_5"),
])
def test_keye_matches_oracle(tmp_path_factory, arch, model_type):
    import torch

    path, sd = _make_dir(tmp_path_factory, arch, model_type)
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
        img = _tower(sd, torch.tensor(pix), "1_5" in arch)
        ids = [5] + [IMG_TOK] * NTOK + [9, 42]
        ref = _text_oracle(sd, ids, img, 8)
    assert list(out.outputs[0].token_ids) == ref
