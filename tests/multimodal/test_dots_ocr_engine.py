"""dots.ocr through the engine: RMSNorm/SwiGLU NaViT tower with 2D
rope + biased-LayerNorm patch merger over a Qwen2 decoder; greedy
matches a hand-stitched torch oracle (reference:
vllm/model_executor/models/dots_ocr.py — upstream vision is
remote-code-only; transformers ships the Qwen2 decoder)."""

import json

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 250
S = 32  # patch 8 → grid 4, merge 2 → 4 tokens
VW = 32
VH = 2  # head_dim 16
H = 64
NTOK = 4


@pytest.fixture(scope="module")
def dots_dir(tmp_path_factory):
    import torch
    import transformers
    from safetensors.torch import save_file

    g = torch.Generator().manual_seed(0)

    def rand(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    tcfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=H, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False)
    llm = transformers.Qwen2ForCausalLM(tcfg).float().eval()

    sd = {}
    p0 = "vision_tower."
    sd[p0 + "patch_embed.patchifier.proj.weight"] = rand(VW, 3, 8, 8)
    sd[p0 + "patch_embed.patchifier.proj.bias"] = rand(VW)
    sd[p0 + "patch_embed.patchifier.norm.weight"] = \
        torch.ones(VW) + rand(VW)
    for i in range(2):
        p = p0 + f"blocks.{i}."
        sd[p + "norm1.weight"] = torch.ones(VW) + rand(VW)
        sd[p + "norm2.weight"] = torch.ones(VW) + rand(VW)
        sd[p + "attn.qkv_proj.weight"] = rand(3 * VW, VW)
        sd[p + "attn.out_proj.weight"] = rand(VW, VW)
        sd[p + "mlp.fc1.weight"] = rand(2 * VW, VW)
        sd[p + "mlp.fc3.weight"] = rand(2 * VW, VW)
        sd[p + "mlp.fc2.weight"] = rand(VW, 2 * VW)
    sd[p0 + "post_trunk_norm.weight"] = torch.ones(VW) + rand(VW)
    sd[p0 + "merger.ln_q.weight"] = torch.ones(VW) + rand(VW)
    sd[p0 + "merger.ln_q.bias"] = rand(VW)
    sd[p0 + "merger.mlp.0.weight"] = rand(4 * VW, 4 * VW)
    sd[p0 + "merger.mlp.0.bias"] = rand(4 * VW)
    sd[p0 + "merger.mlp.2.weight"] = rand(H, 4 * VW)
    sd[p0 + "merger.mlp.2.bias"] = rand(H)
    for k, v in llm.state_dict().items():
        sd[k] = v.contiguous()
    path = tmp_path_factory.mktemp("models") / "tiny-dots"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(path / "model.safetensors"))
    cfg = json.loads(tcfg.to_json_string())
    cfg.update({
        "architectures": ["DotsOCRForCausalLM"],
        "model_type": "dots_ocr",
        "image_token_id": IMG_TOK,
        "vision_config": {"embed_dim": VW, "hidden_size": H,
                          "intermediate_size": 2 * VW,
                          "num_hidden_layers": 2,
                          "num_attention_heads": VH,
                          "patch_size": 8, "spatial_merge_size": 2,
                          "rms_norm_eps": 1e-5, "use_bias": False,
                          "post_norm": True},
    })
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), {k: v.float() for k, v in sd.items()}, llm


def _tower(sd, pix):
    import torch

    g, m, dh = 4, 2, VW // VH
    p0 = "vision_tower."

    def rms(x, w):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-5)
        return v * w

    x = torch.nn.functional.conv2d(
        pix[None], sd[p0 + "patch_embed.patchifier.proj.weight"],
        sd[p0 + "patch_embed.patchifier.proj.bias"], stride=8)
    x = x.flatten(2).permute(0, 2, 1)[0]  # [16, VW] row-major
    x = rms(x, sd[p0 + "patch_embed.patchifier.norm.weight"])
    # merge-group raster + matching pos ids
    idx = torch.arange(g * g).reshape(g // m, m, g // m, m).permute(
        0, 2, 1, 3).reshape(-1)
    x = x[idx]
    hpos = (torch.arange(g)[:, None] *
            torch.ones(g, dtype=torch.long)).reshape(-1)[idx]
    wpos = (torch.ones(g, dtype=torch.long)[:, None] *
            torch.arange(g)).reshape(-1)[idx]
    half = dh // 4
    inv = 1.0 / 10000.0**(torch.arange(0, dh // 2, 2).float() /
                          (dh // 2))
    ang = torch.cat([hpos[:, None] * inv[None, :half],
                     wpos[:, None] * inv[None, :half]], -1)
    cos, sin = ang.cos()[:, None], ang.sin()[:, None]

    def rot(z):  # [t, heads, dh] half-split
        d2 = z.shape[-1] // 2
        z1, z2 = z[..., :d2], z[..., d2:]
        return torch.cat([z1 * cos - z2 * sin, z2 * cos + z1 * sin],
                         -1)

    t = x.shape[0]
    for i in range(2):
        p = p0 + f"blocks.{i}."
        h = rms(x, sd[p + "norm1.weight"])
        qkv = h @ sd[p + "attn.qkv_proj.weight"].T
        q, k, v = qkv.chunk(3, -1)
        q = rot(q.reshape(t, VH, dh))
        k = rot(k.reshape(t, VH, dh))
        v = v.reshape(t, VH, dh)
        s = torch.einsum("qhd,khd->hqk", q, k) * dh**-0.5
        o = torch.einsum("hqk,khd->qhd", torch.softmax(s, -1),
                         v).reshape(t, VW)
        x = x + o @ sd[p + "attn.out_proj.weight"].T
        h = rms(x, sd[p + "norm2.weight"])
        y = torch.nn.functional.silu(h @ sd[p + "mlp.fc1.weight"].T
                                     ) * (h @ sd[p +
                                                 "mlp.fc3.weight"].T)
        x = x + y @ sd[p + "mlp.fc2.weight"].T
    x = rms(x, sd[p0 + "post_trunk_norm.weight"])
    x = torch.nn.functional.layer_norm(
        x, (VW, ), sd[p0 + "merger.ln_q.weight"],
        sd[p0 + "merger.ln_q.bias"], 1e-6)
    x = x.reshape(-1, 4 * VW)
    x = torch.nn.functional.gelu(
        x @ sd[p0 + "merger.mlp.0.weight"].T +
        sd[p0 + "merger.mlp.0.bias"])
    return x @ sd[p0 + "merger.mlp.2.weight"].T + \
        sd[p0 + "merger.mlp.2.bias"]


def test_dots_ocr_matches_oracle(dots_dir):
    import torch

    path, sd, hf_llm = dots_dir
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
        emb = hf_llm.get_input_embeddings()(torch.tensor([ids]))
        emb[0, 1:1 + NTOK] = img
        gen = hf_llm.generate(
            inputs_embeds=emb, max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0)
    assert list(out.outputs[0].token_ids) == gen[0].tolist()[-8:]
