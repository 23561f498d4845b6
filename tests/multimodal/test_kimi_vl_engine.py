"""Kimi-VL through the engine: MoonViT (2D interleaved rope, biased
packed qkv, gelu-tanh MLP2) + 2x2 spatial patch-merge projector over a
DeepSeek-V2 MLA decoder; greedy matches a hand-stitched torch oracle
(reference: vllm/model_executor/models/kimi_vl.py + moonvit.py —
upstream is remote-code-only)."""

import json
import math

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 250
S = 32  # image size; patch 8 -> grid 4; merge 2 -> 4 tokens
W = 32  # vision width
VH = 2  # vision heads -> head_dim 16 (divisible by 4)
H = 64  # text hidden
NTOK = 4


@pytest.fixture(scope="module")
def kimi_dir(tmp_path_factory):
    import torch
    import transformers
    from safetensors.torch import save_file

    torch.manual_seed(0)
    g = 4
    dh = W // VH

    class Tower(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = torch.nn.Conv2d(3, W, 8, 8)
            self.pos = torch.nn.Parameter(torch.randn(g, g, W) * 0.1)
            self.blocks = torch.nn.ModuleList()
            for _ in range(2):
                b = torch.nn.Module()
                b.norm0 = torch.nn.LayerNorm(W, eps=1e-5)
                b.norm1 = torch.nn.LayerNorm(W, eps=1e-5)
                b.wqkv = torch.nn.Linear(W, 3 * W)
                b.wo = torch.nn.Linear(W, W)
                b.fc0 = torch.nn.Linear(W, 2 * W)
                b.fc1 = torch.nn.Linear(2 * W, W)
                self.blocks.append(b)
            self.final = torch.nn.LayerNorm(W, eps=1e-5)
            self.pre_norm = torch.nn.LayerNorm(W, eps=1e-5)
            self.lin1 = torch.nn.Linear(4 * W, 4 * W)
            self.lin2 = torch.nn.Linear(4 * W, H)

        def rope(self, x):  # [t, heads, dh] adjacent-pair 2D rope
            t = x.shape[0]
            n4 = dh // 4
            freqs = 1.0 / (10000.0**(
                torch.arange(n4).float() * 4.0 / dh))
            pos = torch.arange(t)
            xp, yp = (pos % g).float(), (pos // g).float()
            ang = torch.zeros(t, dh // 2)
            ang[:, 0::2] = torch.outer(xp, freqs)
            ang[:, 1::2] = torch.outer(yp, freqs)
            cos, sin = ang.cos()[:, None], ang.sin()[:, None]
            xr = x.reshape(t, -1, dh // 2, 2)
            re, im = xr[..., 0], xr[..., 1]
            return torch.stack(
                [re * cos - im * sin, re * sin + im * cos],
                -1).reshape(x.shape)

        def forward(self, pix):  # [1, 3, S, S]
            x = self.proj(pix).flatten(2).permute(0, 2, 1)[0]
            x = x + self.pos.reshape(g * g, W)
            t = x.shape[0]
            for b in self.blocks:
                h = b.norm0(x)
                qkv = b.wqkv(h).reshape(t, 3, VH, dh)
                q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
                q, k = self.rope(q), self.rope(k)
                s = torch.einsum("qhd,khd->hqk", q, k) * dh**-0.5
                p = torch.softmax(s, -1)
                o = torch.einsum("hqk,khd->qhd", p, v).reshape(t, W)
                x = x + b.wo(o)
                h = b.norm1(x)
                x = x + b.fc1(
                    torch.nn.functional.gelu(b.fc0(h),
                                             approximate="tanh"))
            x = self.final(x)
            x = self.pre_norm(x)
            # 2x2 spatial merge (moonvit.py patch_merger)
            x = x.reshape(g // 2, 2, g // 2, 2, W)
            x = x.permute(0, 2, 1, 3, 4).reshape(-1, 4 * W)
            x = torch.nn.functional.gelu(self.lin1(x))
            return self.lin2(x)

    tower = Tower().float().eval()
    tcfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=H, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=128,
        kv_lora_rank=32, q_lora_rank=48, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1,
        moe_intermediate_size=32, first_k_dense_replace=1,
        topk_method="greedy", norm_topk_prob=False,
        routed_scaling_factor=1.0, aux_loss_alpha=0.0)
    llm = transformers.DeepseekV2ForCausalLM(tcfg).float().eval()

    sd = {}
    tsd = tower.state_dict()
    sd["vision_tower.patch_embed.proj.weight"] = tsd["proj.weight"]
    sd["vision_tower.patch_embed.proj.bias"] = tsd["proj.bias"]
    sd["vision_tower.patch_embed.pos_emb.weight"] = tsd["pos"]
    for i in range(2):
        p = f"vision_tower.encoder.blocks.{i}."
        for src, dst in (("norm0", "norm0"), ("norm1", "norm1"),
                         ("wqkv", "wqkv"), ("wo", "wo"),
                         ("fc0", "mlp.fc0"), ("fc1", "mlp.fc1")):
            sd[p + f"{dst}.weight"] = tsd[f"blocks.{i}.{src}.weight"]
            sd[p + f"{dst}.bias"] = tsd[f"blocks.{i}.{src}.bias"]
    sd["vision_tower.encoder.final_layernorm.weight"] = \
        tsd["final.weight"]
    sd["vision_tower.encoder.final_layernorm.bias"] = \
        tsd["final.bias"]
    sd["multi_modal_projector.pre_norm.weight"] = \
        tsd["pre_norm.weight"]
    sd["multi_modal_projector.pre_norm.bias"] = tsd["pre_norm.bias"]
    sd["multi_modal_projector.linear_1.weight"] = tsd["lin1.weight"]
    sd["multi_modal_projector.linear_1.bias"] = tsd["lin1.bias"]
    sd["multi_modal_projector.linear_2.weight"] = tsd["lin2.weight"]
    sd["multi_modal_projector.linear_2.bias"] = tsd["lin2.bias"]
    for k, v in llm.state_dict().items():
        sd["language_model." + k] = v.contiguous()
    path = tmp_path_factory.mktemp("models") / "tiny-kimivl"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(path / "model.safetensors"))
    cfg = {
        "architectures": ["KimiVLForConditionalGeneration"],
        "model_type": "kimi_vl",
        "media_placeholder_token_id": IMG_TOK,
        "vision_config": {"model_type": "moonvit", "patch_size": 8,
                          "init_pos_emb_height": 4,
                          "init_pos_emb_width": 4,
                          "num_attention_heads": VH,
                          "num_hidden_layers": 2, "hidden_size": W,
                          "intermediate_size": 2 * W,
                          "merge_kernel_size": [2, 2]},
        "text_config": json.loads(tcfg.to_json_string()),
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), tower, llm


def test_kimi_vl_matches_oracle(kimi_dir):
    import torch

    path, tower, hf_llm = kimi_dir
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
        img_tokens = tower(torch.tensor(pix[None]))
        ids = [5] + [IMG_TOK] * NTOK + [9, 42]
        emb = hf_llm.get_input_embeddings()(torch.tensor([ids]))
        emb[0, 1:1 + NTOK] = img_tokens
        gen = hf_llm.generate(
            inputs_embeds=emb, max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0)
    assert list(out.outputs[0].token_ids) == gen[0].tolist()[-8:]
