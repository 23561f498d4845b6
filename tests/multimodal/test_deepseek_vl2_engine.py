"""DeepSeek-VL2 through the engine: timm-style SigLIP ViT +
downsample-MLP projector + 2D tile formatting over the DeepSeek-V2
MLA decoder; greedy matches a hand-stitched torch oracle (reference:
vllm/model_executor/models/deepseek_vl2.py — upstream is
remote-code-only; transformers ships DeepseekV2ForCausalLM for the
decoder half)."""

import json

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 250
S = 32  # patch 8 -> grid 4; ds 2 -> h 2 -> 2*2*3+1 = 13 tokens
W = 32
H = 64  # text hidden == n_embed
NTOK = 13


@pytest.fixture(scope="module")
def dsvl2_dir(tmp_path_factory):
    import torch
    import transformers
    from safetensors.torch import save_file

    torch.manual_seed(0)

    class Tower(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = torch.nn.Conv2d(3, W, 8, 8)
            self.pos = torch.nn.Parameter(torch.randn(1, 16, W) * 0.1)
            self.blocks = torch.nn.ModuleList()
            for _ in range(2):
                b = torch.nn.Module()
                b.norm1 = torch.nn.LayerNorm(W, eps=1e-6)
                b.attn = torch.nn.MultiheadAttention(
                    W, 4, batch_first=True)
                b.norm2 = torch.nn.LayerNorm(W, eps=1e-6)
                b.fc1 = torch.nn.Linear(W, 4 * W)
                b.fc2 = torch.nn.Linear(4 * W, W)
                self.blocks.append(b)
            self.norm = torch.nn.LayerNorm(W, eps=1e-6)
            self.lin0 = torch.nn.Linear(W * 4, H)
            self.lin1 = torch.nn.Linear(H, H)
            self.image_newline = torch.nn.Parameter(
                torch.randn(H) * 0.1)
            self.view_seperator = torch.nn.Parameter(
                torch.randn(H) * 0.1)

        def forward(self, pix):  # [2, 3, S, S]
            x = self.proj(pix).flatten(2).permute(0, 2, 1) + self.pos
            for b in self.blocks:
                h = b.norm1(x)
                x = x + b.attn(h, h, h)[0]
                x = x + b.fc2(torch.nn.functional.gelu(
                    b.fc1(b.norm2(x))))
            x = self.norm(x)
            # channel-major 2x2 unfold (F.unfold order)
            x = x.reshape(2, 4, 4, W).permute(0, 3, 1, 2)
            x = torch.nn.functional.unfold(
                x, kernel_size=2, stride=2).permute(0, 2, 1)
            x = self.lin1(torch.nn.functional.gelu(self.lin0(x)))
            h2 = 2

            def fmt(f):
                f = f.reshape(h2, h2, H)
                nl = self.image_newline[None, None].expand(h2, 1, H)
                return torch.cat([f, nl], 1).reshape(-1, H)

            return torch.cat(
                [fmt(x[0]), self.view_seperator[None], fmt(x[1])], 0)

    tower = Tower().float().eval()
    tcfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=H, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
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
    sd["vision.patch_embed.proj.weight"] = tsd["proj.weight"]
    sd["vision.patch_embed.proj.bias"] = tsd["proj.bias"]
    sd["vision.pos_embed"] = tsd["pos"]
    sd["vision.norm.weight"] = tsd["norm.weight"]
    sd["vision.norm.bias"] = tsd["norm.bias"]
    for i in range(2):
        p = f"vision.blocks.{i}."
        sd[p + "norm1.weight"] = tsd[f"blocks.{i}.norm1.weight"]
        sd[p + "norm1.bias"] = tsd[f"blocks.{i}.norm1.bias"]
        sd[p + "attn.qkv.weight"] = \
            tsd[f"blocks.{i}.attn.in_proj_weight"]
        sd[p + "attn.qkv.bias"] = tsd[f"blocks.{i}.attn.in_proj_bias"]
        sd[p + "attn.proj.weight"] = \
            tsd[f"blocks.{i}.attn.out_proj.weight"]
        sd[p + "attn.proj.bias"] = \
            tsd[f"blocks.{i}.attn.out_proj.bias"]
        sd[p + "norm2.weight"] = tsd[f"blocks.{i}.norm2.weight"]
        sd[p + "norm2.bias"] = tsd[f"blocks.{i}.norm2.bias"]
        sd[p + "mlp.fc1.weight"] = tsd[f"blocks.{i}.fc1.weight"]
        sd[p + "mlp.fc1.bias"] = tsd[f"blocks.{i}.fc1.bias"]
        sd[p + "mlp.fc2.weight"] = tsd[f"blocks.{i}.fc2.weight"]
        sd[p + "mlp.fc2.bias"] = tsd[f"blocks.{i}.fc2.bias"]
    sd["projector.layers.0.weight"] = tsd["lin0.weight"]
    sd["projector.layers.0.bias"] = tsd["lin0.bias"]
    sd["projector.layers.2.weight"] = tsd["lin1.weight"]
    sd["projector.layers.2.bias"] = tsd["lin1.bias"]
    sd["image_newline"] = tsd["image_newline"]
    sd["view_seperator"] = tsd["view_seperator"]
    for k, v in llm.state_dict().items():
        sd["language." + k] = v.contiguous()
    path = tmp_path_factory.mktemp("models") / "tiny-dsvl2"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(path / "model.safetensors"))
    cfg = {
        "architectures": ["DeepseekVLV2ForCausalLM"],
        "model_type": "deepseek_vl_v2",
        "image_token_index": IMG_TOK,
        "vision_config": {"width": W, "layers": 2, "heads": 4,
                          "image_size": S, "patch_size": 8,
                          "mlp_ratio": 4},
        "projector_config": {"projector_type": "downsample_mlp_gelu",
                             "input_dim": W, "n_embed": H,
                             "depth": 2, "mlp_ratio": 1,
                             "downsample_ratio": 2},
        "language_config": json.loads(tcfg.to_json_string()),
        "tile_tag": "2D", "global_view_pos": "head",
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), tower, llm


def test_deepseek_vl2_matches_oracle(dsvl2_dir):
    import torch

    path, tower, hf_llm = dsvl2_dir
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
        img_tokens = tower(torch.tensor(np.stack([pix, pix])))
        ids = [5] + [IMG_TOK] * NTOK + [9, 42]
        emb = hf_llm.get_input_embeddings()(torch.tensor([ids]))
        emb[0, 1:1 + NTOK] = img_tokens
        gen = hf_llm.generate(
            inputs_embeds=emb, max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0)
    assert list(out.outputs[0].token_ids) == gen[0].tolist()[-8:]
