"""Original Qwen-VL through the engine: OpenCLIP-style ViT +
Resampler2 pool over the Qwen-v1 decoder; greedy matches a
hand-stitched torch oracle (reference:
vllm/model_executor/models/qwen_vl.py — upstream is
remote-code-only). The tiny config keeps both absolute-position
tables at their native grids so no bicubic resampling runs in this
path (covered separately below)."""

import json
import math

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

S = 128  # image size; patch 8 -> grid 16 == sqrt(256) pos entries
PATCH = 8
W = 32  # vision width
OD = 48  # output dim == text hidden
NQ = 256  # n_queries (grid 16 -> no key-pos interpolation)
IMG_PAD = 502  # image_start_id 500 -> pad id 502


def _sincos_v20(g, dim):
    omega = 1.0 / 10000**(np.arange(dim // 4, dtype=np.float32) /
                          (dim // 4))
    hh, ww = np.meshgrid(np.arange(g, dtype=np.float32),
                         np.arange(g, dtype=np.float32),
                         indexing="ij")

    def enc(pos):
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], 1)

    return np.concatenate([enc(ww), enc(hh)], 1).astype(np.float32)


@pytest.fixture(scope="module")
def qwen_vl_dir(tmp_path_factory):
    import torch
    from safetensors.torch import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    g = S // PATCH

    class Tower(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, W, PATCH, PATCH,
                                         bias=False)
            self.positional_embedding = torch.nn.Parameter(
                torch.randn(256, W) * W**-0.5)
            self.ln_pre = torch.nn.LayerNorm(W, eps=1e-6)
            self.blocks = torch.nn.ModuleList()
            for _ in range(2):
                b = torch.nn.Module()
                b.ln_1 = torch.nn.LayerNorm(W, eps=1e-6)
                b.attn = torch.nn.MultiheadAttention(W, 4,
                    batch_first=True)
                b.ln_2 = torch.nn.LayerNorm(W, eps=1e-6)
                b.c_fc = torch.nn.Linear(W, 4 * W)
                b.c_proj = torch.nn.Linear(4 * W, W)
                self.blocks.append(b)
            self.query = torch.nn.Parameter(torch.randn(NQ, OD) * 0.1)
            self.kv_proj = torch.nn.Linear(W, OD, bias=False)
            self.pool_attn = torch.nn.MultiheadAttention(
                OD, max(1, OD // 128))
            self.ln_q = torch.nn.LayerNorm(OD, eps=1e-6)
            self.ln_kv = torch.nn.LayerNorm(OD, eps=1e-6)
            self.ln_post = torch.nn.LayerNorm(OD, eps=1e-6)
            self.proj = torch.nn.Parameter(torch.randn(OD, OD) *
                                           OD**-0.5)

        def forward(self, pix):  # [1, 3, S, S]
            x = self.conv1(pix).flatten(2).permute(0, 2, 1)
            x = x + self.positional_embedding[None]
            x = self.ln_pre(x)
            for b in self.blocks:
                h = b.ln_1(x)
                x = x + b.attn(h, h, h)[0]
                x = x + b.c_proj(
                    torch.nn.functional.gelu(b.c_fc(b.ln_2(x))))
            pos = torch.tensor(_sincos_v20(int(math.isqrt(NQ)), OD))
            kv = self.ln_kv(self.kv_proj(x)).permute(1, 0, 2)
            q = self.ln_q(self.query) + pos
            out = self.pool_attn(q[:, None, :],
                                 kv + pos[:, None, :], kv)[0]
            out = self.ln_post(out.permute(1, 0, 2))
            return out @ self.proj

    tower = Tower().float().eval()
    tcfg = LlamaConfig(vocab_size=512, hidden_size=OD,
                       intermediate_size=96, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=4,
                       attention_bias=True, max_position_embeddings=512,
                       rope_theta=10000.0, tie_word_embeddings=False)
    llm = LlamaForCausalLM(tcfg).float().eval()

    # serialize in the Qwen-VL remote-code layout
    sd = {}
    tsd = tower.state_dict()
    v = "transformer.visual."
    sd[v + "conv1.weight"] = tsd["conv1.weight"]
    sd[v + "positional_embedding"] = tsd["positional_embedding"]
    for ln in ("ln_pre", "ln_post"):
        sd[v + f"{ln}.weight"] = tsd[f"{ln}.weight"]
        sd[v + f"{ln}.bias"] = tsd[f"{ln}.bias"]
    sd[v + "proj"] = tsd["proj"]
    for i in range(2):
        p = v + f"transformer.resblocks.{i}."
        sd[p + "ln_1.weight"] = tsd[f"blocks.{i}.ln_1.weight"]
        sd[p + "ln_1.bias"] = tsd[f"blocks.{i}.ln_1.bias"]
        sd[p + "attn.in_proj.weight"] = \
            tsd[f"blocks.{i}.attn.in_proj_weight"]
        sd[p + "attn.in_proj.bias"] = \
            tsd[f"blocks.{i}.attn.in_proj_bias"]
        sd[p + "attn.out_proj.weight"] = \
            tsd[f"blocks.{i}.attn.out_proj.weight"]
        sd[p + "attn.out_proj.bias"] = \
            tsd[f"blocks.{i}.attn.out_proj.bias"]
        sd[p + "ln_2.weight"] = tsd[f"blocks.{i}.ln_2.weight"]
        sd[p + "ln_2.bias"] = tsd[f"blocks.{i}.ln_2.bias"]
        sd[p + "mlp.c_fc.weight"] = tsd[f"blocks.{i}.c_fc.weight"]
        sd[p + "mlp.c_fc.bias"] = tsd[f"blocks.{i}.c_fc.bias"]
        sd[p + "mlp.c_proj.weight"] = tsd[f"blocks.{i}.c_proj.weight"]
        sd[p + "mlp.c_proj.bias"] = tsd[f"blocks.{i}.c_proj.bias"]
    ap = v + "attn_pool."
    sd[ap + "query"] = tsd["query"]
    sd[ap + "kv_proj.weight"] = tsd["kv_proj.weight"]
    sd[ap + "attn.in_proj_weight"] = tsd["pool_attn.in_proj_weight"]
    sd[ap + "attn.in_proj_bias"] = tsd["pool_attn.in_proj_bias"]
    sd[ap + "attn.out_proj.weight"] = \
        tsd["pool_attn.out_proj.weight"]
    sd[ap + "attn.out_proj.bias"] = tsd["pool_attn.out_proj.bias"]
    for ln in ("ln_q", "ln_kv"):
        sd[ap + f"{ln}.weight"] = tsd[f"{ln}.weight"]
        sd[ap + f"{ln}.bias"] = tsd[f"{ln}.bias"]
    # decoder → QWen v1 key layout
    lsd = llm.state_dict()
    sd["transformer.wte.weight"] = lsd["model.embed_tokens.weight"]
    sd["transformer.ln_f.weight"] = lsd["model.norm.weight"]
    sd["lm_head.weight"] = lsd["lm_head.weight"]
    for i in range(2):
        src = f"model.layers.{i}."
        dst = f"transformer.h.{i}."
        sd[dst + "attn.c_attn.weight"] = torch.cat(
            [lsd[src + "self_attn.q_proj.weight"],
             lsd[src + "self_attn.k_proj.weight"],
             lsd[src + "self_attn.v_proj.weight"]], 0)
        sd[dst + "attn.c_attn.bias"] = torch.cat(
            [lsd[src + "self_attn.q_proj.bias"],
             lsd[src + "self_attn.k_proj.bias"],
             lsd[src + "self_attn.v_proj.bias"]], 0)
        sd[dst + "attn.c_proj.weight"] = \
            lsd[src + "self_attn.o_proj.weight"]
        sd[dst + "mlp.w2.weight"] = lsd[src + "mlp.gate_proj.weight"]
        sd[dst + "mlp.w1.weight"] = lsd[src + "mlp.up_proj.weight"]
        sd[dst + "mlp.c_proj.weight"] = \
            lsd[src + "mlp.down_proj.weight"]
        sd[dst + "ln_1.weight"] = lsd[src + "input_layernorm.weight"]
        sd[dst + "ln_2.weight"] = \
            lsd[src + "post_attention_layernorm.weight"]
    path = tmp_path_factory.mktemp("models") / "tiny-qwen-vl"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v2.contiguous() for k, v2 in sd.items()},
              str(path / "model.safetensors"))
    cfg = {
        "architectures": ["QWenLMHeadModel"], "model_type": "llama",
        "vocab_size": 512, "hidden_size": OD,
        "intermediate_size": 96, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 4,
        "max_position_embeddings": 512, "rope_theta": 10000.0,
        "rms_norm_eps": 1e-6, "tie_word_embeddings": False,
        "visual": {
            "image_size": S, "patch_size": PATCH, "width": W,
            "layers": 2, "heads": 4, "mlp_ratio": 4.0,
            "n_queries": NQ, "output_dim": OD,
            "image_start_id": 500,
        },
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), tower, llm


def test_qwen_vl_matches_oracle(qwen_vl_dir):
    import torch

    path, tower, hf_llm = qwen_vl_dir
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    engine = LLM(model=path, dtype="float32", max_model_len=512,
                 max_num_seqs=2, max_num_batched_tokens=512,
                 block_size=8, num_kv_blocks=256)
    out = engine.generate(
        [{"prompt_token_ids": [5, IMG_PAD, 9, 42],
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    with torch.no_grad():
        img_tokens = tower(torch.tensor(pix[None]))[0]  # [NQ, OD]
        ids = [5] + [IMG_PAD] * NQ + [9, 42]
        emb = hf_llm.get_input_embeddings()(torch.tensor([ids]))
        emb[0, 1:1 + NQ] = img_tokens
        gen = hf_llm.generate(
            inputs_embeds=emb, max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0)
    assert list(out.outputs[0].token_ids) == gen[0].tolist()[-8:]


def test_bicubic_matches_torch():
    """The numpy bicubic used for absolute-position resampling must
    match torch.nn.functional.interpolate (align_corners=False)."""
    import torch

    from vllm_main_modify_tpu.models.qwen_vl import \
        resize_pos_embed_bicubic

    rng = np.random.default_rng(0)
    table = rng.standard_normal((16 * 16, 8)).astype(np.float32)
    got = resize_pos_embed_bicubic(table, 32)
    want = torch.nn.functional.interpolate(
        torch.tensor(table).reshape(1, 16, 16, 8).permute(0, 3, 1, 2),
        size=(32, 32), mode="bicubic",
        align_corners=False).permute(0, 2, 3, 1).reshape(32 * 32, 8)
    np.testing.assert_allclose(got, want.numpy(), atol=2e-5,
                               rtol=2e-4)
