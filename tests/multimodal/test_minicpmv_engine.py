"""MiniCPM-V 2.6 through the engine: idefics2-vision (SigLIP) tower +
perceiver resampler (2-D sincos keys, packed MultiheadAttention) over
a Qwen2 decoder. The oracle is hand-stitched from HF primitives
(Idefics2VisionTransformer + nn.MultiheadAttention + Qwen2ForCausalLM)
following the reference's documented forward (reference:
vllm/model_executor/models/minicpmv.py MiniCPMV2_6 + resampler.py
Resampler2_5) — the upstream model is remote-code-only."""

import json

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 500
S = 32
GRID = 4
Q = 4  # query_num
VH = 32  # vision hidden
H = 48  # text hidden


def _sincos_pos(h, w, dim):
    # MAE-style 2-D sincos, version-(2,5) layout (w coordinate first)
    omega = 1.0 / 10000**(np.arange(dim // 4, dtype=np.float32) /
                          (dim // 4))
    col = np.einsum("w,d->wd", np.arange(w, dtype=np.float32), omega)
    row = np.einsum("h,d->hd", np.arange(h, dtype=np.float32), omega)
    col2 = np.concatenate([np.sin(col), np.cos(col)], -1)
    row2 = np.concatenate([np.sin(row), np.cos(row)], -1)
    return np.concatenate([
        np.broadcast_to(col2[None], (h, w, dim // 2)),
        np.broadcast_to(row2[:, None], (h, w, dim // 2)),
    ], -1).astype(np.float32).reshape(h * w, dim)


@pytest.fixture(scope="module")
def minicpmv_dir(tmp_path_factory):
    import torch
    from safetensors.torch import save_file
    from transformers import Qwen2Config, Qwen2ForCausalLM
    from transformers.models.idefics2.configuration_idefics2 import \
        Idefics2VisionConfig
    from transformers.models.idefics2.modeling_idefics2 import \
        Idefics2VisionTransformer

    torch.manual_seed(0)
    vcfg = Idefics2VisionConfig(
        hidden_size=VH, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=S, patch_size=8,
        hidden_act="gelu_pytorch_tanh")
    vpm = Idefics2VisionTransformer(vcfg).float().eval()
    tcfg = Qwen2Config(
        vocab_size=512, hidden_size=H, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        rope_theta=10000.0, tie_word_embeddings=False)
    llm = Qwen2ForCausalLM(tcfg).float().eval()

    class Resampler(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.query = torch.nn.Parameter(torch.randn(Q, H) * 0.1)
            self.kv_proj = torch.nn.Linear(VH, H, bias=False)
            self.attn = torch.nn.MultiheadAttention(
                H, max(1, H // 128))
            self.ln_q = torch.nn.LayerNorm(H, eps=1e-6)
            self.ln_kv = torch.nn.LayerNorm(H, eps=1e-6)
            self.ln_post = torch.nn.LayerNorm(H, eps=1e-6)
            self.proj = torch.nn.Parameter(torch.randn(H, H) *
                                           H**-0.5)

        def forward(self, x):  # [1, P, VH]
            pos = torch.tensor(_sincos_pos(GRID, GRID, H))
            kv = self.ln_kv(self.kv_proj(x)).permute(1, 0, 2)
            q = self.ln_q(self.query)
            out = self.attn(q[:, None, :],
                            kv + pos[:, None, :], kv)[0]
            return (self.ln_post(out.permute(1, 0, 2)) @ self.proj)

    res = Resampler().float().eval()

    path = tmp_path_factory.mktemp("models") / "tiny-minicpmv"
    path.mkdir(parents=True, exist_ok=True)
    sd = {}
    for k, v in vpm.state_dict().items():
        sd["vpm." + k] = v.contiguous()
    for k, v in res.state_dict().items():
        sd["resampler." + k] = v.contiguous()
    for k, v in llm.state_dict().items():
        sd["llm." + k] = v.contiguous()
    save_file(sd, str(path / "model.safetensors"))
    cfg = {
        "architectures": ["MiniCPMV"], "model_type": "minicpmv",
        "version": "2.6", "query_num": Q,
        "drop_vision_last_layer": False, "image_token_id": IMG_TOK,
        "vision_config": {
            "hidden_size": VH, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": S, "patch_size": 8,
            "hidden_act": "gelu_pytorch_tanh",
            "layer_norm_eps": 1e-6,
        },
        "vocab_size": 512, "hidden_size": H,
        "intermediate_size": 96, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "max_position_embeddings": 128, "rope_theta": 10000.0,
        "rms_norm_eps": 1e-6, "tie_word_embeddings": False,
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), vpm, res, llm


def test_minicpmv_matches_oracle(minicpmv_dir):
    import torch

    path, vpm, res, hf_llm = minicpmv_dir
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    engine = LLM(model=path, dtype="float32", max_model_len=128,
                 max_num_seqs=4, max_num_batched_tokens=64,
                 block_size=4, num_kv_blocks=128)
    prompt_ids = [5, IMG_TOK, 9, 42]
    out = engine.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    # oracle: tower -> resampler -> splice -> Qwen2 greedy.
    # transformers 4.57's Idefics2VisionEmbeddings bucketize formula
    # (h/nb*(1-1e-6)) regressed full-resolution position ids to
    # [0,0,1,2,...]; the original model (and vLLM's vendored
    # idefics2_vision_model.py:99) uses arange(0, 1-1e-6, 1/nb) which
    # is the identity at full resolution — build embeddings manually
    # with identity positions
    with torch.no_grad():
        pe = vpm.embeddings.patch_embedding(
            torch.tensor(pix[None])).flatten(2).transpose(1, 2)
        emb_v = pe + vpm.embeddings.position_embedding.weight[None]
        feats = vpm.post_layernorm(
            vpm.encoder(inputs_embeds=emb_v).last_hidden_state)
        img_tokens = res(feats)[0]  # [Q, H]
        ids = [5] + [IMG_TOK] * Q + [9, 42]
        emb = hf_llm.get_input_embeddings()(torch.tensor([ids]))
        emb[0, 1:1 + Q] = img_tokens
        gen = hf_llm.generate(
            inputs_embeds=emb, max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0)
    ref = gen[0].tolist()[-8:]
    assert list(out.outputs[0].token_ids) == ref
