"""MiDasheng-LM through the engine: Dasheng audio ViT (mel BatchNorm,
time/freq position tables, layer-scale blocks) + k-frame subsample
projector over Qwen2; greedy matches a hand-stitched torch oracle
(reference: vllm/model_executor/models/midashenglm.py — upstream is
remote-code-only)."""

import json

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

AUD = 500
MELS = 16
T = 40  # frames; patch/stride 4 -> grid (4, 10) -> 40 -> k=5 -> 8
D = 32
H = 48
NTOK = 8


@pytest.fixture(scope="module")
def mdlm_dir(tmp_path_factory):
    import torch
    from safetensors.torch import save_file
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)

    class Tower(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.init_bn = torch.nn.BatchNorm2d(MELS, momentum=0.01)
            with torch.no_grad():
                self.init_bn.running_mean.normal_(0, 0.3)
                self.init_bn.running_var.uniform_(0.5, 1.5)
                self.init_bn.weight.normal_(1, 0.1)
                self.init_bn.bias.normal_(0, 0.1)
            self.proj = torch.nn.Conv2d(1, D, 4, 4)
            self.time_pos = torch.nn.Parameter(
                torch.randn(1, D, 1, 10) * 0.1)
            self.freq_pos = torch.nn.Parameter(
                torch.randn(1, D, 4, 1) * 0.1)
            self.blocks = torch.nn.ModuleList()
            for _ in range(2):
                b = torch.nn.Module()
                b.norm1 = torch.nn.LayerNorm(D, eps=1e-6)
                b.attn = torch.nn.MultiheadAttention(
                    D, 4, batch_first=True)
                b.ls1 = torch.nn.Parameter(torch.rand(D) * 0.1)
                b.norm2 = torch.nn.LayerNorm(D, eps=1e-6)
                b.fc1 = torch.nn.Linear(D, 4 * D)
                b.fc2 = torch.nn.Linear(4 * D, D)
                b.ls2 = torch.nn.Parameter(torch.rand(D) * 0.1)
                self.blocks.append(b)
            self.norm = torch.nn.LayerNorm(D, eps=1e-6)
            self.lin0 = torch.nn.Linear(D * 5, H)
            self.lin2 = torch.nn.Linear(H, H)

        def forward(self, mel):  # [MELS, T]
            x = mel[None, :, None, :]  # [1, mels, 1, T]
            x = self.init_bn(x).permute(0, 2, 1, 3)  # [1, 1, mels, T]
            x = self.proj(x)  # [1, D, 4, 10]
            x = x + self.time_pos
            x = x + self.freq_pos
            x = x.flatten(2).permute(0, 2, 1)  # [1, 40, D]
            for b in self.blocks:
                h = b.norm1(x)
                x = x + b.attn(h, h, h)[0] * b.ls1
                x = x + b.fc2(torch.nn.functional.gelu(
                    b.fc1(b.norm2(x)))) * b.ls2
            x = self.norm(x)[0]
            x = x.reshape(8, 5 * D)
            return self.lin2(
                torch.nn.functional.gelu(self.lin0(x)))

    tower = Tower().float().eval()
    tcfg = Qwen2Config(vocab_size=512, hidden_size=H,
                       intermediate_size=96, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       max_position_embeddings=128,
                       rope_theta=10000.0, tie_word_embeddings=False)
    llm = Qwen2ForCausalLM(tcfg).float().eval()

    sd = {}
    tsd = tower.state_dict()
    sd["audio_encoder.init_bn.weight"] = tsd["init_bn.weight"]
    sd["audio_encoder.init_bn.bias"] = tsd["init_bn.bias"]
    sd["audio_encoder.init_bn.running_mean"] = \
        tsd["init_bn.running_mean"]
    sd["audio_encoder.init_bn.running_var"] = \
        tsd["init_bn.running_var"]
    sd["audio_encoder.patch_embed.proj.weight"] = tsd["proj.weight"]
    sd["audio_encoder.patch_embed.proj.bias"] = tsd["proj.bias"]
    sd["audio_encoder.time_pos_embed"] = tsd["time_pos"]
    sd["audio_encoder.freq_pos_embed"] = tsd["freq_pos"]
    sd["audio_encoder.norm.weight"] = tsd["norm.weight"]
    sd["audio_encoder.norm.bias"] = tsd["norm.bias"]
    for i in range(2):
        p = f"audio_encoder.blocks.{i}."
        sd[p + "norm1.weight"] = tsd[f"blocks.{i}.norm1.weight"]
        sd[p + "norm1.bias"] = tsd[f"blocks.{i}.norm1.bias"]
        sd[p + "attn.qkv.weight"] = \
            tsd[f"blocks.{i}.attn.in_proj_weight"]
        sd[p + "attn.qkv.bias"] = tsd[f"blocks.{i}.attn.in_proj_bias"]
        sd[p + "attn.proj.weight"] = \
            tsd[f"blocks.{i}.attn.out_proj.weight"]
        sd[p + "attn.proj.bias"] = \
            tsd[f"blocks.{i}.attn.out_proj.bias"]
        sd[p + "ls1.gamma"] = tsd[f"blocks.{i}.ls1"]
        sd[p + "ls2.gamma"] = tsd[f"blocks.{i}.ls2"]
        sd[p + "norm2.weight"] = tsd[f"blocks.{i}.norm2.weight"]
        sd[p + "norm2.bias"] = tsd[f"blocks.{i}.norm2.bias"]
        sd[p + "mlp.fc1.weight"] = tsd[f"blocks.{i}.fc1.weight"]
        sd[p + "mlp.fc1.bias"] = tsd[f"blocks.{i}.fc1.bias"]
        sd[p + "mlp.fc2.weight"] = tsd[f"blocks.{i}.fc2.weight"]
        sd[p + "mlp.fc2.bias"] = tsd[f"blocks.{i}.fc2.bias"]
    sd["audio_projector.net.0.weight"] = tsd["lin0.weight"]
    sd["audio_projector.net.0.bias"] = tsd["lin0.bias"]
    sd["audio_projector.net.2.weight"] = tsd["lin2.weight"]
    sd["audio_projector.net.2.bias"] = tsd["lin2.bias"]
    for k, v in llm.state_dict().items():
        sd["decoder." + k] = v.contiguous()
    path = tmp_path_factory.mktemp("models") / "tiny-midasheng"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(path / "model.safetensors"))
    cfg = {
        "architectures": ["MiDashengLMModel"],
        "model_type": "midashenglm", "audio_token_id": AUD,
        "subsample_factor": 5,
        "audio_encoder_config": {
            "n_mels": MELS, "embed_dim": D, "num_heads": 4,
            "depth": 2, "mlp_ratio": 4.0, "qkv_bias": True,
            "init_values": 1e-5, "patch_size": 4, "patch_stride": 4,
            "target_length": 40,
        },
        "text_config": json.loads(tcfg.to_json_string()),
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), tower, llm


def test_midashenglm_matches_oracle(mdlm_dir):
    import torch

    path, tower, hf_llm = mdlm_dir
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((MELS, T)).astype(np.float32)
    engine = LLM(model=path, dtype="float32", max_model_len=128,
                 max_num_seqs=2, max_num_batched_tokens=64,
                 block_size=4, num_kv_blocks=128)
    out = engine.generate(
        [{"prompt_token_ids": [5, AUD, 9, 42],
          "multi_modal_data": {"audio": mel}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    with torch.no_grad():
        audio_tokens = tower(torch.tensor(mel))
        ids = [5] + [AUD] * NTOK + [9, 42]
        emb = hf_llm.get_input_embeddings()(torch.tensor([ids]))
        emb[0, 1:1 + NTOK] = audio_tokens
        gen = hf_llm.generate(
            inputs_embeds=emb, max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0)
    assert list(out.outputs[0].token_ids) == gen[0].tolist()[-8:]
