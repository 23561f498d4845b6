"""RVL (Reka Flash VL) through the engine: the LLaVA-OneVision recipe
with a LayerNorm ahead of the projector MLP (reference:
vllm/model_executor/models/rvl.py — upstream config is
remote-code-only; the oracle is HF LlavaOnevision with the RVL
projector swapped in)."""

import json

import numpy as np

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 255


def test_rvl_generate_matches_oracle(tmp_path):
    import torch
    import transformers

    vision = dict(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  image_size=28, patch_size=14, num_channels=3)
    text = dict(vocab_size=512, hidden_size=64, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=128,
                model_type="qwen2")
    cfg = transformers.LlavaOnevisionConfig(
        text_config=text, vision_config=vision,
        image_token_index=IMG_TOK, video_token_index=254,
        image_grid_pinpoints=[[28, 28]],
        vision_feature_select_strategy="full",
        vision_feature_layer=-1)
    torch.manual_seed(0)
    hf = transformers.LlavaOnevisionForConditionalGeneration(cfg).to(
        torch.float32).eval()

    class RVLProjector(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.pre_norm = torch.nn.LayerNorm(32, eps=1e-6)
            self.linear_1 = torch.nn.Linear(32, 64)
            self.act = torch.nn.GELU()
            self.linear_2 = torch.nn.Linear(64, 64)

        def forward(self, x):
            return self.linear_2(
                self.act(self.linear_1(self.pre_norm(x))))

    with torch.no_grad():
        proj = RVLProjector().float()
        torch.nn.init.normal_(proj.pre_norm.weight, 1.0, 0.1)
        torch.nn.init.normal_(proj.pre_norm.bias, 0.0, 0.1)
    hf.model.multi_modal_projector = proj
    hf = hf.eval()
    path = tmp_path / "tiny-rvl"
    hf.save_pretrained(path, safe_serialization=True)
    # claim the RVL architecture in the raw config
    cj = json.loads((path / "config.json").read_text())
    cj["architectures"] = ["RForConditionalGeneration"]
    (path / "config.json").write_text(json.dumps(cj))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)

    llm = LLM(model=str(path), dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, 28, 28)).astype(np.float32)
    prompt_ids = [5, IMG_TOK, 7, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=10,
                       ignore_eos=True))[0]
    expanded = [5] + [IMG_TOK] * 10 + [7, 9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(np.stack([pix, pix])[None]),
            image_sizes=torch.tensor([[28, 28]]),
            max_new_tokens=10, do_sample=False,
            eos_token_id=None, pad_token_id=0)
    ref = gen[0, len(expanded):].tolist()
    assert list(out.outputs[0].token_ids) == ref
