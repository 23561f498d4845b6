"""LLaVA-OneVision through the engine (reference: llava_onevision.py):
single-tile SigLIP features + image_newline — HF greedy match."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 255


def test_llava_onevision_generate_matches_hf(tmp_path):
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
    path = tmp_path / "tiny-onevision"
    hf.save_pretrained(path, safe_serialization=True)
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
    # base 4 patches + tile grid 2x(2+1) = 10 image tokens; HF gets
    # [base, tile] patches + image_sizes
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
