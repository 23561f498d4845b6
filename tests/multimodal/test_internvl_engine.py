"""InternVL through the engine (reference: internvl.py): InternViT
layer-scale tower + pixel shuffle + LN-MLP projector — HF greedy
match via LLM.generate."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 255


@pytest.fixture(scope="module")
def ivl_dir(tmp_path_factory):
    import torch
    import transformers

    vision = dict(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  image_size=28, patch_size=14)
    text = dict(vocab_size=512, hidden_size=64, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=128,
                model_type="qwen2")
    cfg = transformers.InternVLConfig(
        text_config=text, vision_config=vision, image_token_id=IMG_TOK,
        downsample_ratio=0.5)
    torch.manual_seed(0)
    hf = transformers.InternVLForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-internvl"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_internvl_generate_matches_hf(ivl_dir):
    import torch

    path, hf = ivl_dir
    llm = LLM(model=path, dtype="float32", max_model_len=128,
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
    # grid 2x2, downsample 2 → 1 token per image
    expanded = [5, IMG_TOK, 7, 9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(pix[None]),
            max_new_tokens=10, do_sample=False,
            eos_token_id=None, pad_token_id=0)
    ref = gen[0, len(expanded):].tolist()
    assert list(out.outputs[0].token_ids) == ref
