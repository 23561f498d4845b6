"""Qwen2-VL through the engine: image prompts via LLM.generate match
HF greedy — exercises the full mrope path (prompt 3-D positions +
decode delta) and the fixed-resolution ViT ingest."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 120
VSTART = 121
SIZE = 16  # patch 4 -> grid 4 -> 4 merged tokens per image


@pytest.fixture(scope="module")
def qwen2vl_dir(tmp_path_factory):
    import torch
    import transformers

    cfg = transformers.Qwen2VLConfig(
        vocab_size=512, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        image_token_id=IMG_TOK, vision_start_token_id=VSTART,
        tie_word_embeddings=False,
        vision_config=dict(depth=2, embed_dim=32, hidden_size=32,
                           num_heads=4, patch_size=4,
                           spatial_merge_size=2, temporal_patch_size=2,
                           mlp_ratio=2))
    torch.manual_seed(0)
    hf = transformers.Qwen2VLForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-qwen2vl"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_image_generate_matches_hf(qwen2vl_dir):
    import torch

    from tests.models.test_qwen2_vl import hf_patchify

    path, hf = qwen2vl_dir
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, SIZE, SIZE)).astype(np.float32)
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256, mm_image_size=SIZE)
    prompt_ids = [5, VSTART, IMG_TOK, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    expanded = [5, VSTART] + [IMG_TOK] * 4 + [9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(hf_patchify(pix, 4, 2, 2)),
            image_grid_thw=torch.tensor([[1, 4, 4]]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0, len(expanded):].tolist()
    assert out.outputs[0].token_ids == ref
