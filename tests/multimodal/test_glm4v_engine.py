"""GLM-4.1V through the engine: image prompts via LLM.generate match
HF greedy — exercises GLM's interleaved-section mrope (partial rotary
+ section-chunk stream selection), the RMS-norm ViT with learned
absolute position embeddings, the Conv2d spatial-merge downsample and
the gated merger head."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 120
IMG_START = 121
IMG_END = 122
SIZE = 16  # patch 4 -> grid 4 -> 4 merged tokens per image


@pytest.fixture(scope="module")
def glm4v_dir(tmp_path_factory):
    import torch
    import transformers

    cfg = transformers.Glm4vConfig(
        text_config=dict(
            vocab_size=512, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            partial_rotary_factor=0.5,
            rope_scaling={"rope_type": "default",
                          "mrope_section": [1, 1, 0]},
            attention_bias=True, tie_word_embeddings=False),
        vision_config=dict(
            depth=2, hidden_size=32, num_heads=4, patch_size=4,
            image_size=SIZE, spatial_merge_size=2,
            temporal_patch_size=2, out_hidden_size=32,
            intermediate_size=48, rms_norm_eps=1e-5),
        image_token_id=IMG_TOK, image_start_token_id=IMG_START,
        image_end_token_id=IMG_END, video_start_token_id=123,
        video_end_token_id=124, video_token_id=125)
    torch.manual_seed(0)
    hf = transformers.Glm4vForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-glm4v"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_image_generate_matches_hf(glm4v_dir):
    import torch

    from tests.models.test_qwen2_vl import hf_patchify

    path, hf = glm4v_dir
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, SIZE, SIZE)).astype(np.float32)
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256, mm_image_size=SIZE)
    prompt_ids = [5, IMG_START, IMG_TOK, IMG_END, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    expanded = [5, IMG_START] + [IMG_TOK] * 4 + [IMG_END, 9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(hf_patchify(pix, 4, 2, 2)),
            image_grid_thw=torch.tensor([[1, 4, 4]]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0, len(expanded):].tolist()
    assert out.outputs[0].token_ids == ref


def test_glm4v_moe_image_generate_matches_hf(tmp_path):
    """GLM-4.5V: same tower over the Glm4Moe (sigmoid-routed V3)
    decoder with GLM interleaved mrope."""
    import torch
    import transformers

    from tests.models.test_qwen2_vl import hf_patchify

    cfg = transformers.Glm4vMoeConfig(
        text_config=dict(
            vocab_size=512, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            moe_intermediate_size=32, n_routed_experts=4,
            num_experts_per_tok=2, n_shared_experts=1,
            first_k_dense_replace=1, n_group=1, topk_group=1,
            partial_rotary_factor=0.5,
            rope_scaling={"rope_type": "default",
                          "mrope_section": [2, 1, 1]},
            tie_word_embeddings=False),
        vision_config=dict(
            depth=2, hidden_size=32, num_heads=4, patch_size=4,
            image_size=SIZE, spatial_merge_size=2,
            temporal_patch_size=2, out_hidden_size=64,
            intermediate_size=48, rms_norm_eps=1e-5),
        image_token_id=IMG_TOK, image_start_token_id=IMG_START,
        image_end_token_id=IMG_END, video_start_token_id=123,
        video_end_token_id=124, video_token_id=125)
    torch.manual_seed(0)
    hf = transformers.Glm4vMoeForConditionalGeneration(cfg).to(
        torch.float32).eval()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for k, v in hf.named_parameters():
            if "e_score_correction_bias" in k:
                v.copy_(torch.randn(v.shape, generator=g) * 0.5)
    path = tmp_path / "tiny-glm4v-moe"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)

    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, SIZE, SIZE)).astype(np.float32)
    llm = LLM(model=str(path), dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256, mm_image_size=SIZE)
    prompt_ids = [5, IMG_START, IMG_TOK, IMG_END, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    expanded = [5, IMG_START] + [IMG_TOK] * 4 + [IMG_END, 9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(hf_patchify(pix, 4, 2, 2)),
            image_grid_thw=torch.tensor([[1, 4, 4]]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0, len(expanded):].tolist()
    assert out.outputs[0].token_ids == ref


def test_text_only_matches_hf(glm4v_dir):
    """No image: the [3,T] broadcast fallback must equal plain GLM
    interleaved partial rotary."""
    import torch

    path, hf = glm4v_dir
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256, mm_image_size=SIZE)
    prompt_ids = [5, 9, 42, 7, 13]
    out = llm.generate([{"prompt_token_ids": prompt_ids}],
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True))[0]
    with torch.no_grad():
        gen = hf.generate(input_ids=torch.tensor([prompt_ids]),
                          max_new_tokens=8, do_sample=False,
                          eos_token_id=None, pad_token_id=0)
    ref = gen[0, len(prompt_ids):].tolist()
    assert out.outputs[0].token_ids == ref
