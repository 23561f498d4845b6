"""LLaVA-NeXT-Video through the engine: frames → CLIP tower →
spatial 2x2 pooling → projector, frames*(g//2)^2 tokens; greedy output
equals HF generate fed the identical frames. Images still take the
inherited anyres path."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 120
VID_TOK = 121
S = 32  # image size; patch 8 -> grid 4 -> pooled 2x2 per frame


@pytest.fixture(scope="module")
def lnv_dir(tmp_path_factory):
    import torch
    import transformers

    cfg = transformers.LlavaNextVideoConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=S, patch_size=8,
                           num_channels=3),
        text_config=dict(vocab_size=512, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=256,
                         architectures=["LlamaForCausalLM"]),
        image_grid_pinpoints=[[S, S], [S, 2 * S], [2 * S, S]],
        image_token_index=IMG_TOK, video_token_index=VID_TOK,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        spatial_pool_mode="average", spatial_pool_stride=2)
    torch.manual_seed(0)
    hf = transformers.LlavaNextVideoForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-llava-next-video"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_video_generate_matches_hf(lnv_dir):
    import torch

    path, hf = lnv_dir
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((3, 3, S, S)).astype(np.float32)
    llm = LLM(model=path, dtype="float32", max_model_len=256,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=4,
              num_kv_blocks=256)
    prompt_ids = [5, VID_TOK, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"video": frames}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]

    n_tok = 3 * 4  # 3 frames x (4//2)^2
    expanded = [5] + [VID_TOK] * n_tok + [9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values_videos=torch.tensor(frames[None]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0, len(expanded):].tolist()
    assert out.outputs[0].token_ids == ref


def test_image_path_still_anyres(lnv_dir):
    """The inherited image path (anyres) through the video model."""
    import torch

    path, hf = lnv_dir
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((3, S, 2 * S)).astype(np.float32)
    llm = LLM(model=path, dtype="float32", max_model_len=256,
              max_num_seqs=4, max_num_batched_tokens=256, block_size=4,
              num_kv_blocks=256)
    prompt_ids = [5, IMG_TOK, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]

    g = S // 8
    n_tok = g * g + g * (2 * g + 1)  # base + 1x2 tiles w/ newline
    expanded = [5] + [IMG_TOK] * n_tok + [9, 42]

    def resize(a, h, w):
        yi = (np.arange(h) * a.shape[1] // h).clip(0, a.shape[1] - 1)
        xi = (np.arange(w) * a.shape[2] // w).clip(0, a.shape[2] - 1)
        return a[:, yi][:, :, xi]

    base = resize(pix, S, S)
    tiles = [pix[:, :, 0:S], pix[:, :, S:2 * S]]
    crops = np.stack([base] + tiles)
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(crops[None]),
            image_sizes=torch.tensor([[S, 2 * S]]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0, len(expanded):].tolist()
    assert out.outputs[0].token_ids == ref
