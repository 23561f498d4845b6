"""Qwen2.5-Omni thinker through the engine: Qwen2.5-VL vision +
chunked Whisper-style audio tower over the mrope decoder; greedy
matches HF for image and audio prompts (reference:
vllm/model_executor/models/qwen2_5_omni_thinker.py)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 120
AUD_TOK = 121
VSTART = 122
SIZE = 16  # patch 4, merge 2 -> 4x4 grid -> 4 tokens
NTOK_IMG = 4
MEL = 32
N_WINDOW = 10
MAX_SRC = 50
FRAMES = 100  # (max_src*2 // 2*n_window) * 2*n_window
NTOK_AUD = 25


@pytest.fixture(scope="module")
def omni_dir(tmp_path_factory):
    import torch
    import transformers
    from transformers import (Qwen2_5OmniThinkerConfig,
                              Qwen2_5OmniThinkerForConditionalGeneration)
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni \
        import (Qwen2_5OmniAudioEncoderConfig, Qwen2_5OmniTextConfig,
                Qwen2_5OmniVisionEncoderConfig)

    a = Qwen2_5OmniAudioEncoderConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=64, num_mel_bins=MEL,
        max_source_positions=MAX_SRC, output_dim=48,
        n_window=N_WINDOW)
    v = Qwen2_5OmniVisionEncoderConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
        out_hidden_size=48, window_size=8, fullatt_block_indexes=[1],
        tokens_per_second=2)
    t = Qwen2_5OmniTextConfig(
        vocab_size=512, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=512,
        rope_scaling={"type": "default", "rope_type": "default",
                      "mrope_section": [2, 2, 2]})
    cfg = Qwen2_5OmniThinkerConfig(
        audio_config=a.to_dict(), vision_config=v.to_dict(),
        text_config=t.to_dict(), audio_token_index=AUD_TOK,
        image_token_index=IMG_TOK, video_token_index=123)
    cfg.vision_start_token_id = VSTART
    torch.manual_seed(0)
    hf = Qwen2_5OmniThinkerForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-omni"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


@pytest.fixture(scope="module")
def omni_llm(omni_dir):
    path, _ = omni_dir
    return LLM(model=path, dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
               num_kv_blocks=128, mm_image_size=SIZE)


def test_omni_audio_matches_hf(omni_dir, omni_llm):
    import torch

    path, hf = omni_dir
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((MEL, FRAMES)).astype(np.float32)
    out = omni_llm.generate(
        [{"prompt_token_ids": [5, AUD_TOK, 9, 42],
          "multi_modal_data": {"audio": mel}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    expanded = [5] + [AUD_TOK] * NTOK_AUD + [9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            input_features=torch.tensor(mel[None]),
            feature_attention_mask=torch.ones((1, FRAMES),
                                              dtype=torch.long),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0].tolist()[-8:]
    assert list(out.outputs[0].token_ids) == ref


def test_omni_image_matches_hf(omni_dir, omni_llm):
    import sys
    import os

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "models"))
    from test_qwen2_vl import hf_patchify

    path, hf = omni_dir
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((3, SIZE, SIZE)).astype(np.float32)
    out = omni_llm.generate(
        [{"prompt_token_ids": [5, VSTART, IMG_TOK, 9],
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    expanded = [5, VSTART] + [IMG_TOK] * NTOK_IMG + [9]
    patches = hf_patchify(pix, 4, 2, 2)
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([[1, 4, 4]]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0].tolist()[-8:]
    assert list(out.outputs[0].token_ids) == ref
