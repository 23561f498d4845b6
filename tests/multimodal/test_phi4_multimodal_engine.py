"""Phi-4-multimodal (vision) through the engine: SigLIP feature_layer
-2 + 2x2 token compression + extensor-separated global/sub crops over
a Phi-3 decoder; greedy matches HF (reference:
vllm/model_executor/models/phi4_multimodal.py)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 500
S = 32  # patch 8 -> grid 4 -> bf 2 -> 2*2*3+1 = 13 tokens
NTOK = 13


@pytest.fixture(scope="module")
def phi4mm_dir(tmp_path_factory):
    import torch
    import transformers
    from transformers import Phi4MultimodalConfig
    from transformers.models.phi4_multimodal.configuration_phi4_multimodal import (  # noqa: E501
        Phi4MultimodalAudioConfig, Phi4MultimodalVisionConfig)

    v = Phi4MultimodalVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=S, patch_size=8,
        crop_size=S, feature_layer=-2, image_token_id=IMG_TOK)
    a = Phi4MultimodalAudioConfig(
        hidden_size=32, intermediate_size=64, num_blocks=2,
        num_attention_heads=4, depthwise_separable_out_channel=32,
        ext_pw_out_channel=32, nemo_conv_channels=32,
        nemo_final_size=5, input_size=40, downsample_rate=1,
        bias_max_distance=64, audio_token_id=501)
    cfg = Phi4MultimodalConfig(
        vocab_size=512, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        rope_theta=10000.0, partial_rotary_factor=1.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        vision_config=v.to_dict(), audio_config=a.to_dict())
    # this transformers version marks the VISION attention
    # is_causal=True; under sdpa with a trivial mask that silently
    # runs causal attention over image patches (refactor artifact —
    # the model is bidirectional). Force eager for the oracle.
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    hf = transformers.Phi4MultimodalForCausalLM(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-phi4mm"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_phi4mm_vision_matches_hf(phi4mm_dir):
    import torch

    path, hf = phi4mm_dir
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    prompt_ids = [5, IMG_TOK, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    expanded = [5] + [IMG_TOK] * NTOK + [9, 42]
    # HF: [bs, num_crops(global+sub), 3, S, S] + full-ones patch mask
    pv = torch.tensor(np.stack([pix, pix])[None])
    mask = torch.ones((1, 2, S // 8, S // 8))
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            image_pixel_values=pv,
            image_sizes=torch.tensor([[S, S]]),
            image_attention_mask=mask,
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0].tolist()[-8:]
    assert list(out.outputs[0].token_ids) == ref


def test_phi4mm_audio_matches_hf(phi4mm_dir):
    import torch

    path, hf = phi4mm_dir
    rng = np.random.default_rng(1)
    T = 24  # frames -> 24->12->6->3 tokens through the nemo stack
    feats = rng.standard_normal((T, 40)).astype(np.float32)
    n_tok = 3
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    prompt_ids = [5, 501, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"audio": feats}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    expanded = [5] + [501] * n_tok + [9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            audio_input_features=torch.tensor(feats[None]),
            audio_embed_sizes=torch.tensor([n_tok]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0].tolist()[-8:]
    assert list(out.outputs[0].token_ids) == ref
