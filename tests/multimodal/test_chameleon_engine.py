"""Chameleon through the engine: host-side VQ-GAN tokenization +
per-head-LN llama decoder with image-logit masking; greedy matches HF
(reference: vllm/model_executor/models/chameleon.py)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

S = 32  # resolution 32, one downsample -> 16x16 = 256 latent tokens
NTOK = 256
N_CODES = 32


def _letters(i: int) -> str:
    return "".join(chr(ord("A") + int(d)) for d in str(i))


@pytest.fixture(scope="module")
def chameleon_dir(tmp_path_factory):
    import torch
    import transformers
    from transformers import ChameleonConfig, ChameleonVQVAEConfig

    vocab_map = {"<image>": 599}
    for i in range(N_CODES):
        vocab_map[f"IMGIMG{_letters(i)}Z"] = 500 + i
    v = ChameleonVQVAEConfig(
        embed_dim=8, num_embeddings=N_CODES, latent_channels=8,
        base_channels=32, channel_multiplier=[1, 2], num_res_blocks=1,
        resolution=S, attn_resolutions=[16])
    cfg = ChameleonConfig(
        vocab_size=600, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=512,
        vq_config=v.to_dict(), vocabulary_map=vocab_map,
        swin_norm=False)
    torch.manual_seed(0)
    hf = transformers.ChameleonForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-chameleon"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_chameleon_vq_tokens_match_hf(chameleon_dir):
    import torch

    path, hf = chameleon_dir
    from vllm_main_modify_tpu.config import ModelConfig
    from vllm_main_modify_tpu.multimodal.chameleon_vq import \
        image_tokenizer

    mc = ModelConfig(model=path, dtype="float32", max_model_len=512)
    assert mc.is_multimodal and mc.image_token_index == 599
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    got = image_tokenizer(mc).encode(pix)
    with torch.no_grad():
        want = hf.model.get_image_tokens(
            torch.tensor(pix[None]))[0].tolist()
    assert got == want


def test_chameleon_generate_matches_hf(chameleon_dir):
    import torch

    path, hf = chameleon_dir
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    llm = LLM(model=path, dtype="float32", max_model_len=512,
              max_num_seqs=4, max_num_batched_tokens=512, block_size=8,
              num_kv_blocks=256)
    out = llm.generate(
        [{"prompt_token_ids": [5, 599, 9, 42],
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    expanded = [5] + [599] * NTOK + [9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(pix[None]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0].tolist()[-8:]
    assert list(out.outputs[0].token_ids) == ref


def test_chameleon_text_only_matches_hf(chameleon_dir):
    import torch

    path, hf = chameleon_dir
    llm = LLM(model=path, dtype="float32", max_model_len=512,
              max_num_seqs=4, max_num_batched_tokens=512, block_size=8,
              num_kv_blocks=256)
    ids = [5, 9, 42, 77, 3]
    out = llm.generate(
        [{"prompt_token_ids": ids}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    with torch.no_grad():
        gen = hf.generate(input_ids=torch.tensor([ids]),
                          max_new_tokens=8, do_sample=False,
                          eos_token_id=None, pad_token_id=0)
    assert list(out.outputs[0].token_ids) == gen[0].tolist()[-8:]
    # image codebook ids must never be emitted in text generation
    assert all(not (500 <= t < 500 + N_CODES)
               for t in out.outputs[0].token_ids)
