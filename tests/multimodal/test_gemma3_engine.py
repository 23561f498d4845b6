"""Gemma3 multimodal through the engine (reference: gemma3_mm.py):
image prompts via LLM.generate match HF greedy — which exercises the
SigLIP tower, avg-pool projector, unscaled image-feature merge, AND
the bidirectional image-block attention spans."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 255


@pytest.fixture(scope="module")
def gemma3_dir(tmp_path_factory):
    import torch
    import transformers

    vision = dict(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  image_size=28, patch_size=14, num_channels=3)
    text = dict(vocab_size=512, hidden_size=64, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, head_dim=16,
                max_position_embeddings=128, sliding_window=8,
                layer_types=["sliding_attention", "full_attention"])
    cfg = transformers.Gemma3Config(
        text_config=text, vision_config=vision,
        mm_tokens_per_image=4, image_token_index=IMG_TOK,
        boi_token_index=253, eoi_token_index=254)
    torch.manual_seed(0)
    hf = transformers.Gemma3ForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-gemma3-mm"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def _img(seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((3, 28, 28)).astype(np.float32)


def _hf_greedy(hf, token_ids, pix, n):
    import torch

    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([token_ids]),
            pixel_values=torch.tensor(pix[None]),
            token_type_ids=torch.tensor(
                [[1 if t == IMG_TOK else 0 for t in token_ids]]),
            max_new_tokens=n, do_sample=False,
            eos_token_id=None, pad_token_id=0)
    return gen[0, len(token_ids):].tolist()


def test_gemma3_image_generate_matches_hf(gemma3_dir):
    path, hf = gemma3_dir
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    pix = _img(0)
    prompt_ids = [5, IMG_TOK, 7, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=10,
                       ignore_eos=True))[0]
    # mm_tokens_per_image=4: [5] + 4 image tokens + [7, 9, 42]
    expanded = [5] + [IMG_TOK] * 4 + [7, 9, 42]
    ref = _hf_greedy(hf, expanded, pix, 10)
    assert list(out.outputs[0].token_ids) == ref

    # text-only on the same engine still works (no spans segment)
    out2 = llm.generate([{"prompt_token_ids": [5, 7, 9, 42]}],
                        SamplingParams(temperature=0.0, max_tokens=6,
                                       ignore_eos=True))[0]
    import torch

    with torch.no_grad():
        gen = hf.generate(input_ids=torch.tensor([[5, 7, 9, 42]]),
                          max_new_tokens=6, do_sample=False,
                          eos_token_id=None, pad_token_id=0)
    assert list(out2.outputs[0].token_ids) == gen[0, 4:].tolist()


def test_gemma3_chunked_prefill_never_splits_image(gemma3_dir):
    """With a 4-token step budget the 9-token prompt is chunked; the
    scheduler must align chunks so the 4-token bidirectional image
    block lands in ONE step — output still matches HF."""
    path, hf = gemma3_dir
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=4, block_size=4,
              num_kv_blocks=256)
    pix = _img(3)
    prompt_ids = [5, IMG_TOK, 7, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    expanded = [5] + [IMG_TOK] * 4 + [7, 9, 42]
    ref = _hf_greedy(hf, expanded, pix, 8)
    assert list(out.outputs[0].token_ids) == ref
