"""LLaVA through the engine: image prompts via LLM.generate match HF
greedy; image content keys the prefix cache (same text + different
image must not share KV)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 250


@pytest.fixture(scope="module")
def llava_dir(tmp_path_factory):
    import torch
    import transformers

    vc = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=16, patch_size=8)
    tc = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128)
    cfg = transformers.LlavaConfig(
        vision_config=vc, text_config=tc, image_token_index=IMG_TOK,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default")
    torch.manual_seed(0)
    hf = transformers.LlavaForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-llava-e2e"
    hf.save_pretrained(path, safe_serialization=True)
    import sys
    sys.path.insert(0, str(path))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


@pytest.fixture(scope="module")
def llm(llava_dir):
    path, _ = llava_dir
    return LLM(model=path, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
               num_kv_blocks=256)


def _img(seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((3, 16, 16)).astype(np.float32)


def _hf_greedy(hf, token_ids, pix, n):
    import torch

    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([token_ids]),
            pixel_values=torch.tensor(pix[None]),
            max_new_tokens=n, do_sample=False,
            eos_token_id=None, pad_token_id=0)  # our side ignores eos
    return gen[0, len(token_ids):].tolist()


def test_image_generate_matches_hf(llava_dir, llm):
    _, hf = llava_dir
    pix = _img(0)
    prompt_ids = [5, IMG_TOK, 7, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=10,
                       ignore_eos=True))[0]
    # HF expands the placeholder itself on embedding merge, so feed it
    # the expanded sequence (4 patch tokens for a 16/8 grid)
    expanded = [5] + [IMG_TOK] * 4 + [7, 9, 42]
    ref = _hf_greedy(hf, expanded, pix, 10)
    assert out.outputs[0].token_ids == ref
    assert len(out.prompt_token_ids) == len(expanded)


def test_different_image_different_output(llava_dir, llm):
    """Same text, different image → (almost surely) different
    continuation AND no KV sharing via the content salt."""
    _, hf = llava_dir
    prompt_ids = [5, IMG_TOK, 7, 9, 42]
    sp = SamplingParams(temperature=0.0, max_tokens=10,
                        ignore_eos=True)
    outs = []
    for seed in (0, 3):
        pix = _img(seed)
        out = llm.generate(
            [{"prompt_token_ids": prompt_ids,
              "multi_modal_data": {"image": pix}}], sp)[0]
        expanded = [5] + [IMG_TOK] * 4 + [7, 9, 42]
        ref = _hf_greedy(hf, expanded, pix, 10)
        assert out.outputs[0].token_ids == ref, f"seed {seed}"
        outs.append(out.outputs[0].token_ids)
    assert outs[0] != outs[1]


def test_warm_repeat_same_image(llava_dir, llm):
    """Prefix-cache hit on the identical (text, image) pair must
    reproduce the cold output."""
    pix = _img(0)
    prompt_ids = [5, IMG_TOK, 7, 9, 42]
    sp = SamplingParams(temperature=0.0, max_tokens=10,
                        ignore_eos=True)
    req = {"prompt_token_ids": prompt_ids,
           "multi_modal_data": {"image": pix}}
    a = llm.generate([req], sp)[0].outputs[0].token_ids
    b = llm.generate([req], sp)[0].outputs[0].token_ids
    assert a == b


def test_text_only_on_mm_model(llm):
    out = llm.generate([{"prompt_token_ids": [5, 7, 9, 42]}],
                       SamplingParams(temperature=0.0, max_tokens=4,
                                      ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 4


def test_placeholder_count_mismatch(llm):
    with pytest.raises(ValueError, match="placeholder"):
        llm.generate(
            [{"prompt_token_ids": [5, 7],
              "multi_modal_data": {"image": [_img(0), _img(1)]}}],
            SamplingParams(max_tokens=2))
