"""Mistral3 (Pixtral tower) through the engine: greedy output matches
HF generate with images — exercises the 2-D pixtral rope, the torch-
unfold patch-merger order, and the projector."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 120
SIZE = 32  # patch 8 -> grid 4; merge 2 -> 4 tokens


@pytest.fixture(scope="module")
def mistral3_dir(tmp_path_factory):
    import torch
    import transformers

    cfg = transformers.Mistral3Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=SIZE, patch_size=8,
                           num_channels=3, head_dim=8,
                           rope_theta=10000.0),
        text_config=dict(vocab_size=512, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128,
                         architectures=["MistralForCausalLM"]),
        image_token_index=IMG_TOK, spatial_merge_size=2,
        multimodal_projector_bias=False)
    torch.manual_seed(0)
    hf = transformers.Mistral3ForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-mistral3"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_image_generate_matches_hf(mistral3_dir):
    import torch

    path, hf = mistral3_dir
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, SIZE, SIZE)).astype(np.float32)
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    prompt_ids = [5, IMG_TOK, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    expanded = [5] + [IMG_TOK] * 4 + [9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(pix[None]),
            image_sizes=torch.tensor([[SIZE, SIZE]]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0, len(expanded):].tolist()
    assert out.outputs[0].token_ids == ref
