"""Llama 4 multimodal through the engine (reference: mllama4.py):
unfold-patch ViT with 2-D rope, trailing CLS, pixel-shuffle adapter,
bias-free projector; greedy output equals HF generate fed the single
global chunk."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 120
S = 64  # image size; patch 16 -> grid 4 -> shuffle 0.5 -> 4 tokens


@pytest.fixture(scope="module")
def llama4_mm_dir(tmp_path_factory):
    import torch
    import transformers

    cfg = transformers.Llama4Config(
        vision_config=dict(hidden_size=32, intermediate_size=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=S, patch_size=16,
                           num_channels=3, pixel_shuffle_ratio=0.5,
                           projector_input_dim=48,
                           projector_output_dim=48,
                           vision_output_dim=48, rope_theta=10000),
        text_config=dict(vocab_size=512, hidden_size=48,
                         intermediate_size=96,
                         intermediate_size_mlp=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=16,
                         num_local_experts=4, num_experts_per_tok=1,
                         interleave_moe_layer_step=2,
                         attention_chunk_size=8,
                         max_position_embeddings=128,
                         use_qk_norm=True, tie_word_embeddings=False,
                         architectures=["Llama4ForCausalLM"]),
        image_token_index=IMG_TOK, boi_token_index=121,
        eoi_token_index=122)
    torch.manual_seed(0)
    hf = transformers.Llama4ForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-llama4-mm"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_llama4_mm_generate_matches_hf(llama4_mm_dir):
    import torch

    path, hf = llama4_mm_dir
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
    n_tok = 4  # (grid * shuffle_ratio)^2
    expanded = [5] + [IMG_TOK] * n_tok + [9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(pix[None]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0, len(expanded):].tolist()
    assert list(out.outputs[0].token_ids) == ref
