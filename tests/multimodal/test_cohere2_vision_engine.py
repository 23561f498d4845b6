"""Cohere2Vision (Command A Vision) through the engine: post-LN
SigLIP → pixel shuffle → SwiGLU alignment (no adapter layernorm) →
Cohere2 sliding-window decoder; greedy matches HF (reference:
vllm/model_executor/models/cohere2_vision.py)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 120
S = 32  # patch 8 -> grid 4 -> f=2 -> 4 tokens


@pytest.fixture(scope="module")
def c2v_dir(tmp_path_factory):
    import torch
    import transformers

    cfg = transformers.Cohere2VisionConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=S, patch_size=8,
                           num_channels=3),
        text_config=dict(model_type="cohere2", vocab_size=512,
                         hidden_size=48, intermediate_size=96,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=4,
                         max_position_embeddings=128,
                         logit_scale=0.5, layer_norm_eps=1e-5,
                         sliding_window=16, sliding_window_pattern=2,
                         architectures=["Cohere2ForCausalLM"]),
        image_token_id=IMG_TOK, downsample_factor=2,
        alignment_intermediate_size=64)
    torch.manual_seed(0)
    hf = transformers.Cohere2VisionForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-c2v"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_cohere2_vision_matches_hf(c2v_dir):
    import torch

    path, hf = c2v_dir
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
    expanded = [5] + [IMG_TOK] * 4 + [9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(pix[None]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0].tolist()[-8:]
    assert list(out.outputs[0].token_ids) == ref
