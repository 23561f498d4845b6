"""Ovis2 through the engine: RMS ViT → hidden-stride merge → visual
vocabulary softmax @ embedding table + indicator-token substitution;
greedy matches HF (reference: vllm/model_executor/models/ovis.py)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

S = 32  # patch 8 -> grid 4; stride 2 -> 4 tokens
NTOK = 4
IMG_TOK = 500
IND = [501, 502, 503, 504, 505]


@pytest.fixture(scope="module")
def ovis2_dir(tmp_path_factory):
    import torch
    import transformers
    from transformers import Ovis2Config, Ovis2VisionConfig

    vc = Ovis2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=S, patch_size=8,
        hidden_stride=2, num_visual_indicator_tokens=5,
        vocab_size=64)
    cfg = Ovis2Config(
        vision_config=vc,
        text_config=dict(model_type="qwen2", vocab_size=512,
                         hidden_size=48, intermediate_size=96,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2,
                         max_position_embeddings=128,
                         architectures=["Qwen2ForCausalLM"]),
        image_token_id=IMG_TOK, visual_indicator_token_ids=IND,
        vocab_size=512, hidden_size=48)
    torch.manual_seed(0)
    hf = transformers.Ovis2ForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-ovis2"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_ovis2_generate_matches_hf(ovis2_dir):
    import torch

    path, hf = ovis2_dir
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    prompt_ids = [5, IND[0], IMG_TOK, IND[1], 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    expanded = [5, IND[0]] + [IMG_TOK] * NTOK + [IND[1], 9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(pix[None]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0].tolist()[-8:]
    assert list(out.outputs[0].token_ids) == ref
