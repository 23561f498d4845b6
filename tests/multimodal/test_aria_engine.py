"""Aria through the engine: SigLIP tower → learned-query projector
(double-projection cross-attention) → fused-expert MoE decoder;
greedy matches HF (reference: vllm/model_executor/models/aria.py)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 60
S = 32  # image 32, patch 8 -> 16 patches
NQ = 8


@pytest.fixture(scope="module")
def aria_dir(tmp_path_factory):
    import torch
    import transformers
    from transformers import AriaConfig, AriaTextConfig, \
        Idefics3VisionConfig

    vcfg = Idefics3VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=S, patch_size=8)
    tcfg = AriaTextConfig(
        vocab_size=512, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, moe_num_experts=4, moe_topk=2,
        moe_num_shared_experts=1, max_position_embeddings=128,
        architectures=["AriaTextForCausalLM"])
    cfg = AriaConfig(vision_config=vcfg, text_config=tcfg,
                     image_token_index=IMG_TOK,
                     projector_patch_to_query_dict={16: NQ})
    torch.manual_seed(0)
    hf = transformers.AriaForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-aria"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_aria_generate_matches_hf(aria_dir):
    import torch

    path, hf = aria_dir
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
    expanded = [5] + [IMG_TOK] * NQ + [9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(pix[None]),
            pixel_mask=torch.ones((1, S, S), dtype=torch.long),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0].tolist()[-8:]
    assert list(out.outputs[0].token_ids) == ref


def test_aria_text_only_matches_hf(aria_dir):
    import torch

    path, hf = aria_dir
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
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
