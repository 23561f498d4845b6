"""Fuyu through the engine (reference: fuyu.py): raw patch linear
projection into the Persimmon decoder — HF greedy match."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 500


def test_fuyu_generate_matches_hf(tmp_path):
    import torch
    import transformers

    text = dict(vocab_size=512, hidden_size=64, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=128, model_type="persimmon")
    cfg = transformers.FuyuConfig(text_config=text, patch_size=14,
                                  num_channels=3,
                                  image_token_id=IMG_TOK,
                                  hidden_size=64)
    torch.manual_seed(0)
    hf = transformers.FuyuForCausalLM(cfg).to(torch.float32).eval()
    path = tmp_path / "tiny-fuyu"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)

    llm = LLM(model=str(path), dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256, mm_image_size=28)
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, 28, 28)).astype(np.float32)
    prompt_ids = [5, IMG_TOK, 7, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=10,
                       ignore_eos=True))[0]

    # HF side: 4 patches (28/14 grid), patchify channel-last
    g, ps = 2, 14
    x = pix.reshape(3, g, ps, g, ps).transpose(1, 3, 2, 4, 0)
    patches = torch.tensor(x.reshape(1, g * g, ps * ps * 3))
    expanded = [5] + [IMG_TOK] * 4 + [7, 9, 42]
    idx = torch.full((1, len(expanded)), -1, dtype=torch.long)
    idx[0, 1:5] = torch.arange(4)
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            image_patches=patches,
            image_patches_indices=idx,
            max_new_tokens=10, do_sample=False,
            eos_token_id=None, pad_token_id=0)
    ref = gen[0, len(expanded):].tolist()
    assert list(out.outputs[0].token_ids) == ref
