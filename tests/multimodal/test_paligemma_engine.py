"""PaliGemma through the engine (reference: paligemma.py): prefix-LM
bidirectional prompt attention + linear projector with the
1/sqrt(text_hidden) feature scale — HF greedy match."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 255


@pytest.fixture(scope="module")
def pg_dir(tmp_path_factory):
    import torch
    import transformers

    vision = dict(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  image_size=28, patch_size=14, num_channels=3,
                  projection_dim=64)
    text = dict(vocab_size=512, hidden_size=64, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, head_dim=16,
                max_position_embeddings=128)
    cfg = transformers.PaliGemmaConfig(
        text_config=text, vision_config=vision,
        image_token_index=IMG_TOK, projection_dim=64)
    torch.manual_seed(0)
    hf = transformers.PaliGemmaForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-paligemma"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_paligemma_generate_matches_hf(pg_dir):
    import torch

    path, hf = pg_dir
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, 28, 28)).astype(np.float32)
    # paligemma convention: image first, then the text prefix
    prompt_ids = [IMG_TOK, 5, 7, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=10,
                       ignore_eos=True))[0]
    expanded = [IMG_TOK] * 4 + [5, 7, 9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(pix[None]),
            max_new_tokens=10, do_sample=False,
            eos_token_id=None, pad_token_id=0)
    ref = gen[0, len(expanded):].tolist()
    assert list(out.outputs[0].token_ids) == ref


def test_prefix_lm_prompt_exceeding_budget_rejected(pg_dir):
    """A prefix-LM prompt longer than max_num_batched_tokens can never
    be scheduled whole (the bidirectional span must enter the KV in
    one step), so ingest must reject it instead of starving it."""
    path, _ = pg_dir
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((3, 28, 28)).astype(np.float32)
    # 4 image tokens + 70 text tokens = 74 > 64 budget
    prompt_ids = [IMG_TOK] + [5] * 70
    with pytest.raises(ValueError, match="prefix-LM prompt"):
        llm.generate(
            [{"prompt_token_ids": prompt_ids,
              "multi_modal_data": {"image": pix}}],
            SamplingParams(temperature=0.0, max_tokens=2,
                           ignore_eos=True))
