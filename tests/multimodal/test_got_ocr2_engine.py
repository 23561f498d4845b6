"""GOT-OCR2 through the engine: SAM windowed ViT (decomposed rel-pos
biases, global layers) + conv neck/upsampler over a Qwen2 decoder;
greedy matches HF (reference: vllm/model_executor/models/got_ocr2.py)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 500
S = 32  # patch 8 -> grid 4 -> /4 -> 1 token


@pytest.fixture(scope="module")
def got_dir(tmp_path_factory):
    import torch
    import transformers
    from transformers import GotOcr2Config
    from transformers.models.got_ocr2.configuration_got_ocr2 import \
        GotOcr2VisionConfig

    v = GotOcr2VisionConfig(
        hidden_size=32, mlp_dim=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=S, patch_size=8,
        window_size=2, global_attn_indexes=[1], output_channels=16,
        use_rel_pos=True, use_abs_pos=True)
    cfg = GotOcr2Config(
        vision_config=v.to_dict(),
        text_config=dict(model_type="qwen2", vocab_size=512,
                         hidden_size=48, intermediate_size=96,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2,
                         max_position_embeddings=128,
                         architectures=["Qwen2ForCausalLM"]),
        image_token_index=IMG_TOK)
    torch.manual_seed(0)
    hf = transformers.GotOcr2ForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-got"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_got_ocr2_matches_hf(got_dir):
    import torch

    path, hf = got_dir
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
    expanded = [5, IMG_TOK, 9, 42]  # 1 image token -> no expansion
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(pix[None]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0].tolist()[-8:]
    assert list(out.outputs[0].token_ids) == ref
