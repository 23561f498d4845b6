"""LLaVA-NeXT (anyres) through the engine: non-square image → grid
pinpoint tiles + base, packed with image_newline columns; greedy
output equals HF generate fed the identical tiles + image_sizes."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 120
S = 16  # tile size; patch 8 -> 2x2 per tile


@pytest.fixture(scope="module")
def llava_next_dir(tmp_path_factory):
    import torch
    import transformers

    cfg = transformers.LlavaNextConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=S, patch_size=8,
                           num_channels=3),
        text_config=dict(vocab_size=512, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=256,
                         architectures=["LlamaForCausalLM"]),
        image_grid_pinpoints=[[S, S], [S, 2 * S], [2 * S, S]],
        image_token_index=IMG_TOK, vision_feature_layer=-2,
        vision_feature_select_strategy="default")
    torch.manual_seed(0)
    hf = transformers.LlavaNextForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-llava-next"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_anyres_generate_matches_hf(llava_next_dir):
    import torch

    path, hf = llava_next_dir
    rng = np.random.default_rng(0)
    # wide image -> pinpoint [S, 2S]: 2 tiles + base = 3 crops,
    # tokens = 4 (base) + 1*2 * (2*2 + 1) = 14
    pix = rng.standard_normal((3, S, 2 * S)).astype(np.float32)
    llm = LLM(model=path, dtype="float32", max_model_len=256,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=4,
              num_kv_blocks=256)
    prompt_ids = [5, IMG_TOK, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]

    n_tok = 14
    expanded = [5] + [IMG_TOK] * n_tok + [9, 42]
    # the engine's crops: base (squash to SxS) + row-major SxS tiles
    def resize(a, h, w):
        yi = (np.arange(h) * a.shape[1] // h).clip(0, a.shape[1] - 1)
        xi = (np.arange(w) * a.shape[2] // w).clip(0, a.shape[2] - 1)
        return a[:, yi][:, :, xi]

    base = resize(pix, S, S)
    tiles = [pix[:, :, 0:S], pix[:, :, S:2 * S]]
    crops = np.stack([base] + tiles)
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(crops[None]),
            image_sizes=torch.tensor([[S, 2 * S]]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0, len(expanded):].tolist()
    assert out.outputs[0].token_ids == ref
