"""Mllama (Llama 3.2 Vision) through the engine: tiled ViT encoder →
cross-KV pool at ingest, cross-attending Llama decoder; greedy matches
HF (reference: vllm/model_executor/models/mllama.py)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 511
S = 32
GRID = 4  # 32 / 8
NPP = GRID * GRID + 1  # +cls
N_TILES = 2  # aspect ratio [1, 2]


@pytest.fixture(scope="module")
def mllama_dir(tmp_path_factory):
    import torch
    import transformers
    from transformers.models.mllama.configuration_mllama import (
        MllamaConfig, MllamaTextConfig, MllamaVisionConfig)

    v = MllamaVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_global_layers=2, attention_heads=4, image_size=S,
        patch_size=8, max_num_tiles=4,
        intermediate_layers_indices=[1, 2], vision_output_dim=96,
        supported_aspect_ratios=[[1, 1], [1, 2], [2, 1], [2, 2]])
    t = MllamaTextConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=5,
        num_attention_heads=4, num_key_value_heads=2,
        cross_attention_layers=[1, 4], vocab_size=504,
        rope_theta=10000.0, rope_scaling={"rope_type": "default"},
        max_position_embeddings=256, pad_token_id=0)
    cfg = MllamaConfig(vision_config=v, text_config=t,
                       image_token_index=IMG_TOK)
    torch.manual_seed(0)
    hf = transformers.MllamaForConditionalGeneration(cfg).to(
        torch.float32).eval()
    # HF initializes the tanh gates to ZERO — cross attention would
    # contribute nothing and the tests could not see the vision path.
    # Open the gates so image content actually steers the logits.
    with torch.no_grad():
        for lyr in hf.model.language_model.layers:
            if hasattr(lyr, "cross_attn_attn_gate"):
                lyr.cross_attn_attn_gate.fill_(0.5)
                lyr.cross_attn_mlp_gate.fill_(0.3)
        vm = hf.model.vision_model
        vm.pre_tile_positional_embedding.gate.fill_(0.4)
        vm.post_tile_positional_embedding.gate.fill_(0.6)
        vm.gated_positional_embedding.gate.fill_(0.3)
    path = tmp_path_factory.mktemp("models") / "tiny-mllama"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_mllama_generate_matches_hf(mllama_dir):
    import torch

    path, hf = mllama_dir
    rng = np.random.default_rng(0)
    # pre-tiled [2, 3, S, S] → aspect ratio [1, 2] (id 2)
    tiles = rng.standard_normal((N_TILES, 3, S, S)).astype(np.float32)
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    prompt = [5, IMG_TOK, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"image": tiles}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    # HF reference: tiles zero-padded to max_num_tiles (the padding
    # tiles run the tower and leak into valid tiles exactly as in the
    # engine); the cross mask restricts text to the 2 valid tiles,
    # matching the engine's enc_len = n_tiles * num_patches prefix
    pix = torch.zeros((1, 1, 4, 3, S, S))
    pix[0, 0, :N_TILES] = torch.tensor(tiles)
    cross_mask = torch.zeros((1, len(prompt), 1, 4),
                             dtype=torch.long)
    cross_mask[:, :, 0, :N_TILES] = 1
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([prompt]), pixel_values=pix,
            aspect_ratio_ids=torch.tensor([[2]]),
            aspect_ratio_mask=torch.tensor([[[1, 1, 0, 0]]]),
            cross_attention_mask=cross_mask,
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0].tolist()[-8:]
    assert list(out.outputs[0].token_ids) == ref


def test_mllama_text_only_batch(mllama_dir):
    """A no-image request in the same engine: cross layers read an
    empty cross pool (enc_len 0 → cross attention contributes 0)."""
    import torch

    path, hf = mllama_dir
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    prompt = [5, 9, 42, 7]
    out = llm.generate(
        [{"prompt_token_ids": prompt}],
        SamplingParams(temperature=0.0, max_tokens=6,
                       ignore_eos=True))[0]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([prompt]), max_new_tokens=6,
            do_sample=False, eos_token_id=None, pad_token_id=0)
    assert list(out.outputs[0].token_ids) == gen[0].tolist()[-6:]


def test_mllama_warm_engine_slot_reuse(mllama_dir):
    """Sequential image requests on one warm engine: cross-pool slots
    free and re-assign; a repeated identical request reproduces the
    first answer and a different image changes it."""
    path, hf = mllama_dir
    rng = np.random.default_rng(5)
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    tiles_a = rng.standard_normal((N_TILES, 3, S, S)).astype(
        np.float32)
    tiles_b = rng.standard_normal((N_TILES, 3, S, S)).astype(
        np.float32)
    sp = SamplingParams(temperature=0.0, max_tokens=6,
                        ignore_eos=True)

    def run(tiles):
        return list(llm.generate(
            [{"prompt_token_ids": [5, IMG_TOK, 9],
              "multi_modal_data": {"image": tiles}}],
            sp)[0].outputs[0].token_ids)

    first = run(tiles_a)
    other = run(tiles_b)
    again = run(tiles_a)
    assert first == again
    assert first != other
