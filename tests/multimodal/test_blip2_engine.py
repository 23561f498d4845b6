"""BLIP-2 through the engine: ViT → Q-Former (cross-attention every
2nd layer) → language projection → OPT decoder; greedy matches HF
(reference: vllm/model_executor/models/blip2.py)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 130
S = 32  # image size; patch 8 -> 16 patches + CLS
NQ = 8  # query tokens


@pytest.fixture(scope="module")
def blip2_dir(tmp_path_factory):
    import torch
    import transformers

    cfg = transformers.Blip2Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=S, patch_size=8),
        qformer_config=dict(hidden_size=24, num_hidden_layers=2,
                            num_attention_heads=4,
                            intermediate_size=48,
                            encoder_hidden_size=32,
                            cross_attention_frequency=2),
        text_config=dict(model_type="opt", vocab_size=512,
                         hidden_size=40, ffn_dim=80,
                         num_hidden_layers=2, num_attention_heads=4,
                         max_position_embeddings=128,
                         word_embed_proj_dim=40,
                         architectures=["OPTForCausalLM"],
                         eos_token_id=2, pad_token_id=0,
                         bos_token_id=1),
        num_query_tokens=NQ)
    cfg.image_token_index = IMG_TOK
    cfg.image_token_id = IMG_TOK
    torch.manual_seed(0)
    hf = transformers.Blip2ForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-blip2"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_blip2_generate_matches_hf(blip2_dir):
    import torch

    path, hf = blip2_dir
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    prompt_ids = [5] + [IMG_TOK] + [9, 42, 77]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    expanded = [5] + [IMG_TOK] * NQ + [9, 42, 77]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(pix[None]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    # HF blip2 generate may return the prompt + continuation or only
    # the continuation depending on version — take the tail
    ref = gen[0].tolist()[-8:]
    assert list(out.outputs[0].token_ids) == ref


def test_blip2_encoder_sensitive_to_image(blip2_dir):
    """Different pixels must produce different Q-Former soft tokens
    (the tiny random decoder collapses to a fixed token under greedy,
    so output-level comparison is vacuous — HF does the same)."""
    import jax.numpy as jnp

    path, _ = blip2_dir
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    mr = llm.engine.engine_core.model_runner
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((1, 3, S, S)),
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((1, 3, S, S)),
                    jnp.float32)
    ea = np.asarray(mr.model.encode_images(mr.params, a))
    eb = np.asarray(mr.model.encode_images(mr.params, b))
    assert ea.shape == (1, NQ, 40)
    assert np.abs(ea - eb).max() > 1e-3
