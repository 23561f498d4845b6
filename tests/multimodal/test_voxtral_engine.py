"""Voxtral through the engine: whisper-style encoder → final LN →
frame grouping (r = intermediate/d_model, NO avg-pool) → bias-free
two-linear projector → embedding merge; greedy matches HF."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

AUDIO_TOK = 120
MEL, MAXPOS, D, FFN = 16, 8, 32, 64  # r = 2 -> 4 audio tokens


@pytest.fixture(scope="module")
def voxtral_dir(tmp_path_factory):
    import torch
    import transformers

    cfg = transformers.VoxtralConfig(
        audio_config=dict(hidden_size=D, num_hidden_layers=2,
                          num_attention_heads=4,
                          intermediate_size=FFN, num_mel_bins=MEL,
                          max_source_positions=MAXPOS,
                          scale_embedding=False),
        text_config=dict(vocab_size=512, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128,
                         tie_word_embeddings=False,
                         architectures=["LlamaForCausalLM"]),
        audio_token_id=AUDIO_TOK)
    torch.manual_seed(0)
    hf = transformers.VoxtralForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-voxtral"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_voxtral_generate_matches_hf(voxtral_dir):
    import torch

    path, hf = voxtral_dir
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((MEL, MAXPOS * 2)).astype(np.float32)
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    prompt_ids = [5, AUDIO_TOK, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"audio": mel}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    n_tok = MAXPOS // (FFN // D)
    expanded = [5] + [AUDIO_TOK] * n_tok + [9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            input_features=torch.tensor(mel[None]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0, len(expanded):].tolist()
    assert out.outputs[0].token_ids == ref
