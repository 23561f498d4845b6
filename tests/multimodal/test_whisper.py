"""Whisper encoder-decoder through the engine vs HF greedy
(reference: vllm/model_executor/models/whisper.py + cross-attention
KV spec)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def whisper_dir(tmp_path_factory):
    import torch
    import transformers

    cfg = transformers.WhisperConfig(
        vocab_size=256, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, num_mel_bins=80,
        max_source_positions=24, max_target_positions=64,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1)
    torch.manual_seed(0)
    hf = transformers.WhisperForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-whisper"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def _mel(seed):
    # precomputed log-mel [80, 48] → conv stride 2 → 24 = T_enc
    rng = np.random.default_rng(seed)
    return rng.standard_normal((80, 48)).astype(np.float32)


def _hf_greedy(hf, feats, prompt_ids, n):
    # manual loop: WhisperGenerationMixin.generate injects
    # transcription logic (suppress/forced tokens) that a raw LM
    # comparison must not include
    import torch

    ids = list(prompt_ids)
    with torch.no_grad():
        for _ in range(n):
            logits = hf(
                input_features=torch.tensor(feats[None]),
                decoder_input_ids=torch.tensor([ids])).logits
            ids.append(int(logits[0, -1].argmax()))
    return ids[len(prompt_ids):]


@pytest.fixture(scope="module")
def llm(whisper_dir):
    path, _ = whisper_dir
    return LLM(model=path, dtype="float32", max_model_len=64,
               max_num_seqs=4, max_num_batched_tokens=32, block_size=4,
               num_kv_blocks=128)


def test_whisper_matches_hf(whisper_dir, llm):
    _, hf = whisper_dir
    feats = _mel(0)
    prompt = [1, 5, 9]
    out = llm.generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"audio": feats}}],
        SamplingParams(temperature=0.0, max_tokens=12,
                       ignore_eos=True))[0]
    ref = _hf_greedy(hf, feats, prompt, 12)
    assert out.outputs[0].token_ids == ref


def test_different_audio_different_output(whisper_dir, llm):
    _, hf = whisper_dir
    prompt = [1, 5, 9]
    sp = SamplingParams(temperature=0.0, max_tokens=10,
                        ignore_eos=True)
    outs = []
    for seed in (0, 7):
        feats = _mel(seed)
        out = llm.generate(
            [{"prompt_token_ids": prompt,
              "multi_modal_data": {"audio": feats}}], sp)[0]
        assert out.outputs[0].token_ids == _hf_greedy(
            hf, feats, prompt, 10), f"seed {seed}"
        outs.append(out.outputs[0].token_ids)
    # NOTE: a random tiny model degenerates to the same attractor for
    # both audios (HF agrees) — the per-seed exact HF match above is
    # the conditioning evidence, not output inequality


def test_two_audio_requests_batched(whisper_dir, llm):
    """Two concurrent audio requests: cross pools must not leak
    across slots."""
    _, hf = whisper_dir
    prompt = [1, 5, 9]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    f0, f1 = _mel(0), _mel(7)
    outs = llm.generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"audio": f0}},
         {"prompt_token_ids": prompt,
          "multi_modal_data": {"audio": f1}}], sp)
    assert outs[0].outputs[0].token_ids == _hf_greedy(hf, f0, prompt, 8)
    assert outs[1].outputs[0].token_ids == _hf_greedy(hf, f1, prompt, 8)


def test_default_decoder_prompt(whisper_dir, llm):
    out = llm.generate(
        [{"multi_modal_data": {"audio": _mel(0)}}],
        SamplingParams(temperature=0.0, max_tokens=4,
                       ignore_eos=True))[0]
    assert out.prompt_token_ids[0] == 1  # decoder_start_token_id
    assert len(out.outputs[0].token_ids) == 4
