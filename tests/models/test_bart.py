"""BART / mBART text encoder-decoder through the engine vs HF greedy
(reference: vllm/model_executor/models/bart.py, mbart.py — encoder
prompt + decoder_start_token_id decode)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from vllm_main_modify_tpu.entrypoints.llm import LLM  # noqa: E402
from vllm_main_modify_tpu.sampling_params import \
    SamplingParams  # noqa: E402


def _build(tmp_path_factory, mbart: bool):
    import torch
    import transformers

    kw = dict(vocab_size=256, d_model=64, encoder_layers=2,
              decoder_layers=2, encoder_attention_heads=4,
              decoder_attention_heads=4, encoder_ffn_dim=128,
              decoder_ffn_dim=128, max_position_embeddings=64,
              pad_token_id=0, bos_token_id=1, eos_token_id=2,
              decoder_start_token_id=2, forced_bos_token_id=None,
              scale_embedding=True)
    if mbart:
        cfg = transformers.MBartConfig(**kw)
        cls = transformers.MBartForConditionalGeneration
        name = "tiny-mbart"
    else:
        cfg = transformers.BartConfig(**kw)
        cls = transformers.BartForConditionalGeneration
        name = "tiny-bart"
    torch.manual_seed(0)
    hf = cls(cfg).to(torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / name
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def _hf_greedy(hf, enc_ids, dec_ids, n):
    import torch

    ids = list(dec_ids)
    with torch.no_grad():
        for _ in range(n):
            logits = hf(input_ids=torch.tensor([enc_ids]),
                        decoder_input_ids=torch.tensor([ids])).logits
            ids.append(int(logits[0, -1].argmax()))
    return ids[len(dec_ids):]


@pytest.fixture(scope="module", params=[False, True],
                ids=["bart", "mbart"])
def bart_env(request, tmp_path_factory):
    path, hf = _build(tmp_path_factory, request.param)
    llm = LLM(model=path, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=32, block_size=4,
              num_kv_blocks=128)
    return hf, llm


def test_bart_matches_hf(bart_env):
    hf, llm = bart_env
    enc = [4, 17, 93, 201, 55, 8]
    out = llm.generate([{"prompt_token_ids": enc}],
                       SamplingParams(temperature=0.0, max_tokens=10,
                                      ignore_eos=True))[0]
    ref = _hf_greedy(hf, enc, [2], 10)
    assert out.outputs[0].token_ids == ref


def test_bart_batched_different_lengths(bart_env):
    hf, llm = bart_env
    encs = [[4, 17, 93], [201, 55, 8, 31, 77, 12, 64, 9]]
    outs = llm.generate(
        [{"prompt_token_ids": e} for e in encs],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))
    for e, o in zip(encs, outs):
        assert o.outputs[0].token_ids == _hf_greedy(hf, e, [2], 8)


def test_bart_explicit_decoder_prompt(bart_env):
    hf, llm = bart_env
    enc = [4, 17, 93, 201]
    dec = [2, 1, 7]
    out = llm.generate(
        [{"prompt_token_ids": enc,
          "decoder_prompt_token_ids": dec}],
        SamplingParams(temperature=0.0, max_tokens=6,
                       ignore_eos=True))[0]
    assert out.outputs[0].token_ids == _hf_greedy(hf, enc, dec, 6)
