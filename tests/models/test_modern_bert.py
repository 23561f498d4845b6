"""ModernBERT parity (reference: vllm modernbert.py): pre-norm rope
encoder with alternating global/local attention and GeGLU MLP —
embeddings and classification vs HF."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM

KW = dict(vocab_size=512, hidden_size=64, intermediate_size=96,
          num_hidden_layers=3, num_attention_heads=4,
          max_position_embeddings=128, global_attn_every_n_layers=2,
          local_attention=8, pad_token_id=0)


def _build(tmp_path, cls, **over):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.ModernBertConfig(**dict(KW, **over))
    hf = getattr(transformers, cls)(cfg).to(torch.float32).eval()
    path = tmp_path / cls
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(str(path))
    return str(path), hf


def test_modernbert_embed_matches_hf(tmp_path):
    import torch

    path, hf = _build(tmp_path, "ModernBertModel")
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=8)
    # long enough that local-window layers actually mask (window=4)
    prompts = [[5, 9, 42, 7, 13, 77, 21, 8, 100, 3],
               [11, 3, 99, 100, 33]]
    outs = llm.embed([list(p) for p in prompts])
    for ids, out in zip(prompts, outs):
        with torch.no_grad():
            ref = hf(torch.tensor([ids])).last_hidden_state[0, 0]
        ref = ref.numpy()
        ref = ref / np.linalg.norm(ref)
        np.testing.assert_allclose(np.asarray(out.data), ref,
                                   atol=2e-3, rtol=2e-3)


def test_modernbert_classification(tmp_path):
    import torch

    path, hf = _build(tmp_path, "ModernBertForSequenceClassification",
                      num_labels=3)
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=8)
    ids = [5, 9, 42, 7, 13, 77, 21, 8]
    from vllm_main_modify_tpu.sampling_params import PoolingParams

    out = llm.embed([ids], PoolingParams(task="classify",
                                         activation="none"))[0]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0]
    np.testing.assert_allclose(np.asarray(out.data), ref.numpy(),
                               atol=2e-3, rtol=2e-3)
