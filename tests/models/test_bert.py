"""BERT-family encoder parity + e2e embeddings (reference test
style: tests/models/language/pooling/). Encoder-only path: no KV
cache, whole-prompt steps, CLS/mean pooling in the fused step."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM


def _save_tok(path):
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)


@pytest.fixture(scope="module")
def bert_dir(tmp_path_factory):
    import torch
    import transformers

    cfg = transformers.BertConfig(
        vocab_size=512, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=128, sep_token_id=102)
    torch.manual_seed(0)
    hf = transformers.BertModel(cfg).to(torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-bert"
    hf.save_pretrained(path, safe_serialization=True)
    _save_tok(path)
    return str(path), hf


def test_bert_embed_matches_hf(bert_dir):
    import torch

    path, hf = bert_dir
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=8)
    prompts = [[5, 9, 42, 7], [11, 3, 99, 100, 33]]
    outs = llm.embed([list(p) for p in prompts])
    for ids, out in zip(prompts, outs):
        with torch.no_grad():
            ref = hf(torch.tensor([ids])).last_hidden_state[0, 0]
        ref = ref.numpy()
        ref = ref / np.linalg.norm(ref)  # engine normalizes
        np.testing.assert_allclose(np.asarray(out.data), ref,
                                   atol=2e-3, rtol=2e-3)


def test_bert_batched_mixed_lengths(bert_dir):
    """Two requests of different lengths packed into ONE step must
    not attend across segments."""
    import torch

    path, hf = bert_dir
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=8)
    a = [5, 9, 42]
    b = [11, 3, 99, 100, 33, 7, 8]
    outs = llm.embed([a, b])
    for ids, out in zip((a, b), outs):
        with torch.no_grad():
            ref = hf(torch.tensor([ids])).last_hidden_state[0, 0]
        ref = ref.numpy()
        ref = ref / np.linalg.norm(ref)
        np.testing.assert_allclose(np.asarray(out.data), ref,
                                   atol=2e-3, rtol=2e-3)


def test_roberta_position_offset(tmp_path):
    import torch
    import transformers

    cfg = transformers.RobertaConfig(
        vocab_size=512, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=130, pad_token_id=1)
    torch.manual_seed(0)
    hf = transformers.RobertaModel(cfg).to(torch.float32).eval()
    path = tmp_path / "tiny-roberta"
    hf.save_pretrained(path, safe_serialization=True)
    _save_tok(path)
    llm = LLM(model=str(path), dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=8)
    ids = [5, 9, 42, 7, 13]
    out = llm.embed([ids])[0]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).last_hidden_state[0, 0].numpy()
    ref = ref / np.linalg.norm(ref)
    np.testing.assert_allclose(np.asarray(out.data), ref, atol=2e-3,
                               rtol=2e-3)


def test_bert_cross_encoder_classification(tmp_path):
    """BertForSequenceClassification pair scoring: [CLS] a [SEP] b
    [SEP] with inferred token types == HF with explicit types."""
    import torch
    import transformers

    SEP = 102
    cfg = transformers.BertConfig(
        vocab_size=512, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=128, sep_token_id=SEP, num_labels=1)
    torch.manual_seed(0)
    hf = transformers.BertForSequenceClassification(cfg).to(
        torch.float32).eval()
    path = tmp_path / "tiny-cross-encoder"
    hf.save_pretrained(path, safe_serialization=True)
    _save_tok(path)
    llm = LLM(model=str(path), dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=8)
    ids = [101, 5, 9, SEP, 42, 7, SEP]
    types = [0, 0, 0, 0, 1, 1, 1]
    from vllm_main_modify_tpu.sampling_params import PoolingParams

    out = llm.embed([ids], PoolingParams(task="classify",
                                         activation="none"))[0]
    with torch.no_grad():
        ref = hf(torch.tensor([ids]),
                 token_type_ids=torch.tensor([types])).logits[0]
    np.testing.assert_allclose(np.asarray(out.data),
                               ref.numpy(), atol=2e-3, rtol=2e-3)


def test_cross_encoder_score_api(tmp_path):
    """LLM.score on a BERT cross-encoder runs each PAIR through the
    model (not embedding cosine) and matches HF."""
    import torch
    import transformers

    SEP = 102
    cfg = transformers.BertConfig(
        vocab_size=512, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=128, sep_token_id=SEP, num_labels=1)
    torch.manual_seed(0)
    hf = transformers.BertForSequenceClassification(cfg).to(
        torch.float32).eval()
    path = tmp_path / "tiny-cross-score"
    hf.save_pretrained(path, safe_serialization=True)
    _save_tok(path)
    llm = LLM(model=str(path), dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=8)
    scores = llm.score(["hot day"], ["cold night", "warm day"])
    assert len(scores) == 2
    tok = llm.get_tokenizer()
    for text2, got in zip(["cold night", "warm day"], scores):
        ids = tok("hot day", text2)["input_ids"]
        # token types as the engine infers them (from [SEP] runs)
        sep_prev = np.cumsum([1 if t == SEP else 0 for t in ids])
        types = [1 if (sp - (1 if t == SEP else 0)) >= 1 else 0
                 for t, sp in zip(ids, sep_prev)]
        with torch.no_grad():
            ref = hf(torch.tensor([ids]),
                     token_type_ids=torch.tensor([types])
                     ).logits[0, 0].item()
        np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)
    # rerank orders by the cross-encoder score
    ranked = llm.rerank("hot day", ["cold night", "warm day"])
    assert [i for i, _ in ranked] == sorted(
        range(2), key=lambda i: scores[i], reverse=True)


def test_bert_token_classification(tmp_path):
    """BertForTokenClassification: per-token logits through the
    runner's token-level ("all") pooling path."""
    import torch
    import transformers

    cfg = transformers.BertConfig(
        vocab_size=512, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=128, sep_token_id=102, num_labels=5)
    torch.manual_seed(0)
    hf = transformers.BertForTokenClassification(cfg).to(
        torch.float32).eval()
    path = tmp_path / "tiny-token-cls"
    hf.save_pretrained(path, safe_serialization=True)
    _save_tok(path)
    llm = LLM(model=str(path), dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=8)
    from vllm_main_modify_tpu.sampling_params import PoolingParams

    prompts = [[5, 9, 42, 7], [11, 3, 99, 100, 33, 2]]
    outs = llm.embed([list(p) for p in prompts],
                     PoolingParams(task="classify", activation="none"))
    for ids, out in zip(prompts, outs):
        with torch.no_grad():
            ref = hf(torch.tensor([ids])).logits[0].numpy()
        got = np.asarray(out.data)
        assert got.shape == ref.shape  # [T, num_labels]
        np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)
