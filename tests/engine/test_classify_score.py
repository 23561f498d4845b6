"""Classification + score/rerank (reference: LLM.classify/score,
/classify /score /rerank routes; HF parity for the score head)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM


@pytest.fixture(scope="module")
def cls_dir(tmp_path_factory):
    import torch
    import transformers

    cfg = transformers.Qwen2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        num_labels=3, pad_token_id=2)
    torch.manual_seed(0)
    hf = transformers.Qwen2ForSequenceClassification(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-qwen2-cls"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_classify_matches_hf(cls_dir):
    import torch

    path, hf = cls_dir
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    tk = llm.get_tokenizer()
    prompts = ["hello world this is", "a test of the tokenizer"]
    outs = llm.classify(prompts)
    for p, o in zip(prompts, outs):
        ids = torch.tensor([tk(p)["input_ids"]])
        with torch.no_grad():
            ref = torch.softmax(hf(ids).logits[0], -1).numpy()
        np.testing.assert_allclose(np.asarray(o.data), ref,
                                   atol=2e-3, rtol=2e-3)


def test_score_and_rerank(tiny_llama_dir):
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    # self-similarity of identical texts must be maximal (=1 after
    # normalization)
    s_same = llm.score("hello world", "hello world")[0]
    s_diff = llm.score("hello world", "a test of the tokenizer")[0]
    assert s_same == pytest.approx(1.0, abs=1e-4)
    assert s_diff < s_same
    ranked = llm.rerank("hello world",
                        ["a test of the", "hello world", "tokenizer"])
    assert ranked[0][0] == 1  # identical doc ranks first
    assert ranked[0][1] >= ranked[1][1] >= ranked[2][1]
