"""Embedding/pooling model path (reference: tests/models/embedding)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def embed_model_dir(tmp_path_factory):
    """Tiny LlamaModel (no lm_head) checkpoint."""
    import torch
    from transformers import LlamaConfig, LlamaModel

    path = tmp_path_factory.mktemp("models") / "tiny-embed"
    cfg = LlamaConfig(vocab_size=512, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=256)
    torch.manual_seed(0)
    LlamaModel(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True)
    # reuse the generation tokenizer
    return str(path)


def test_embed_e2e(embed_model_dir, tiny_llama_dir):
    import shutil, os
    # copy tokenizer files next to the embed checkpoint
    for f in os.listdir(tiny_llama_dir):
        if "token" in f or f == "special_tokens_map.json":
            shutil.copy(os.path.join(tiny_llama_dir, f),
                        os.path.join(embed_model_dir, f))

    from vllm_main_modify_tpu.entrypoints.llm import LLM

    llm = LLM(model=embed_model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    outs = llm.embed(["hello world", "a test of the tokenizer"])
    assert len(outs) == 2
    for o in outs:
        vec = np.asarray(o.data)
        assert vec.shape == (64, )
        np.testing.assert_allclose(np.linalg.norm(vec), 1.0, atol=1e-5)
    # different prompts → different embeddings
    assert not np.allclose(outs[0].data, outs[1].data)
    # deterministic
    outs2 = llm.embed(["hello world"])
    np.testing.assert_allclose(outs2[0].data, outs[0].data, atol=1e-5)
