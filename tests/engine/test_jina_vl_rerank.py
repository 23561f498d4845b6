"""JinaVLForRanking (jina-reranker-m0): Qwen2-VL backbone + two-layer
score head over the last-token hidden state, served through the
engine's classify/pooling path (reference:
vllm/model_executor/models/jina_vl.py JinaVLScorer)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

IMG_TOKEN = 120
VSTART = 121


@pytest.fixture(scope="module")
def jina_dir(tmp_path_factory):
    import safetensors.torch as stt
    import torch
    import transformers

    cfg = transformers.Qwen2VLConfig(
        vocab_size=512, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        image_token_id=IMG_TOKEN, vision_start_token_id=VSTART,
        tie_word_embeddings=False, num_labels=1, pad_token_id=0,
        vision_config=dict(depth=2, embed_dim=32, hidden_size=32,
                           num_heads=4, patch_size=4,
                           spatial_merge_size=2, temporal_patch_size=2,
                           mlp_ratio=2))
    torch.manual_seed(0)
    hf = transformers.Qwen2VLForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-jina-vl"
    hf.save_pretrained(path, safe_serialization=True)
    # graft the JinaVLScorer head (score.0 = dense H->H, score.2 =
    # out_proj H->num_labels) onto the saved checkpoint
    torch.manual_seed(1)
    head = {
        "score.0.weight": torch.randn(32, 32) * 0.1,
        "score.0.bias": torch.randn(32) * 0.05,
        "score.2.weight": torch.randn(1, 32) * 0.1,
        "score.2.bias": torch.randn(1) * 0.05,
    }
    sd = dict(stt.load_file(path / "model.safetensors"))
    sd.update({k: v.contiguous() for k, v in head.items()})
    stt.save_file(sd, str(path / "model.safetensors"))
    import json
    cfg_json = json.loads((path / "config.json").read_text())
    cfg_json["architectures"] = ["JinaVLForRanking"]
    (path / "config.json").write_text(json.dumps(cfg_json))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf, head


def test_jina_vl_rerank_matches_hf(jina_dir):
    import torch

    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import PoolingParams

    path, hf, head = jina_dir
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=64)
    tk = llm.get_tokenizer()
    prompts = ["hello world this is", "a test of the tokenizer"]
    outs = llm.embed(prompts, PoolingParams(task="classify",
                                            activation="none"))
    for p, o in zip(prompts, outs):
        ids = torch.tensor([tk(p)["input_ids"]])
        with torch.no_grad():
            h = hf.model(input_ids=ids,
                         output_hidden_states=True).hidden_states[-1]
            v = torch.relu(h[0, -1] @ head["score.0.weight"].T +
                           head["score.0.bias"])
            ref = (v @ head["score.2.weight"].T +
                   head["score.2.bias"]).numpy()
        np.testing.assert_allclose(np.asarray(o.data).reshape(-1),
                                   ref.reshape(-1), atol=2e-3,
                                   rtol=2e-3)
