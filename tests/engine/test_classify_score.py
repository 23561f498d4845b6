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


def test_gpt2_classification_matches_hf(tmp_path):
    """GPT2ForSequenceClassification through the engine's classify
    path == HF last-token logits."""
    import numpy as np
    import torch
    import transformers

    from tests.conftest import _save_tiny_tokenizer
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import PoolingParams

    cfg = transformers.GPT2Config(vocab_size=512, n_embd=64,
                                  n_layer=2, n_head=4,
                                  n_positions=128, num_labels=3,
                                  pad_token_id=0)
    torch.manual_seed(0)
    hf = transformers.GPT2ForSequenceClassification(cfg).to(
        torch.float32).eval()
    d = tmp_path / "tiny-gpt2-cls"
    hf.save_pretrained(d, safe_serialization=True)
    _save_tiny_tokenizer(d)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=64)
    ids = [5, 9, 42, 7, 13]
    out = llm.embed([ids], PoolingParams(task="classify",
                                         activation="none"))[0]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(out.data), ref, atol=2e-3,
                               rtol=2e-3)


def test_qwen2_reward_model(tmp_path):
    """Qwen2ForRewardModel: two-layer head (score.0 ReLU score.2),
    last-token pooling — verified against a manual numpy compute on
    the pooled hidden."""
    import json

    import numpy as np
    import torch
    import transformers
    from safetensors.numpy import save_file

    from tests.conftest import _save_tiny_tokenizer
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import PoolingParams

    cfg = transformers.Qwen2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128)
    torch.manual_seed(0)
    hf = transformers.Qwen2Model(cfg).to(torch.float32).eval()
    d = tmp_path / "tiny-qwen2-rm"
    hf.save_pretrained(d, safe_serialization=True)
    _save_tiny_tokenizer(d)
    # splice in the reward head + architecture tag
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(64, 64)).astype(np.float32) * 0.1
    b0 = rng.normal(size=(64, )).astype(np.float32) * 0.1
    w2 = rng.normal(size=(1, 64)).astype(np.float32) * 0.1
    save_file({"score.0.weight": w0, "score.0.bias": b0,
               "score.2.weight": w2},
              str(d / "model-head.safetensors"))
    import safetensors.numpy as stn
    base = stn.load_file(str(d / "model.safetensors"))
    base.update({"score.0.weight": w0, "score.0.bias": b0,
                 "score.2.weight": w2})
    stn.save_file(base, str(d / "model.safetensors"))
    (d / "model-head.safetensors").unlink()
    raw = json.loads((d / "config.json").read_text())
    raw["architectures"] = ["Qwen2ForRewardModel"]
    raw["num_labels"] = 1
    (d / "config.json").write_text(json.dumps(raw))

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=64)
    ids = [5, 9, 42, 7, 13, 88]
    out = llm.embed([ids], PoolingParams(task="classify",
                                         activation="none"))[0]
    with torch.no_grad():
        hidden = hf(torch.tensor([ids])).last_hidden_state[0, -1]
    h = hidden.numpy()
    ref = np.maximum(h @ w0.T + b0, 0.0) @ w2.T
    np.testing.assert_allclose(np.asarray(out.data), ref, atol=2e-3,
                               rtol=2e-3)


def test_internlm2_reward_model(tmp_path):
    """InternLM2ForRewardModel (reference: internlm2.py:404): v_head
    on last-token hidden, internlm2 checkpoint layout."""
    import json

    import numpy as np
    import torch
    import safetensors.numpy as stn

    from tests.conftest import _save_tiny_tokenizer
    from tests.models.test_internlm2_baichuan import (_build_llama,
                                                      _convert)
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import PoolingParams

    src, hf = _build_llama(tmp_path)
    d = tmp_path / "internlm2-rm"
    _convert(src, d, "internlm2")
    _save_tiny_tokenizer(d)
    rng = np.random.default_rng(0)
    vh = rng.normal(size=(1, 64)).astype(np.float32) * 0.1
    base = stn.load_file(str(d / "model.safetensors"))
    del base["output.weight"]
    base["v_head.weight"] = vh
    stn.save_file(base, str(d / "model.safetensors"))
    raw = json.loads((d / "config.json").read_text())
    raw["architectures"] = ["InternLM2ForRewardModel"]
    (d / "config.json").write_text(json.dumps(raw))

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=64)
    ids = [5, 9, 42, 7, 13, 88]
    out = llm.embed([ids], PoolingParams(task="classify",
                                         activation="none"))[0]
    with torch.no_grad():
        h = hf.model(torch.tensor([ids])).last_hidden_state[0, -1]
        ref = (h.numpy() @ vh.T)
    np.testing.assert_allclose(np.asarray(out.data), ref, atol=2e-3,
                               rtol=2e-3)


def test_jamba_sequence_classification(tmp_path):
    """JambaForSequenceClassification (reference: jamba.py:559):
    score head on the hybrid backbone's last-token hidden."""
    import numpy as np
    import torch
    import transformers

    from tests.conftest import _save_tiny_tokenizer
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import PoolingParams

    cfg = transformers.JambaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, attn_layer_offset=1,
        attn_layer_period=2, expert_layer_offset=1,
        expert_layer_period=2, num_experts=2, num_experts_per_tok=2,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
        mamba_dt_rank=4, max_position_embeddings=128, num_labels=3,
        use_mamba_kernels=False)
    torch.manual_seed(0)
    hf = transformers.JambaForSequenceClassification(cfg).to(
        torch.float32).eval()
    d = tmp_path / "tiny-jamba-cls"
    hf.save_pretrained(d, safe_serialization=True)
    _save_tiny_tokenizer(d)

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=64)
    ids = [5, 9, 42, 7, 13, 88]
    out = llm.embed([ids], PoolingParams(task="classify",
                                         activation="none"))[0]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(out.data), ref, atol=2e-3,
                               rtol=2e-3)
