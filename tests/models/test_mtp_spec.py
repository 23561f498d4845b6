"""DeepSeek-MTP speculative decoding (reference:
vllm/model_executor/models/deepseek_mtp.py + v1/spec_decode/eagle.py
MTP path): the checkpoint's nextn layer proposes drafts, the target
verifies via rejection sampling — greedy output must match the
non-speculative engine exactly."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def tiny_deepseek_mtp_dir(tmp_path_factory):
    import torch
    import transformers
    from safetensors.torch import save_file

    path = tmp_path_factory.mktemp("models") / "tiny-dsv3-mtp"
    cfg = transformers.DeepseekV3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=4, kv_lora_rank=32, q_lora_rank=48,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, n_group=4, topk_group=2,
        num_experts_per_tok=2, n_shared_experts=1,
        moe_intermediate_size=32, first_k_dense_replace=1,
        norm_topk_prob=True, routed_scaling_factor=2.5,
        max_position_embeddings=256, tie_word_embeddings=False)
    cfg.num_nextn_predict_layers = 1
    torch.manual_seed(0)
    hf = transformers.DeepseekV3ForCausalLM(cfg).to(torch.float32)
    hf.save_pretrained(str(path), safe_serialization=True)

    # craft the MTP (nextn) layer at index num_hidden_layers: a copy
    # of the last MoE decoder layer + enorm/hnorm/eh_proj/shared_head
    # (the layout real DeepSeek-V3 checkpoints ship)
    sd = {k: v.clone().contiguous()
          for k, v in hf.state_dict().items()}
    h = cfg.hidden_size
    g = torch.Generator().manual_seed(7)
    mtp = {}
    for k, v in list(sd.items()):
        if k.startswith("model.layers.2."):
            mtp[k.replace("model.layers.2.",
                          "model.layers.3.")] = v.clone()
    mtp["model.layers.3.enorm.weight"] = \
        torch.ones(h) + 0.05 * torch.randn(h, generator=g)
    mtp["model.layers.3.hnorm.weight"] = \
        torch.ones(h) + 0.05 * torch.randn(h, generator=g)
    mtp["model.layers.3.eh_proj.weight"] = \
        0.05 * torch.randn(h, 2 * h, generator=g)
    mtp["model.layers.3.embed_tokens.weight"] = \
        sd["model.embed_tokens.weight"].clone()
    mtp["model.layers.3.shared_head.norm.weight"] = torch.ones(h)
    mtp["model.layers.3.shared_head.head.weight"] = \
        sd["lm_head.weight"].clone()
    save_file({**sd, **mtp},
              os.path.join(str(path), "model.safetensors"))

    with open(os.path.join(str(path), "config.json")) as f:
        raw = json.load(f)
    raw["num_nextn_predict_layers"] = 1
    with open(os.path.join(str(path), "config.json"), "w") as f:
        json.dump(raw, f)

    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from conftest import _save_tiny_tokenizer
    _save_tiny_tokenizer(str(path))
    return str(path)


@pytest.fixture(scope="module")
def mtp_pair(tiny_deepseek_mtp_dir):
    from vllm_main_modify_tpu.entrypoints.llm import LLM

    kw = dict(model=tiny_deepseek_mtp_dir, dtype="float32",
              max_model_len=128, max_num_seqs=8,
              max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    base = LLM(**kw)
    spec = LLM(speculative_config=dict(method="deepseek_mtp",
                                       num_speculative_tokens=2),
               **kw)
    return base, spec


def test_mtp_method_detected_from_architecture():
    from vllm_main_modify_tpu.config import _detect_spec_method

    # _detect maps MTP architectures to family methods (reference:
    # SpeculativeConfig.__post_init__)
    import tempfile

    for arch, want in (("DeepSeekMTPModel", "deepseek_mtp"),
                       ("Glm4MoeMTPModel", "glm4_moe_mtp"),
                       ("ErnieMTPModel", "ernie_mtp"),
                       ("Qwen3NextMTP", "qwen3_next_mtp"),
                       ("LongCatFlashMTPModel", "longcat_flash_mtp")):
        with tempfile.TemporaryDirectory() as d:
            with open(os.path.join(d, "config.json"), "w") as f:
                json.dump({"architectures": [arch]}, f)
            assert _detect_spec_method(d) == want, arch


def test_mtp_greedy_parity(mtp_pair):
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    base, spec = mtp_pair
    prompts = [
        "hello world hello world hello world hello",
        "a test of the tokenizer",
        "this is this is this is",
    ]
    p = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    b = base.generate(prompts, p)
    s = spec.generate(prompts, p)
    for ob, os_ in zip(b, s):
        assert ob.outputs[0].token_ids == os_.outputs[0].token_ids


def test_mtp_drafts_flow_and_acceptance_counted(mtp_pair):
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    _, spec = mtp_pair
    p = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    spec.generate(["hello world hello world hello"], p)
    stats = spec.engine.engine_core.scheduler.make_stats()
    assert stats.spec_num_draft_tokens > 0
    # acceptance is counted (the crafted head may accept rarely, but
    # the accounting fields must move together)
    assert 0 <= stats.spec_num_accepted_tokens <= \
        stats.spec_num_draft_tokens


def test_mtp_shares_target_embedding(tiny_deepseek_mtp_dir):
    """The draft tree carries no embed_tokens of its own."""
    from vllm_main_modify_tpu.entrypoints.llm import LLM

    llm = LLM(model=tiny_deepseek_mtp_dir, dtype="float32",
              max_model_len=128, max_num_seqs=4,
              max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128,
              speculative_config=dict(method="deepseek_mtp",
                                      num_speculative_tokens=1))
    params = llm.engine.engine_core.model_runner.params
    assert "embed_tokens" not in params["__draft__"]
    assert "mtp_eh_proj" in params["__draft__"]
