"""Multi-LoRA: batched apply vs dense oracle, adapter load/slot
management, and E2E equivalence against merged weights (reference test
style: tests/lora/)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_main_modify_tpu.lora.ops import (lora_apply,
                                           lora_apply_dense_reference)


def test_lora_apply_matches_dense():
    rng = np.random.default_rng(0)
    t, h, r, o, s = 24, 32, 4, 48, 3
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((s, h, r)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((s, r, o)) * 0.1, jnp.float32)
    # slot 0 zeroed (null adapter convention)
    a = a.at[0].set(0.0)
    b = b.at[0].set(0.0)
    scales = jnp.asarray([0.0, 2.0, 0.5], jnp.float32)
    slots = jnp.asarray(rng.integers(0, s, t), jnp.int32)
    ref = lora_apply_dense_reference(x, a, b, scales, slots)
    got = lora_apply(x, a, b, scales, slots)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # slot-0 tokens get exactly zero delta
    zero_rows = np.asarray(slots) == 0
    assert np.all(np.asarray(got)[zero_rows] == 0.0)


def make_adapter(path, base_dir, rank=4, alpha=8.0, seed=0,
                 zero=False):
    """Synthetic peft-format adapter for the tiny llama."""
    import torch
    from safetensors.torch import save_file
    from transformers import AutoConfig

    cfg = AutoConfig.from_pretrained(base_dir)
    rng = np.random.default_rng(seed)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump({"r": rank, "lora_alpha": alpha,
                   "target_modules": ["q_proj", "v_proj"],
                   "peft_type": "LORA"}, f)
    tensors = {}
    h = cfg.hidden_size
    head_dim = getattr(cfg, "head_dim", None) or \
        h // cfg.num_attention_heads
    kd = cfg.num_key_value_heads * head_dim
    for layer in range(cfg.num_hidden_layers):
        qd = cfg.num_attention_heads * head_dim
        for target, out_dim in (("q_proj", qd), ("v_proj", kd)):
            scale = 0.0 if zero else 0.1
            a = rng.standard_normal((rank, h)) * scale
            b = rng.standard_normal((out_dim, rank)) * scale
            prefix = (f"base_model.model.model.layers.{layer}."
                      f"self_attn.{target}")
            tensors[f"{prefix}.lora_A.weight"] = torch.tensor(
                a, dtype=torch.float32)
            tensors[f"{prefix}.lora_B.weight"] = torch.tensor(
                b, dtype=torch.float32)
    save_file(tensors, os.path.join(path,
                                    "adapter_model.safetensors"))
    return path


@pytest.fixture(scope="module")
def lora_llm(tiny_llama_dir):
    from vllm_main_modify_tpu.entrypoints.llm import LLM

    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
               num_kv_blocks=256, enable_lora=True, max_loras=2,
               max_lora_rank=8)


def test_lora_e2e(lora_llm, tiny_llama_dir, tmp_path_factory):
    from vllm_main_modify_tpu.lora import LoRARequest
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    tmp = tmp_path_factory.mktemp("adapters")
    real = make_adapter(str(tmp / "real"), tiny_llama_dir, seed=1)
    zero = make_adapter(str(tmp / "zero"), tiny_llama_dir, zero=True)

    p = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    base = lora_llm.generate(["hello world this is"], p)[0]
    with_zero = lora_llm.generate(
        ["hello world this is"], p,
        lora_request=LoRARequest("zero", zero))[0]
    with_real = lora_llm.generate(
        ["hello world this is"], p,
        lora_request=LoRARequest("real", real))[0]

    # zero adapter = identity; real adapter changes the logits
    assert (with_zero.outputs[0].token_ids ==
            base.outputs[0].token_ids)
    assert (with_real.outputs[0].token_ids !=
            base.outputs[0].token_ids)

    # mixed batch: base + adapter requests in one engine pass
    outs = lora_llm.generate(["hello world this is"] * 2, p)
    assert outs[0].outputs[0].token_ids == base.outputs[0].token_ids


def test_lora_matches_merged_weights(tiny_llama_dir,
                                     tmp_path_factory):
    """Gold check: generation with an adapter == generation from a
    checkpoint with W' = W + (alpha/r) * B@A merged in."""
    import torch
    from transformers import AutoModelForCausalLM

    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.lora import LoRARequest
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    tmp = tmp_path_factory.mktemp("merge")
    adapter = make_adapter(str(tmp / "ad"), tiny_llama_dir, rank=4,
                           alpha=8.0, seed=3)

    # merged model
    model = AutoModelForCausalLM.from_pretrained(
        tiny_llama_dir, torch_dtype=torch.float32)
    from safetensors.torch import load_file

    ts = load_file(os.path.join(adapter, "adapter_model.safetensors"))
    for layer, mod in enumerate(model.model.layers):
        for target in ("q_proj", "v_proj"):
            prefix = (f"base_model.model.model.layers.{layer}."
                      f"self_attn.{target}")
            a = ts[f"{prefix}.lora_A.weight"]
            b = ts[f"{prefix}.lora_B.weight"]
            lin = getattr(mod.self_attn, target)
            lin.weight.data += (8.0 / 4) * (b @ a)
    merged_dir = str(tmp / "merged")
    model.save_pretrained(merged_dir, safe_serialization=True)
    for f in os.listdir(tiny_llama_dir):
        if "token" in f or f == "special_tokens_map.json":
            import shutil

            shutil.copy(os.path.join(tiny_llama_dir, f),
                        os.path.join(merged_dir, f))

    kw = dict(dtype="float32", max_model_len=128, max_num_seqs=4,
              max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    p = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    merged_out = LLM(model=merged_dir, **kw).generate(
        ["a test of the"], p)[0]
    lora_out = LLM(model=tiny_llama_dir, enable_lora=True,
                   max_lora_rank=8, **kw).generate(
                       ["a test of the"], p,
                       lora_request=LoRARequest("ad", adapter))[0]
    assert (lora_out.outputs[0].token_ids ==
            merged_out.outputs[0].token_ids)


@pytest.fixture(scope="module")
def tiny_qwen3_dir(tmp_path_factory):
    """Non-Llama family: exercises the generic matmul()-seam LoRA
    path (the adapters reach every architecture whose param tree uses
    standard module tails, not just the Llama family)."""
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    path = tmp_path_factory.mktemp("models") / "tiny-qwen3"
    cfg = Qwen3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
        max_position_embeddings=256, tie_word_embeddings=False)
    torch.manual_seed(0)
    Qwen3ForCausalLM(cfg).to(torch.float32).save_pretrained(
        str(path), safe_serialization=True)
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from conftest import _save_tiny_tokenizer
    _save_tiny_tokenizer(str(path))
    return str(path)


def test_lora_non_llama_matches_merged_weights(tiny_qwen3_dir,
                                               tmp_path_factory):
    """Generic-seam gold check on Qwen3: adapter generation == merged
    W' = W + (alpha/r) B@A generation."""
    import shutil

    import torch
    from transformers import AutoModelForCausalLM
    from safetensors.torch import load_file

    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.lora import LoRARequest
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    tmp = tmp_path_factory.mktemp("merge_q3")
    adapter = make_adapter(str(tmp / "ad"), tiny_qwen3_dir, rank=4,
                           alpha=8.0, seed=11)
    model = AutoModelForCausalLM.from_pretrained(
        tiny_qwen3_dir, torch_dtype=torch.float32)
    ts = load_file(os.path.join(adapter, "adapter_model.safetensors"))
    for layer, mod in enumerate(model.model.layers):
        for target in ("q_proj", "v_proj"):
            prefix = (f"base_model.model.model.layers.{layer}."
                      f"self_attn.{target}")
            a = ts[f"{prefix}.lora_A.weight"]
            b = ts[f"{prefix}.lora_B.weight"]
            getattr(mod.self_attn, target).weight.data += \
                (8.0 / 4) * (b @ a)
    merged_dir = str(tmp / "merged")
    model.save_pretrained(merged_dir, safe_serialization=True)
    for f in os.listdir(tiny_qwen3_dir):
        if "token" in f or f == "special_tokens_map.json":
            shutil.copy(os.path.join(tiny_qwen3_dir, f), merged_dir)

    kw = dict(dtype="float32", max_model_len=128, max_num_seqs=8,
              max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    p = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    prompt = ["hello world this is a test"]
    llm = LLM(model=tiny_qwen3_dir, enable_lora=True, max_loras=2,
              max_lora_rank=8, **kw)
    with_ad = llm.generate(prompt, p,
                           lora_request=LoRARequest("ad", adapter))[0]
    base = llm.generate(prompt, p)[0]
    del llm
    merged = LLM(model=merged_dir, **kw)
    ref = merged.generate(prompt, p)[0]
    del merged
    assert (with_ad.outputs[0].token_ids ==
            ref.outputs[0].token_ids)
    assert (base.outputs[0].token_ids !=
            ref.outputs[0].token_ids)


def test_lora_prefix_cache_isolation(tiny_llama_dir,
                                     tmp_path_factory):
    """Block hashes carry adapter identity: the same prompt under two
    adapters must NOT share prefix-cache KV (reference: LoRA extra
    keys, vllm/v1/core/kv_cache_utils.py:420-545)."""
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.lora import LoRARequest
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    tmp = tmp_path_factory.mktemp("adapters_pc")
    real = make_adapter(str(tmp / "real"), tiny_llama_dir, seed=21)
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256, enable_lora=True, max_loras=2,
              max_lora_rank=8, enable_prefix_caching=True)
    p = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    prompt = ["hello world this is a longer prompt for caching"]
    base1 = llm.generate(prompt, p)[0]
    # warm the cache under the adapter, then re-run without it: the
    # base run must not hit the adapter's KV blocks (and vice versa)
    ad = llm.generate(prompt, p,
                      lora_request=LoRARequest("real", real))[0]
    base2 = llm.generate(prompt, p)[0]
    ad2 = llm.generate(prompt, p,
                       lora_request=LoRARequest("real", real))[0]
    assert base1.outputs[0].token_ids == base2.outputs[0].token_ids
    assert ad.outputs[0].token_ids == ad2.outputs[0].token_ids
    assert ad.outputs[0].token_ids != base1.outputs[0].token_ids


def test_max_loras_batch_cap(tiny_llama_dir, tmp_path_factory):
    """More distinct adapters than max_loras in one submission: the
    scheduler staggers admission so a step never needs more device
    slots than exist; every request still completes correctly."""
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.lora import LoRARequest
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    tmp = tmp_path_factory.mktemp("adapters_cap")
    paths = [make_adapter(str(tmp / f"a{i}"), tiny_llama_dir,
                          seed=30 + i) for i in range(3)]
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256, enable_lora=True, max_loras=2,
              max_lora_rank=8)
    p = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    prompt = "hello world this is"
    # singly, for reference outputs
    singles = [
        llm.generate([prompt], p,
                     lora_request=LoRARequest(f"a{i}", paths[i]))[0]
        for i in range(3)
    ]
    # one batch across 3 adapters with only 2 slots
    outs = [
        llm.generate([prompt], p,
                     lora_request=LoRARequest(f"a{i}", paths[i]))
        for i in (0, 1, 2)
    ]
    for got, ref in zip(outs, singles):
        assert got[0].outputs[0].token_ids == ref.outputs[0].token_ids
