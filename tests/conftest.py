"""Test harness config: run JAX on a virtual 8-device CPU mesh so every
sharding/collective path is exercised without TPU hardware (SURVEY.md §4
test-pyramid item 4)."""

import os

# Force CPU: the ambient environment may point JAX at the (single) TPU
# chip; unit tests must run on the virtual 8-device CPU mesh. The TPU
# plugin can overwrite JAX_PLATFORMS at import, so set the config
# programmatically too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    A single-process full-suite run accumulates thousands of XLA:CPU
    executables; past some threshold the XLA:CPU compiler segfaults
    (observed twice at different Pallas-interpret tests, each green in
    isolation). Dropping the caches per module keeps the resident
    compile state bounded; within-module jit reuse is unaffected."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def tiny_llama_dir(tmp_path_factory):
    """A tiny random-weight HF Llama checkpoint saved to disk, used for
    loader + E2E parity tests (no network egress: weights are random but
    both frameworks load the same safetensors)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("models") / "tiny-llama"
    cfg = LlamaConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg)
    model = model.to(torch.float32)
    model.save_pretrained(path, safe_serialization=True)
    _save_tiny_tokenizer(path)
    return str(path)


@pytest.fixture(scope="session")
def tiny_eagle_dir(tmp_path_factory, tiny_llama_dir):
    """A tiny random-weight EAGLE-1 draft checkpoint whose geometry
    matches tiny_llama_dir (hidden 64, 4 q / 2 kv heads, head_dim 16,
    one decoder layer). Keys follow the yuhuili/EAGLE-* layout: bare
    (no "model." prefix), fc.weight, layer 0 WITHOUT input_layernorm,
    embed_tokens present, lm_head shared with the target (absent)."""
    import json

    import numpy as np
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp("models") / "tiny-eagle"
    path.mkdir(exist_ok=True)
    H, I, V, QD, KD = 64, 128, 512, 64, 32
    rng = np.random.default_rng(7)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    tensors = {
        "fc.weight": w(H, 2 * H),
        "embed_tokens.weight": w(V, H),
        "layers.0.self_attn.q_proj.weight": w(QD, H),
        "layers.0.self_attn.k_proj.weight": w(KD, H),
        "layers.0.self_attn.v_proj.weight": w(KD, H),
        "layers.0.self_attn.o_proj.weight": w(H, QD),
        "layers.0.post_attention_layernorm.weight":
            np.ones(H, dtype=np.float32),
        "layers.0.mlp.gate_proj.weight": w(I, H),
        "layers.0.mlp.up_proj.weight": w(I, H),
        "layers.0.mlp.down_proj.weight": w(H, I),
    }
    save_file(tensors, str(path / "model.safetensors"))
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": V,
        "hidden_size": H,
        "intermediate_size": I,
        "num_hidden_layers": 1,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "max_position_embeddings": 256,
        "rms_norm_eps": 1e-6,
        "torch_dtype": "float32",
    }
    (path / "config.json").write_text(json.dumps(cfg))
    return str(path)


def _save_tiny_tokenizer(path):
    """Build a minimal byte-level BPE tokenizer with 512 tokens."""
    from tokenizers import (Tokenizer, decoders, models, pre_tokenizers,
                            trainers)

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=512,
        special_tokens=["<s>", "</s>", "<pad>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["hello world this is a test of the tokenizer " * 50], trainer)
    from transformers import PreTrainedTokenizerFast

    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<s>",
        eos_token="</s>",
        pad_token="<pad>",
    )
    fast.save_pretrained(path)


@pytest.fixture(scope="session")
def tiny_eagle3_dir(tmp_path_factory, tiny_llama_dir):
    """A tiny random-weight EAGLE-3 draft checkpoint matching
    tiny_llama_dir's KV geometry: fc [H, 3H] over the target's aux
    taps, one midlayer with 2H-wide qkv, hidden_norm, a final norm,
    a REDUCED draft vocab lm_head and the d2t translation table."""
    import json

    import numpy as np
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp("models") / "tiny-eagle3"
    path.mkdir(exist_ok=True)
    H, I, V, DV, QD, KD = 64, 128, 512, 128, 64, 32
    rng = np.random.default_rng(11)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    tensors = {
        "fc.weight": w(H, 3 * H),
        "embed_tokens.weight": w(V, H),
        "midlayer.input_layernorm.weight": np.ones(H, np.float32),
        "midlayer.hidden_norm.weight": np.ones(H, np.float32),
        "midlayer.self_attn.q_proj.weight": w(QD, 2 * H),
        "midlayer.self_attn.k_proj.weight": w(KD, 2 * H),
        "midlayer.self_attn.v_proj.weight": w(KD, 2 * H),
        "midlayer.self_attn.o_proj.weight": w(H, QD),
        "midlayer.post_attention_layernorm.weight":
            np.ones(H, np.float32),
        "midlayer.mlp.gate_proj.weight": w(I, H),
        "midlayer.mlp.up_proj.weight": w(I, H),
        "midlayer.mlp.down_proj.weight": w(H, I),
        "norm.weight": np.ones(H, np.float32),
        "lm_head.weight": w(DV, H),
        # draft id d -> target id d + d2t[d]: spread draft ids over
        # the target vocab
        "d2t": (np.arange(DV, dtype=np.int64) * 3),
    }
    save_file(tensors, str(path / "model.safetensors"))
    cfg = {
        "architectures": ["Eagle3LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": V,
        "draft_vocab_size": DV,
        "hidden_size": H,
        "intermediate_size": I,
        "num_hidden_layers": 1,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "max_position_embeddings": 256,
        "rms_norm_eps": 1e-6,
        "torch_dtype": "float32",
    }
    (path / "config.json").write_text(json.dumps(cfg))
    return str(path)
