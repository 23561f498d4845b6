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
