"""Gemma3n text decoder through the engine: AltUp streams, Laurel,
per-layer embeddings, activation sparsity, KV sharing (read-only
reuse of the source layer's pages), sliding/full hybrid groups;
greedy matches HF (reference: vllm/model_executor/models/gemma3n.py).
"""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def gemma3n_dir(tmp_path_factory):
    import torch
    import transformers
    from transformers import Gemma3nTextConfig

    cfg = Gemma3nTextConfig(
        vocab_size=512, vocab_size_per_layer_input=512,
        hidden_size=48, intermediate_size=[96] * 6,
        num_hidden_layers=6, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
        max_position_embeddings=256, rope_theta=1000000.0,
        rope_local_base_freq=10000.0, sliding_window=8,
        layer_types=["sliding_attention", "sliding_attention",
                     "full_attention", "sliding_attention",
                     "sliding_attention", "full_attention"],
        num_kv_shared_layers=2, hidden_size_per_layer_input=8,
        altup_num_inputs=2, altup_active_idx=0,
        altup_correct_scale=True, laurel_rank=4,
        activation_sparsity_pattern=[0.6, 0.6, 0.0, 0.0, 0.0, 0.0],
        final_logit_softcapping=30.0, pad_token_id=0)
    torch.manual_seed(0)
    hf = transformers.Gemma3nForCausalLM(cfg).to(torch.float32).eval()
    # HF zero-inits altup.correct_output_scale, which would silence
    # the per-layer-embedding injection (scaled stream -> gate -> 0);
    # randomize it so that path actually steers the logits
    with torch.no_grad():
        for lyr in hf.model.layers:
            lyr.altup.correct_output_scale.normal_(0.5, 0.1)
    path = tmp_path_factory.mktemp("models") / "tiny-gemma3n"
    hf.save_pretrained(path, safe_serialization=True)
    # transformers' save applies its {model.language_model -> model}
    # reverse mapping as a substring replace, mangling
    # per_layer_model_projection; official checkpoints use the clean
    # spelling — normalize to it
    import glob

    from safetensors.numpy import load_file, save_file
    for f in glob.glob(str(path / "*.safetensors")):
        sd = load_file(f)
        fixed = {
            k.replace("per_layer_model.language_model_projection",
                      "per_layer_model_projection"): v
            for k, v in sd.items()
        }
        save_file(fixed, f)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_gemma3n_generate_matches_hf(gemma3n_dir):
    import torch

    path, hf = gemma3n_dir
    llm = LLM(model=path, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    prompt = [5, 9, 42, 7, 101, 3]
    out = llm.generate(
        [{"prompt_token_ids": prompt}],
        SamplingParams(temperature=0.0, max_tokens=10,
                       ignore_eos=True))[0]
    with torch.no_grad():
        gen = hf.generate(input_ids=torch.tensor([prompt]),
                          max_new_tokens=10, do_sample=False,
                          eos_token_id=None, pad_token_id=0)
    assert list(out.outputs[0].token_ids) == gen[0].tolist()[-10:]


def test_gemma3n_long_context_past_window(gemma3n_dir):
    """Decode past the sliding window so windowed pages recycle while
    full-attention (and KV-shared) layers keep the whole context."""
    import torch

    path, hf = gemma3n_dir
    llm = LLM(model=path, dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    rng = np.random.default_rng(3)
    prompt = rng.integers(1, 500, size=20).tolist()
    out = llm.generate(
        [{"prompt_token_ids": prompt}],
        SamplingParams(temperature=0.0, max_tokens=12,
                       ignore_eos=True))[0]
    with torch.no_grad():
        gen = hf.generate(input_ids=torch.tensor([prompt]),
                          max_new_tokens=12, do_sample=False,
                          eos_token_id=None, pad_token_id=0)
    assert list(out.outputs[0].token_ids) == gen[0].tolist()[-12:]
