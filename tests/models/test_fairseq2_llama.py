"""Fairseq2-format llama: .pt envelope checkpoint, fairseq2 key names,
interleaved-rope q/k rows (reference: fairseq2_llama.py). Built by
converting a tiny HF llama to the fairseq2 layout; logits must match
the HF original.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.models.loader import load_model_weights
from vllm_main_modify_tpu.models.registry import create_model

from test_llama_parity import (NUM_PAGES, PAGE, hf_logits,  # noqa: E402
                               make_meta)


@pytest.fixture(scope="module")
def fs2_dir(tmp_path_factory, tiny_llama_dir):
    import json
    import os
    import shutil

    import torch
    from transformers import LlamaForCausalLM

    out = tmp_path_factory.mktemp("fs2-llama")
    hf = LlamaForCausalLM.from_pretrained(tiny_llama_dir,
                                          torch_dtype=torch.float32)
    cfg = hf.config
    nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    hd = cfg.hidden_size // nh

    def unpermute(w, heads):
        # inverse of the reference's load-time permute
        # (fairseq2_llama.py:108-119)
        return w.view(heads, 2, hd // 2,
                      -1).transpose(1, 2).reshape(heads * hd, -1)

    renames = [
        ("model.embed_tokens.", "decoder_frontend.embed."),
        (".input_layernorm.", ".self_attn_layer_norm."),
        (".post_attention_layernorm.", ".ffn_layer_norm."),
        (".self_attn.o_proj.", ".self_attn.output_proj."),
        (".mlp.gate_proj.", ".ffn.gate_proj."),
        (".mlp.up_proj.", ".ffn.inner_proj."),
        (".mlp.down_proj.", ".ffn.output_proj."),
        ("model.norm.", "decoder.layer_norm."),
        ("lm_head.", "final_proj."),
        ("model.layers.", "decoder.layers."),
    ]
    sd = {}
    for k, v in hf.state_dict().items():
        if ".q_proj." in k:
            v = unpermute(v, nh)
        elif ".k_proj." in k:
            v = unpermute(v, nkv)
        for new, old in renames:
            k = k.replace(new, old)
        sd[k] = v
    torch.save({"model_key": "llama", "llama": sd},
               os.path.join(out, "model.pt"))
    # config + tokenizer stay HF-format alongside the .pt
    for f in os.listdir(tiny_llama_dir):
        if f.endswith(".json") or "token" in f:
            shutil.copy(os.path.join(tiny_llama_dir, f), out)
    with open(os.path.join(out, "config.json")) as f:
        c = json.load(f)
    c["architectures"] = ["Fairseq2LlamaForCausalLM"]
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump(c, f)
    return str(out)


def test_fairseq2_llama_parity(fs2_dir, tiny_llama_dir):
    import jax
    from jax.sharding import Mesh

    cfg = ModelConfig(model=fs2_dir, dtype="float32",
                      max_model_len=128)
    model = create_model(cfg)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, cfg, mesh)
    num_kv, head_dim, num_layers = model.kv_cache_spec()
    kv = jnp.zeros((num_layers, NUM_PAGES, PAGE, 2 * num_kv, head_dim),
                   jnp.float32)

    rng = np.random.default_rng(7)
    token_ids = rng.integers(0, cfg.vocab_size, 11).tolist()
    bt, qsl, sl, slots, ns = make_meta([11], [11], [2])
    meta = AttentionMetadata(bt, qsl, sl, slots, ns)
    hidden, _ = model(params, jnp.asarray(token_ids),
                      jnp.arange(11), kv, meta, use_pallas=False)
    logits = np.asarray(model.compute_logits(params, hidden))
    ref = hf_logits(tiny_llama_dir, token_ids)
    np.testing.assert_allclose(logits, ref, rtol=2e-4, atol=2e-4)
