"""Arctic (dense-MoE hybrid) parity vs a hand-stitched torch oracle
replicating the reference layer semantics (reference:
vllm/model_executor/models/arctic.py — upstream is remote-code-only):
parallel hidden-width residual MLP + top-2 softmax-renormalized
experts whose input is the PRE-attention residual."""

import json

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

H = 64
E = 4
I = 96


@pytest.fixture(scope="module")
def arctic_dir(tmp_path_factory):
    import torch
    from safetensors.torch import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    tcfg = LlamaConfig(vocab_size=256, hidden_size=H,
                       intermediate_size=I, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       max_position_embeddings=128,
                       rope_theta=10000.0, tie_word_embeddings=False)
    base = LlamaForCausalLM(tcfg).float().eval()
    sd = dict(base.state_dict())
    g = torch.Generator().manual_seed(1)

    def rand(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    extras = {}
    for i in range(2):
        p = f"model.layers.{i}."
        extras[p + "block_sparse_moe.gate.weight"] = rand(E, H)
        for e in range(E):
            q = p + f"block_sparse_moe.experts.{e}."
            extras[q + "w1.weight"] = rand(I, H)
            extras[q + "w3.weight"] = rand(I, H)
            extras[q + "w2.weight"] = rand(H, I)
        extras[p + "residual_layernorm.weight"] = \
            torch.ones(H) + rand(H)
        extras[p + "residual_mlp.w1.weight"] = rand(H, H)
        extras[p + "residual_mlp.w3.weight"] = rand(H, H)
        extras[p + "residual_mlp.w2.weight"] = rand(H, H)
        # drop the dense llama MLP tensors (arctic has none)
        for k in ("mlp.gate_proj", "mlp.up_proj", "mlp.down_proj"):
            sd.pop(p + k + ".weight", None)
    sd.update(extras)
    path = tmp_path_factory.mktemp("models") / "tiny-arctic"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(path / "model.safetensors"))
    cfg = {
        "architectures": ["ArcticForCausalLM"], "model_type": "llama",
        "vocab_size": 256, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "max_position_embeddings": 128,
        "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
        "tie_word_embeddings": False, "num_local_experts": E,
        "num_experts_per_tok": 2, "moe_layer_frequency": 1,
        "use_residual": True,
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), base, sd


def _oracle_generate(base, sd, prompt, n_new):
    """Greedy decode with the arctic layer semantics, reusing the
    torch Llama modules for attention/norms/embeddings."""
    import torch

    def rms(x, w):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-6)
        return (v * w.float()).to(x.dtype)

    ids = list(prompt)
    model = base.model
    for _ in range(n_new):
        x = model.embed_tokens(torch.tensor([ids]))
        pos = torch.arange(len(ids))[None]
        pe = model.rotary_emb(x, pos)
        mask = torch.full((len(ids), len(ids)), float("-inf")) \
            .triu(1)[None, None]
        for i, lyr in enumerate(model.layers):
            p = f"model.layers.{i}."
            res_in = x
            h = lyr.input_layernorm(x)
            a = lyr.self_attn(h, position_embeddings=pe,
                              attention_mask=mask)[0]
            x1 = res_in + a
            hr = rms(x1, sd[p + "residual_layernorm.weight"])
            rg = hr @ sd[p + "residual_mlp.w1.weight"].T
            ru = hr @ sd[p + "residual_mlp.w3.weight"].T
            rmlp = (torch.nn.functional.silu(rg) * ru) @ \
                sd[p + "residual_mlp.w2.weight"].T
            hm = lyr.post_attention_layernorm(res_in)
            logits = hm @ sd[p + "block_sparse_moe.gate.weight"].T
            probs = torch.softmax(logits.float(), -1)
            topw, topi = probs.topk(2, -1)
            topw = topw / topw.sum(-1, keepdim=True)
            moe = torch.zeros_like(hm)
            for kk in range(2):
                for e in range(E):
                    m = (topi[..., kk] == e).unsqueeze(-1)
                    q = f"model.layers.{i}.block_sparse_moe" \
                        f".experts.{e}."
                    ge = torch.nn.functional.silu(
                        hm @ sd[q + "w1.weight"].T) * \
                        (hm @ sd[q + "w3.weight"].T)
                    out = ge @ sd[q + "w2.weight"].T
                    moe = moe + m * topw[..., kk:kk + 1].to(
                        out.dtype) * out
            x = x1 + rmlp + moe
        x = model.norm(x)
        logits = base.lm_head(x)
        ids.append(int(logits[0, -1].argmax()))
    return ids[len(prompt):]


def test_arctic_matches_oracle(arctic_dir):
    path, base, sd = arctic_dir
    prompt = [5, 9, 42, 7, 101]
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    out = llm.generate(
        [{"prompt_token_ids": prompt}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    ref = _oracle_generate(base, sd, prompt, 8)
    assert list(out.outputs[0].token_ids) == ref
