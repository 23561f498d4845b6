"""Motif differential-attention decoder parity vs a pure-torch oracle
(reference: vllm/model_executor/models/motif.py registers the arch but
its DIFFERENTIAL_FLASH_ATTN backend is absent upstream; the oracle
implements the Differential Transformer semantics, arXiv:2410.05258,
matching the lambda_*/subln parameters in motif.py:157-181 and the
PolyNorm MLP of layernorm.py:336-370)."""

import json
import math

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

H = 64
DH = 16
NH = 4  # q heads (2 pairs)
NKV = 2  # kv heads (1 pair)
I_ = 96


@pytest.fixture(scope="module")
def motif_dir(tmp_path_factory):
    import torch
    from safetensors.torch import save_file

    g = torch.Generator().manual_seed(0)

    def rand(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {"model.embed_tokens.weight": rand(256, H),
          "model.norm.weight": torch.ones(H) + rand(H),
          "lm_head.weight": rand(256, H)}
    for i in range(2):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = torch.ones(H) + rand(H)
        sd[p + "post_attention_layernorm.weight"] = \
            torch.ones(H) + rand(H)
        sd[p + "self_attn.q_proj.weight"] = rand(NH * DH, H)
        sd[p + "self_attn.k_proj.weight"] = rand(NKV * DH, H)
        sd[p + "self_attn.v_proj.weight"] = rand(NKV * DH, H)
        sd[p + "self_attn.o_proj.weight"] = rand(H, NH * DH)
        sd[p + "self_attn.lambda_q1"] = rand(DH)
        sd[p + "self_attn.lambda_k1"] = rand(DH)
        sd[p + "self_attn.lambda_q2"] = rand(DH)
        sd[p + "self_attn.lambda_k2"] = rand(DH)
        sd[p + "self_attn.subln.weight"] = \
            torch.ones(2 * DH) + rand(2 * DH)
        sd[p + "mlp.gate_proj.weight"] = rand(I_, H)
        sd[p + "mlp.up_proj.weight"] = rand(I_, H)
        sd[p + "mlp.down_proj.weight"] = rand(H, I_)
        sd[p + "mlp.act_fn.weight"] = torch.ones(3) / 3 + rand(3)
        sd[p + "mlp.act_fn.bias"] = rand(1)
    path = tmp_path_factory.mktemp("models") / "tiny-motif"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(path / "model.safetensors"))
    cfg = {
        "architectures": ["MotifForCausalLM"],
        "model_type": "llama", "vocab_size": 256, "hidden_size": H,
        "intermediate_size": I_, "num_hidden_layers": 2,
        "num_attention_heads": NH, "num_key_value_heads": NKV,
        "head_dim": DH, "max_position_embeddings": 128,
        "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
        "attn_rms_norm_eps": 1e-5, "tie_word_embeddings": False,
        "hidden_act": "poly_norm",
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), {k: v.float() for k, v in sd.items()}


def _oracle(sd, prompt, n_new):
    import torch

    def rms(x, w, eps):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps)
        return v * w

    def poly(x, w, b):
        def n(y):
            return y * torch.rsqrt(
                y.pow(2).mean(-1, keepdim=True) + 1e-6)

        return w[0] * n(x**3) + w[1] * n(x**2) + w[2] * n(x) + b

    def rope(x, pos):
        half = DH // 2
        inv = 1.0 / 10000.0**(torch.arange(half) / half)
        ang = pos[:, None].float() * inv[None]
        cos, sin = ang.cos()[:, None], ang.sin()[:, None]
        x1, x2 = x[..., :half], x[..., half:]
        return torch.cat([x1 * cos - x2 * sin,
                          x2 * cos + x1 * sin], -1)

    ids = list(prompt)
    g = (NH // 2) // (NKV // 2)  # q pairs per kv pair
    for _ in range(n_new):
        T = len(ids)
        pos = torch.arange(T)
        x = sd["model.embed_tokens.weight"][torch.tensor(ids)]
        for i in range(2):
            p = f"model.layers.{i}."
            res = x
            h = rms(x, sd[p + "input_layernorm.weight"], 1e-6)
            q = (h @ sd[p + "self_attn.q_proj.weight"].T).reshape(
                T, NH, DH)
            k = (h @ sd[p + "self_attn.k_proj.weight"].T).reshape(
                T, NKV, DH)
            v = (h @ sd[p + "self_attn.v_proj.weight"].T).reshape(
                T, NKV, DH)
            q, k = rope(q, pos), rope(k, pos)
            lam_init = 0.8 - 0.6 * math.exp(-0.3 * (i - 1))
            lam = (torch.exp(
                (sd[p + "self_attn.lambda_q1"] *
                 sd[p + "self_attn.lambda_k1"]).sum()) - torch.exp(
                     (sd[p + "self_attn.lambda_q2"] *
                      sd[p + "self_attn.lambda_k2"]).sum()) +
                   lam_init)
            mask = torch.full((T, T), float("-inf")).triu(1)
            outs = []
            for j in range(NH // 2):  # q pairs
                m = j // g  # kv pair
                vv = torch.cat([v[:, 2 * m], v[:, 2 * m + 1]],
                               -1)  # [T, 2D]
                heads = []
                for c in (0, 1):
                    s = (q[:, 2 * j + c] @ k[:, 2 * m + c].T) * \
                        DH**-0.5
                    heads.append(torch.softmax(s + mask, -1) @ vv)
                d = heads[0] - lam * heads[1]
                d = rms(d, sd[p + "self_attn.subln.weight"], 1e-5)
                outs.append(d * (1 - lam_init))
            o = torch.cat(outs, -1)  # [T, NH*DH]
            x = res + o @ sd[p + "self_attn.o_proj.weight"].T
            res = x
            h = rms(x, sd[p + "post_attention_layernorm.weight"],
                    1e-6)
            y = poly(h @ sd[p + "mlp.gate_proj.weight"].T,
                     sd[p + "mlp.act_fn.weight"],
                     sd[p + "mlp.act_fn.bias"]) * \
                (h @ sd[p + "mlp.up_proj.weight"].T)
            x = res + y @ sd[p + "mlp.down_proj.weight"].T
        x = rms(x, sd["model.norm.weight"], 1e-6)
        logits = x @ sd["lm_head.weight"].T
        ids.append(int(logits[-1].argmax()))
    return ids[len(prompt):]


def test_motif_matches_oracle(motif_dir):
    path, sd = motif_dir
    prompt = [5, 9, 42, 7, 101, 33]
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    out = llm.generate(
        [{"prompt_token_ids": prompt}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    ref = _oracle(sd, prompt, 8)
    assert list(out.outputs[0].token_ids) == ref
