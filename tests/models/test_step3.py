"""Step3 text decoder parity vs a pure-torch oracle replicating the
reference semantics (reference:
vllm/model_executor/models/step3_text.py — upstream is
remote-code-only): MFA shared-low-rank-q MQA + shared-expert MoE."""

import json
import math

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

H = 64
DH = 32  # head dim
NH = 4
SQ = 48  # share_q_dim
E = 4
MI = 48  # moe inter
SI = 64  # share expert inter
I_ = 96  # dense inter


@pytest.fixture(scope="module")
def step3_dir(tmp_path_factory):
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
        sd[p + "self_attn.q_proj.weight"] = rand(SQ, H)
        sd[p + "self_attn.k_proj.weight"] = rand(DH, H)
        sd[p + "self_attn.v_proj.weight"] = rand(DH, H)
        sd[p + "self_attn.inter_norm.weight"] = \
            torch.ones(SQ) + rand(SQ)
        sd[p + "self_attn.wq.weight"] = rand(NH * DH, SQ)
        sd[p + "self_attn.o_proj.weight"] = rand(H, NH * DH)
        if i == 0:
            sd[p + "mlp.gate_proj.weight"] = rand(I_, H)
            sd[p + "mlp.up_proj.weight"] = rand(I_, H)
            sd[p + "mlp.down_proj.weight"] = rand(H, I_)
        else:
            sd[p + "moe.gate.weight"] = rand(E, H)
            sd[p + "moe.gate_proj.weight"] = rand(E, MI, H)
            sd[p + "moe.up_proj.weight"] = rand(E, MI, H)
            sd[p + "moe.down_proj.weight"] = rand(E, H, MI)
            sd[p + "share_expert.gate_proj.weight"] = rand(SI, H)
            sd[p + "share_expert.up_proj.weight"] = rand(SI, H)
            sd[p + "share_expert.down_proj.weight"] = rand(H, SI)
    path = tmp_path_factory.mktemp("models") / "tiny-step3"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(path / "model.safetensors"))
    cfg = {
        "architectures": ["Step3TextForCausalLM"],
        "model_type": "llama", "vocab_size": 256, "hidden_size": H,
        "intermediate_size": I_, "num_hidden_layers": 2,
        "num_attention_heads": NH, "num_key_value_heads": 1,
        "head_dim": DH, "share_q_dim": SQ,
        "max_position_embeddings": 128,
        "max_position_embedding": 128, "rope_theta": 10000.0,
        "rms_norm_eps": 1e-6, "tie_word_embeddings": False,
        "moe_num_experts": E, "moe_top_k": 2,
        "moe_intermediate_size": MI, "share_expert_dim": SI,
        "norm_expert_weight": True, "moe_layers_enum": "1",
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), {k: v.float() for k, v in sd.items()}


def _oracle(sd, prompt, n_new):
    import torch

    def rms(x, w):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-6)
        return v * w

    def rope(x, pos):  # [T, h, DH] neox half-split
        half = DH // 2
        inv = 1.0 / 10000.0**(torch.arange(half) / half)
        ang = pos[:, None].float() * inv[None]
        cos, sin = ang.cos()[:, None], ang.sin()[:, None]
        x1, x2 = x[..., :half], x[..., half:]
        return torch.cat([x1 * cos - x2 * sin,
                          x2 * cos + x1 * sin], -1)

    ids = list(prompt)
    for _ in range(n_new):
        T = len(ids)
        pos = torch.arange(T)
        x = sd["model.embed_tokens.weight"][torch.tensor(ids)]
        for i in range(2):
            p = f"model.layers.{i}."
            res = x
            h = rms(x, sd[p + "input_layernorm.weight"])
            qlow = rms(h @ sd[p + "self_attn.q_proj.weight"].T,
                       sd[p + "self_attn.inter_norm.weight"])
            q = (qlow @ sd[p + "self_attn.wq.weight"].T).reshape(
                T, NH, DH)
            k = (h @ sd[p + "self_attn.k_proj.weight"].T).reshape(
                T, 1, DH)
            v = (h @ sd[p + "self_attn.v_proj.weight"].T).reshape(
                T, 1, DH)
            q, k = rope(q, pos), rope(k, pos)
            s = torch.einsum("qhd,kod->hqk", q, k[:, :1]) * DH**-0.5
            mask = torch.full((T, T), float("-inf")).triu(1)
            a = torch.softmax(s + mask, -1)
            o = torch.einsum("hqk,kod->qhd", a,
                             v[:, :1]).reshape(T, NH * DH)
            x = res + o @ sd[p + "self_attn.o_proj.weight"].T
            res = x
            h = rms(x, sd[p + "post_attention_layernorm.weight"])
            if i == 0:
                y = torch.nn.functional.silu(
                    h @ sd[p + "mlp.gate_proj.weight"].T) * \
                    (h @ sd[p + "mlp.up_proj.weight"].T)
                x = res + y @ sd[p + "mlp.down_proj.weight"].T
            else:
                share = torch.nn.functional.silu(
                    h @ sd[p + "share_expert.gate_proj.weight"].T) * \
                    (h @ sd[p + "share_expert.up_proj.weight"].T)
                share = share @ \
                    sd[p + "share_expert.down_proj.weight"].T
                logits = h @ sd[p + "moe.gate.weight"].T
                probs = torch.softmax(logits, -1)
                tw, ti = probs.topk(2, -1)
                tw = tw / tw.sum(-1, keepdim=True)
                moe = torch.zeros_like(h)
                for kk in range(2):
                    for e in range(E):
                        m = (ti[:, kk] == e)[:, None]
                        ge = torch.nn.functional.silu(
                            h @ sd[p + "moe.gate_proj.weight"][e].T) \
                            * (h @ sd[p + "moe.up_proj.weight"][e].T)
                        moe = moe + m * tw[:, kk:kk + 1] * (
                            ge @ sd[p + "moe.down_proj.weight"][e].T)
                x = res + share + moe
        x = rms(x, sd["model.norm.weight"])
        logits = x @ sd["lm_head.weight"].T
        ids.append(int(logits[-1].argmax()))
    return ids[len(prompt):]


def test_step3_matches_oracle(step3_dir):
    path, sd = step3_dir
    prompt = [5, 9, 42, 7, 101]
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    out = llm.generate(
        [{"prompt_token_ids": prompt}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    ref = _oracle(sd, prompt, 8)
    assert list(out.outputs[0].token_ids) == ref
