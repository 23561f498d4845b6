"""PLaMo-2 hybrid parity vs a pure-torch oracle (reference:
vllm/model_executor/models/plamo2.py — the HF model is
remote-code-only): sandwich norms with checkpoint weight offsets,
post-conv bcdt projection with learned RMSNorms, per-head q/k norm
weights."""

import json
import math

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

H = 64
DH = 16  # hidden_size_per_head
NH = 4  # attention q heads
NKV = 2
I_ = 96
MH = 4  # mamba heads (inter = 64)
DS = 8  # d_state
DC = 3  # d_conv
RK = 64  # dt rank = max(64, H // 16)


@pytest.fixture(scope="module")
def plamo2_dir(tmp_path_factory):
    import torch
    from safetensors.torch import save_file

    g = torch.Generator().manual_seed(0)

    def rand(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    di = MH * DH
    sd = {"model.embed_tokens.weight": rand(256, H),
          "model.norm.weight": rand(H),  # +1 at load
          "lm_head.weight": rand(256, H)}
    for i in range(2):
        p = f"model.layers.layers.{i}."
        for n in ("pre_mixer_norm", "post_mixer_norm", "pre_mlp_norm",
                  "post_mlp_norm"):
            sd[p + n + ".weight"] = rand(H)
        sd[p + "mlp.gate_up_proj.weight"] = rand(2 * I_, H)
        sd[p + "mlp.down_proj.weight"] = rand(H, I_)
        if i == 0:  # mamba layer (step=2 → attention at i%2==1)
            sd[p + "mixer.in_proj.weight"] = rand(2 * di, H)
            sd[p + "mixer.conv1d.weight"] = rand(di, DC)
            sd[p + "mixer.bcdt_proj.weight"] = rand(2 * DS + RK, di)
            sd[p + "mixer.dt_proj.weight"] = rand(MH, RK)
            sd[p + "mixer.dt_norm_weight"] = torch.ones(RK) + rand(RK)
            sd[p + "mixer.B_norm_weight"] = torch.ones(DS) + rand(DS)
            sd[p + "mixer.C_norm_weight"] = torch.ones(DS) + rand(DS)
            sd[p + "mixer.dt_bias"] = rand(MH)
            sd[p + "mixer.A_log"] = rand(MH)
            sd[p + "mixer.D"] = torch.ones(MH) + rand(MH)
            sd[p + "mixer.out_proj.weight"] = rand(H, di)
        else:
            sd[p + "mixer.q_proj.weight"] = rand(NH * DH, H)
            sd[p + "mixer.k_proj.weight"] = rand(NKV * DH, H)
            sd[p + "mixer.v_proj.weight"] = rand(NKV * DH, H)
            sd[p + "mixer.o_proj.weight"] = rand(H, NH * DH)
            sd[p + "mixer.q_weight"] = torch.ones(NH, DH) + \
                rand(NH, DH)
            sd[p + "mixer.k_weight"] = torch.ones(NKV, DH) + \
                rand(NKV, DH)
    path = tmp_path_factory.mktemp("models") / "tiny-plamo2"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(path / "model.safetensors"))
    cfg = {
        "architectures": ["Plamo2ForCausalLM"],
        "model_type": "llama", "vocab_size": 256, "hidden_size": H,
        "intermediate_size": I_, "num_hidden_layers": 2,
        "num_attention_heads": NH, "num_key_value_heads": NKV,
        "hidden_size_per_head": DH, "max_position_embeddings": 128,
        "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
        "mamba_d_state": DS, "mamba_d_conv": DC,
        "mamba_num_heads": MH, "mamba_step": 2,
        "mamba_chunk_size": 16, "tie_word_embeddings": False,
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), {k: v.float() for k, v in sd.items()}


def _oracle(sd, prompt, n_new):
    import torch

    di = MH * DH

    def rms(x, w):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-6)
        return v * w

    def rope(x, pos):
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
            p = f"model.layers.layers.{i}."
            res = x
            h = rms(x, sd[p + "pre_mixer_norm.weight"] + 1.0)
            if i == 0:  # mamba
                proj = h @ sd[p + "mixer.in_proj.weight"].T
                pr = proj.reshape(T, MH, 2 * DH)
                z = pr[..., :DH].reshape(T, di)
                hid = pr[..., DH:].reshape(T, di)
                wconv = sd[p + "mixer.conv1d.weight"]  # [di, DC]
                padded = torch.cat([torch.zeros(DC - 1, di), hid], 0)
                u = torch.stack([
                    sum(wconv[:, j] * padded[t0 + j]
                        for j in range(DC)) for t0 in range(T)
                ])
                u = torch.nn.functional.silu(u)
                bcdt = u @ sd[p + "mixer.bcdt_proj.weight"].T
                B = rms(bcdt[:, :DS], sd[p + "mixer.B_norm_weight"])
                C = rms(bcdt[:, DS:2 * DS],
                        sd[p + "mixer.C_norm_weight"])
                tsr = rms(bcdt[:, 2 * DS:],
                          sd[p + "mixer.dt_norm_weight"])
                dt = tsr @ sd[p + "mixer.dt_proj.weight"].T
                dt = torch.nn.functional.softplus(
                    dt + sd[p + "mixer.dt_bias"])
                a = -torch.exp(sd[p + "mixer.A_log"])  # [MH]
                st = torch.zeros(MH, DH, DS)
                ys = []
                xs = u.reshape(T, MH, DH)
                for t0 in range(T):
                    dA = torch.exp(dt[t0] * a)  # [MH]
                    st = st * dA[:, None, None] + \
                        (dt[t0][:, None] * xs[t0])[..., None] * \
                        B[t0][None, None, :]
                    y = (st * C[t0][None, None, :]).sum(-1) + \
                        sd[p + "mixer.D"][:, None] * xs[t0]
                    ys.append(y.reshape(di))
                y = torch.stack(ys) * torch.nn.functional.silu(z)
                mix = y @ sd[p + "mixer.out_proj.weight"].T
            else:  # attention
                q = (h @ sd[p + "mixer.q_proj.weight"].T).reshape(
                    T, NH, DH)
                k = (h @ sd[p + "mixer.k_proj.weight"].T).reshape(
                    T, NKV, DH)
                v = (h @ sd[p + "mixer.v_proj.weight"].T).reshape(
                    T, NKV, DH)
                q = rms(q, torch.ones(DH)) * \
                    sd[p + "mixer.q_weight"][None]
                k = rms(k, torch.ones(DH)) * \
                    sd[p + "mixer.k_weight"][None]
                q, k = rope(q, pos), rope(k, pos)
                group = NH // NKV
                mask = torch.full((T, T), float("-inf")).triu(1)
                outs = []
                for hh in range(NH):
                    kv_h = hh // group
                    s = (q[:, hh] @ k[:, kv_h].T) * DH**-0.5
                    outs.append(
                        torch.softmax(s + mask, -1) @ v[:, kv_h])
                o = torch.cat(outs, -1)
                mix = o @ sd[p + "mixer.o_proj.weight"].T
            mix = rms(mix, sd[p + "post_mixer_norm.weight"] + 0.2)
            x = res + mix
            res = x
            h = rms(x, sd[p + "pre_mlp_norm.weight"] + 1.0)
            gu = h @ sd[p + "mlp.gate_up_proj.weight"].T
            y = torch.nn.functional.silu(gu[:, :I_]) * gu[:, I_:]
            y = y @ sd[p + "mlp.down_proj.weight"].T
            y = rms(y, sd[p + "post_mlp_norm.weight"] + 5**-1.5)
            x = res + y
        x = rms(x, sd["model.norm.weight"] + 1.0)
        logits = x @ sd["lm_head.weight"].T
        ids.append(int(logits[-1].argmax()))
    return ids[len(prompt):]


def test_plamo2_matches_oracle(plamo2_dir):
    path, sd = plamo2_dir
    prompt = [5, 9, 42, 7, 101, 33]
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=64)
    out = llm.generate(
        [{"prompt_token_ids": prompt}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    ref = _oracle(sd, prompt, 8)
    assert list(out.outputs[0].token_ids) == ref
