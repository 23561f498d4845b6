"""DeepSeek-MoE v1 parity vs a manual torch oracle (remote-code
family; reference model: vllm/model_executor/models/deepseek.py —
softmax top-k routing + ungated shared experts, dense first_k
layers)."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")

TOKENS = [3, 17, 91, 200, 45, 12, 7, 150, 33, 99]
H, I, MI, NH, NKV, HD, V, L, E, K, NS = (64, 96, 32, 4, 2, 16, 256, 2,
                                         4, 2, 2)


def _build(tmp_path):
    import safetensors.torch as stt
    import torch

    torch.manual_seed(0)
    sd = {"model.embed_tokens.weight": torch.randn(V, H) * 0.2,
          "model.norm.weight": torch.rand(H) * 0.5 + 0.75,
          "lm_head.weight": torch.randn(V, H) * 0.2}
    for l in range(L):
        p = f"model.layers.{l}."
        sd[p + "input_layernorm.weight"] = torch.rand(H) * 0.5 + 0.75
        sd[p + "post_attention_layernorm.weight"] = \
            torch.rand(H) * 0.5 + 0.75
        sd[p + "self_attn.q_proj.weight"] = torch.randn(NH * HD,
                                                        H) * 0.1
        sd[p + "self_attn.k_proj.weight"] = torch.randn(NKV * HD,
                                                        H) * 0.1
        sd[p + "self_attn.v_proj.weight"] = torch.randn(NKV * HD,
                                                        H) * 0.1
        sd[p + "self_attn.o_proj.weight"] = torch.randn(H,
                                                        NH * HD) * 0.1
        if l == 0:  # dense (first_k_dense_replace=1)
            sd[p + "mlp.gate_proj.weight"] = torch.randn(I, H) * 0.1
            sd[p + "mlp.up_proj.weight"] = torch.randn(I, H) * 0.1
            sd[p + "mlp.down_proj.weight"] = torch.randn(H, I) * 0.1
        else:
            sd[p + "mlp.gate.weight"] = torch.randn(E, H) * 0.1
            for e in range(E):
                q = p + f"mlp.experts.{e}."
                sd[q + "gate_proj.weight"] = torch.randn(MI, H) * 0.1
                sd[q + "up_proj.weight"] = torch.randn(MI, H) * 0.1
                sd[q + "down_proj.weight"] = torch.randn(H, MI) * 0.1
            q = p + "mlp.shared_experts."
            sd[q + "gate_proj.weight"] = torch.randn(MI * NS, H) * 0.1
            sd[q + "up_proj.weight"] = torch.randn(MI * NS, H) * 0.1
            sd[q + "down_proj.weight"] = torch.randn(H, MI * NS) * 0.1
    d = tmp_path / "deepseek-v1"
    d.mkdir()
    stt.save_file({k: v.contiguous() for k, v in sd.items()},
                  str(d / "model.safetensors"))
    cfg = dict(model_type="llama",
               architectures=["DeepseekForCausalLM"],
               vocab_size=V, hidden_size=H, intermediate_size=I,
               num_hidden_layers=L, num_attention_heads=NH,
               num_key_value_heads=NKV, head_dim=HD,
               n_routed_experts=E, num_experts_per_tok=K,
               moe_intermediate_size=MI, n_shared_experts=NS,
               first_k_dense_replace=1, moe_layer_freq=1,
               norm_topk_prob=True, rms_norm_eps=1e-5,
               rope_theta=10000.0, max_position_embeddings=128,
               tie_word_embeddings=False)
    (d / "config.json").write_text(json.dumps(cfg))
    return d, sd


def _oracle(sd, ids):
    import torch
    import torch.nn.functional as F

    def rms(x, w):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-5)
        return v * w

    T = len(ids)
    with torch.no_grad():
        x = sd["model.embed_tokens.weight"][torch.tensor(ids)]
        pos = torch.arange(T)
        inv = 1.0 / (10000.0 ** (torch.arange(0, HD, 2).float() / HD))
        ang = pos[:, None].float() * inv[None]
        cos, sin = ang.cos()[:, None], ang.sin()[:, None]

        def rope(t_):
            d2 = HD // 2
            x1, x2 = t_[..., :d2], t_[..., d2:]
            return torch.cat([x1 * cos - x2 * sin,
                              x2 * cos + x1 * sin], dim=-1)

        def swiglu(h, pre):
            g = F.silu(h @ sd[pre + "gate_proj.weight"].T)
            u = h @ sd[pre + "up_proj.weight"].T
            return (g * u) @ sd[pre + "down_proj.weight"].T

        for l in range(L):
            p = f"model.layers.{l}."
            h = rms(x, sd[p + "input_layernorm.weight"])
            q = rope((h @ sd[p + "self_attn.q_proj.weight"].T
                      ).reshape(T, NH, HD))
            k = rope((h @ sd[p + "self_attn.k_proj.weight"].T
                      ).reshape(T, NKV, HD))
            v = (h @ sd[p + "self_attn.v_proj.weight"].T
                 ).reshape(T, NKV, HD)
            k = k.repeat_interleave(NH // NKV, dim=1)
            v = v.repeat_interleave(NH // NKV, dim=1)
            s = torch.einsum("qhd,khd->hqk", q, k) / (HD ** 0.5)
            mask = torch.triu(torch.full((T, T), float("-inf")), 1)
            o = torch.einsum("hqk,khd->qhd", F.softmax(s + mask, -1),
                             v).reshape(T, -1)
            x = x + o @ sd[p + "self_attn.o_proj.weight"].T

            h = rms(x, sd[p + "post_attention_layernorm.weight"])
            if l == 0:
                y = swiglu(h, p + "mlp.")
            else:
                probs = F.softmax(h @ sd[p + "mlp.gate.weight"].T, -1)
                wts, eidx = torch.topk(probs, K, dim=-1)
                wts = wts / wts.sum(-1, keepdim=True)
                y = torch.zeros_like(h)
                for t_ in range(T):
                    for j in range(K):
                        e = int(eidx[t_, j])
                        y[t_] += wts[t_, j] * swiglu(
                            h[t_], p + f"mlp.experts.{e}.")
                y = y + swiglu(h, p + "mlp.shared_experts.")
            x = x + y
        x = rms(x, sd["model.norm.weight"])
        return (x @ sd["lm_head.weight"].T).numpy()


def test_deepseek_v1_parity(tmp_path):
    d, sd = _build(tmp_path)
    ref = _oracle(sd, TOKENS)
    from tests.models.test_model_families import run_ours

    got = run_ours(str(d), TOKENS)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)
