"""Grok-1 parity vs a manual torch oracle (remote-code family;
reference model: vllm/model_executor/models/grok1.py)."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")

TOKENS = [3, 17, 91, 200, 45, 12, 7, 150, 33, 99]
H, I, NH, NKV, HD, V, L, E, K = 64, 48, 4, 2, 16, 256, 2, 4, 2


def _build(tmp_path):
    import torch
    import safetensors.torch as stt

    torch.manual_seed(0)
    sd = {"model.embed_tokens.weight": torch.randn(V, H) * 0.2,
          "model.norm.weight": torch.rand(H) * 0.5 + 0.75,
          "lm_head.weight": torch.randn(V, H) * 0.2}
    for l in range(L):
        p = f"model.layers.{l}."
        for n in ("pre_attn_norm", "post_attn_norm", "pre_moe_norm",
                  "post_moe_norm"):
            sd[p + n + ".weight"] = torch.rand(H) * 0.5 + 0.75
        sd[p + "self_attn.q_proj.weight"] = torch.randn(NH * HD,
                                                        H) * 0.1
        sd[p + "self_attn.k_proj.weight"] = torch.randn(NKV * HD,
                                                        H) * 0.1
        sd[p + "self_attn.v_proj.weight"] = torch.randn(NKV * HD,
                                                        H) * 0.1
        sd[p + "self_attn.o_proj.weight"] = torch.randn(H,
                                                        NH * HD) * 0.1
        sd[p + "moe_block.gate.weight"] = torch.randn(E, H) * 0.1
        for e in range(E):
            q = p + f"moe_block.experts.{e}."
            sd[q + "linear.weight"] = torch.randn(I, H) * 0.1
            sd[q + "linear_v.weight"] = torch.randn(I, H) * 0.1
            sd[q + "linear_1.weight"] = torch.randn(H, I) * 0.1
    d = tmp_path / "grok1"
    d.mkdir()
    stt.save_file({k: v.contiguous() for k, v in sd.items()},
                  str(d / "model.safetensors"))
    cfg = dict(model_type="llama", architectures=["Grok1ForCausalLM"],
               vocab_size=V, hidden_size=H, intermediate_size=I,
               num_hidden_layers=L, num_attention_heads=NH,
               num_key_value_heads=NKV, head_dim=HD,
               num_experts=E, num_experts_per_tok=K,
               attn_logit_softcapping=30.0,
               router_logit_softcapping=30.0,
               attn_output_multiplier=0.5,
               embedding_multiplier_scale=2.0,
               output_multiplier_scale=0.25, rms_norm_eps=1e-5,
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
        x = sd["model.embed_tokens.weight"][torch.tensor(ids)] * 2.0
        pos = torch.arange(T)
        inv = 1.0 / (10000.0 ** (torch.arange(0, HD, 2).float() / HD))
        ang = pos[:, None].float() * inv[None]
        cos, sin = ang.cos()[:, None], ang.sin()[:, None]

        def rope(t_):
            d2 = HD // 2
            x1, x2 = t_[..., :d2], t_[..., d2:]
            return torch.cat([x1 * cos - x2 * sin,
                              x2 * cos + x1 * sin], dim=-1)

        for l in range(L):
            p = f"model.layers.{l}."
            h = rms(x, sd[p + "pre_attn_norm.weight"])
            q = rope((h @ sd[p + "self_attn.q_proj.weight"].T
                      ).reshape(T, NH, HD))
            k = rope((h @ sd[p + "self_attn.k_proj.weight"].T
                      ).reshape(T, NKV, HD))
            v = (h @ sd[p + "self_attn.v_proj.weight"].T
                 ).reshape(T, NKV, HD)
            k = k.repeat_interleave(NH // NKV, dim=1)
            v = v.repeat_interleave(NH // NKV, dim=1)
            s = torch.einsum("qhd,khd->hqk", q, k) / (HD ** 0.5)
            s = 30.0 * torch.tanh(s / 30.0)  # attn softcap
            mask = torch.triu(torch.full((T, T), float("-inf")), 1)
            o = torch.einsum("hqk,khd->qhd", F.softmax(s + mask, -1),
                             v).reshape(T, -1)
            o = (o @ sd[p + "self_attn.o_proj.weight"].T) * 0.5
            x = x + rms(o, sd[p + "post_attn_norm.weight"])

            h = rms(x, sd[p + "pre_moe_norm.weight"])
            logits = h @ sd[p + "moe_block.gate.weight"].T
            logits = 30.0 * torch.tanh(logits / 30.0)
            probs = F.softmax(logits, dim=-1)
            wts, eidx = torch.topk(probs, K, dim=-1)
            wts = wts / wts.sum(-1, keepdim=True)
            y = torch.zeros_like(h)
            for t_ in range(T):
                for j in range(K):
                    e = int(eidx[t_, j])
                    q_ = f"model.layers.{l}.moe_block.experts.{e}."
                    g_ = F.gelu(h[t_] @ sd[q_ + "linear.weight"].T,
                                approximate="none")
                    u_ = h[t_] @ sd[q_ + "linear_v.weight"].T
                    y[t_] += wts[t_, j] * ((g_ * u_) @
                                           sd[q_ + "linear_1.weight"].T)
            x = x + rms(y, sd[p + "post_moe_norm.weight"])
        x = rms(x, sd["model.norm.weight"])
        return (x @ sd["lm_head.weight"].T).numpy() * 0.25


def test_grok1_parity(tmp_path):
    d, sd = _build(tmp_path)
    ref = _oracle(sd, TOKENS)
    from tests.models.test_model_families import run_ours

    got = run_ours(str(d), TOKENS)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_hunyuan_moe_parity(tmp_path):
    """HunYuan-MoE-V1 vs a manual torch oracle: post-rope qk norm +
    softmax top-k MoE + always-on shared MLP
    (reference: hunyuan_v1.py MoE path)."""
    import torch
    import torch.nn.functional as F
    import safetensors.torch as stt

    torch.manual_seed(1)
    sd = {"model.embed_tokens.weight": torch.randn(V, H) * 0.2,
          "model.norm.weight": torch.rand(H) * 0.5 + 0.75,
          "lm_head.weight": torch.randn(V, H) * 0.2}
    SI = 48
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
        sd[p + "self_attn.query_layernorm.weight"] = \
            torch.rand(HD) * 0.5 + 0.75
        sd[p + "self_attn.key_layernorm.weight"] = \
            torch.rand(HD) * 0.5 + 0.75
        sd[p + "mlp.gate.wg.weight"] = torch.randn(E, H) * 0.1
        sd[p + "mlp.shared_mlp.gate_proj.weight"] = \
            torch.randn(SI, H) * 0.1
        sd[p + "mlp.shared_mlp.up_proj.weight"] = \
            torch.randn(SI, H) * 0.1
        sd[p + "mlp.shared_mlp.down_proj.weight"] = \
            torch.randn(H, SI) * 0.1
        for e in range(E):
            q = p + f"mlp.experts.{e}."
            sd[q + "gate_proj.weight"] = torch.randn(I, H) * 0.1
            sd[q + "up_proj.weight"] = torch.randn(I, H) * 0.1
            sd[q + "down_proj.weight"] = torch.randn(H, I) * 0.1
    d = tmp_path / "hunyuan-moe"
    d.mkdir()
    stt.save_file({k: v.contiguous() for k, v in sd.items()},
                  str(d / "model.safetensors"))
    import json as _json

    cfg = dict(model_type="llama",
               architectures=["HunYuanMoEV1ForCausalLM"],
               vocab_size=V, hidden_size=H, intermediate_size=48,
               num_hidden_layers=L, num_attention_heads=NH,
               num_key_value_heads=NKV, head_dim=HD, num_experts=E,
               moe_topk=K, moe_intermediate_size=I, use_qk_norm=True,
               use_mixed_mlp_moe=1, num_shared_expert=1,
               rms_norm_eps=1e-5, rope_theta=10000.0,
               max_position_embeddings=128, tie_word_embeddings=False)
    (d / "config.json").write_text(_json.dumps(cfg))

    def rms(x, w, eps=1e-5):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps)
        return v * w

    T = len(TOKENS)
    with torch.no_grad():
        x = sd["model.embed_tokens.weight"][torch.tensor(TOKENS)]
        pos = torch.arange(T)
        inv = 1.0 / (10000.0 ** (torch.arange(0, HD, 2).float() / HD))
        ang = pos[:, None].float() * inv[None]
        cos, sin = ang.cos()[:, None], ang.sin()[:, None]

        def rope(t_):
            d2 = HD // 2
            x1, x2 = t_[..., :d2], t_[..., d2:]
            return torch.cat([x1 * cos - x2 * sin,
                              x2 * cos + x1 * sin], dim=-1)

        for l in range(L):
            p = f"model.layers.{l}."
            h = rms(x, sd[p + "input_layernorm.weight"])
            q = rope((h @ sd[p + "self_attn.q_proj.weight"].T
                      ).reshape(T, NH, HD))
            k = rope((h @ sd[p + "self_attn.k_proj.weight"].T
                      ).reshape(T, NKV, HD))
            v = (h @ sd[p + "self_attn.v_proj.weight"].T
                 ).reshape(T, NKV, HD)
            q = rms(q, sd[p + "self_attn.query_layernorm.weight"])
            k = rms(k, sd[p + "self_attn.key_layernorm.weight"])
            k = k.repeat_interleave(NH // NKV, dim=1)
            v = v.repeat_interleave(NH // NKV, dim=1)
            s = torch.einsum("qhd,khd->hqk", q, k) / (HD ** 0.5)
            mask = torch.triu(torch.full((T, T), float("-inf")), 1)
            o = torch.einsum("hqk,khd->qhd", F.softmax(s + mask, -1),
                             v).reshape(T, -1)
            x = x + o @ sd[p + "self_attn.o_proj.weight"].T

            h = rms(x, sd[p + "post_attention_layernorm.weight"])
            logits = h @ sd[p + "mlp.gate.wg.weight"].T
            probs = F.softmax(logits, dim=-1)
            wts, eidx = torch.topk(probs, K, dim=-1)
            wts = wts / wts.sum(-1, keepdim=True)
            y = torch.zeros_like(h)
            for t_ in range(T):
                for j in range(K):
                    e = int(eidx[t_, j])
                    qk = p + f"mlp.experts.{e}."
                    g_ = F.silu(h[t_] @ sd[qk + "gate_proj.weight"].T)
                    u_ = h[t_] @ sd[qk + "up_proj.weight"].T
                    y[t_] += wts[t_, j] * ((g_ * u_) @
                                           sd[qk + "down_proj.weight"].T)
            sh = (F.silu(h @ sd[p + "mlp.shared_mlp.gate_proj"
                                ".weight"].T) *
                  (h @ sd[p + "mlp.shared_mlp.up_proj.weight"].T)) @ \
                sd[p + "mlp.shared_mlp.down_proj.weight"].T
            x = x + y + sh
        x = rms(x, sd["model.norm.weight"])
        ref = (x @ sd["lm_head.weight"].T).numpy()

    from tests.models.test_model_families import run_ours

    got = run_ours(str(d), TOKENS)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)
