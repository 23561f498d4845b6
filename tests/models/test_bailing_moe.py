"""Bailing/Ling MoE parity vs a manual torch oracle (remote-code
family; reference model: vllm/model_executor/models/bailing_moe.py).

Covers both registry names: BailingMoeForCausalLM (softmax routing,
per-head qk LayerNorm, partial rotary, fused qkv with bias, norm_head)
and BailingMoeV2ForCausalLM (sigmoid scoring + expert bias +
group-limited top-k, per-head qk RMSNorm)."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")

TOKENS = [3, 17, 91, 200, 45, 12, 7, 150]
H, I, MI, NH, NKV, HD, V, L, E, K, NS = (64, 96, 32, 4, 2, 16, 256, 2,
                                         4, 2, 1)
ROT = 8  # partial rotary


def _build(tmp_path, v2: bool):
    import safetensors.torch as stt
    import torch

    torch.manual_seed(1 if v2 else 0)
    qd, kd = NH * HD, NKV * HD
    sd = {"model.word_embeddings.weight": torch.randn(V, H) * 0.2,
          "model.norm.weight": torch.rand(H) * 0.5 + 0.75,
          "lm_head.weight": torch.randn(V, H) * 0.2}
    for l in range(L):
        p = f"model.layers.{l}."
        sd[p + "input_layernorm.weight"] = torch.rand(H) * 0.5 + 0.75
        sd[p + "post_attention_layernorm.weight"] = \
            torch.rand(H) * 0.5 + 0.75
        sd[p + "attention.query_key_value.weight"] = \
            torch.randn(qd + 2 * kd, H) * 0.1
        sd[p + "attention.query_key_value.bias"] = \
            torch.randn(qd + 2 * kd) * 0.02
        sd[p + "attention.dense.weight"] = torch.randn(H, qd) * 0.1
        if v2:
            sd[p + "attention.query_layernorm.weight"] = \
                torch.rand(HD) * 0.5 + 0.75
            sd[p + "attention.key_layernorm.weight"] = \
                torch.rand(HD) * 0.5 + 0.75
        else:
            for n in ("query", "key"):
                sd[p + f"attention.{n}_layernorm.weight"] = \
                    torch.rand(HD) * 0.5 + 0.75
                sd[p + f"attention.{n}_layernorm.bias"] = \
                    torch.randn(HD) * 0.02
        if l == 0:  # dense (first_k_dense_replace=1)
            sd[p + "mlp.gate_up_proj.weight"] = \
                torch.randn(2 * I, H) * 0.1
            sd[p + "mlp.down_proj.weight"] = torch.randn(H, I) * 0.1
        else:
            sd[p + "mlp.gate.weight"] = torch.randn(E, H) * 0.1
            if v2:
                sd[p + "mlp.gate.expert_bias"] = torch.randn(E) * 0.2
            for e in range(E):
                q = p + f"mlp.experts.{e}."
                sd[q + "gate_proj.weight"] = torch.randn(MI, H) * 0.1
                sd[q + "up_proj.weight"] = torch.randn(MI, H) * 0.1
                sd[q + "down_proj.weight"] = torch.randn(H, MI) * 0.1
            q = p + "mlp.shared_experts."
            sd[q + "gate_proj.weight"] = torch.randn(MI * NS, H) * 0.1
            sd[q + "up_proj.weight"] = torch.randn(MI * NS, H) * 0.1
            sd[q + "down_proj.weight"] = torch.randn(H, MI * NS) * 0.1
    d = tmp_path / ("bailing-v2" if v2 else "bailing")
    d.mkdir()
    stt.save_file({k: v.contiguous() for k, v in sd.items()},
                  str(d / "model.safetensors"))
    cfg = dict(model_type="bailing_moe_v2" if v2 else "bailing_moe",
               architectures=["BailingMoeV2ForCausalLM" if v2 else
                              "BailingMoeForCausalLM"],
               vocab_size=V, hidden_size=H, intermediate_size=I,
               num_hidden_layers=L, num_attention_heads=NH,
               num_key_value_heads=NKV, head_dim=HD, rotary_dim=ROT,
               num_experts=E, num_experts_per_tok=K,
               moe_intermediate_size=MI, num_shared_experts=NS,
               first_k_dense_replace=1, norm_topk_prob=True,
               rms_norm_eps=1e-5, rope_theta=10000.0,
               max_position_embeddings=128, use_bias=False,
               use_qkv_bias=True, use_qk_norm=True, norm_head=True,
               hidden_act="silu", tie_word_embeddings=False,
               embedding_dropout=0.0)
    if v2:
        cfg.update(use_rmsnorm=True, score_function="sigmoid",
                   moe_router_enable_expert_bias=True, n_group=2,
                   topk_group=1, routed_scaling_factor=1.5)
    (d / "config.json").write_text(json.dumps(cfg))
    return d, sd


def _oracle(sd, ids, v2: bool):
    import torch
    import torch.nn.functional as F

    qd, kd = NH * HD, NKV * HD

    def rms(x, w, eps=1e-5):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps)
        return v * w

    T = len(ids)
    with torch.no_grad():
        x = sd["model.word_embeddings.weight"][torch.tensor(ids)]
        pos = torch.arange(T)
        inv = 1.0 / (10000.0 ** (torch.arange(0, ROT, 2).float() /
                                 ROT))
        ang = pos[:, None].float() * inv[None]
        cos, sin = ang.cos()[:, None], ang.sin()[:, None]

        def rope(t_):
            r, rest = t_[..., :ROT], t_[..., ROT:]
            d2 = ROT // 2
            x1, x2 = r[..., :d2], r[..., d2:]
            rr = torch.cat([x1 * cos - x2 * sin,
                            x2 * cos + x1 * sin], dim=-1)
            return torch.cat([rr, rest], dim=-1)

        def swiglu_split(h, pre):
            gu = h @ sd[pre + "gate_up_proj.weight"].T
            g, u = gu.split(I, dim=-1)
            return (F.silu(g) * u) @ sd[pre + "down_proj.weight"].T

        def swiglu(h, pre):
            g = F.silu(h @ sd[pre + "gate_proj.weight"].T)
            u = h @ sd[pre + "up_proj.weight"].T
            return (g * u) @ sd[pre + "down_proj.weight"].T

        for l in range(L):
            p = f"model.layers.{l}."
            h = rms(x, sd[p + "input_layernorm.weight"])
            qkv = h @ sd[p + "attention.query_key_value.weight"].T + \
                sd[p + "attention.query_key_value.bias"]
            q, k, v = qkv.split([qd, kd, kd], dim=-1)
            q = q.reshape(T, NH, HD)
            k = k.reshape(T, NKV, HD)
            v = v.reshape(T, NKV, HD)
            if v2:
                q = rms(q, sd[p + "attention.query_layernorm.weight"])
                k = rms(k, sd[p + "attention.key_layernorm.weight"])
            else:
                q = F.layer_norm(
                    q, (HD, ),
                    sd[p + "attention.query_layernorm.weight"],
                    sd[p + "attention.query_layernorm.bias"], 1e-6)
                k = F.layer_norm(
                    k, (HD, ),
                    sd[p + "attention.key_layernorm.weight"],
                    sd[p + "attention.key_layernorm.bias"], 1e-6)
            q, k = rope(q), rope(k)
            k = k.repeat_interleave(NH // NKV, dim=1)
            vv = v.repeat_interleave(NH // NKV, dim=1)
            s = torch.einsum("qhd,khd->hqk", q, k) / (HD ** 0.5)
            mask = torch.triu(torch.full((T, T), float("-inf")), 1)
            o = torch.einsum("hqk,khd->qhd",
                             F.softmax(s + mask, -1),
                             vv).reshape(T, -1)
            x = x + o @ sd[p + "attention.dense.weight"].T

            h = rms(x, sd[p + "post_attention_layernorm.weight"])
            if l == 0:
                y = swiglu_split(h, p + "mlp.")
            else:
                logits = h @ sd[p + "mlp.gate.weight"].T
                if v2:
                    scores = torch.sigmoid(logits)
                    choice = scores + sd[p + "mlp.gate.expert_bias"]
                    grouped = choice.reshape(T, 2, E // 2)
                    gsc = grouped.topk(2, dim=-1).values.sum(-1)
                    gidx = gsc.topk(1, dim=-1).indices
                    gmask = F.one_hot(gidx, 2).sum(1).float()
                    m = gmask.repeat_interleave(E // 2, dim=-1)
                    masked = torch.where(m > 0, choice,
                                         torch.zeros_like(choice))
                    eidx = masked.topk(K, dim=-1).indices
                    wts = torch.gather(scores, 1, eidx)
                    wts = wts / (wts.sum(-1, keepdim=True) + 1e-20)
                    wts = wts * 1.5
                else:
                    probs = F.softmax(logits, -1)
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
        head = sd["lm_head.weight"].float()
        # norm_head: F.normalize(w, dim=0) over the [V, H] torch
        # layout (bailing_moe.py:495-500)
        head = head / head.norm(dim=0, keepdim=True).clamp_min(1e-7)
        return (x @ head.T).numpy()


@pytest.mark.parametrize("v2", [False, True], ids=["v1", "v2"])
def test_bailing_moe_parity(tmp_path, v2):
    d, sd = _build(tmp_path, v2)
    ref = _oracle(sd, TOKENS, v2)
    from tests.models.test_model_families import run_ours

    got = run_ours(str(d), TOKENS)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)
