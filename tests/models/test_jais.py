"""JAIS parity vs a manual torch oracle (remote-code family;
reference model: vllm/model_executor/models/jais.py — GPT-2 skeleton
with alibi, muP embedding/logit scales, swiglu c_fc/c_fc2 MLP and 1/d
attention scaling)."""

import json
import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")

TOKENS = [5, 19, 83, 201, 44, 13, 9, 152]
H, I, NH, HD, V, L = 64, 96, 4, 16, 256, 2
EMB_SCALE, OUT_ALPHA, WIDTH_SCALE = 9.0, 1.5, 0.5


def _slopes(n):
    start = 2 ** (-(2 ** -(math.log2(n) - 3)))
    return [start * start**i for i in range(n)]


def _build(tmp_path):
    import safetensors.torch as stt
    import torch

    torch.manual_seed(3)
    sd = {"transformer.wte.weight": torch.randn(V, H) * 0.2,
          "transformer.ln_f.weight": torch.rand(H) * 0.5 + 0.75,
          "transformer.ln_f.bias": torch.randn(H) * 0.02}
    for l in range(L):
        p = f"transformer.h.{l}."
        for n in ("ln_1", "ln_2"):
            sd[p + n + ".weight"] = torch.rand(H) * 0.5 + 0.75
            sd[p + n + ".bias"] = torch.randn(H) * 0.02
        # Conv1D layout [in, out]
        sd[p + "attn.c_attn.weight"] = torch.randn(H, 3 * H) * 0.1
        sd[p + "attn.c_attn.bias"] = torch.randn(3 * H) * 0.02
        sd[p + "attn.c_proj.weight"] = torch.randn(H, H) * 0.1
        sd[p + "attn.c_proj.bias"] = torch.randn(H) * 0.02
        sd[p + "mlp.c_fc.weight"] = torch.randn(H, I) * 0.1
        sd[p + "mlp.c_fc.bias"] = torch.randn(I) * 0.02
        sd[p + "mlp.c_fc2.weight"] = torch.randn(H, I) * 0.1
        sd[p + "mlp.c_fc2.bias"] = torch.randn(I) * 0.02
        sd[p + "mlp.c_proj.weight"] = torch.randn(I, H) * 0.1
        sd[p + "mlp.c_proj.bias"] = torch.randn(H) * 0.02
    d = tmp_path / "jais"
    d.mkdir()
    stt.save_file({k: v.contiguous() for k, v in sd.items()},
                  str(d / "model.safetensors"))
    cfg = dict(model_type="jais", architectures=["JAISLMHeadModel"],
               vocab_size=V, n_embd=H, n_layer=L, n_head=NH,
               n_positions=128, n_inner=I,
               activation_function="swiglu",
               position_embedding_type="alibi",
               mup_embeddings_scale=EMB_SCALE,
               mup_output_alpha=OUT_ALPHA,
               mup_width_scale=WIDTH_SCALE,
               mup_scale_qk_dot_by_d=True,
               layer_norm_epsilon=1e-5, tie_word_embeddings=True)
    (d / "config.json").write_text(json.dumps(cfg))
    return d, sd


def _oracle(sd, ids):
    import torch
    import torch.nn.functional as F

    T = len(ids)
    slopes = torch.tensor(_slopes(NH))

    def ln(x, w, b):
        return F.layer_norm(x, (H, ), w, b, 1e-5)

    with torch.no_grad():
        x = sd["transformer.wte.weight"][torch.tensor(ids)] * EMB_SCALE
        for l in range(L):
            p = f"transformer.h.{l}."
            h = ln(x, sd[p + "ln_1.weight"], sd[p + "ln_1.bias"])
            qkv = h @ sd[p + "attn.c_attn.weight"] + \
                sd[p + "attn.c_attn.bias"]
            q, k, v = qkv.split(H, dim=-1)
            q = q.reshape(T, NH, HD)
            k = k.reshape(T, NH, HD)
            v = v.reshape(T, NH, HD)
            s = torch.einsum("qhd,khd->hqk", q, k) / HD  # 1/d scaling
            pos = torch.arange(T)
            bias = slopes[:, None, None] * (
                pos[None, None, :] - pos[None, :, None]).float()
            mask = torch.triu(torch.full((T, T), float("-inf")), 1)
            o = torch.einsum("hqk,khd->qhd",
                             F.softmax(s + bias + mask, -1),
                             v).reshape(T, -1)
            x = x + o @ sd[p + "attn.c_proj.weight"] + \
                sd[p + "attn.c_proj.bias"]
            h = ln(x, sd[p + "ln_2.weight"], sd[p + "ln_2.bias"])
            h1 = h @ sd[p + "mlp.c_fc.weight"] + sd[p + "mlp.c_fc.bias"]
            h2 = h @ sd[p + "mlp.c_fc2.weight"] + \
                sd[p + "mlp.c_fc2.bias"]
            h = h1 * F.silu(h2)
            x = x + h @ sd[p + "mlp.c_proj.weight"] + \
                sd[p + "mlp.c_proj.bias"]
        x = ln(x, sd["transformer.ln_f.weight"],
               sd["transformer.ln_f.bias"])
        logits = x @ sd["transformer.wte.weight"].T
        return (logits * OUT_ALPHA * WIDTH_SCALE).numpy()


def test_jais_parity(tmp_path):
    d, sd = _build(tmp_path)
    ref = _oracle(sd, TOKENS)
    from tests.models.test_model_families import run_ours

    got = run_ours(str(d), TOKENS)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)
