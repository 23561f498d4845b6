"""Rope-BERT embedders (models/bert_with_rope.py): GTE-new and
Nomic-BERT vs a manual torch oracle (remote-code families — checkpoint
layouts follow the reference's WeightsMapper inverses)."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from vllm_main_modify_tpu.entrypoints.llm import LLM  # noqa: E402

H, I, NH, V, L = 64, 96, 4, 512, 2
HD = H // NH


def _torch_oracle(sd, ids, layer_key, qkv, okey, attn_ln, mlp_ln,
                  emb_ln, gated, act, rot_dim, theta, eps,
                  fused_up_gate, pre=""):
    import torch
    import torch.nn.functional as F

    T = len(ids)
    with torch.no_grad():
        x = sd[pre + "embeddings.word_embeddings.weight"][
            torch.tensor(ids)]
        tte = pre + "embeddings.token_type_embeddings.weight"
        if tte in sd:
            x = x + sd[tte][0]
        x = F.layer_norm(x, (H, ), sd[pre + emb_ln + ".weight"],
                         sd[pre + emb_ln + ".bias"], eps)
        inv = 1.0 / (theta ** (torch.arange(0, rot_dim, 2).float() /
                               rot_dim))
        ang = torch.arange(T)[:, None].float() * inv[None]
        cos, sin = ang.cos()[:, None], ang.sin()[:, None]

        def rope(q):
            xr, xp = q[..., :rot_dim], q[..., rot_dim:]
            d2 = rot_dim // 2
            x1, x2 = xr[..., :d2], xr[..., d2:]
            o = torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                          dim=-1)
            return torch.cat([o, xp], dim=-1)

        for l in range(L):
            p = pre + layer_key.format(i=l)
            w = sd[p + qkv + ".weight"]
            b = sd.get(p + qkv + ".bias", torch.zeros(3 * H))
            qkv_out = x @ w.T + b
            q = rope(qkv_out[:, :H].reshape(T, NH, HD))
            k = rope(qkv_out[:, H:2 * H].reshape(T, NH, HD))
            v = qkv_out[:, 2 * H:].reshape(T, NH, HD)
            s = torch.einsum("qhd,khd->hqk", q, k) / (HD ** 0.5)
            o = torch.einsum("hqk,khd->qhd",
                             F.softmax(s, -1), v).reshape(T, -1)
            o = o @ sd[p + okey + ".weight"].T
            if p + okey + ".bias" in sd:
                o = o + sd[p + okey + ".bias"]
            x = F.layer_norm(x + o, (H, ),
                             sd[p + attn_ln + ".weight"],
                             sd[p + attn_ln + ".bias"], eps)
            if gated and fused_up_gate:
                ug = x @ sd[p + "mlp.up_gate_proj.weight"].T
                up, gate = ug[:, :I], ug[:, I:]
            elif gated:
                up = x @ sd[p + "mlp.fc11.weight"].T + \
                    sd[p + "mlp.fc11.bias"]
                gate = x @ sd[p + "mlp.fc12.weight"].T + \
                    sd[p + "mlp.fc12.bias"]
            if act == "silu":
                h = F.silu(gate) * up
            else:
                h = F.gelu(gate) * up
            dkey = "mlp.down_proj" if fused_up_gate else "mlp.fc2"
            h = h @ sd[p + dkey + ".weight"].T
            if p + dkey + ".bias" in sd:
                h = h + sd[p + dkey + ".bias"]
            x = F.layer_norm(x + h, (H, ),
                             sd[p + mlp_ln + ".weight"],
                             sd[p + mlp_ln + ".bias"], eps)
        return x[0].numpy()  # CLS


def _ln(rng):
    import torch

    return (torch.rand(H) * 0.5 + 0.75, torch.randn(H) * 0.05)


def test_gte_new_matches_oracle(tmp_path):
    import torch

    import safetensors.torch as stt

    from tests.conftest import _save_tiny_tokenizer

    torch.manual_seed(0)
    sd = {"new.embeddings.word_embeddings.weight":
          torch.randn(V, H) * 0.2,
          "new.embeddings.token_type_embeddings.weight":
          torch.randn(2, H) * 0.1}
    w, b = _ln(torch)
    sd["new.embeddings.LayerNorm.weight"] = w
    sd["new.embeddings.LayerNorm.bias"] = b
    for l in range(L):
        p = f"new.encoder.layer.{l}."
        sd[p + "attention.qkv_proj.weight"] = torch.randn(3 * H,
                                                          H) * 0.1
        sd[p + "attention.qkv_proj.bias"] = torch.randn(3 * H) * 0.05
        sd[p + "attention.o_proj.weight"] = torch.randn(H, H) * 0.1
        sd[p + "attention.o_proj.bias"] = torch.randn(H) * 0.05
        sd[p + "mlp.up_gate_proj.weight"] = torch.randn(2 * I,
                                                        H) * 0.1
        sd[p + "mlp.down_proj.weight"] = torch.randn(H, I) * 0.1
        sd[p + "mlp.down_proj.bias"] = torch.randn(H) * 0.05
        for n in ("attn_ln", "mlp_ln"):
            w, b = _ln(torch)
            sd[p + n + ".weight"] = w
            sd[p + n + ".bias"] = b
    d = tmp_path / "gte-new"
    d.mkdir()
    stt.save_file({k: v.contiguous() for k, v in sd.items()},
                  str(d / "model.safetensors"))
    cfg = dict(model_type="bert", architectures=["GteNewModel"],
               vocab_size=V, hidden_size=H, intermediate_size=I,
               num_hidden_layers=L, num_attention_heads=NH,
               max_position_embeddings=128, layer_norm_eps=1e-12,
               rope_theta=10000.0, type_vocab_size=2,
               position_embedding_type="rope", hidden_act="gelu")
    (d / "config.json").write_text(json.dumps(cfg))
    _save_tiny_tokenizer(d)

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=8)
    ids = [5, 9, 42, 7, 13]
    out = llm.embed([ids])[0]
    ref = _torch_oracle(sd, ids, "encoder.layer.{i}.",
                        "attention.qkv_proj", "attention.o_proj",
                        "attn_ln", "mlp_ln", "embeddings.LayerNorm",
                        True, "geglu", HD, 10000.0, 1e-12, True,
                        pre="new.")
    ref = ref / np.linalg.norm(ref)
    np.testing.assert_allclose(np.asarray(out.data), ref, atol=2e-3,
                               rtol=2e-3)


def test_nomic_bert_matches_oracle(tmp_path):
    import torch

    import safetensors.torch as stt

    from tests.conftest import _save_tiny_tokenizer

    torch.manual_seed(1)
    rot_dim = int(HD * 0.75) // 2 * 2  # partial rotary fraction
    sd = {"embeddings.word_embeddings.weight": torch.randn(V, H) * 0.2,
          "embeddings.token_type_embeddings.weight":
          torch.randn(2, H) * 0.1}
    w, b = _ln(torch)
    sd["emb_ln.weight"] = w
    sd["emb_ln.bias"] = b
    for l in range(L):
        p = f"encoder.layers.{l}."
        sd[p + "attn.Wqkv.weight"] = torch.randn(3 * H, H) * 0.1
        sd[p + "attn.Wqkv.bias"] = torch.randn(3 * H) * 0.05
        sd[p + "attn.out_proj.weight"] = torch.randn(H, H) * 0.1
        sd[p + "attn.out_proj.bias"] = torch.randn(H) * 0.05
        sd[p + "mlp.fc11.weight"] = torch.randn(I, H) * 0.1
        sd[p + "mlp.fc11.bias"] = torch.randn(I) * 0.05
        sd[p + "mlp.fc12.weight"] = torch.randn(I, H) * 0.1
        sd[p + "mlp.fc12.bias"] = torch.randn(I) * 0.05
        sd[p + "mlp.fc2.weight"] = torch.randn(H, I) * 0.1
        sd[p + "mlp.fc2.bias"] = torch.randn(H) * 0.05
        for n in ("norm1", "norm2"):
            w, b = _ln(torch)
            sd[p + n + ".weight"] = w
            sd[p + n + ".bias"] = b
    d = tmp_path / "nomic"
    d.mkdir()
    stt.save_file({k: v.contiguous() for k, v in sd.items()},
                  str(d / "model.safetensors"))
    cfg = dict(model_type="bert", architectures=["NomicBertModel"],
               vocab_size=V, n_embd=H, n_inner=I, n_layer=L,
               num_attention_heads=NH, max_position_embeddings=128,
               layer_norm_epsilon=1e-12, rotary_emb_base=10000.0,
               rotary_emb_fraction=0.75, type_vocab_size=2,
               qkv_proj_bias=True, activation_function="swiglu",
               position_embedding_type="rope",
               # satisfy the generic dim extraction
               hidden_size=H, intermediate_size=I,
               num_hidden_layers=L)
    (d / "config.json").write_text(json.dumps(cfg))
    _save_tiny_tokenizer(d)

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=8)
    ids = [5, 9, 42, 7, 13]
    out = llm.embed([ids])[0]
    ref = _torch_oracle(sd, ids, "encoder.layers.{i}.", "attn.Wqkv",
                        "attn.out_proj", "norm1", "norm2", "emb_ln",
                        True, "silu", rot_dim, 10000.0, 1e-12, False)
    ref = ref / np.linalg.norm(ref)
    np.testing.assert_allclose(np.asarray(out.data), ref, atol=2e-3,
                               rtol=2e-3)


def test_gte_new_classifier(tmp_path):
    """GteNewForSequenceClassification: CLS → tanh pooler →
    classifier through the classify pooling path."""
    import torch
    import safetensors.torch as stt

    from tests.conftest import _save_tiny_tokenizer
    from vllm_main_modify_tpu.sampling_params import PoolingParams

    torch.manual_seed(2)
    sd = {"new.embeddings.word_embeddings.weight":
          torch.randn(V, H) * 0.2,
          "new.embeddings.token_type_embeddings.weight":
          torch.randn(2, H) * 0.1}
    w, b = _ln(torch)
    sd["new.embeddings.LayerNorm.weight"] = w
    sd["new.embeddings.LayerNorm.bias"] = b
    for l in range(L):
        p = f"new.encoder.layer.{l}."
        sd[p + "attention.qkv_proj.weight"] = torch.randn(3 * H,
                                                          H) * 0.1
        sd[p + "attention.qkv_proj.bias"] = torch.randn(3 * H) * 0.05
        sd[p + "attention.o_proj.weight"] = torch.randn(H, H) * 0.1
        sd[p + "attention.o_proj.bias"] = torch.randn(H) * 0.05
        sd[p + "mlp.up_gate_proj.weight"] = torch.randn(2 * I,
                                                        H) * 0.1
        sd[p + "mlp.down_proj.weight"] = torch.randn(H, I) * 0.1
        sd[p + "mlp.down_proj.bias"] = torch.randn(H) * 0.05
        for n in ("attn_ln", "mlp_ln"):
            w, b = _ln(torch)
            sd[p + n + ".weight"] = w
            sd[p + n + ".bias"] = b
    sd["new.pooler.dense.weight"] = torch.randn(H, H) * 0.1
    sd["new.pooler.dense.bias"] = torch.randn(H) * 0.05
    sd["classifier.weight"] = torch.randn(1, H) * 0.1
    sd["classifier.bias"] = torch.randn(1) * 0.05
    d = tmp_path / "gte-cls"
    d.mkdir()
    stt.save_file({k: v.contiguous() for k, v in sd.items()},
                  str(d / "model.safetensors"))
    cfg = dict(model_type="bert",
               architectures=["GteNewForSequenceClassification"],
               vocab_size=V, hidden_size=H, intermediate_size=I,
               num_hidden_layers=L, num_attention_heads=NH,
               max_position_embeddings=128, layer_norm_eps=1e-12,
               rope_theta=10000.0, type_vocab_size=2, num_labels=1,
               position_embedding_type="rope", hidden_act="gelu")
    (d / "config.json").write_text(json.dumps(cfg))
    _save_tiny_tokenizer(d)

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=8)
    ids = [5, 9, 42, 7, 13]
    out = llm.embed([ids], PoolingParams(task="classify",
                                         activation="none"))[0]
    cls = _torch_oracle(sd, ids, "encoder.layer.{i}.",
                        "attention.qkv_proj", "attention.o_proj",
                        "attn_ln", "mlp_ln", "embeddings.LayerNorm",
                        True, "geglu", HD, 10000.0, 1e-12, True,
                        pre="new.")
    import numpy as _np
    import torch as _t

    pooled = _np.tanh(cls @ sd["new.pooler.dense.weight"].numpy().T +
                      sd["new.pooler.dense.bias"].numpy())
    ref = pooled @ sd["classifier.weight"].numpy().T + \
        sd["classifier.bias"].numpy()
    np.testing.assert_allclose(np.asarray(out.data), ref, atol=2e-3,
                               rtol=2e-3)
