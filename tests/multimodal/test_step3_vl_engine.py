"""Step3-VL through the engine: post-norm vision tower (cls pad rows,
quick-gelu MLP) + two-conv downsampler projector over the Step3 MFA
text decoder; greedy matches a hand-stitched torch oracle (reference:
vllm/model_executor/models/step3_vl.py — upstream is
remote-code-only)."""

import json

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 250
S = 32  # image size; patch 8 → grid 4 → g1 3 → g2 2 → 4 tokens
VW = 32  # vision width
VH = 2
OH = 16  # output_hidden_size
NTOK = 4
# text dims (mirrors tests/models/test_step3.py)
H = 64
DH = 32
NH = 4
SQ = 48
E = 4
MI = 48
SI = 64
I_ = 96


@pytest.fixture(scope="module")
def step3vl_dir(tmp_path_factory):
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
    # vision tower + projector
    sd["vision_model.embeddings.class_embedding"] = rand(1, VW)
    sd["vision_model.embeddings.patch_embedding.weight"] = \
        rand(VW, 3, 8, 8)
    sd["vision_model.embeddings.patch_embedding.bias"] = rand(VW)
    sd["vision_model.embeddings.position_embedding.weight"] = \
        rand(17, VW)
    for i in range(2):
        p = f"vision_model.transformer.layers.{i}."
        sd[p + "self_attn.qkv_proj.weight"] = rand(3 * VW, VW)
        sd[p + "self_attn.qkv_proj.bias"] = rand(3 * VW)
        sd[p + "self_attn.out_proj.weight"] = rand(VW, VW)
        sd[p + "self_attn.out_proj.bias"] = rand(VW)
        sd[p + "layer_norm1.weight"] = torch.ones(VW) + rand(VW)
        sd[p + "layer_norm1.bias"] = rand(VW)
        sd[p + "layer_norm2.weight"] = torch.ones(VW) + rand(VW)
        sd[p + "layer_norm2.bias"] = rand(VW)
        sd[p + "mlp.fc1.weight"] = rand(2 * VW, VW)
        sd[p + "mlp.fc1.bias"] = rand(2 * VW)
        sd[p + "mlp.fc2.weight"] = rand(VW, 2 * VW)
        sd[p + "mlp.fc2.bias"] = rand(VW)
    sd["vit_downsampler.weight"] = rand(OH, VW, 2, 2)
    sd["vit_downsampler.bias"] = rand(OH)
    sd["vit_downsampler2.weight"] = rand(2 * OH, OH, 3, 3)
    sd["vit_downsampler2.bias"] = rand(2 * OH)
    sd["vit_large_projector.weight"] = rand(H, 2 * OH)
    sd["vit_large_projector.bias"] = rand(H)

    path = tmp_path_factory.mktemp("models") / "tiny-step3vl"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(path / "model.safetensors"))
    cfg = {
        "architectures": ["Step3VLForConditionalGeneration"],
        "model_type": "step3_vl",
        "image_token_id": IMG_TOK,
        "understand_projector_stride": 1,
        "projector_bias": True,
        "vision_config": {"hidden_size": VW, "intermediate_size":
                          2 * VW, "output_hidden_size": OH,
                          "num_hidden_layers": 2,
                          "num_attention_heads": VH,
                          "image_size": S, "patch_size": 8,
                          "layer_norm_eps": 1e-5},
        "text_config": {
            "vocab_size": 256, "hidden_size": H,
            "intermediate_size": I_, "num_hidden_layers": 2,
            "num_attention_heads": NH, "num_key_value_heads": 1,
            "head_dim": DH, "share_q_dim": SQ,
            "max_position_embeddings": 128,
            "max_position_embedding": 128, "rope_theta": 10000.0,
            "rms_norm_eps": 1e-6, "tie_word_embeddings": False,
            "moe_num_experts": E, "moe_top_k": 2,
            "moe_intermediate_size": MI, "share_expert_dim": SI,
            "norm_expert_weight": True, "moe_layers_enum": "1",
        },
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), {k: v.float() for k, v in sd.items()}


def _tower(sd, pix):
    import torch

    x = torch.nn.functional.conv2d(
        pix[None],
        sd["vision_model.embeddings.patch_embedding.weight"],
        sd["vision_model.embeddings.patch_embedding.bias"],
        stride=8)
    x = x.flatten(2).permute(0, 2, 1)[0]  # [16, VW]
    cls = sd["vision_model.embeddings.class_embedding"]
    x = torch.cat([cls, x], 0)
    x = x + sd["vision_model.embeddings.position_embedding.weight"]
    x = torch.cat([cls.expand(3, VW) +
                   sd["vision_model.embeddings."
                      "position_embedding.weight"][0], x], 0)
    dh = VW // VH
    for i in range(2):
        p = f"vision_model.transformer.layers.{i}."
        t = x.shape[0]
        qkv = x @ sd[p + "self_attn.qkv_proj.weight"].T + \
            sd[p + "self_attn.qkv_proj.bias"]
        q, k, v = qkv.chunk(3, -1)
        q = q.reshape(t, VH, dh)
        k = k.reshape(t, VH, dh)
        v = v.reshape(t, VH, dh)
        s = torch.einsum("qhd,khd->hqk", q, k) * dh**-0.5
        o = torch.einsum("hqk,khd->qhd", torch.softmax(s, -1),
                         v).reshape(t, VW)
        o = o @ sd[p + "self_attn.out_proj.weight"].T + \
            sd[p + "self_attn.out_proj.bias"]
        x = x + torch.nn.functional.layer_norm(
            o, (VW, ), sd[p + "layer_norm1.weight"],
            sd[p + "layer_norm1.bias"], 1e-5)
        h = x @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"]
        h = h * torch.sigmoid(1.702 * h)
        h = h @ sd[p + "mlp.fc2.weight"].T + sd[p + "mlp.fc2.bias"]
        x = x + torch.nn.functional.layer_norm(
            h, (VW, ), sd[p + "layer_norm2.weight"],
            sd[p + "layer_norm2.bias"], 1e-5)
    x = x[4:]  # drop pad cls rows
    x = x.T.reshape(1, VW, 4, 4)
    x = torch.nn.functional.conv2d(x, sd["vit_downsampler.weight"],
                                   sd["vit_downsampler.bias"],
                                   stride=1)
    x = torch.nn.functional.conv2d(x, sd["vit_downsampler2.weight"],
                                   sd["vit_downsampler2.bias"],
                                   stride=2, padding=1)
    x = x.flatten(2).permute(0, 2, 1)[0]  # [4, 2*OH]
    return x @ sd["vit_large_projector.weight"].T + \
        sd["vit_large_projector.bias"]


def _text_oracle(sd, ids_seed, inject, n_new):
    """Step3 text oracle (mirrors tests/models/test_step3.py) with
    image embeddings injected at ``inject`` positions."""
    import torch

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

    ids = list(ids_seed)
    inj_pos, inj_vecs = inject
    for _ in range(n_new):
        T = len(ids)
        pos = torch.arange(T)
        x = sd["model.embed_tokens.weight"][torch.tensor(ids)].clone()
        for j, pp in enumerate(inj_pos):
            x[pp] = inj_vecs[j]
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
    return ids[len(ids_seed):]


def test_step3_vl_matches_oracle(step3vl_dir):
    import torch

    path, sd = step3vl_dir
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    engine = LLM(model=path, dtype="float32", max_model_len=128,
                 max_num_seqs=2, max_num_batched_tokens=64,
                 block_size=4, num_kv_blocks=128)
    out = engine.generate(
        [{"prompt_token_ids": [5, IMG_TOK, 9, 42],
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    with torch.no_grad():
        img = _tower(sd, torch.tensor(pix))
        ids = [5] + [IMG_TOK] * NTOK + [9, 42]
        ref = _text_oracle(sd, ids, (list(range(1, 1 + NTOK)), img),
                           8)
    assert list(out.outputs[0].token_ids) == ref
