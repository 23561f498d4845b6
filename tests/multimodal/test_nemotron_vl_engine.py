"""Nemotron VL family through the engine: C-RADIO tower (cls+register
rows, pos on patches only, timm pre-LN blocks) + pixel shuffle +
per-variant projector over (a) Llama and (b) the NemotronH hybrid;
greedy matches hand-stitched torch oracles (reference:
vllm/model_executor/models/nemotron_vl.py, nano_nemotron_vl.py,
radio.py — upstream vision is remote-code-only)."""

import json

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 250
S = 32  # patch 8 → grid 4; ds 2 → 4 tokens
VD = 32
VH = 2
REG = 4  # cls+register rows
H = 64
MID = 48
NTOK = 4
NH_PATTERN = "M*-"


def _radio_sd(rand, torch):
    sd = {}
    p0 = "vision_model.radio_model.model."
    sd[p0 + "patch_generator.embedder.weight"] = rand(VD, 3 * 64)
    sd[p0 + "patch_generator.pos_embed"] = rand(1, 16, VD)
    sd[p0 + "patch_generator.cls_token.token"] = rand(REG, VD)
    for i in range(2):
        p = p0 + f"blocks.{i}."
        sd[p + "norm1.weight"] = torch.ones(VD) + rand(VD)
        sd[p + "norm1.bias"] = rand(VD)
        sd[p + "norm2.weight"] = torch.ones(VD) + rand(VD)
        sd[p + "norm2.bias"] = rand(VD)
        sd[p + "attn.qkv.weight"] = rand(3 * VD, VD)
        sd[p + "attn.qkv.bias"] = rand(3 * VD)
        sd[p + "attn.proj.weight"] = rand(VD, VD)
        sd[p + "attn.proj.bias"] = rand(VD)
        sd[p + "mlp.fc1.weight"] = rand(2 * VD, VD)
        sd[p + "mlp.fc1.bias"] = rand(2 * VD)
        sd[p + "mlp.fc2.weight"] = rand(VD, 2 * VD)
        sd[p + "mlp.fc2.bias"] = rand(VD)
    return sd


def _radio_tower(sd, pix):
    import torch

    g = 4
    p0 = "vision_model.radio_model.model."
    ln = torch.nn.functional.layer_norm
    dh = VD // VH
    x = pix.reshape(3, g, 8, g, 8).permute(1, 3, 0, 2, 4).reshape(
        g * g, 3 * 64)
    x = x @ sd[p0 + "patch_generator.embedder.weight"].T
    x = x + sd[p0 + "patch_generator.pos_embed"][0]
    x = torch.cat([sd[p0 + "patch_generator.cls_token.token"], x], 0)
    t = x.shape[0]
    for i in range(2):
        p = p0 + f"blocks.{i}."
        h = ln(x, (VD, ), sd[p + "norm1.weight"],
               sd[p + "norm1.bias"], 1e-6)
        qkv = (h @ sd[p + "attn.qkv.weight"].T +
               sd[p + "attn.qkv.bias"]).reshape(t, 3, VH, dh)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        s = torch.einsum("qhd,khd->hqk", q, k) * dh**-0.5
        o = torch.einsum("hqk,khd->qhd", torch.softmax(s, -1),
                         v).reshape(t, VD)
        x = x + (o @ sd[p + "attn.proj.weight"].T +
                 sd[p + "attn.proj.bias"])
        h = ln(x, (VD, ), sd[p + "norm2.weight"],
               sd[p + "norm2.bias"], 1e-6)
        h = torch.nn.functional.gelu(
            h @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"])
        x = x + (h @ sd[p + "mlp.fc2.weight"].T +
                 sd[p + "mlp.fc2.bias"])
    x = x[REG:].reshape(1, g, g, VD)
    # pixel shuffle v2 (HF InternVLModel semantics)
    ds = 2
    x = x.reshape(1, g, g // ds, VD * ds)
    x = x.permute(0, 2, 1, 3)
    x = x.reshape(1, g // ds, g // ds, VD * ds * ds)
    x = x.permute(0, 2, 1, 3).reshape(-1, VD * 4)
    return x  # [4, 128]


def test_llama_nemotron_vl_matches_oracle(tmp_path_factory):
    import torch
    import transformers
    from safetensors.torch import save_file

    g = torch.Generator().manual_seed(0)

    def rand(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    tcfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=H, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False)
    llm = transformers.LlamaForCausalLM(tcfg).float().eval()
    sd = _radio_sd(rand, torch)
    pd = VD * 4
    sd["mlp1.0.weight"] = torch.ones(pd) + rand(pd)
    sd["mlp1.0.bias"] = rand(pd)
    sd["mlp1.1.weight"] = rand(MID, pd)
    sd["mlp1.1.bias"] = rand(MID)
    sd["mlp1.3.weight"] = rand(H, MID)
    sd["mlp1.3.bias"] = rand(H)
    for k, v in llm.state_dict().items():
        sd["language_model." + k] = v.contiguous()
    path = tmp_path_factory.mktemp("models") / "tiny-nemotron-vl"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(path / "model.safetensors"))
    cfg = {
        "architectures": ["Llama_Nemotron_Nano_VL"],
        "model_type": "Llama_Nemotron_Nano_VL",
        "image_token_index": IMG_TOK,
        "downsample_ratio": 0.5, "ps_version": "v2",
        "vit_hidden_size": VD, "projector_hidden_size": MID,
        "vision_config": {"hidden_size": VD, "num_hidden_layers": 2,
                          "num_attention_heads": VH,
                          "intermediate_size": 2 * VD,
                          "image_size": S, "patch_size": 8,
                          "reg_tokens": REG,
                          "layer_norm_eps": 1e-6},
        "text_config": json.loads(tcfg.to_json_string()),
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)

    sdf = {k: v.float() for k, v in sd.items()}
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    engine = LLM(model=str(path), dtype="float32", max_model_len=128,
                 max_num_seqs=2, max_num_batched_tokens=64,
                 block_size=4, num_kv_blocks=128, mm_image_size=S)
    out = engine.generate(
        [{"prompt_token_ids": [5, IMG_TOK, 9, 42],
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    with torch.no_grad():
        f = _radio_tower(sdf, torch.tensor(pix))
        f = torch.nn.functional.layer_norm(
            f, (pd, ), sdf["mlp1.0.weight"], sdf["mlp1.0.bias"],
            1e-5)
        f = torch.nn.functional.gelu(
            f @ sdf["mlp1.1.weight"].T + sdf["mlp1.1.bias"])
        img = f @ sdf["mlp1.3.weight"].T + sdf["mlp1.3.bias"]
        ids = [5] + [IMG_TOK] * NTOK + [9, 42]
        emb = llm.get_input_embeddings()(torch.tensor([ids]))
        emb[0, 1:1 + NTOK] = img
        gen = llm.generate(inputs_embeds=emb, max_new_tokens=8,
                           do_sample=False, eos_token_id=None,
                           pad_token_id=0)
    assert list(out.outputs[0].token_ids) == gen[0].tolist()[-8:]


def test_nemotron_h_nano_vl_matches_oracle(tmp_path_factory):
    import torch
    import torch.nn.functional as F
    from safetensors.torch import save_file
    from transformers import Mamba2Config
    from transformers.models.mamba2.modeling_mamba2 import Mamba2Mixer

    torch.manual_seed(0)
    g = torch.Generator().manual_seed(1)

    def rand(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    nh, hd, st, dc = 4, 16, 8, 4
    I_ = 96
    m2cfg = Mamba2Config(hidden_size=H, num_heads=nh, head_dim=hd,
                         expand=1, state_size=st, conv_kernel=dc,
                         n_groups=1, use_bias=False,
                         use_conv_bias=True, rms_norm=True,
                         layer_norm_epsilon=1e-5)
    sd = {}
    mixers = {}
    for l, kind in enumerate(NH_PATTERN):
        p = f"language_model.backbone.layers.{l}."
        sd[p + "norm.weight"] = torch.rand(H) * 0.5 + 0.75
        if kind == "M":
            mx = Mamba2Mixer(m2cfg, layer_idx=l).to(torch.float32)
            for k, v in mx.state_dict().items():
                if v.dtype.is_floating_point:
                    v.data = torch.randn_like(v) * 0.2
            mx.A_log.data = torch.log(torch.rand(nh) * 8 + 1)
            mx.dt_bias.data = torch.rand(nh)
            mx.eval()
            mixers[l] = mx
            for k, v in mx.state_dict().items():
                sd[p + "mixer." + k] = v.clone()
        elif kind == "*":
            sd[p + "mixer.q_proj.weight"] = rand(nh * hd, H)
            sd[p + "mixer.k_proj.weight"] = rand(2 * hd, H)
            sd[p + "mixer.v_proj.weight"] = rand(2 * hd, H)
            sd[p + "mixer.o_proj.weight"] = rand(H, nh * hd)
        else:
            sd[p + "mixer.up_proj.weight"] = rand(I_, H)
            sd[p + "mixer.down_proj.weight"] = rand(H, I_)
    sd["language_model.backbone.embed_tokens.weight"] = rand(256, H)
    sd["language_model.backbone.norm_f.weight"] = \
        torch.rand(H) * 0.5 + 0.75
    sd["language_model.lm_head.weight"] = rand(256, H)
    sd.update(_radio_sd(rand, torch))
    pd = VD * 4
    sd["mlp1.0.weight"] = torch.ones(pd) + rand(pd)
    sd["mlp1.1.weight"] = rand(MID, pd)
    sd["mlp1.3.weight"] = rand(H, MID)

    path = tmp_path_factory.mktemp("models") / "tiny-nano-nemotron"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(path / "model.safetensors"))
    cfg = {
        "architectures": ["NemotronH_Nano_VL_V2"],
        "model_type": "NemotronH_Nano_VL_V2",
        "image_token_index": IMG_TOK,
        "downsample_ratio": 0.5, "ps_version": "v2",
        "vit_hidden_size": VD, "projector_hidden_size": MID,
        "vision_config": {"hidden_size": VD, "num_hidden_layers": 2,
                          "num_attention_heads": VH,
                          "intermediate_size": 2 * VD,
                          "image_size": S, "patch_size": 8,
                          "reg_tokens": REG,
                          "layer_norm_eps": 1e-6},
        "text_config": {
            "model_type": "nemotron_h",
            "architectures": ["NemotronHForCausalLM"],
            "vocab_size": 256, "hidden_size": H,
            "intermediate_size": I_,
            "num_hidden_layers": len(NH_PATTERN),
            "num_attention_heads": nh, "num_key_value_heads": 2,
            "head_dim": hd, "hybrid_override_pattern": NH_PATTERN,
            "mamba_num_heads": nh, "mamba_head_dim": hd,
            "ssm_state_size": st, "conv_kernel": dc, "n_groups": 1,
            "use_conv_bias": True, "use_bias": False,
            "mlp_bias": False, "rms_norm_eps": 1e-5,
            "max_position_embeddings": 128,
            "tie_word_embeddings": False,
        },
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)

    sdf = {k: (v.float() if v.dtype.is_floating_point else v)
           for k, v in sd.items()}
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    engine = LLM(model=str(path), dtype="float32", max_model_len=128,
                 max_num_seqs=2, max_num_batched_tokens=64,
                 block_size=4, num_kv_blocks=128, mm_image_size=S)
    out = engine.generate(
        [{"prompt_token_ids": [5, IMG_TOK, 9, 42],
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=6,
                       ignore_eos=True))[0]

    def rms(x, w):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-5)
        return v * w

    def nh_forward(embeds):
        x = embeds
        T = x.shape[0]
        for l, kind in enumerate(NH_PATTERN):
            p = f"language_model.backbone.layers.{l}."
            h = rms(x, sdf[p + "norm.weight"])
            if kind == "M":
                mix = mixers[l].torch_forward(
                    h[None], cache_params=None, cache_position=None,
                    attention_mask=None)[0]
            elif kind == "*":
                q = (h @ sdf[p + "mixer.q_proj.weight"].T).reshape(
                    T, nh, hd)
                k = (h @ sdf[p + "mixer.k_proj.weight"].T).reshape(
                    T, 2, hd)
                v = (h @ sdf[p + "mixer.v_proj.weight"].T).reshape(
                    T, 2, hd)
                k = k.repeat_interleave(2, dim=1)
                v = v.repeat_interleave(2, dim=1)
                s = torch.einsum("qhd,khd->hqk", q, k) * hd**-0.5
                mask = torch.triu(
                    torch.full((T, T), float("-inf")), diagonal=1)
                o = torch.einsum("hqk,khd->qhd",
                                 F.softmax(s + mask, dim=-1),
                                 v).reshape(T, -1)
                mix = o @ sdf[p + "mixer.o_proj.weight"].T
            else:
                y = F.relu(h @ sdf[p + "mixer.up_proj.weight"].T)**2
                mix = y @ sdf[p + "mixer.down_proj.weight"].T
            x = x + mix
        x = rms(x, sdf["language_model.backbone.norm_f.weight"])
        return x @ sdf["language_model.lm_head.weight"].T

    with torch.no_grad():
        f = _radio_tower(sdf, torch.tensor(pix))
        f = rms(f, sdf["mlp1.0.weight"])
        f = F.relu(f @ sdf["mlp1.1.weight"].T)**2
        img = f @ sdf["mlp1.3.weight"].T
        ids = [5] + [IMG_TOK] * NTOK + [9, 42]
        ref = []
        cur = list(ids)
        for _ in range(6):
            emb = sdf["language_model.backbone."
                      "embed_tokens.weight"][torch.tensor(cur)]
            emb = emb.clone()
            emb[1:1 + NTOK] = img
            logits = nh_forward(emb)
            nxt = int(logits[-1].argmax())
            ref.append(nxt)
            cur.append(nxt)
    assert list(out.outputs[0].token_ids) == ref
