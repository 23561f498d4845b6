"""Remote-code InternVLChatModel layout (reference: internvl.py
InternVLChatModel + intern_vit.py): the same tiny model saved in the
hub layout and converted to the OpenGVLab layout (fused attn.qkv,
ls1/ls2, norm1/norm2, mlp1.{0,1,3}, llm_config) must generate the
same tokens — validates the key mapping and the fused-qkv path."""

import json
import os

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 255


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    import torch
    import transformers

    vision = dict(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  image_size=28, patch_size=14,
                  attention_bias=True)
    text = dict(vocab_size=512, hidden_size=64, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=128,
                model_type="qwen2")
    cfg = transformers.InternVLConfig(
        text_config=text, vision_config=vision, image_token_id=IMG_TOK,
        downsample_ratio=0.5)
    torch.manual_seed(0)
    hf = transformers.InternVLForConditionalGeneration(cfg).to(
        torch.float32).eval()
    hub = tmp_path_factory.mktemp("models") / "tiny-internvl-hub"
    hf.save_pretrained(hub, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(hub)

    # ---- convert to the remote-code OpenGVLab layout ----------------
    from safetensors import safe_open
    from safetensors.numpy import save_file

    sd = {}
    with safe_open(os.path.join(hub, "model.safetensors"),
                   framework="np") as f:
        for k in f.keys():
            sd[k] = f.get_tensor(k)

    def strip(k):
        return k[len("model."):] if k.startswith("model.") else k

    sd = {strip(k): v for k, v in sd.items()}
    new = {}
    VT = "vision_tower."
    for k, v in sd.items():
        if k.startswith(VT):
            r = k[len(VT):]
            r = (r.replace("embeddings.cls_token",
                           "embeddings.class_embedding")
                 .replace("embeddings.position_embeddings",
                          "embeddings.position_embedding")
                 .replace("embeddings.patch_embeddings.projection",
                          "embeddings.patch_embedding")
                 .replace("encoder.layer.", "encoder.layers.")
                 .replace("layernorm_before", "norm1")
                 .replace("layernorm_after", "norm2")
                 .replace("lambda_1", "ls1")
                 .replace("lambda_2", "ls2")
                 .replace("attention.projection_layer", "attn.proj"))
            if ".attention.q_proj." in r or \
                    ".attention.k_proj." in r or \
                    ".attention.v_proj." in r:
                continue  # fused below
            new["vision_model." + r] = v
        elif k.startswith("multi_modal_projector."):
            r = k[len("multi_modal_projector."):]
            r = (r.replace("layer_norm", "mlp1.0")
                 .replace("linear_1", "mlp1.1")
                 .replace("linear_2", "mlp1.3"))
            new[r] = v
        else:
            new[k] = v  # language_model.* / lm_head: same both ways
    # fuse q/k/v
    n_layers = vision["num_hidden_layers"]
    for i in range(n_layers):
        base = f"{VT}encoder.layer.{i}.attention."
        for part in ("weight", "bias"):
            q = sd[base + f"q_proj.{part}"]
            kk = sd[base + f"k_proj.{part}"]
            vv = sd[base + f"v_proj.{part}"]
            new[f"vision_model.encoder.layers.{i}.attn.qkv."
                f"{part}"] = np.concatenate([q, kk, vv], axis=0)

    remote = str(hub) + "-remote"
    os.makedirs(remote, exist_ok=True)
    save_file(new, os.path.join(remote, "model.safetensors"))
    cfg_json = {
        "model_type": "internvl_chat",
        "architectures": ["InternVLChatModel"],
        "vision_config": {
            **vision,
            "qkv_bias": True,
            "layer_norm_eps": 1e-6,
        },
        "llm_config": {
            **text,
            "architectures": ["Qwen2ForCausalLM"],
        },
        "downsample_ratio": 0.5,
        "select_layer": -1,
        "ps_version": "v2",
        "image_token_index": IMG_TOK,
    }
    with open(os.path.join(remote, "config.json"), "w") as f:
        json.dump(cfg_json, f)
    _save_tiny_tokenizer(remote)
    return str(hub), remote


def test_remote_layout_matches_hub_layout(dirs):
    hub, remote = dirs
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, 28, 28)).astype(np.float32)
    prompt_ids = [5, IMG_TOK, 7, 9, 42]
    sp = SamplingParams(temperature=0.0, max_tokens=10,
                        ignore_eos=True)
    outs = []
    for path in (hub, remote):
        llm = LLM(model=path, dtype="float32", max_model_len=128,
                  max_num_seqs=8, max_num_batched_tokens=64,
                  block_size=4, num_kv_blocks=256)
        out = llm.generate(
            [{"prompt_token_ids": prompt_ids,
              "multi_modal_data": {"image": pix}}], sp)[0]
        outs.append(list(out.outputs[0].token_ids))
        del llm
    assert outs[0] == outs[1]


def test_nvlm_projector_shape_loads(dirs):
    """NVLM_D: wide bias-free mlp1 (pd → llm_intermediate → H)
    loads and generates (reference: nvlm_d.py _init_mlp1)."""
    import torch

    _, remote = dirs
    with open(os.path.join(remote, "config.json")) as f:
        cfg = json.load(f)
    nvlm = remote + "-nvlm"
    os.makedirs(nvlm, exist_ok=True)
    cfg["model_type"] = "NVLM_D"
    cfg["architectures"] = ["NVLM_D"]
    with open(os.path.join(nvlm, "config.json"), "w") as f:
        json.dump(cfg, f)
    from safetensors import safe_open
    from safetensors.numpy import save_file

    sd = {}
    with safe_open(os.path.join(remote, "model.safetensors"),
                   framework="np") as f:
        for k in f.keys():
            sd[k] = f.get_tensor(k)
    torch.manual_seed(1)
    pd = 32 * 4  # vision hidden * ds^2
    mid, hid = 96, 64  # llm intermediate, hidden
    sd["mlp1.1.weight"] = torch.randn(mid, pd).numpy() * 0.05
    sd["mlp1.3.weight"] = torch.randn(hid, mid).numpy() * 0.05
    del sd["mlp1.1.bias"], sd["mlp1.3.bias"]
    save_file(sd, os.path.join(nvlm, "model.safetensors"))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(nvlm)

    rng = np.random.default_rng(1)
    pix = rng.standard_normal((3, 28, 28)).astype(np.float32)
    llm = LLM(model=nvlm, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    out = llm.generate(
        [{"prompt_token_ids": [5, IMG_TOK, 7],
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=5,
                       ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 5
