"""Phi-3-Vision through the engine (reference: phi3v.py): CLIP tower
at layer -2, 2x2 HD merge, sub_GN/glb_GN separators, MLP projector —
greedy parity vs a torch reference composed from transformers
CLIPVisionModel + Phi3ForCausalLM with the reference HD-transform
math (phi3v.py:229-315)."""

import json
import os

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 300
S = 28  # tiny canonical image size (grid 2, m=1 → 5 tokens/image)


@pytest.fixture(scope="module")
def phi3v_dir(tmp_path_factory):
    import torch
    import transformers

    torch.manual_seed(0)
    clip_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=S, patch_size=14,
        projection_dim=32)
    clip = transformers.CLIPVisionModel(clip_cfg).to(
        torch.float32).eval()
    phi_cfg = transformers.Phi3Config(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    phi = transformers.Phi3ForCausalLM(phi_cfg).to(
        torch.float32).eval()

    D = 32
    glb_GN = torch.randn(1, 1, 4 * D) * 0.1
    sub_GN = torch.randn(1, 1, 1, 4 * D) * 0.1
    proj0_w = torch.randn(64, 4 * D) * 0.05
    proj0_b = torch.randn(64) * 0.05
    proj2_w = torch.randn(64, 64) * 0.05
    proj2_b = torch.randn(64) * 0.05

    sd = {}
    for k, v in clip.state_dict().items():
        # CLIPVisionModel prefixes with "vision_model."
        sd["model.vision_embed_tokens.img_processor." + k] = v
    sd["model.vision_embed_tokens.glb_GN"] = glb_GN
    sd["model.vision_embed_tokens.sub_GN"] = sub_GN
    sd["model.vision_embed_tokens.img_projection.0.weight"] = proj0_w
    sd["model.vision_embed_tokens.img_projection.0.bias"] = proj0_b
    sd["model.vision_embed_tokens.img_projection.2.weight"] = proj2_w
    sd["model.vision_embed_tokens.img_projection.2.bias"] = proj2_b
    for k, v in phi.state_dict().items():
        sd[k] = v

    path = str(tmp_path_factory.mktemp("models") / "tiny-phi3v")
    os.makedirs(path, exist_ok=True)
    from safetensors.torch import save_file

    save_file({k: v.contiguous() for k, v in sd.items()},
              os.path.join(path, "model.safetensors"))
    cfg = {
        "model_type": "phi3_v",
        "architectures": ["Phi3VForCausalLM"],
        "image_token_index": IMG_TOK,
        "img_processor": {
            "image_dim_out": D,
            "hidden_size": D,
            "intermediate_size": 64,
            "num_hidden_layers": 3,
            "num_attention_heads": 4,
            "image_size": S,
            "patch_size": 14,
            "layer_idx": -2,
            "type_feature": "patch",
        },
        "embd_layer": {
            "embedding_cls": "image",
            "hd_transform_order": "sub_glb",
            "use_hd_transform": True,
            "with_learnable_separator": True,
            "projection_cls": "mlp",
        },
        **{k: getattr(phi_cfg, k) for k in (
            "vocab_size", "hidden_size", "intermediate_size",
            "num_hidden_layers", "num_attention_heads",
            "num_key_value_heads", "max_position_embeddings",
            "rms_norm_eps", "rope_theta")},
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    extras = dict(glb_GN=glb_GN, sub_GN=sub_GN, proj=(
        proj0_w, proj0_b, proj2_w, proj2_b))
    return path, clip, phi, extras


def _hd_reference(clip, extras, pix):
    """Reference HD transform (phi3v.py:229-315) at 1x1 crops."""
    import torch

    with torch.no_grad():
        out = clip(torch.tensor(pix), output_hidden_states=True)
        feats = out.hidden_states[-2][:, 1:]  # layer -2, drop CLS
    n, p, d = feats.shape
    g = int(p**0.5)
    m = g // 2

    def merge(x):  # [1, P, D] → [1, m, m, 4D]
        x = x.reshape(1, m, 2, m, 2, d).permute(0, 1, 3, 2, 4, 5)
        return x.reshape(1, m, m, 4 * d)

    glb = merge(feats[0:1])
    sub = merge(feats[1:2])
    newline = extras["sub_GN"].expand(1, m, 1, 4 * d)
    sub = torch.cat([sub, newline], dim=2).reshape(1, m * (m + 1),
                                                   4 * d)
    glb = torch.cat([glb, newline], dim=2).reshape(1, m * (m + 1),
                                                   4 * d)
    x = torch.cat([sub, extras["glb_GN"], glb], dim=1)
    w0, b0, w2, b2 = extras["proj"]
    x = torch.nn.functional.gelu(x @ w0.T + b0)
    return x @ w2.T + b2  # [1, tokens, H]


def test_phi3v_generate_matches_reference(phi3v_dir):
    import torch

    path, clip, phi, extras = phi3v_dir
    rng = np.random.default_rng(0)
    pix_one = rng.standard_normal((3, S, S)).astype(np.float32)
    prompt_ids = [5, IMG_TOK, 7, 9, 42]

    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix_one}}],
        SamplingParams(temperature=0.0, max_tokens=10,
                       ignore_eos=True))[0]

    # torch reference: HD features at the 5 placeholder rows
    n_tok = 2 * 1 * 2 + 1  # m=1
    feats = _hd_reference(clip, extras,
                          np.stack([pix_one, pix_one])[None][0][None]
                          .reshape(2, 3, S, S))
    expanded = [5] + [IMG_TOK] * n_tok + [7, 9, 42]
    with torch.no_grad():
        emb = phi.get_input_embeddings()(torch.tensor([expanded]))
        emb[0, 1:1 + n_tok] = feats[0]
        gen = phi.generate(inputs_embeds=emb, max_new_tokens=10,
                           do_sample=False, eos_token_id=None,
                           pad_token_id=0)
    ref = gen[0].tolist()[-10:] if gen.shape[1] > 10 else \
        gen[0].tolist()
    assert list(out.outputs[0].token_ids) == ref
