"""Pixtral through the engine (reference: pixtral.py): HF-format
(Llava arch + pixtral tower, break/end token weaving) greedy-matches
transformers; the mistral-format key layout (params.json +
consolidated.safetensors) matches the HF-format load."""

import json
import os

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK, BRK_TOK, END_TOK = 10, 12, 13
S = 28  # grid 2x2 with patch 14 → 2*(2+1) = 6 tokens/image


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    import torch
    import transformers

    torch.manual_seed(0)
    vision = transformers.PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=S, patch_size=14,
        head_dim=8, rope_theta=10000.0)
    text = dict(vocab_size=512, hidden_size=64, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=128,
                model_type="mistral")
    cfg = transformers.LlavaConfig(
        vision_config=vision.to_dict(), text_config=text,
        image_token_index=IMG_TOK,
        vision_feature_layer=-1,
        vision_feature_select_strategy="full",
        image_seq_length=4,
        projector_hidden_act="gelu")
    cfg.image_break_token_id = BRK_TOK
    cfg.image_end_token_id = END_TOK
    hf = transformers.LlavaForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-pixtral-hf"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_pixtral_hf_matches_transformers(hf_dir):
    import torch

    path, hf = hf_dir
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    prompt_ids = [5, IMG_TOK, 7, 9, 42]
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=10,
                       ignore_eos=True))[0]

    # transformers: expand manually with break/end woven in (the HF
    # processor's layout, reference pixtral.py:295-301)
    expanded = [5, IMG_TOK, IMG_TOK, BRK_TOK, IMG_TOK, IMG_TOK,
                END_TOK, 7, 9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(pix[None]),
            image_sizes=torch.tensor([[S, S]]),
            max_new_tokens=10, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0, len(expanded):].tolist()
    assert list(out.outputs[0].token_ids) == ref


def test_pixtral_mistral_format_matches_hf_format(hf_dir,
                                                  tmp_path_factory):
    """Convert the HF-format weights to the mistral consolidated
    layout + params.json; both loads must generate identically."""
    from safetensors import safe_open
    from safetensors.numpy import save_file

    path, _ = hf_dir
    sd = {}
    with safe_open(os.path.join(path, "model.safetensors"),
                   framework="np") as f:
        for k in f.keys():
            sd[k] = f.get_tensor(k)

    def conv(k):
        k = k.replace("model.", "", 1) if k.startswith(
            "model.language_model.") or k.startswith(
                "model.vision_tower.") or k.startswith(
                    "model.multi_modal_projector.") else k
        table = [
            ("vision_tower.", "vision_encoder."),
            (".attention.q_proj.", ".attention.wq."),
            (".attention.k_proj.", ".attention.wk."),
            (".attention.v_proj.", ".attention.wv."),
            (".attention.o_proj.", ".attention.wo."),
            (".feed_forward.gate_proj.", ".feed_forward.w1."),
            (".feed_forward.down_proj.", ".feed_forward.w2."),
            (".feed_forward.up_proj.", ".feed_forward.w3."),
            ("multi_modal_projector.linear_1",
             "vision_language_adapter.w_in"),
            ("multi_modal_projector.linear_2",
             "vision_language_adapter.w_out"),
            ("language_model.model.embed_tokens.weight",
             "tok_embeddings.weight"),
            ("language_model.model.norm.weight", "norm.weight"),
            ("language_model.lm_head.weight", "output.weight"),
            ("lm_head.weight", "output.weight"),
            ("language_model.model.layers.", "layers."),
            ("language_model.layers.", "layers."),
            (".self_attn.q_proj.", ".attention.wq."),
            (".self_attn.k_proj.", ".attention.wk."),
            (".self_attn.v_proj.", ".attention.wv."),
            (".self_attn.o_proj.", ".attention.wo."),
            (".mlp.gate_proj.", ".feed_forward.w1."),
            (".mlp.down_proj.", ".feed_forward.w2."),
            (".mlp.up_proj.", ".feed_forward.w3."),
            (".input_layernorm.", ".attention_norm."),
            (".post_attention_layernorm.", ".ffn_norm."),
        ]
        for old, new in table:
            k = k.replace(old, new)
        return k

    # normalize possible "model."-nested llava layout first
    flat = {}
    for k, v in sd.items():
        kk = k
        if kk.startswith("model.") and not kk.startswith(
                "model.layers"):
            kk = kk[len("model."):]
        flat[kk] = v
    new = {conv(k): v for k, v in flat.items()}

    mdir = str(tmp_path_factory.mktemp("models") / "tiny-pixtral-mf")
    os.makedirs(mdir, exist_ok=True)
    save_file(new, os.path.join(mdir, "consolidated.safetensors"))
    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)
    tc, vc = hf_cfg["text_config"], hf_cfg["vision_config"]
    params = {
        "dim": tc["hidden_size"],
        "n_layers": tc["num_hidden_layers"],
        "n_heads": tc["num_attention_heads"],
        "n_kv_heads": tc["num_key_value_heads"],
        "hidden_dim": tc["intermediate_size"],
        "head_dim": tc["hidden_size"] // tc["num_attention_heads"],
        "norm_eps": tc.get("rms_norm_eps", 1e-5),
        "rope_theta": tc.get("rope_theta", 10000.0),
        "vocab_size": tc["vocab_size"],
        "max_seq_len": 128,
        "vision_encoder": {
            "hidden_size": vc["hidden_size"],
            "intermediate_size": vc["intermediate_size"],
            "num_hidden_layers": vc["num_hidden_layers"],
            "num_attention_heads": vc["num_attention_heads"],
            "image_size": vc["image_size"],
            "patch_size": vc["patch_size"],
            "rope_theta": vc.get("rope_theta", 10000.0),
            "image_token_id": IMG_TOK,
        },
    }
    with open(os.path.join(mdir, "params.json"), "w") as f:
        json.dump(params, f)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(mdir)

    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    sp = SamplingParams(temperature=0.0, max_tokens=10,
                        ignore_eos=True)
    outs = []
    for p in (path, mdir):
        llm = LLM(model=p, dtype="float32", max_model_len=128,
                  max_num_seqs=8, max_num_batched_tokens=64,
                  block_size=4, num_kv_blocks=256)
        out = llm.generate(
            [{"prompt_token_ids": [5, IMG_TOK, 7, 9, 42],
              "multi_modal_data": {"image": pix}}], sp)[0]
        outs.append(list(out.outputs[0].token_ids))
        del llm
    assert outs[0] == outs[1]
