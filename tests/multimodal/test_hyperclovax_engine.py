"""HyperCLOVA-X Vision through the engine: SigLIP tower (HF weights)
+ C-Abstractor / inverted-MLP projector over a Llama-shaped decoder;
greedy matches a hand-stitched torch oracle (reference:
vllm/model_executor/models/hyperclovax_vision.py — upstream is
remote-code-only and its C-Abstractor depends on timm, absent here;
the oracle replicates the timm RegStage Bottleneck structure the
reference builds)."""

import json

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 250
S = 32  # patch 8 → 16 patches
VD = 32
H = 64
NQ = 4  # cabstractor queries (2x2)


def _make_dir(tmp_path_factory, proj_type):
    import torch
    import transformers
    from safetensors.torch import save_file

    g = torch.Generator().manual_seed(0)

    def rand(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    vcfg = transformers.SiglipVisionConfig(
        hidden_size=VD, intermediate_size=2 * VD,
        num_hidden_layers=2, num_attention_heads=2, image_size=S,
        patch_size=8)
    torch.manual_seed(1)
    tower = transformers.SiglipVisionModel(vcfg).float().eval()
    tcfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=H, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False)
    llm = transformers.LlamaForCausalLM(tcfg).float().eval()

    sd = {}
    for k, v in tower.state_dict().items():
        sd["vision_model." + k] = v.contiguous()
    if proj_type == "inverted_mlp":
        sd["mm_projector.fc1.weight"] = rand(2 * VD, VD)
        sd["mm_projector.fc1.bias"] = rand(2 * VD)
        sd["mm_projector.fc2.weight"] = rand(H, 2 * VD)
        sd["mm_projector.fc2.bias"] = rand(H)
    else:
        sd["mm_projector.pos_emb"] = rand(1, 16, VD)
        se = VD // 4
        for si in (0, 2):
            for b in range(1, 4):
                p = f"mm_projector.net.{si}.b{b}."
                sd[p + "conv1.conv.weight"] = rand(VD, VD, 1, 1)
                sd[p + "conv1.bn.weight"] = torch.ones(VD) + rand(VD)
                sd[p + "conv1.bn.bias"] = rand(VD)
                sd[p + "conv2.conv.weight"] = rand(VD, 1, 3, 3)
                sd[p + "conv2.bn.weight"] = torch.ones(VD) + rand(VD)
                sd[p + "conv2.bn.bias"] = rand(VD)
                sd[p + "se.fc1.weight"] = rand(se, VD, 1, 1)
                sd[p + "se.fc1.bias"] = rand(se)
                sd[p + "se.fc2.weight"] = rand(VD, se, 1, 1)
                sd[p + "se.fc2.bias"] = rand(VD)
                sd[p + "conv3.conv.weight"] = rand(VD, VD, 1, 1)
                sd[p + "conv3.bn.weight"] = torch.ones(VD) + rand(VD)
                sd[p + "conv3.bn.bias"] = rand(VD)
        sd["mm_projector.readout.0.weight"] = rand(H, VD)
        sd["mm_projector.readout.0.bias"] = rand(H)
        sd["mm_projector.readout.2.weight"] = rand(H, H)
        sd["mm_projector.readout.2.bias"] = rand(H)
    for k, v in llm.state_dict().items():
        sd["language_model." + k] = v.contiguous()

    path = tmp_path_factory.mktemp("models") / f"tiny-hcx-{proj_type}"
    path.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(path / "model.safetensors"))
    cfg = {
        "architectures": ["HCXVisionForCausalLM"],
        "model_type": "hyperclovax_vlm",
        "image_token_index": IMG_TOK,
        "mm_projector_type": proj_type,
        "num_queries_vis_abstractor_image": NQ,
        "proj_pos_emb": True, "proj_prenorm": False,
        "anyres": False, "unpad": False,
        "vision_config": json.loads(vcfg.to_json_string()),
        "text_config": json.loads(tcfg.to_json_string()),
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return (str(path), {k: v.float() for k, v in sd.items()}, tower,
            llm)


def _cab_bottleneck(sd, p, x):
    """torch replica of the timm RegStage Bottleneck the reference
    builds (LayerNorm2d + SiLU + depthwise 3x3 + SE)."""
    import torch
    import torch.nn.functional as F

    def ln2d(y, w, b):  # y NCHW, LN over C
        y = y.permute(0, 2, 3, 1)
        y = F.layer_norm(y, (y.shape[-1], ), w, b, 1e-5)
        return y.permute(0, 3, 1, 2)

    sc = x
    y = F.conv2d(x, sd[p + "conv1.conv.weight"])
    y = F.silu(ln2d(y, sd[p + "conv1.bn.weight"],
                    sd[p + "conv1.bn.bias"]))
    y = F.conv2d(y, sd[p + "conv2.conv.weight"], padding=1,
                 groups=VD)
    y = F.silu(ln2d(y, sd[p + "conv2.bn.weight"],
                    sd[p + "conv2.bn.bias"]))
    s = y.mean(dim=(2, 3), keepdim=True)
    s = F.silu(F.conv2d(s, sd[p + "se.fc1.weight"],
                        sd[p + "se.fc1.bias"]))
    s = torch.sigmoid(
        F.conv2d(s, sd[p + "se.fc2.weight"], sd[p + "se.fc2.bias"]))
    y = y * s
    y = F.conv2d(y, sd[p + "conv3.conv.weight"])
    y = ln2d(y, sd[p + "conv3.bn.weight"], sd[p + "conv3.bn.bias"])
    return F.silu(y + sc)


@pytest.mark.parametrize("proj_type", ["inverted_mlp",
                                       "cabstractor"])
def test_hcx_vision_matches_oracle(tmp_path_factory, proj_type):
    import torch
    import torch.nn.functional as F

    path, sd, tower, llm = _make_dir(tmp_path_factory, proj_type)
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    ntok = NQ if proj_type == "cabstractor" else 16
    engine = LLM(model=path, dtype="float32", max_model_len=128,
                 max_num_seqs=2, max_num_batched_tokens=64,
                 block_size=4, num_kv_blocks=128, mm_image_size=S)
    out = engine.generate(
        [{"prompt_token_ids": [5, IMG_TOK, 9, 42],
          "multi_modal_data": {"image": pix}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    with torch.no_grad():
        feats = tower(
            torch.tensor(pix[None])).last_hidden_state[0]  # [16, VD]
        if proj_type == "inverted_mlp":
            y = F.gelu(feats @ sd["mm_projector.fc1.weight"].T +
                       sd["mm_projector.fc1.bias"])
            img = y @ sd["mm_projector.fc2.weight"].T + \
                sd["mm_projector.fc2.bias"]
        else:
            x = feats + sd["mm_projector.pos_emb"][0]
            x = x.T.reshape(1, VD, 4, 4)
            for b in range(1, 4):
                x = _cab_bottleneck(sd, f"mm_projector.net.0.b{b}.",
                                    x)
            x = F.adaptive_avg_pool2d(x, (2, 2))
            for b in range(1, 4):
                x = _cab_bottleneck(sd, f"mm_projector.net.2.b{b}.",
                                    x)
            x = x.flatten(2).permute(0, 2, 1)[0]  # [4, VD]
            y = F.silu(x @ sd["mm_projector.readout.0.weight"].T +
                       sd["mm_projector.readout.0.bias"])
            img = y @ sd["mm_projector.readout.2.weight"].T + \
                sd["mm_projector.readout.2.bias"]
        ids = [5] + [IMG_TOK] * ntok + [9, 42]
        emb = llm.get_input_embeddings()(torch.tensor([ids]))
        emb[0, 1:1 + ntok] = img
        gen = llm.generate(inputs_embeds=emb, max_new_tokens=8,
                           do_sample=False, eos_token_id=None,
                           pad_token_id=0)
    assert list(out.outputs[0].token_ids) == gen[0].tolist()[-8:]
