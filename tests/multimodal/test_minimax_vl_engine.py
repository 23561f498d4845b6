"""MiniMax-VL-01 wiring: the LLaVA-NeXT anyres composition over the
MiniMaxText01 hybrid decoder boots and generates deterministically
(reference: vllm/model_executor/models/minimax_vl_01.py reuses the
llava infrastructure; CLIP-tower parity and lightning-attention
parity are covered by their own suites)."""

import json

import numpy as np

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

IMG_TOK = 500
S = 32


def test_minimax_vl_dummy_boot(tmp_path):
    path = tmp_path / "tiny-minimax-vl"
    path.mkdir()
    cfg = {
        "architectures": ["MiniMaxVL01ForConditionalGeneration"],
        "model_type": "minimax_vl_01",
        "image_token_index": IMG_TOK,
        "vision_feature_layer": -1,
        "vision_feature_select_strategy": "default",
        "image_grid_pinpoints": [[S, S]],
        "vision_config": {
            "model_type": "clip_vision_model", "hidden_size": 32,
            "intermediate_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "image_size": S,
            "patch_size": 8, "projection_dim": 32,
        },
        "text_config": {
            "model_type": "minimax_text01",
            "architectures": ["MiniMaxText01ForCausalLM"],
            "vocab_size": 512, "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "head_dim": 16, "max_position_embeddings": 64,
            "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
            "attn_type_list": [0, 1],
            "num_local_experts": 4, "num_experts_per_tok": 2,
        },
    }
    (path / "config.json").write_text(json.dumps(cfg))
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, S, S)).astype(np.float32)
    llm = LLM(model=str(path), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=128,
              block_size=4, num_kv_blocks=512, load_format="dummy")
    outs = [
        llm.generate(
            [{"prompt_token_ids": [5, IMG_TOK, 9],
              "multi_modal_data": {"image": pix}}],
            SamplingParams(temperature=0.0, max_tokens=6,
                           ignore_eos=True))[0].outputs[0].token_ids
        for _ in range(2)
    ]
    assert len(outs[0]) == 6 and list(outs[0]) == list(outs[1])
