"""GraniteSpeech through the engine: conformer CTC encoder (Shaw
block attention, GLU conv, mid-stack CTC injection) + windowed
Q-Former projector over a Granite decoder; greedy matches HF
(reference: vllm/model_executor/models/granite_speech.py)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

AUD_TOK = 500
IN_DIM = 40
T_FRAMES = 30  # 2 windows of 15
WINDOW = 15
DS = 5
NTOK = T_FRAMES // DS


@pytest.fixture(scope="module")
def granite_speech_dir(tmp_path_factory):
    import torch
    import transformers
    from transformers import GraniteSpeechConfig
    from transformers.models.granite_speech.configuration_granite_speech \
        import GraniteSpeechEncoderConfig

    enc = GraniteSpeechEncoderConfig(
        input_dim=IN_DIM, num_layers=2, hidden_dim=32,
        feedforward_mult=2, num_heads=4, dim_head=8, output_dim=24,
        context_size=20)
    cfg = GraniteSpeechConfig(
        text_config=dict(model_type="granite", vocab_size=512,
                         hidden_size=48, intermediate_size=96,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2,
                         max_position_embeddings=128,
                         architectures=["GraniteForCausalLM"]),
        encoder_config=enc,
        projector_config=dict(model_type="blip_2_qformer",
                              hidden_size=24, num_hidden_layers=2,
                              num_attention_heads=4,
                              intermediate_size=48,
                              encoder_hidden_size=32,
                              cross_attention_frequency=1,
                              num_query_tokens=3),
        audio_token_index=AUD_TOK, downsample_rate=DS,
        window_size=WINDOW, has_lora_adapter=False)
    torch.manual_seed(0)
    hf = transformers.GraniteSpeechForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-granite-speech"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), hf


def test_granite_speech_matches_hf(granite_speech_dir):
    import torch

    path, hf = granite_speech_dir
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((T_FRAMES, IN_DIM)).astype(np.float32)
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    out = llm.generate(
        [{"prompt_token_ids": [5, AUD_TOK, 9, 42],
          "multi_modal_data": {"audio": feats}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    expanded = [5] + [AUD_TOK] * NTOK + [9, 42]
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            input_features=torch.tensor(feats[None]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0].tolist()[-8:]
    assert list(out.outputs[0].token_ids) == ref
