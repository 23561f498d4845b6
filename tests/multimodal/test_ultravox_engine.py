"""Ultravox through the engine: whisper-style encoder → final LN →
StackAudioFrames (pad T to a stack_factor multiple, concat frames) →
RMSNorm → linear_1 → swiglu (x[:d] * silu(x[d:])) → mid RMSNorm →
linear_2 → embedding merge; greedy matches a torch oracle built from
HF WhisperEncoder + hand-written projector + HF Llama.

(Ultravox is a remote-code checkpoint — no transformers class — so
the oracle composes stock HF modules instead of AutoModel.)
"""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams

AUDIO_TOK = 120
MEL, MAXPOS, D, FFN = 16, 8, 32, 64
STACK = 3  # 8 frames -> pad to 9 -> 3 audio tokens
PROJ_H = 40  # swiglu -> dim_mid 20
TEXT_H = 48
N_TOK = (MAXPOS + STACK - 1) // STACK


@pytest.fixture(scope="module")
def ultravox_dir(tmp_path_factory):
    import torch
    from safetensors.torch import save_file
    from transformers import LlamaConfig, LlamaForCausalLM, WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    from vllm_main_modify_tpu.models.hf_config_shims import UltravoxConfig

    audio_cfg = dict(d_model=D, encoder_layers=2,
                     encoder_attention_heads=4, encoder_ffn_dim=FFN,
                     num_mel_bins=MEL, max_source_positions=MAXPOS,
                     scale_embedding=False, dropout=0.0)
    text_cfg = dict(vocab_size=512, hidden_size=TEXT_H,
                    intermediate_size=96, num_hidden_layers=2,
                    num_attention_heads=4, num_key_value_heads=2,
                    max_position_embeddings=128,
                    tie_word_embeddings=False,
                    architectures=["LlamaForCausalLM"])
    cfg = UltravoxConfig(audio_config=audio_cfg, text_config=text_cfg,
                         audio_token_index=AUDIO_TOK, hidden_size=PROJ_H,
                         stack_factor=STACK, projector_act="swiglu",
                         projector_ln_mid=True)
    cfg.architectures = ["UltravoxModel"]

    torch.manual_seed(0)
    enc = WhisperEncoder(WhisperConfig(**audio_cfg)).float().eval()
    lm = LlamaForCausalLM(LlamaConfig(**text_cfg)).float().eval()
    g = torch.Generator().manual_seed(1)
    proj = {
        "ln_pre.weight": torch.rand((D * STACK, ), generator=g) + 0.5,
        "linear_1.weight": torch.randn((PROJ_H, D * STACK),
                                       generator=g) * 0.1,
        "ln_mid.weight": torch.rand((PROJ_H // 2, ), generator=g) + 0.5,
        "linear_2.weight": torch.randn((TEXT_H, PROJ_H // 2),
                                       generator=g) * 0.1,
    }
    state = {}
    for k, v in enc.state_dict().items():
        state["audio_tower." + k] = v.contiguous()
    for k, v in proj.items():
        state["multi_modal_projector." + k] = v.contiguous()
    for k, v in lm.state_dict().items():
        state["language_model." + k] = v.contiguous()

    path = tmp_path_factory.mktemp("models") / "tiny-ultravox"
    path.mkdir()
    save_file(state, str(path / "model.safetensors"))
    cfg.save_pretrained(path)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path), enc, proj, lm


def _oracle_generate(enc, proj, lm, mel, prompt_ids, n_new):
    import torch

    def rms(x, w, eps=1e-6):
        return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps) * w

    with torch.no_grad():
        x = enc(torch.tensor(mel[None])).last_hidden_state  # [1, T, D]
        t_pad = N_TOK * STACK - x.shape[1]
        x = torch.nn.functional.pad(x, (0, 0, 0, t_pad))
        x = x.reshape(1, N_TOK, D * STACK)
        x = rms(x, proj["ln_pre.weight"])
        x = x @ proj["linear_1.weight"].T
        d = x.shape[-1] // 2
        x = x[..., :d] * torch.nn.functional.silu(x[..., d:])
        x = rms(x, proj["ln_mid.weight"])
        audio_embeds = x @ proj["linear_2.weight"].T  # [1, N_TOK, H]

        ids = torch.tensor([prompt_ids])
        embeds = lm.model.embed_tokens(ids)
        pos = [i for i, t in enumerate(prompt_ids) if t == AUDIO_TOK]
        embeds[0, pos] = audio_embeds[0]
        out = lm.generate(inputs_embeds=embeds, max_new_tokens=n_new,
                          do_sample=False, eos_token_id=None,
                          pad_token_id=0)
    return out[0].tolist()[-n_new:]


def test_ultravox_generate_matches_oracle(ultravox_dir):
    path, enc, proj, lm = ultravox_dir
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((MEL, MAXPOS * 2)).astype(np.float32)
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    prompt_ids = [5, AUDIO_TOK, 9, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"audio": mel}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    expanded = [5] + [AUDIO_TOK] * N_TOK + [9, 42]
    ref = _oracle_generate(enc, proj, lm, mel, expanded, 8)
    assert list(out.outputs[0].token_ids) == ref
