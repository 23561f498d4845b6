"""Audio input processing for encoder-decoder (Whisper) requests.

Reference: vllm whisper serving — raw waveform → log-mel features via
the checkpoint's HF feature extractor; the decoder prompt (task /
language tokens) travels as normal token ids, and the audio content
hashes into the prefix-cache key.
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np

_EXTRACTOR_CACHE: dict[str, Any] = {}


def _feature_extractor(model_dir: str):
    if model_dir not in _EXTRACTOR_CACHE:
        from transformers import AutoFeatureExtractor

        _EXTRACTOR_CACHE[model_dir] = \
            AutoFeatureExtractor.from_pretrained(model_dir)
    return _EXTRACTOR_CACHE[model_dir]


def default_decoder_prompt(model_config) -> list[int]:
    """<|startoftranscript|> (+ forced task tokens) from the
    checkpoint's generation config."""
    hf = model_config.hf_config
    ids = []
    start = getattr(hf, "decoder_start_token_id", None)
    if start is not None:
        ids.append(int(start))
    forced = getattr(hf, "forced_decoder_ids", None) or []
    for _, tok in forced:
        ids.append(int(tok))
    return ids or [0]


def build_audio_inputs(
    token_ids,
    audio,
    model_config,
) -> tuple[list[int], list[dict], str]:
    """→ (decoder_prompt_ids, mm_inputs, content_salt). ``audio`` is a
    raw waveform (float array at the extractor's sampling rate) or an
    (array, sampling_rate) pair; a precomputed [mel, frames] feature
    array passes through."""
    if isinstance(audio, tuple):
        wav, sr = audio
    else:
        wav, sr = audio, None
    wav = np.asarray(wav, dtype=np.float32)

    hf = model_config.hf_config
    n_mel = getattr(hf, "num_mel_bins", 80)
    if wav.ndim == 2 and wav.shape[0] == n_mel:
        feats = wav  # precomputed log-mel [mel, frames]
    else:
        ex = _feature_extractor(model_config.model)
        if sr and sr != ex.sampling_rate:
            # linear resample to the extractor's rate (no audio-codec
            # deps in this environment)
            n_out = int(round(len(wav) * ex.sampling_rate / sr))
            wav = np.interp(
                np.linspace(0.0, len(wav) - 1.0, n_out),
                np.arange(len(wav), dtype=np.float64),
                wav).astype(np.float32)
        feats = ex(wav, return_tensors="np",
                   sampling_rate=ex.sampling_rate)[
            "input_features"][0].astype(np.float32)

    if not token_ids:
        token_ids = default_decoder_prompt(model_config)
    salt = hashlib.sha256(feats.tobytes()).hexdigest()[:16]
    mm_inputs = [{"input_features": feats, "offset": -1,
                  "num_tokens": 0}]
    return list(token_ids), mm_inputs, salt


AUDIO_EMBED_ARCHS = ("MiDashengLMModel",
                     "Phi4MultimodalForCausalLM",
                     "Phi4MMForCausalLM",
                     "GraniteSpeechForConditionalGeneration",
                     "Qwen2AudioForConditionalGeneration",
                     "VoxtralForConditionalGeneration",
                     "UltravoxModel",
                     "Qwen2_5OmniThinkerForConditionalGeneration",
                     "Qwen2_5OmniModel",
                     "Qwen2_5OmniForConditionalGeneration")


def build_granite_speech_inputs(token_ids, audio, model_config):
    """GraniteSpeech: [T, input_dim] stacked-mel features (or raw wav
    through the checkpoint's feature extractor) → window-aligned
    padding; tokens = padded_T // downsample_rate (HF pads the same
    blocks, so padded-block projector outputs match)."""
    hf = model_config.hf_config
    ec = hf.encoder_config
    g = (ec.get if isinstance(ec, dict)
         else lambda k, d=None: getattr(ec, k, d))
    in_dim = int(g("input_dim"))
    window = int(getattr(hf, "window_size", 15))
    ds = int(getattr(hf, "downsample_rate", 5))
    feats = np.asarray(audio, dtype=np.float32)
    if feats.ndim == 1:  # raw waveform → extractor
        ex = _feature_extractor(model_config.model)
        feats = np.asarray(
            ex(feats, return_tensors="np")["input_features"][0],
            np.float32)
    assert feats.ndim == 2 and feats.shape[1] == in_dim, feats.shape
    t = feats.shape[0]
    pad = (-t) % window
    if pad:
        feats = np.pad(feats, ((0, pad), (0, 0)))
    n_tok = feats.shape[0] // ds
    audio_token = int(getattr(hf, "audio_token_index"))
    expanded: list[int] = []
    placed = False
    for tok in token_ids:
        if tok == audio_token and not placed:
            expanded.extend([audio_token] * n_tok)
            placed = True
        else:
            expanded.append(tok)
    if not placed:
        expanded = [audio_token] * n_tok + expanded
        offset = 0
    else:
        offset = expanded.index(audio_token)
    salt = hashlib.sha256(feats.tobytes()).hexdigest()[:16]
    return expanded, [{"pixel_values": feats, "offset": offset,
                       "num_tokens": n_tok}], salt


def build_midasheng_audio_inputs(token_ids, audio, model_config):
    """MiDasheng-LM: [n_mels, T] log-mel features; tokens =
    grid_f * t_patches // subsample_factor
    (models/midashenglm.py)."""
    hf = model_config.hf_config
    ac = hf.audio_encoder_config
    g = (ac.get if isinstance(ac, dict)
         else lambda k, d=None: getattr(ac, k, d))
    n_mels = int(g("n_mels", 64))
    ps = g("patch_size", 16)
    st = g("patch_stride", 16)
    pf, pt = (ps, ps) if isinstance(ps, int) else tuple(ps)
    sf, stt = (st, st) if isinstance(st, int) else tuple(st)
    feats = np.asarray(audio, dtype=np.float32)
    if feats.ndim == 2 and feats.shape[1] == n_mels and \
            feats.shape[0] != n_mels:
        feats = feats.T  # [T, mel] -> [mel, T]
    assert feats.ndim == 2 and feats.shape[0] == n_mels, feats.shape
    tp = (feats.shape[1] - pt) // stt + 1
    k = int(getattr(hf, "subsample_factor", 5))
    n_tok = (n_mels // sf) * tp // k
    audio_token = int(getattr(hf, "audio_token_id"))
    expanded: list[int] = []
    placed = False
    for tok in token_ids:
        if tok == audio_token and not placed:
            expanded.extend([audio_token] * n_tok)
            placed = True
        else:
            expanded.append(tok)
    if not placed:
        expanded = [audio_token] * n_tok + expanded
        offset = 0
    else:
        offset = expanded.index(audio_token)
    salt = hashlib.sha256(feats.tobytes()).hexdigest()[:16]
    return expanded, [{"pixel_values": feats, "offset": offset,
                       "num_tokens": n_tok}], salt


def build_phi4mm_audio_inputs(token_ids, audio, model_config):
    """Phi-4-multimodal: [T, input_size] log-mel features; tokens =
    T through the nemo stride-2 stack (ceil division per conv —
    models/phi4_multimodal.py encode_audio_feats)."""
    import math

    hf = model_config.hf_config
    ac = hf.audio_config
    g = (ac.get if isinstance(ac, dict)
         else lambda k, d=None: getattr(ac, k, d))
    in_dim = int(g("input_size"))
    feats = np.asarray(audio, dtype=np.float32)
    if feats.ndim == 1:  # raw waveform -> extractor
        ex = _feature_extractor(model_config.model)
        feats = np.asarray(
            ex(feats, return_tensors="np")["input_features"][0],
            np.float32)
    if feats.ndim == 2 and feats.shape[0] == in_dim and \
            feats.shape[1] != in_dim:
        feats = feats.T  # [mel, T] -> [T, mel]
    assert feats.ndim == 2 and feats.shape[1] == in_dim, feats.shape
    n_tok = feats.shape[0]
    for _ in range(int(math.log2(int(g("time_reduction", 8))))):
        n_tok = (n_tok - 1) // 2 + 1
    audio_token = int(g("audio_token_id"))
    expanded: list[int] = []
    placed = False
    for tok in token_ids:
        if tok == audio_token and not placed:
            expanded.extend([audio_token] * n_tok)
            placed = True
        else:
            expanded.append(tok)
    if not placed:
        expanded = [audio_token] * n_tok + expanded
        offset = 0
    else:
        offset = expanded.index(audio_token)
    salt = hashlib.sha256(feats.tobytes()).hexdigest()[:16]
    return expanded, [{"pixel_values": feats, "offset": offset,
                       "num_tokens": n_tok}], salt


def build_audio_embeds_inputs(
    token_ids,
    audio,
    model_config,
) -> tuple[list[int], list[dict], str]:
    """Decoder-only audio models (Qwen2-Audio): mel features become
    embeddings merged at the audio-placeholder positions — the
    image-style mm path, not Whisper's cross-attention. Features pad
    to the encoder's fixed window (max_source_positions * 2 frames),
    so every clip compiles to ONE encode shape; the placeholder
    expands to max_source_positions // 2 tokens (conv stride 2 x
    avg-pool 2)."""
    if model_config.architecture == \
            "GraniteSpeechForConditionalGeneration":
        return build_granite_speech_inputs(token_ids, audio,
                                           model_config)
    if model_config.architecture in ("Phi4MultimodalForCausalLM",
                                     "Phi4MMForCausalLM"):
        return build_phi4mm_audio_inputs(token_ids, audio,
                                         model_config)
    if model_config.architecture == "MiDashengLMModel":
        return build_midasheng_audio_inputs(token_ids, audio,
                                            model_config)
    hf = model_config.hf_config
    ac = hf.audio_config
    n_mel = getattr(ac, "num_mel_bins", 128)
    max_pos = getattr(ac, "max_source_positions", 1500)
    frames = max_pos * 2
    if isinstance(audio, tuple):
        wav, sr = audio
    else:
        wav, sr = audio, None
    wav = np.asarray(wav, dtype=np.float32)
    if wav.ndim == 2 and wav.shape[0] == n_mel:
        feats = wav
    else:
        ex = _feature_extractor(model_config.model)
        if sr and sr != ex.sampling_rate:
            n_out = int(round(len(wav) * ex.sampling_rate / sr))
            wav = np.interp(
                np.linspace(0.0, len(wav) - 1.0, n_out),
                np.arange(len(wav), dtype=np.float64),
                wav).astype(np.float32)
        feats = ex(wav, return_tensors="np",
                   sampling_rate=ex.sampling_rate)[
            "input_features"][0].astype(np.float32)
    if "Omni" in model_config.architecture:
        cw = 2 * int(getattr(ac, "n_window", 100))
        frames = frames // cw * cw
    if feats.shape[1] < frames:
        feats = np.pad(feats, ((0, 0), (0, frames - feats.shape[1])))
    feats = feats[:, :frames]

    audio_token = getattr(hf, "audio_token_index", None)
    if audio_token is None:
        audio_token = getattr(hf, "audio_token_id", -1)
    if model_config.architecture == "VoxtralForConditionalGeneration":
        # no avg-pool; r consecutive frames group into one token
        # (voxtral.py get_audio_features reshape)
        n_tok = max_pos // (ac.intermediate_size // ac.d_model)
    elif model_config.architecture == "UltravoxModel":
        # StackAudioFrames pads T up to a stack_factor multiple
        # (ultravox.py:246-254)
        stack = int(getattr(hf, "stack_factor", 8))
        n_tok = (max_pos + stack - 1) // stack
    elif "Omni" in model_config.architecture:
        # chunked processing: frames snap to whole 2*n_window chunks
        # (models/qwen2_5_omni.py encode_audio_mm)
        cw = 2 * int(getattr(ac, "n_window", 100))
        frames = (max_pos * 2) // cw * cw
        n_tok = frames // 4
    else:
        n_tok = max_pos // 2
    expanded: list[int] = []
    placed = False
    for tok in token_ids:
        if tok == audio_token and not placed:
            expanded.extend([audio_token] * n_tok)
            placed = True
        else:
            expanded.append(tok)
    if not placed:  # no placeholder: audio leads the prompt
        expanded = [audio_token] * n_tok + expanded
        offset = 0
    else:
        offset = expanded.index(audio_token)
    salt = hashlib.sha256(feats.tobytes()).hexdigest()[:16]
    mm_inputs = [{"pixel_values": feats, "offset": offset,
                  "num_tokens": n_tok}]
    return expanded, mm_inputs, salt
