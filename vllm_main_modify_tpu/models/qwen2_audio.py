"""Qwen2-Audio: Whisper-style audio encoder + projector + Qwen2.

Reference parity: vllm/model_executor/models/qwen2_audio.py.
Decoder-only audio: the encoder output (conv x2 → transformer →
avg-pool → LN → linear projector) becomes embeddings merged at the
audio-placeholder positions through the shared mm_buffer/mm_scatter
path — unlike Whisper, there is no cross-attention. Fixed 30s windows
(multimodal/audio.py pads) give one static encode shape.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.registry import resolve_model_cls

AP = "audio_tower."


class Qwen2AudioForConditionalGeneration:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        ac = hf.audio_config
        self.mel = getattr(ac, "num_mel_bins", 128)
        self.d = ac.d_model
        self.a_layers = ac.encoder_layers
        self.a_heads = ac.encoder_attention_heads
        self.a_head_dim = self.d // self.a_heads
        self.a_ffn = ac.encoder_ffn_dim
        self.max_pos = getattr(ac, "max_source_positions", 1500)
        self.num_audio_tokens = self.max_pos // 2

        text_archs = getattr(hf.text_config, "architectures",
                             None) or ["Qwen2ForCausalLM"]
        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = text_archs[0]
        self.language_model = resolve_model_cls(text_archs[0])(
            text_cfg)
        self.text_cfg = text_cfg
        self.tie_embeddings = text_cfg.tie_word_embeddings

    def param_specs(self) -> list[ParamSpec]:
        D, F, L = self.d, self.a_ffn, self.a_layers
        H = self.cfg.hidden_size
        t = transpose2d

        def astk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"audio.layers.{path}", (L, *shape),
                             spec, AP + "layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("audio.conv1", (D, self.mel, 3),
                      P(None, None, None), AP + "conv1.weight",
                      transform=None),
            ParamSpec("audio.conv1_bias", (D, ), P(),
                      AP + "conv1.bias", transform=None),
            ParamSpec("audio.conv2", (D, D, 3), P(None, None, None),
                      AP + "conv2.weight", transform=None),
            ParamSpec("audio.conv2_bias", (D, ), P(),
                      AP + "conv2.bias", transform=None),
            ParamSpec("audio.embed_positions", (self.max_pos, D),
                      P(None, None), AP + "embed_positions.weight",
                      transform=None),
            ParamSpec("audio.final_norm", (D, ), P(),
                      AP + "layer_norm.weight", transform=None),
            ParamSpec("audio.final_norm_bias", (D, ), P(),
                      AP + "layer_norm.bias", transform=None),
            ParamSpec("projector", (D, H), P(None, None),
                      "multi_modal_projector.linear.weight",
                      transform=t),
            ParamSpec("projector_bias", (H, ), P(),
                      "multi_modal_projector.linear.bias",
                      transform=None),
        ]
        for n in ("self_attn_layer_norm", "final_layer_norm"):
            specs += [
                astk(n, (D, ), P(None, None), f"{n}.weight",
                     transform=None),
                astk(f"{n}_bias", (D, ), P(None, None), f"{n}.bias",
                     transform=None),
            ]
        # whisper lineage: k_proj has NO bias
        for n, bias in (("q_proj", True), ("k_proj", False),
                        ("v_proj", True), ("out_proj", True)):
            specs.append(astk(n, (D, D), P(None, None, "model"),
                              f"self_attn.{n}.weight"))
            if bias:
                specs.append(
                    astk(f"{n}_bias", (D, ), P(None, "model"),
                         f"self_attn.{n}.bias", transform=None))
        specs += [
            astk("fc1", (D, F), P(None, None, "model"),
                 "fc1.weight"),
            astk("fc1_bias", (F, ), P(None, "model"), "fc1.bias",
                 transform=None),
            astk("fc2", (F, D), P(None, "model", None),
                 "fc2.weight"),
            astk("fc2_bias", (D, ), P(None, None), "fc2.bias",
                 transform=None),
        ]
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def encode_images(self, params, feats: jax.Array) -> jax.Array:
        """(name kept for the runner's mm ingest path)
        [1, mel, frames] log-mel → [1, max_pos//2, text_H]."""
        a = params["audio"]
        x = self._encoder_frames(params, feats)
        # avg-pool over time (kernel 2, stride 2), THEN layer norm
        x = x.reshape(x.shape[0] // 2, 2, self.d).mean(axis=1)
        x = layer_norm(x, a["final_norm"], a["final_norm_bias"], 1e-5)
        return (x @ params["projector"] +
                params["projector_bias"])[None]

    def _encoder_frames(self, params, feats: jax.Array) -> jax.Array:
        """Whisper-style encoder trunk: conv x2 + positions +
        transformer layers → [max_pos, D] (pre final-norm)."""
        a = params["audio"]
        if feats.ndim == 3:
            feats = feats[0]
        x = feats.astype(jnp.float32)[None]  # [1, mel, frames]
        x = jax.lax.conv_general_dilated(
            x, a["conv1"].astype(jnp.float32), (1, ), [(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH")) + \
            a["conv1_bias"][None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        x = jax.lax.conv_general_dilated(
            x, a["conv2"].astype(jnp.float32), (2, ), [(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH")) + \
            a["conv2_bias"][None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.transpose(x, (0, 2, 1))[0]  # [max_pos, D]
        x = x + a["embed_positions"].astype(jnp.float32)

        layers = a["layers"]
        eps = 1e-5
        t = x.shape[0]

        def layer_fn(l, x):
            w = jax.tree.map(
                lambda v: jax.lax.dynamic_index_in_dim(
                    v, l, 0, keepdims=False), layers)
            res = x
            h = layer_norm(x, w["self_attn_layer_norm"],
                           w["self_attn_layer_norm_bias"], eps)
            q = (h @ w["q_proj"] + w["q_proj_bias"]).reshape(
                t, self.a_heads, self.a_head_dim)
            k = (h @ w["k_proj"]).reshape(t, self.a_heads,
                                          self.a_head_dim)
            v = (h @ w["v_proj"] + w["v_proj_bias"]).reshape(
                t, self.a_heads, self.a_head_dim)
            s = jnp.einsum("qhd,khd->hqk", q, k) * \
                (self.a_head_dim**-0.5)
            p_ = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("hqk,khd->qhd", p_, v).reshape(t, -1)
            x = res + (o @ w["out_proj"] + w["out_proj_bias"])
            res = x
            h = layer_norm(x, w["final_layer_norm"],
                           w["final_layer_norm_bias"], eps)
            h = jax.nn.gelu(h @ w["fc1"] + w["fc1_bias"],
                            approximate=False)
            return res + (h @ w["fc2"] + w["fc2_bias"])

        return jax.lax.fori_loop(0, self.a_layers, layer_fn, x)

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None):
        lm_params = params["language_model"]
        x = jnp.take(lm_params["embed_tokens"], input_ids, axis=0)
        if mm_embeds is not None:
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds.astype(x.dtype), mode="drop")
        return self.language_model(lm_params, input_ids, positions,
                                   kv_caches, attn_meta,
                                   use_pallas=use_pallas,
                                   inputs_embeds=x)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(
            params["language_model"], hidden)


class VoxtralForConditionalGeneration(Qwen2AudioForConditionalGeneration):
    """Voxtral (reference: vllm/model_executor/models/voxtral.py /
    HF modeling_voxtral.py): the same Whisper-style encoder trunk, but
    NO avg-pool — the final layer norm is followed by grouping
    ``r = intermediate_size // d_model`` consecutive frames into one
    vector (get_audio_features reshape) and a bias-free two-linear
    projector. Tokens per 30s window = max_source_positions // r."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        ac = config.hf_config.audio_config
        self.group = ac.intermediate_size // ac.d_model
        self.num_audio_tokens = self.max_pos // self.group

    def param_specs(self) -> list[ParamSpec]:
        H = self.cfg.hidden_size
        specs = [s for s in super().param_specs()
                 if s.path not in ("projector", "projector_bias")]
        specs += [
            ParamSpec("proj_1", (self.group * self.d, H),
                      P(None, None),
                      "multi_modal_projector.linear_1.weight",
                      transform=transpose2d),
            ParamSpec("proj_2", (H, H), P(None, None),
                      "multi_modal_projector.linear_2.weight",
                      transform=transpose2d),
        ]
        return specs

    def encode_images(self, params, feats: jax.Array) -> jax.Array:
        a = params["audio"]
        x = self._encoder_frames(params, feats)
        x = layer_norm(x, a["final_norm"], a["final_norm_bias"], 1e-5)
        x = x.reshape(x.shape[0] // self.group, self.group * self.d)
        x = jax.nn.gelu(x @ params["proj_1"], approximate=False)
        return (x @ params["proj_2"])[None]


class UltravoxModel(Qwen2AudioForConditionalGeneration):
    """Ultravox (reference: vllm/model_executor/models/ultravox.py):
    the same Whisper-style encoder trunk + final LN, then
    StackAudioFrames — ``stack_factor`` consecutive frames concatenate
    into one vector (T padded up to a multiple) — followed by the
    fixie projector: RMSNorm → bias-free linear_1 → swiglu
    (x[:d] * silu(x[d:]), MulAndSilu) → RMSNorm (mid for v0.5+, post
    for v0.4.1-) → bias-free linear_2. Tokens per 30s window =
    ceil(max_source_positions / stack_factor)."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.stack = int(getattr(hf, "stack_factor", 8))
        self.proj_hidden = int(getattr(hf, "hidden_size", 4096))
        self.proj_act = getattr(hf, "projector_act", "swiglu")
        self.proj_ln_mid = bool(getattr(hf, "projector_ln_mid",
                                        False))
        from vllm_main_modify_tpu.utils import cdiv

        self.num_audio_tokens = cdiv(self.max_pos, self.stack)
        self.dim_in = self.d * self.stack
        self.dim_mid = self.proj_hidden // 2 \
            if self.proj_act == "swiglu" else self.proj_hidden

    def param_specs(self) -> list[ParamSpec]:
        H = self.cfg.hidden_size
        MP = "multi_modal_projector."
        specs = [s for s in super().param_specs()
                 if s.path not in ("projector", "projector_bias")]
        specs += [
            ParamSpec("proj_ln_pre", (self.dim_in, ), P(),
                      MP + "ln_pre.weight", transform=None),
            ParamSpec("proj_fc1", (self.dim_in, self.proj_hidden),
                      P(None, None), MP + "linear_1.weight",
                      transform=transpose2d),
            ParamSpec("proj_fc2", (self.dim_mid, H), P(None, None),
                      MP + "linear_2.weight", transform=transpose2d),
            ParamSpec("proj_ln_out",
                      (self.dim_mid if self.proj_ln_mid else H, ),
                      P(),
                      MP + ("ln_mid.weight" if self.proj_ln_mid
                            else "ln_post.weight"), transform=None),
        ]
        return specs

    def encode_images(self, params, feats: jax.Array) -> jax.Array:
        from vllm_main_modify_tpu.layers.normalization import rms_norm

        a = params["audio"]
        x = self._encoder_frames(params, feats)
        x = layer_norm(x, a["final_norm"], a["final_norm_bias"], 1e-5)
        pad = self.num_audio_tokens * self.stack - x.shape[0]
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
        x = x.reshape(self.num_audio_tokens, self.dim_in)
        x = rms_norm(x, params["proj_ln_pre"], 1e-6)
        x = x @ params["proj_fc1"]
        if self.proj_act == "swiglu":
            d = x.shape[-1] // 2
            x = x[:, :d] * jax.nn.silu(x[:, d:])
        else:
            x = jax.nn.gelu(x, approximate=False)
        if self.proj_ln_mid:
            x = rms_norm(x, params["proj_ln_out"], 1e-6)
        x = x @ params["proj_fc2"]
        if not self.proj_ln_mid:
            x = rms_norm(x, params["proj_ln_out"], 1e-6)
        return x[None]
