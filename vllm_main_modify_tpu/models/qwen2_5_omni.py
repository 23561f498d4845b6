"""Qwen2.5-Omni (thinker).

Reference: vllm/model_executor/models/qwen2_5_omni_thinker.py — the
"thinker" half of the Omni checkpoint: the Qwen2.5-VL windowed vision
tower + a chunked Whisper-style audio tower (2*n_window-frame chunks,
per-chunk sinusoidal positions and block-diagonal attention, 2x avg
pool, ln_post + proj) over the Qwen2.5 mrope decoder. Talker /
token2wav (speech synthesis) are inference-output components the
reference also drops.

TPU design: subclasses the Qwen2.5-VL implementation; the audio path
rides the same fixed-shape mm-encoder machinery — mel features pad to
the full ``max_source_positions*2`` frame window so every clip
compiles to one encode shape, and ``encode_images`` dispatches on
input rank (3-D mel vs 4-D pixels). Full-Omni checkpoints
("thinker."-prefixed keys) and thinker-only exports both load.
Known delta: video-with-audio TMRoPE interleaving is not implemented
(audio and image requests position like the reference's
non-interleaved case).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.qwen2_vl import \
    Qwen2_5_VLForConditionalGeneration

AP = "audio_tower."


class Qwen2_5OmniThinkerForConditionalGeneration(
        Qwen2_5_VLForConditionalGeneration):

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        if hasattr(hf, "thinker_config"):
            # full Omni checkpoint: operate on the thinker subtree
            config.hf_config = hf = hf.thinker_config
        super().__init__(config)
        ac = hf.audio_config
        self.a_hidden = ac.d_model
        self.a_layers = ac.encoder_layers
        self.a_heads = ac.encoder_attention_heads
        self.a_head_dim = self.a_hidden // self.a_heads
        self.a_ffn = ac.encoder_ffn_dim
        self.a_mel = ac.num_mel_bins
        self.a_out = getattr(ac, "output_dim", config.hidden_size)
        self.n_window = int(getattr(ac, "n_window", 100))
        self.max_src = int(ac.max_source_positions)
        # canonical frames: full window, a whole number of chunks
        cw = 2 * self.n_window
        self.a_frames = ((self.max_src * 2) // cw) * cw
        self.num_audio_tokens = self.a_frames // 2 // 2
        # sinusoidal positions restart per chunk (reference:
        # SinusoidsPositionEmbedding + per-chunk slicing)
        ch = self.a_hidden
        inc = np.log(10000) / (ch // 2 - 1)
        inv = np.exp(-inc * np.arange(ch // 2))
        t = np.arange(self.n_window)[:, None] * inv[None, :]
        self.a_pos = jnp.asarray(
            np.concatenate([np.sin(t), np.cos(t)], axis=1),
            jnp.float32)
        # full-Omni checkpoints prefix every thinker tensor
        self.key_prefix = ""
        try:
            from vllm_main_modify_tpu.models.loader import \
                _hf_tensor_index
            keys = set(_hf_tensor_index(config.model))
            if any(k.startswith("thinker.") for k in keys):
                self.key_prefix = "thinker."
        except Exception:  # noqa: BLE001
            pass

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        specs = super().param_specs()
        # the Omni vision tower stores SEPARATE q/k/v (Qwen2.5-VL
        # fuses them); stitch them into the parent's fused qkv param
        # with per-slice loads
        Dv = self.v_hidden
        out = []
        for s in specs:
            if s.path == "vision.layers.qkv":
                for j, nm in enumerate(("q", "k", "v")):
                    out.append(ParamSpec(
                        f"vision.layers.qkv_{nm}", (s.shape[0], Dv,
                                                    Dv),
                        P(None, None, None),
                        s.hf_key.replace("attn.qkv.weight",
                                         f"attn.{nm}.weight"),
                        stacked=True, transform=transpose2d))
                continue
            if s.path == "vision.layers.qkv_bias":
                for nm in ("q", "k", "v"):
                    out.append(ParamSpec(
                        f"vision.layers.qkv_{nm}_bias",
                        (s.shape[0], Dv), P(None, None),
                        s.hf_key.replace("attn.qkv.bias",
                                         f"attn.{nm}.bias"),
                        stacked=True, transform=None))
                continue
            out.append(s)
        specs = out
        D, F, L = self.a_hidden, self.a_ffn, self.a_layers
        t = transpose2d

        def astk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"audio.layers.{path}", (L, *shape),
                             spec, AP + "layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        aspecs = [
            ParamSpec("audio.conv1", (D, self.a_mel, 3),
                      P(None, None, None), AP + "conv1.weight",
                      transform=None),
            ParamSpec("audio.conv1_bias", (D, ), P(),
                      AP + "conv1.bias", transform=None),
            ParamSpec("audio.conv2", (D, D, 3), P(None, None, None),
                      AP + "conv2.weight", transform=None),
            ParamSpec("audio.conv2_bias", (D, ), P(),
                      AP + "conv2.bias", transform=None),
            ParamSpec("audio.ln_post", (D, ), P(),
                      AP + "ln_post.weight", transform=None),
            ParamSpec("audio.ln_post_bias", (D, ), P(),
                      AP + "ln_post.bias", transform=None),
            ParamSpec("audio.proj", (D, self.a_out), P(None, None),
                      AP + "proj.weight", transform=t),
            ParamSpec("audio.proj_bias", (self.a_out, ), P(),
                      AP + "proj.bias", transform=None),
        ]
        for n in ("self_attn_layer_norm", "final_layer_norm"):
            aspecs += [
                astk(n, (D, ), P(None, None), f"{n}.weight",
                     transform=None),
                astk(f"{n}_bias", (D, ), P(None, None), f"{n}.bias",
                     transform=None),
            ]
        for n, bias in (("q_proj", True), ("k_proj", False),
                        ("v_proj", True), ("out_proj", True)):
            aspecs.append(astk(n, (D, D), P(None, None, None),
                               f"self_attn.{n}.weight"))
            if bias:
                aspecs.append(astk(f"{n}_bias", (D, ), P(None, None),
                                   f"self_attn.{n}.bias",
                                   transform=None))
        aspecs += [
            astk("fc1", (D, F), P(None, None, None), "fc1.weight"),
            astk("fc1_bias", (F, ), P(None, None), "fc1.bias",
                 transform=None),
            astk("fc2", (F, D), P(None, None, None), "fc2.weight"),
            astk("fc2_bias", (D, ), P(None, None), "fc2.bias",
                 transform=None),
        ]
        specs += aspecs
        if self.key_prefix:
            for s in specs:
                s.hf_key = self.key_prefix + s.hf_key
        return specs

    # ------------------------------------------------------------------

    def encode_audio_mm(self, params, feats: jax.Array) -> jax.Array:
        """[N, mel, frames] → [N * num_audio_tokens, out] soft
        tokens."""
        a = params["audio"]
        n = feats.shape[0]
        cw = 2 * self.n_window
        chunks = self.a_frames // cw
        x = feats.astype(jnp.float32).reshape(
            n, self.a_mel, chunks, cw)
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(
            n * chunks, self.a_mel, cw)

        def conv1d(x, w, b, stride=1):
            y = jax.lax.conv_general_dilated(
                x, w.astype(jnp.float32), (stride, ),
                [(1, 1)], dimension_numbers=("NCH", "OIH", "NCH"))
            return y + b.astype(jnp.float32)[None, :, None]

        x = jax.nn.gelu(conv1d(x, a["conv1"], a["conv1_bias"]),
                        approximate=False)
        x = jax.nn.gelu(conv1d(x, a["conv2"], a["conv2_bias"],
                               stride=2), approximate=False)
        x = jnp.transpose(x, (0, 2, 1))  # [NC, n_window, D]
        x = x + self.a_pos[None]
        layers = a["layers"]

        def layer_fn(l, x):
            w = jax.tree.map(
                lambda v: jax.lax.dynamic_index_in_dim(
                    v, l, 0, keepdims=False), layers)
            nb, tt, _ = x.shape
            h = layer_norm(x, w["self_attn_layer_norm"],
                           w["self_attn_layer_norm_bias"], 1e-5)
            q = (h @ w["q_proj"] + w["q_proj_bias"]).reshape(
                nb, tt, self.a_heads, self.a_head_dim)
            k = (h @ w["k_proj"]).reshape(nb, tt, self.a_heads,
                                          self.a_head_dim)
            v = (h @ w["v_proj"] + w["v_proj_bias"]).reshape(
                nb, tt, self.a_heads, self.a_head_dim)
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.a_head_dim**-0.5)
            p_ = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", p_, v).reshape(
                nb, tt, -1)
            x = x + (o @ w["out_proj"] + w["out_proj_bias"])
            h = layer_norm(x, w["final_layer_norm"],
                           w["final_layer_norm_bias"], 1e-5)
            h = jax.nn.gelu(h @ w["fc1"] + w["fc1_bias"],
                            approximate=False)
            return x + (h @ w["fc2"] + w["fc2_bias"])

        x = jax.lax.fori_loop(0, self.a_layers, layer_fn, x)
        x = x.reshape(n, chunks * self.n_window, self.a_hidden)
        # 2x avg pool along time
        x = x.reshape(n, -1, 2, self.a_hidden).mean(axis=2)
        x = layer_norm(x, a["ln_post"], a["ln_post_bias"], 1e-5)
        x = x @ a["proj"] + a["proj_bias"]
        return x.reshape(n * x.shape[1], self.a_out)

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        if pixel_values.ndim == 3:  # [N, mel, frames] audio
            return self.encode_audio_mm(params, pixel_values)
        return super().encode_images(params, pixel_values)
