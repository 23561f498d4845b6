"""MiDasheng-LM (MiDashengLMModel): Dasheng audio ViT + subsample
projector over a Qwen2.5 decoder.

Reference parity: vllm/model_executor/models/midashenglm.py (upstream
is remote-code-only). The tower consumes a log-mel spectrogram
[n_mels, T]: eval-mode BatchNorm2d over the mel bins, patch conv,
additive time/freq position tables, pre-LN layer-scale blocks
(biased packed qkv), final LayerNorm — processed in
``target_length/4``-patch time chunks flattened (freq, time)-major —
then a k-frame subsample projector (discard seq % k, stack k frames,
Linear-gelu-Linear into the decoder width). This build accepts
precomputed mel features (the upstream torchaudio front end bakes a
bf16-rounded filterbank; raw-waveform users run their own
extractor), one chunk per compile shape.

Checkpoint layout: ``audio_encoder.*`` (init_bn, patch_embed.proj,
time/freq_pos_embed, blocks.{i}, norm), ``audio_projector.net.{0,2}``,
decoder under ``decoder.``.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.registry import resolve_model_cls

AE = "audio_encoder."


class MiDashengLMModel:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        ac = hf.audio_encoder_config
        g = (ac.get if isinstance(ac, dict)
             else lambda k, d=None: getattr(ac, k, d))
        self.n_mels = int(g("n_mels", 64))
        self.dim = int(g("embed_dim", 768))
        self.heads = int(g("num_heads", 12))
        self.dh = self.dim // self.heads

        def pair(v, d):
            v = g(v, d)
            return (v, v) if isinstance(v, int) else tuple(v)

        self.patch = pair("patch_size", 16)
        self.stride = pair("patch_stride", 16)
        self.depth = int(g("depth", 12))
        self.mlp_dim = int(self.dim * float(g("mlp_ratio", 4.0)))
        self.qkv_bias = bool(g("qkv_bias", True))
        self.layer_scale = g("init_values", None) is not None
        self.target_length = int(g("target_length", 1008))
        self.grid_f = self.n_mels // self.stride[0]
        self.chunk_t = self.target_length // 4
        self.k = int(getattr(hf, "subsample_factor", 5))

        txt = hf.text_config
        archs = getattr(txt, "architectures", None) or \
            ["Qwen2ForCausalLM"]
        text_cfg = replace(config, hf_config=txt, is_multimodal=False)
        text_cfg.architecture = archs[0]
        self.language_model = resolve_model_cls(archs[0])(text_cfg)

    def param_specs(self) -> list[ParamSpec]:
        D, MD = self.dim, self.mlp_dim
        H = self.cfg.hidden_size
        t = transpose2d
        tmax = self.target_length // self.stride[1]
        specs = [
            ParamSpec("audio.init_bn_w", (self.n_mels, ), P(),
                      AE + "init_bn.weight", transform=None),
            ParamSpec("audio.init_bn_b", (self.n_mels, ), P(),
                      AE + "init_bn.bias", transform=None),
            ParamSpec("audio.init_bn_mean", (self.n_mels, ), P(),
                      AE + "init_bn.running_mean", transform=None),
            ParamSpec("audio.init_bn_var", (self.n_mels, ), P(),
                      AE + "init_bn.running_var", transform=None),
            ParamSpec("audio.patch_embed",
                      (D, 1, self.patch[0], self.patch[1]),
                      P(None, None, None, None),
                      AE + "patch_embed.proj.weight", transform=None),
            ParamSpec("audio.patch_bias", (D, ), P(),
                      AE + "patch_embed.proj.bias", transform=None),
            ParamSpec("audio.time_pos", (1, D, 1, tmax),
                      P(None, None, None, None),
                      AE + "time_pos_embed", transform=None),
            ParamSpec("audio.freq_pos", (1, D, self.grid_f, 1),
                      P(None, None, None, None),
                      AE + "freq_pos_embed", transform=None),
            ParamSpec("audio.norm", (D, ), P(), AE + "norm.weight",
                      transform=None),
            ParamSpec("audio.norm_bias", (D, ), P(),
                      AE + "norm.bias", transform=None),
            ParamSpec("proj.lin0", (D * self.k, H), P(None, None),
                      "audio_projector.net.0.weight", transform=t),
            ParamSpec("proj.lin0_bias", (H, ), P(),
                      "audio_projector.net.0.bias", transform=None),
            ParamSpec("proj.lin2", (H, H), P(None, None),
                      "audio_projector.net.2.weight", transform=t),
            ParamSpec("proj.lin2_bias", (H, ), P(),
                      "audio_projector.net.2.bias", transform=None),
        ]

        def vstk(path, shape, hf_key, transform=t):
            return ParamSpec(
                f"audio.layers.{path}", (self.depth, *shape),
                P(*([None] * (len(shape) + 1))),
                AE + "blocks.{i}." + hf_key, stacked=True,
                transform=transform)

        specs += [
            vstk("norm1", (D, ), "norm1.weight", transform=None),
            vstk("norm1_bias", (D, ), "norm1.bias", transform=None),
            vstk("qkv", (D, 3 * D), "attn.qkv.weight"),
            vstk("proj", (D, D), "attn.proj.weight"),
            vstk("proj_bias", (D, ), "attn.proj.bias",
                 transform=None),
            vstk("norm2", (D, ), "norm2.weight", transform=None),
            vstk("norm2_bias", (D, ), "norm2.bias", transform=None),
            vstk("fc1", (D, MD), "mlp.fc1.weight"),
            vstk("fc1_bias", (MD, ), "mlp.fc1.bias", transform=None),
            vstk("fc2", (MD, D), "mlp.fc2.weight"),
            vstk("fc2_bias", (D, ), "mlp.fc2.bias", transform=None),
        ]
        if self.qkv_bias:
            specs.append(vstk("qkv_bias", (3 * D, ), "attn.qkv.bias",
                              transform=None))
        if self.layer_scale:
            specs += [
                vstk("ls1", (D, ), "ls1.gamma", transform=None),
                vstk("ls2", (D, ), "ls2.gamma", transform=None),
            ]
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "decoder." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self):
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def encode_images(self, params, feats: jax.Array) -> jax.Array:
        """[n_mels, T] log-mel → [tokens, H] (the engine's mm encode
        hook carries audio features through the image slot)."""
        if feats.ndim == 3:
            feats = feats[0]
        aw = params["audio"]
        x = feats.astype(jnp.float32)
        # eval BatchNorm2d over the mel-bin channel axis
        x = (x - aw["init_bn_mean"][:, None]) * jax.lax.rsqrt(
            aw["init_bn_var"][:, None] + 1e-5)
        x = x * aw["init_bn_w"][:, None] + aw["init_bn_b"][:, None]
        # patch conv on [1, 1, n_mels, T]
        x = jax.lax.conv_general_dilated(
            x[None, None], aw["patch_embed"].astype(jnp.float32),
            self.stride, "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + aw["patch_bias"][None, :, None, None]
        t = x.shape[-1]
        x = x + aw["time_pos"][:, :, :, :t]
        x = x + aw["freq_pos"]
        # (freq, time)-major flatten, chunked at target_length/4
        x = x.reshape(self.dim, self.grid_f, t)
        outs = []
        for c0 in range(0, t, self.chunk_t):
            xc = x[:, :, c0:c0 + self.chunk_t]
            tc = xc.shape[-1]
            h = xc.reshape(self.dim, self.grid_f * tc).T
            h = h.astype(self.cfg.jax_dtype)
            for li in range(self.depth):
                w = jax.tree.map(lambda a, li=li: a[li],
                                 aw["layers"])
                hn = layer_norm(h, w["norm1"], w["norm1_bias"], 1e-6)
                qkv = hn @ w["qkv"]
                if self.qkv_bias:
                    qkv = qkv + w["qkv_bias"]
                n = hn.shape[0]
                qkv = qkv.reshape(n, 3, self.heads, self.dh)
                q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
                s = jnp.einsum("qhd,khd->hqk", q, k) * (self.dh**-0.5)
                p = jax.nn.softmax(s.astype(jnp.float32),
                                   axis=-1).astype(h.dtype)
                o = jnp.einsum("hqk,khd->qhd", p, v).reshape(
                    n, self.dim)
                o = o @ w["proj"] + w["proj_bias"]
                if self.layer_scale:
                    o = o * w["ls1"]
                h = h + o
                hn = layer_norm(h, w["norm2"], w["norm2_bias"], 1e-6)
                m = jax.nn.gelu(hn @ w["fc1"] + w["fc1_bias"],
                                approximate=False)
                m = m @ w["fc2"] + w["fc2_bias"]
                if self.layer_scale:
                    m = m * w["ls2"]
                h = h + m
            outs.append(layer_norm(h, aw["norm"], aw["norm_bias"],
                                   1e-6))
        h = jnp.concatenate(outs, axis=0)
        # k-frame subsample projector
        seq = h.shape[0] - h.shape[0] % self.k
        h = h[:seq].reshape(seq // self.k, self.k * self.dim)
        pw = params["proj"]
        h = jax.nn.gelu(h @ pw["lin0"] + pw["lin0_bias"],
                        approximate=False)
        return h @ pw["lin2"] + pw["lin2_bias"]

    def num_audio_tokens(self, t_frames: int) -> int:
        tp = (t_frames - self.patch[1]) // self.stride[1] + 1
        return (self.grid_f * tp) // self.k

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None):
        lm = params["language_model"]
        x = jnp.take(lm["embed_tokens"], input_ids, axis=0)
        if mm_embeds is not None:
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds.astype(x.dtype), mode="drop")
        return self.language_model(lm, input_ids, positions,
                                   kv_caches, attn_meta,
                                   use_pallas=use_pallas,
                                   inputs_embeds=x)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(
            params["language_model"], hidden)
