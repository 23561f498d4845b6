"""Mistral 3 (Small 3.1): Pixtral vision tower + patch merger +
Mistral decoder.

Reference parity: vllm/model_executor/models/mistral3.py +
pixtral.py. TPU-native: one canonical square resolution (the
processor resizes — the reference's variable aspect grids would
retrace per shape), so the Pixtral 2-D rope table and the ViT compile
once. The tower is Llama-flavored (RMS norms, gated SiLU MLP,
bias-free projections) with per-patch (row, col) rotary; the merger
unfolds 2x2 patch blocks (torch-unfold channel-major order
reproduced) into one linear, then an RMS norm + 2-layer GELU
projector feeds the decoder via the shared mm_buffer/mm_scatter
merge.
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
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.registry import resolve_model_cls

# hub-serialized layout (llava-style legacy names)
VP = "vision_tower."
MP = "multi_modal_projector."


class Mistral3ForConditionalGeneration:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        self.v_hidden = vc.hidden_size
        self.v_inter = vc.intermediate_size
        self.v_layers = vc.num_hidden_layers
        self.v_heads = vc.num_attention_heads
        self.v_head_dim = getattr(vc, "head_dim",
                                  self.v_hidden // self.v_heads)
        self.patch = vc.patch_size
        self.rope_theta = getattr(vc, "rope_theta", 10000.0)
        self.sm = getattr(hf, "spatial_merge_size", 2)
        self.image_size = int(config.mm_image_size
                              or vc.image_size)
        self.grid = self.image_size // self.patch
        assert self.grid % self.sm == 0
        self.num_image_tokens = (self.grid // self.sm)**2
        self.proj_bias = bool(getattr(hf, "multimodal_projector_bias",
                                      False))
        self.v_eps = 1e-5

        text_archs = getattr(hf.text_config, "architectures",
                             None) or ["MistralForCausalLM"]
        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = text_archs[0]
        self.language_model = resolve_model_cls(text_archs[0])(
            text_cfg)
        self.tie_embeddings = text_cfg.tie_word_embeddings

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        D, I, L = self.v_hidden, self.v_inter, self.v_layers
        H = self.cfg.hidden_size
        m2 = self.sm**2
        t = transpose2d

        def vstk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"vision.layers.{path}", (L, *shape),
                             spec,
                             VP + "transformer.layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("vision.patch_conv",
                      (D, 3, self.patch, self.patch),
                      P(None, None, None, None),
                      VP + "patch_conv.weight", transform=None),
            ParamSpec("vision.ln_pre", (D, ), P(),
                      VP + "ln_pre.weight", transform=None),
            vstk("attention_norm", (D, ), P(None, None),
                 "attention_norm.weight", transform=None),
            vstk("ffn_norm", (D, ), P(None, None),
                 "ffn_norm.weight", transform=None),
            vstk("q_proj", (D, D), P(None, None, "model"),
                 "attention.q_proj.weight"),
            vstk("k_proj", (D, D), P(None, None, "model"),
                 "attention.k_proj.weight"),
            vstk("v_proj", (D, D), P(None, None, "model"),
                 "attention.v_proj.weight"),
            vstk("o_proj", (D, D), P(None, "model", None),
                 "attention.o_proj.weight"),
            vstk("gate_proj", (D, I), P(None, None, "model"),
                 "feed_forward.gate_proj.weight"),
            vstk("up_proj", (D, I), P(None, None, "model"),
                 "feed_forward.up_proj.weight"),
            vstk("down_proj", (I, D), P(None, "model", None),
                 "feed_forward.down_proj.weight"),
            ParamSpec("merger.norm", (D, ), P(), MP + "norm.weight",
                      transform=None),
            ParamSpec("merger.merging", (D * m2, D), P(None, None),
                      MP + "patch_merger.merging_layer.weight",
                      transform=t),
            ParamSpec("merger.linear_1", (D, H), P(None, None),
                      MP + "linear_1.weight", transform=t),
            ParamSpec("merger.linear_2", (H, H), P(None, None),
                      MP + "linear_2.weight", transform=t),
        ]
        if self.proj_bias:
            specs += [
                ParamSpec("merger.linear_1_bias", (H, ), P(),
                          MP + "linear_1.bias", transform=None),
                ParamSpec("merger.linear_2_bias", (H, ), P(),
                          MP + "linear_2.bias", transform=None),
            ]
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def _rope_angles(self) -> np.ndarray:
        """Pixtral 2-D rope: position (r, c) takes angles
        r*freqs[0::2] interleaved with c*freqs[1::2] (HF
        PixtralRotaryEmbedding table, row-major patch order)."""
        d = self.v_head_dim
        freqs = 1.0 / (self.rope_theta**(
            np.arange(0, d, 2, dtype=np.float64) / d))
        g = self.grid
        h = np.arange(g)[:, None] * freqs[0::2][None]  # [g, d/4]
        w = np.arange(g)[:, None] * freqs[1::2][None]
        ang = np.concatenate([
            np.broadcast_to(h[:, None, :], (g, g, d // 4)),
            np.broadcast_to(w[None, :, :], (g, g, d // 4)),
        ], axis=-1).reshape(g * g, d // 2)
        return ang

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] f32 → [N, num_image_tokens, text_H]."""
        x = self._tower(params, pixel_values)
        g = self.grid
        n = x.shape[0]

        mg = params["merger"]
        x = rms_norm(x, mg["norm"], self.v_eps)
        # 2x2 unfold, channel-major block order (torch F.unfold)
        sm, d = self.sm, self.v_hidden
        x = x.reshape(n, g // sm, sm, g // sm, sm, d)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4)).reshape(
            n, (g // sm)**2, d * sm * sm)
        x = x @ mg["merging"]
        x = x @ mg["linear_1"]
        if "linear_1_bias" in mg:
            x = x + mg["linear_1_bias"]
        x = jax.nn.gelu(x, approximate=False)
        x = x @ mg["linear_2"]
        if "linear_2_bias" in mg:
            x = x + mg["linear_2_bias"]
        return x

    def _tower(self, params, pixel_values: jax.Array) -> jax.Array:
        """Pixtral ViT: [N, 3, S, S] → [N, P, D] (pre-merger)."""
        v = params["vision"]
        n = pixel_values.shape[0]
        x = jax.lax.conv_general_dilated(
            pixel_values.astype(jnp.float32),
            v["patch_conv"].astype(jnp.float32),
            window_strides=(self.patch, self.patch), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        g = self.grid
        x = x.reshape(n, self.v_hidden, g * g)
        x = jnp.transpose(x, (0, 2, 1))  # [N, P, D] row-major
        x = rms_norm(x, v["ln_pre"], self.v_eps)

        ang = self._rope_angles()
        cos = jnp.asarray(np.cos(ang), jnp.float32)[None, :, None, :]
        sin = jnp.asarray(np.sin(ang), jnp.float32)[None, :, None, :]
        layers = v["layers"]

        def layer_fn(l, x):
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = rms_norm(x, w["attention_norm"], self.v_eps)
            t = h.shape[1]
            q = (h @ w["q_proj"]).reshape(n, t, self.v_heads,
                                          self.v_head_dim)
            k = (h @ w["k_proj"]).reshape(n, t, self.v_heads,
                                          self.v_head_dim)
            val = (h @ w["v_proj"]).reshape(n, t, self.v_heads,
                                            self.v_head_dim)

            def rot(z):
                d2 = z.shape[-1] // 2
                z1, z2 = z[..., :d2], z[..., d2:]
                return jnp.concatenate(
                    [z1 * cos - z2 * sin, z2 * cos + z1 * sin],
                    axis=-1)

            q, k = rot(q), rot(k)
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_head_dim**-0.5)
            p_ = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", p_, val).reshape(
                n, t, -1)
            x = res + o @ w["o_proj"]
            res = x
            h = rms_norm(x, w["ffn_norm"], self.v_eps)
            h = jax.nn.silu(h @ w["gate_proj"]) * (h @ w["up_proj"])
            return res + h @ w["down_proj"]

        return jax.lax.fori_loop(0, self.v_layers, layer_fn, x)

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
