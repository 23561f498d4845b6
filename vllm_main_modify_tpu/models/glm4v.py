"""GLM-4.1V / GLM-4.5V (reference:
vllm/model_executor/models/glm4_1v.py + HF modeling_glm4v).

A Qwen2-VL-shaped dynamic-grid ViT with GLM twists: RMS norms
everywhere (post-conv, block norms, post-ln), a LEARNED absolute
position embedding added after the conv (bicubic-adapted in HF;
identity at the canonical grid), bias-free fused qkv, a gated-SiLU
block MLP whose hidden width is ``out_hidden_size`` (glm4_1v.py:703),
a spatial-merge Conv2d ``downsample`` into ``out_hidden_size``, and a
``merger`` head (proj → LayerNorm → GELU → gated SiLU MLP). The text
decoder is the GLM-4 sandwich-norm graph with GLM's interleaved
partial mrope (HF apply_multimodal_rotary_pos_emb).

TPU-native policy as for Qwen2-VL: one canonical square resolution →
one static encode program; 3-D mrope positions computed host-side at
ingest (multimodal/processing.py)."""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.normalization import (layer_norm,
                                                       rms_norm)
from vllm_main_modify_tpu.layers.rotary import (apply_mrope_glm,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.glm4 import Glm4ForCausalLM
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.qwen2_vl import \
    Qwen2VLForConditionalGeneration


def _default_mrope_section(rot_dim: int) -> tuple:
    """(t, h, w) frequency split summing to rot_dim/2 when the
    checkpoint omits rope_scaling.mrope_section."""
    d2 = rot_dim // 2
    hw = d2 // 3
    return (d2 - 2 * hw, hw, hw)


class Glm4vTextModel(Glm4ForCausalLM):
    """GLM-4 graph + GLM interleaved mrope ([3, T] positions)."""

    uses_mrope = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        pf = getattr(hf, "partial_rotary_factor", None) or 1.0
        self.rot_dim = int(self.head_dim * pf)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.rot_dim, config.rope_theta,
                             config.rope_scaling))
        rs = config.rope_scaling or {}
        self.mrope_section = tuple(
            rs.get("mrope_section") or _default_mrope_section(
                self.rot_dim))

    def _rope(self, q, k, positions):
        if positions.ndim == 1:  # text-only fallback
            positions = jnp.broadcast_to(positions[None],
                                         (3, positions.shape[0]))
        return apply_mrope_glm(q, k, positions, self.inv_freq,
                               self.mrope_section)


class Glm4vForConditionalGeneration(Qwen2VLForConditionalGeneration):

    uses_mrope = True
    VISION_PREFIX = "model.visual."
    TEXT_HF_PREFIX = ("model.", "model.language_model.")

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        self.merge = getattr(vc, "spatial_merge_size", 2)
        self.patch = vc.patch_size
        self.tp = getattr(vc, "temporal_patch_size", 1)
        self.v_hidden = vc.hidden_size
        self.v_layers = vc.depth
        self.v_heads = vc.num_heads
        self.v_head_dim = self.v_hidden // self.v_heads
        # GLM quirk: the block MLP hidden width is out_hidden_size
        # (glm4_1v.py:703 mlp_hidden_dim=vision_config.out_hidden_size)
        self.out_hidden = vc.out_hidden_size
        self.v_inter = self.out_hidden
        self.ctx_dim = vc.intermediate_size
        self.v_eps = getattr(vc, "rms_norm_eps", 1e-5)
        self.image_size = int(config.mm_image_size or vc.image_size)
        self.grid = self.image_size // self.patch
        table_grid = vc.image_size // self.patch
        if self.grid != table_grid:
            raise NotImplementedError(
                "glm4v position-embedding interpolation to a "
                "non-native canonical grid is not supported; set "
                "mm_image_size to the checkpoint's image_size")
        assert self.grid % self.merge == 0
        self.num_image_tokens = (self.grid // self.merge)**2

        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = "Glm4vTextModel"
        self.language_model = self._make_text_model(text_cfg)
        self.tie_embeddings = text_cfg.tie_word_embeddings

    def _make_text_model(self, text_cfg: ModelConfig):
        return Glm4vTextModel(text_cfg)

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        D, L = self.v_hidden, self.v_layers
        O, C = self.out_hidden, self.ctx_dim
        m = self.merge
        t = transpose2d
        VP = self.VISION_PREFIX

        def vstk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"vision.layers.{path}", (L, *shape),
                             spec, VP + "blocks.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("vision.patch_embed",
                      (3 * self.tp * self.patch**2, D), P(None, None),
                      VP + "patch_embed.proj.weight",
                      transform=lambda x: np.ascontiguousarray(
                          x.reshape(x.shape[0], -1).T)),
            ParamSpec("vision.patch_embed_bias", (D, ), P(),
                      VP + "patch_embed.proj.bias", transform=None),
            ParamSpec("vision.pos_embedding",
                      (self.grid * self.grid, D), P(None, None),
                      VP + "embeddings.position_embedding.weight",
                      transform=None),
            ParamSpec("vision.post_conv_ln", (D, ), P(),
                      VP + "post_conv_layernorm.weight",
                      transform=None),
            ParamSpec("vision.post_ln", (D, ), P(),
                      VP + "post_layernorm.weight", transform=None),
            # spatial-merge conv → matmul over the cell's (i, j, d)
            # flat order (the merge-group raster keeps each cell's m²
            # patches contiguous row-major)
            ParamSpec("vision.downsample", (m * m * D, O),
                      P(None, None), VP + "downsample.weight",
                      transform=lambda x: np.ascontiguousarray(
                          x.transpose(2, 3, 1, 0).reshape(-1,
                                                          x.shape[0])),
                      ),
            ParamSpec("vision.downsample_bias", (O, ), P(),
                      VP + "downsample.bias", transform=None),
            vstk("norm1", (D, ), P(None, None), "norm1.weight",
                 transform=None),
            vstk("norm2", (D, ), P(None, None), "norm2.weight",
                 transform=None),
            vstk("qkv", (D, 3 * D), P(None, None, "model"),
                 "attn.qkv.weight"),
            vstk("proj", (D, D), P(None, "model", None),
                 "attn.proj.weight"),
            vstk("gate_proj", (D, self.v_inter),
                 P(None, None, "model"), "mlp.gate_proj.weight"),
            vstk("up_proj", (D, self.v_inter), P(None, None, "model"),
                 "mlp.up_proj.weight"),
            vstk("down_proj", (self.v_inter, D),
                 P(None, "model", None), "mlp.down_proj.weight"),
            ParamSpec("merger.proj", (O, O), P(None, None),
                      VP + "merger.proj.weight", transform=t),
            ParamSpec("merger.post_norm", (O, ), P(),
                      VP + "merger.post_projection_norm.weight",
                      transform=None),
            ParamSpec("merger.post_norm_bias", (O, ), P(),
                      VP + "merger.post_projection_norm.bias",
                      transform=None),
            ParamSpec("merger.gate_proj", (O, C), P(None, None),
                      VP + "merger.gate_proj.weight", transform=t),
            ParamSpec("merger.up_proj", (O, C), P(None, None),
                      VP + "merger.up_proj.weight", transform=t),
            ParamSpec("merger.down_proj", (C, O), P(None, None),
                      VP + "merger.down_proj.weight", transform=t),
        ]
        old, new = self.TEXT_HF_PREFIX
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            if s.hf_key.startswith(old):
                s.hf_key = new + s.hf_key[len(old):]
            specs.append(s)
        return specs

    # ------------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] f32 → [N, (grid/merge)², out_hidden]."""
        v = params["vision"]
        n = pixel_values.shape[0]
        flat = self._patchify(pixel_values.astype(jnp.float32))
        x = flat @ v["patch_embed"].astype(jnp.float32) + \
            v["patch_embed_bias"]
        x = x.reshape(n, self.grid * self.grid, self.v_hidden)
        x = rms_norm(x, v["post_conv_ln"], self.v_eps)

        hpos, wpos = self._vit_pos_ids()
        pos_idx = jnp.asarray(hpos * self.grid + wpos, jnp.int32)
        x = x + jnp.take(v["pos_embedding"], pos_idx,
                         axis=0).astype(x.dtype)[None]

        half = self.v_head_dim // 4
        inv_freq = 1.0 / (10000.0**(
            np.arange(0, self.v_head_dim // 2, 2, dtype=np.float64) /
            (self.v_head_dim // 2)))
        angles = np.concatenate([
            hpos[:, None] * inv_freq[None, :half],
            wpos[:, None] * inv_freq[None, :half],
        ], axis=-1)
        cos = jnp.asarray(np.cos(angles), jnp.float32)[None, :, None, :]
        sin = jnp.asarray(np.sin(angles), jnp.float32)[None, :, None, :]

        layers = v["layers"]

        def layer_fn(l, x):
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            h = rms_norm(x, w["norm1"], self.v_eps)
            t_ = h.shape[1]
            qkv = h @ w["qkv"]
            q, k, val = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(n, t_, self.v_heads, self.v_head_dim)
            k = k.reshape(n, t_, self.v_heads, self.v_head_dim)
            val = val.reshape(n, t_, self.v_heads, self.v_head_dim)

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
                n, t_, -1)
            x = x + o @ w["proj"]
            h = rms_norm(x, w["norm2"], self.v_eps)
            h = jax.nn.silu(h @ w["gate_proj"]) * (h @ w["up_proj"])
            return x + h @ w["down_proj"]

        x = jax.lax.fori_loop(0, self.v_layers, layer_fn, x)
        x = rms_norm(x, v["post_ln"], self.v_eps)

        m2 = self.merge**2
        cells = (self.grid**2) // m2
        x = x.reshape(n, cells, m2 * self.v_hidden)
        x = x @ v["downsample"] + v["downsample_bias"]  # [n, c, O]

        mg = params["merger"]
        y = x @ mg["proj"]
        y = layer_norm(y, mg["post_norm"], mg["post_norm_bias"], 1e-5)
        y = jax.nn.gelu(y, approximate=False)
        h = jax.nn.silu(y @ mg["gate_proj"]) * (y @ mg["up_proj"])
        return h @ mg["down_proj"]


class Glm4vMoeForConditionalGeneration(Glm4vForConditionalGeneration):
    """GLM-4.5V (reference: glm4_1v.py + glm4_moe text): the same
    tower over the Glm4MoE decoder with GLM interleaved mrope."""

    def _make_text_model(self, text_cfg: ModelConfig):
        from vllm_main_modify_tpu.models.moe_v3 import \
            Glm4MoeForCausalLM

        class _Glm4MoeMrope(Glm4MoeForCausalLM):
            uses_mrope = True

            def __init__(self, config: ModelConfig):
                super().__init__(config)
                hf = config.hf_config
                pf = getattr(hf, "partial_rotary_factor",
                             None) or 1.0
                self.rot_dim = int(self.head_dim * pf)
                self.inv_freq = jnp.asarray(
                    compute_inv_freq(self.rot_dim, config.rope_theta,
                                     config.rope_scaling))
                rs = config.rope_scaling or {}
                self.mrope_section = tuple(
                    rs.get("mrope_section") or
                    _default_mrope_section(self.rot_dim))

            def _rope(self, q, k, positions):
                # moe_v3 passes full head_dim (partial slicing is
                # the rope fn's job there)
                if positions.ndim == 1:
                    positions = jnp.broadcast_to(
                        positions[None], (3, positions.shape[0]))
                rd = self.rot_dim
                q_rot, k_rot = apply_mrope_glm(
                    q[..., :rd], k[..., :rd], positions,
                    self.inv_freq, self.mrope_section)
                q = jnp.concatenate([q_rot, q[..., rd:]], axis=-1)
                k = jnp.concatenate([k_rot, k[..., rd:]], axis=-1)
                return q, k

        text_cfg.architecture = "Glm4MoeForCausalLM"
        return _Glm4MoeMrope(text_cfg)
