"""Keye-VL (Kwai-Keye/Keye-VL-8B) and Keye-VL-1.5: SigLIP ViT with 2D
rope + interpolated pos-emb, 2x2 merge GELU projector ("mlp_AR"), over
a Qwen3 decoder with Qwen2-VL-style mrope.

Reference parity: vllm/model_executor/models/keye.py +
keye_vl1_5.py. Vision (keye.py:168-830): conv patch embed (row-major
raster), bilinear-interpolated learned pos-emb added to patch tokens
(:199-233), pre-LN SigLIP blocks with separate q/k/v projections and
gelu-tanh MLP, 2D rotary in the Qwen half-split convention with
ROW-MAJOR (h, w) position ids (:606-631 — unlike Qwen2-VL there is no
merge-group reorder), post_layernorm. Projector (keye.py:858-933):
LayerNorm over the vision width, 2x2 spatial merge from row-major
order, linear_1 + gelu + linear_2. Keye-VL-1.5
(keye_vl1_5.py:175-250) moves the LayerNorm AFTER the merge (over
4x width); everything else is shared. Decoder: Qwen3 with standard
(non-interleaved) mrope when the config carries mrope_section
(keye.py:1509).

Checkpoint: visual.vision_model.*, mlp_AR.*, text under model.* /
lm_head (hf_to_vllm_mapper keye.py:1268-1270).
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
from vllm_main_modify_tpu.layers.rotary import apply_mrope
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.qwen3 import Qwen3ForCausalLM

VIS = "visual.vision_model."


class KeyeTextModel(Qwen3ForCausalLM):
    """Qwen3 graph + standard mrope ([3, T] positions)."""

    uses_mrope = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        rs = config.rope_scaling or {}
        self.mrope_section = tuple(
            rs.get("mrope_section") or (self.head_dim // 6, ) * 3)

    def _apply_rope(self, q, k, positions):
        if positions.ndim == 1:
            positions = jnp.broadcast_to(positions[None],
                                         (3, positions.shape[0]))
        return apply_mrope(q, k, positions, self.inv_freq,
                           self.mrope_section)


class KeyeForConditionalGeneration:

    # 1.5: pre_norm over the MERGED width, applied after the merge
    norm_after_merge = False

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        g = lambda c, k, d=None: (c.get(k, d) if isinstance(c, dict)
                                  else getattr(c, k, d))
        self.width = int(g(vc, "hidden_size", 1152))
        self.v_layers = int(g(vc, "num_hidden_layers", 27))
        self.v_heads = int(g(vc, "num_attention_heads", 16))
        self.v_dh = self.width // self.v_heads
        self.v_mlp = int(g(vc, "intermediate_size", 4304))
        self.patch = int(g(vc, "patch_size", 14))
        self.native_size = int(g(vc, "image_size", 336))
        self.v_eps = float(g(vc, "layer_norm_eps", 1e-6))
        self.merge = int(g(vc, "spatial_merge_size", 2))
        self.image_size = int(config.mm_image_size or 448)
        self.grid = self.image_size // self.patch
        assert self.grid % self.merge == 0

        text_cfg = replace(config, is_multimodal=False)
        text_cfg.architecture = "Qwen3ForCausalLM"
        self.language_model = KeyeTextModel(text_cfg)
        self.n_embed = config.hidden_size
        self.uses_mrope = True

    def param_specs(self) -> list[ParamSpec]:
        W, MW = self.width, self.v_mlp
        t = transpose2d
        npos = (self.native_size // self.patch)**2
        m2 = self.merge**2
        pn_dim = W * m2 if self.norm_after_merge else W
        specs = [
            ParamSpec("vision.patch_embed",
                      (W, 3, self.patch, self.patch),
                      P(None, None, None, None),
                      VIS + "embeddings.patch_embedding.weight",
                      transform=None),
            ParamSpec("vision.patch_bias", (W, ), P(),
                      VIS + "embeddings.patch_embedding.bias",
                      transform=None),
            ParamSpec("vision.pos_embed", (npos, W), P(None, None),
                      VIS + "embeddings.position_embedding.weight",
                      transform=None),
            ParamSpec("vision.post_norm", (W, ), P(),
                      VIS + "post_layernorm.weight", transform=None),
            ParamSpec("vision.post_norm_bias", (W, ), P(),
                      VIS + "post_layernorm.bias", transform=None),
            ParamSpec("projector.pre_norm", (pn_dim, ), P(),
                      "mlp_AR.pre_norm.weight", transform=None),
            ParamSpec("projector.pre_norm_bias", (pn_dim, ), P(),
                      "mlp_AR.pre_norm.bias", transform=None),
            ParamSpec("projector.lin1", (W * m2, W * m2),
                      P(None, None), "mlp_AR.linear_1.weight",
                      transform=t),
            ParamSpec("projector.lin1_bias", (W * m2, ), P(),
                      "mlp_AR.linear_1.bias", transform=None),
            ParamSpec("projector.lin2", (W * m2, self.n_embed),
                      P(None, None), "mlp_AR.linear_2.weight",
                      transform=t),
            ParamSpec("projector.lin2_bias", (self.n_embed, ), P(),
                      "mlp_AR.linear_2.bias", transform=None),
        ]

        def vstk(path, shape, hf_key, transform=t):
            return ParamSpec(
                f"vision.layers.{path}", (self.v_layers, *shape),
                P(*([None] * (len(shape) + 1))),
                VIS + "encoder.layers.{i}." + hf_key, stacked=True,
                transform=transform)

        for n in ("q", "k", "v"):
            specs += [
                vstk(f"{n}_proj", (W, W), f"self_attn.{n}_proj.weight"),
                vstk(f"{n}_bias", (W, ), f"self_attn.{n}_proj.bias",
                     transform=None),
            ]
        specs += [
            vstk("out_proj", (W, W), "self_attn.out_proj.weight"),
            vstk("out_bias", (W, ), "self_attn.out_proj.bias",
                 transform=None),
            vstk("ln1", (W, ), "layer_norm1.weight", transform=None),
            vstk("ln1_bias", (W, ), "layer_norm1.bias",
                 transform=None),
            vstk("ln2", (W, ), "layer_norm2.weight", transform=None),
            vstk("ln2_bias", (W, ), "layer_norm2.bias",
                 transform=None),
            vstk("fc1", (W, MW), "mlp.fc1.weight"),
            vstk("fc1_bias", (MW, ), "mlp.fc1.bias", transform=None),
            vstk("fc2", (MW, W), "mlp.fc2.weight"),
            vstk("fc2_bias", (W, ), "mlp.fc2.bias", transform=None),
        ]
        specs += self.language_model.param_specs()
        return specs

    def kv_cache_spec(self):
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N*(grid/merge)^2, text_H]."""
        vw = params["vision"]
        n = pixel_values.shape[0]
        W = self.width
        g, m = self.grid, self.merge
        x = jax.lax.conv_general_dilated(
            pixel_values.astype(jnp.float32),
            vw["patch_embed"].astype(jnp.float32),
            (self.patch, self.patch), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x.reshape(n, W, g * g).transpose(0, 2, 1) + \
            vw["patch_bias"]
        pos = vw["pos_embed"].astype(jnp.float32)
        src = int(pos.shape[0]**0.5)
        if src != g:
            # bilinear interpolation (interpolate_pos_encoding,
            # keye.py:199-233)
            pos = jax.image.resize(pos.reshape(src, src, W),
                                   (g, g, W), method="bilinear")
        x = x + pos.reshape(1, g * g, W)

        # row-major 2D rope, Qwen half-split convention
        half = self.v_dh // 4
        inv_freq = 1.0 / (10000.0**(
            np.arange(0, self.v_dh // 2, 2, dtype=np.float64) /
            (self.v_dh // 2)))
        pid = np.arange(g * g)
        hpos, wpos = pid // g, pid % g
        angles = np.concatenate([
            hpos[:, None] * inv_freq[None, :half],
            wpos[:, None] * inv_freq[None, :half],
        ], axis=-1)
        cos = jnp.asarray(np.cos(angles), jnp.float32)[None, :,
                                                       None, :]
        sin = jnp.asarray(np.sin(angles), jnp.float32)[None, :,
                                                       None, :]

        def rot(z):
            d2 = z.shape[-1] // 2
            z1, z2 = z[..., :d2], z[..., d2:]
            return jnp.concatenate(
                [z1 * cos - z2 * sin, z2 * cos + z1 * sin], axis=-1)

        for li in range(self.v_layers):
            w = jax.tree.map(lambda a, li=li: a[li], vw["layers"])
            h = layer_norm(x, w["ln1"], w["ln1_bias"], self.v_eps)
            t_ = h.shape[1]
            q = (h @ w["q_proj"] + w["q_bias"]).reshape(
                n, t_, self.v_heads, self.v_dh)
            k = (h @ w["k_proj"] + w["k_bias"]).reshape(
                n, t_, self.v_heads, self.v_dh)
            v = (h @ w["v_proj"] + w["v_bias"]).reshape(
                n, t_, self.v_heads, self.v_dh)
            q, k = rot(q), rot(k)
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_dh**-0.5)
            p = jax.nn.softmax(s.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(n, t_, W)
            x = x + (o @ w["out_proj"] + w["out_bias"])
            h = layer_norm(x, w["ln2"], w["ln2_bias"], self.v_eps)
            h = jax.nn.gelu(h @ w["fc1"] + w["fc1_bias"],
                            approximate=True)
            x = x + (h @ w["fc2"] + w["fc2_bias"])
        x = layer_norm(x, vw["post_norm"], vw["post_norm_bias"],
                       self.v_eps)
        # projector: 2x2 merge from row-major; 1.5 norms after merge
        pw = params["projector"]
        if not self.norm_after_merge:
            x = layer_norm(x, pw["pre_norm"], pw["pre_norm_bias"],
                           1e-5)
        g2 = g // m
        x = x.reshape(n, g2, m, g2, m, W)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            n * g2 * g2, m * m * W)
        if self.norm_after_merge:
            x = layer_norm(x, pw["pre_norm"], pw["pre_norm_bias"],
                           1e-5)
        x = jax.nn.gelu(x @ pw["lin1"] + pw["lin1_bias"],
                        approximate=False)
        return x @ pw["lin2"] + pw["lin2_bias"]

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        if mm_embeds is not None:
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds.astype(x.dtype), mode="drop")
        return self.language_model(params, input_ids, positions,
                                   kv_caches, attn_meta,
                                   use_pallas=use_pallas,
                                   inputs_embeds=x)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(params, hidden)


class KeyeVL1_5ForConditionalGeneration(KeyeForConditionalGeneration):
    """Keye-VL-1.5: identical tower, projector LayerNorm over the
    merged 4x width (keye_vl1_5.py:175-250)."""

    norm_after_merge = True
