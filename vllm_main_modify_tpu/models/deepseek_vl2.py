"""DeepSeek-VL2 (DeepseekVLV2ForCausalLM): timm-style SigLIP-so400m
ViT + downsample-MLP projector + 2D tile formatting over the
DeepSeek-V2/V3 MLA decoder.

Reference parity: vllm/model_executor/models/deepseek_vl2.py (+ the
remote-code DeepseekVLV2Config in its transformers_utils). Layout:
``vision.*`` (timm VisionTransformer keys: patch_embed.proj,
pos_embed, blocks.{i}.norm1/attn.qkv/attn.proj/norm2/mlp.fc1/fc2,
norm), ``projector.layers.{j}``, ``image_newline`` /
``view_seperator`` (sic), decoder under ``language.``.

The projector unfolds ``downsample_ratio`` x ``downsample_ratio``
feature blocks channel-major (torch F.unfold order) into a
gelu-separated MLP. Tile formatting at the canonical square
resolution is the 1x1-local case: [global rows with a newline column,
view separator, local rows with a newline column] — tokens per image
= 2 * h * (w + 1) + 1 with h = w = grid / downsample_ratio.
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

VIS = "vision."


class DeepseekVLV2ForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        self.width = int(getattr(vc, "width", 1024))
        self.v_layers = int(getattr(vc, "layers", 24))
        self.v_heads = int(getattr(vc, "heads", 16))
        self.v_dh = self.width // self.v_heads
        self.v_mlp = int(self.width *
                         float(getattr(vc, "mlp_ratio", 4)))
        self.patch = int(getattr(vc, "patch_size", 16))
        self.image_size = int(config.mm_image_size
                              or getattr(vc, "image_size", 384))
        self.grid = self.image_size // self.patch
        pc = hf.projector_config
        self.ds = int(getattr(pc, "downsample_ratio", 2))
        self.n_embed = int(getattr(pc, "n_embed",
                                   config.hidden_size))
        self.p_depth = int(getattr(pc, "depth", 2))
        self.p_ratio = int(getattr(pc, "mlp_ratio", 1))
        self.fgrid = -(-self.grid // self.ds)  # h = w after unfold

        txt = hf.text_config
        archs = getattr(txt, "architectures", None)
        if archs:
            arch = archs[0]
        elif getattr(txt, "topk_method", None) == "noaux_tc":
            arch = "DeepseekV3ForCausalLM"
        elif getattr(txt, "use_mla", True):
            arch = "DeepseekV2ForCausalLM"
        else:
            arch = "DeepseekForCausalLM"
        text_cfg = replace(config, hf_config=txt,
                           is_multimodal=False)
        text_cfg.architecture = arch
        self.language_model = resolve_model_cls(arch)(text_cfg)

    def param_specs(self) -> list[ParamSpec]:
        W, MW = self.width, self.v_mlp
        t = transpose2d
        specs = [
            ParamSpec("vision.patch_embed",
                      (W, 3, self.patch, self.patch),
                      P(None, None, None, None),
                      VIS + "patch_embed.proj.weight", transform=None),
            ParamSpec("vision.patch_bias", (W, ), P(),
                      VIS + "patch_embed.proj.bias", transform=None),
            ParamSpec("vision.pos_embed",
                      (1, self.grid * self.grid, W),
                      P(None, None, None), VIS + "pos_embed",
                      transform=None),
            ParamSpec("vision.norm", (W, ), P(), VIS + "norm.weight",
                      transform=None),
            ParamSpec("vision.norm_bias", (W, ), P(),
                      VIS + "norm.bias", transform=None),
            ParamSpec("image_newline", (self.n_embed, ), P(),
                      "image_newline", transform=None),
            ParamSpec("view_seperator", (self.n_embed, ), P(),
                      "view_seperator", transform=None),
        ]

        def vstk(path, shape, hf_key, transform=t):
            return ParamSpec(
                f"vision.layers.{path}", (self.v_layers, *shape),
                P(*([None] * (len(shape) + 1))),
                VIS + "blocks.{i}." + hf_key, stacked=True,
                transform=transform)

        specs += [
            vstk("norm1", (W, ), "norm1.weight", transform=None),
            vstk("norm1_bias", (W, ), "norm1.bias", transform=None),
            vstk("qkv", (W, 3 * W), "attn.qkv.weight"),
            vstk("qkv_bias", (3 * W, ), "attn.qkv.bias",
                 transform=None),
            vstk("proj", (W, W), "attn.proj.weight"),
            vstk("proj_bias", (W, ), "attn.proj.bias",
                 transform=None),
            vstk("norm2", (W, ), "norm2.weight", transform=None),
            vstk("norm2_bias", (W, ), "norm2.bias", transform=None),
            vstk("fc1", (W, MW), "mlp.fc1.weight"),
            vstk("fc1_bias", (MW, ), "mlp.fc1.bias", transform=None),
            vstk("fc2", (MW, W), "mlp.fc2.weight"),
            vstk("fc2_bias", (W, ), "mlp.fc2.bias", transform=None),
        ]
        # projector (downsample_mlp_gelu): Linear at layers.0, then
        # [GELU, Linear] pairs — torch Sequential indices 0, 2, 4...
        dims = [(self.width * self.ds**2,
                 self.n_embed * self.p_ratio)]
        for _ in range(1, self.p_depth - 1):
            dims.append((self.n_embed * self.p_ratio,
                         self.n_embed * self.p_ratio))
        dims.append((self.n_embed * self.p_ratio, self.n_embed))
        for j, (din, dout) in enumerate(dims):
            idx = 0 if j == 0 else 2 * j
            specs += [
                ParamSpec(f"projector.lin{j}", (din, dout),
                          P(None, None),
                          f"projector.layers.{idx}.weight",
                          transform=t),
                ParamSpec(f"projector.lin{j}_bias", (dout, ), P(),
                          f"projector.layers.{idx}.bias",
                          transform=None),
            ]
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "language." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self):
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[2, 3, S, S] (global + 1x1 local tile) →
        [2*h*(w+1)+1, n_embed] formatted image tokens."""
        if pixel_values.ndim == 5:
            pixel_values = pixel_values[0]
        vw = params["vision"]
        n = pixel_values.shape[0]
        W = self.width
        x = jax.lax.conv_general_dilated(
            pixel_values.astype(jnp.float32),
            vw["patch_embed"].astype(jnp.float32),
            (self.patch, self.patch), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x.reshape(n, W, -1).transpose(0, 2, 1) + vw["patch_bias"]
        x = x + vw["pos_embed"].astype(x.dtype)
        for li in range(self.v_layers):
            w = jax.tree.map(lambda a, li=li: a[li], vw["layers"])
            h = layer_norm(x, w["norm1"], w["norm1_bias"], 1e-6)
            t = h.shape[1]
            qkv = (h @ w["qkv"] + w["qkv_bias"]).reshape(
                n, t, 3, self.v_heads, self.v_dh)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_dh**-0.5)
            p = jax.nn.softmax(s.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(n, t, W)
            x = x + (o @ w["proj"] + w["proj_bias"])
            h = layer_norm(x, w["norm2"], w["norm2_bias"], 1e-6)
            h = jax.nn.gelu(h @ w["fc1"] + w["fc1_bias"],
                            approximate=False)
            x = x + (h @ w["fc2"] + w["fc2_bias"])
        x = layer_norm(x, vw["norm"], vw["norm_bias"], 1e-6)
        # projector: channel-major ds x ds unfold then gelu MLP
        g, ds = self.grid, self.ds
        pad = (-g) % ds
        x = x.reshape(n, g, g, W)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
        h2 = self.fgrid
        x = x.reshape(n, h2, ds, h2, ds, W)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(
            n, h2 * h2, W * ds * ds)
        pw = params["projector"]
        for j in range(self.p_depth):
            if j:
                x = jax.nn.gelu(x, approximate=False)
            x = x @ pw[f"lin{j}"] + pw[f"lin{j}_bias"]
        # 2D tile formatting, global_view_pos="head", 1x1 local
        D = self.n_embed
        newline = params["image_newline"].astype(x.dtype)

        def with_newline(feat):  # [h*w, D] → [h*(w+1), D]
            f = feat.reshape(h2, h2, D)
            nl = jnp.broadcast_to(newline[None, None], (h2, 1, D))
            return jnp.concatenate([f, nl], axis=1).reshape(-1, D)

        return jnp.concatenate([
            with_newline(x[0]),
            params["view_seperator"].astype(x.dtype)[None],
            with_newline(x[1]),
        ], axis=0)

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
