"""Legacy GLM-4V (GLM4VForCausalLM, glm-4v-9b): EVA2CLIP tower +
conv-downsample GLU projector over the ChatGLM decoder.

Reference parity: vllm/model_executor/models/glm4v.py (upstream is
remote-code-only; the NEW GLM-4.1V/4.5V family lives in
models/glm4v.py here). Tower: patch conv + cls token + learned
positions, POST-norm sandwich layers (x += LN(attn(x)),
x += LN(mlp(x)); fused biased query_key_value), drop cls, 2x2 conv
downsample into the text width, then the GLU projector
(linear_proj → LN → gelu → [gate|up] silu-mul → dense_4h_to_h),
wrapped by learned ``boi``/``eoi`` rows and divided by
``scaling_factor``. Tokens per image = 2 + (grid/2)^2 — the engine
expands the image placeholder to that count and scatters ALL rows
(including the boi/eoi embeddings)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.llama_variants import \
    ChatGLMForCausalLM

VIS = "transformer.vision."


class GLM4VForCausalLM(ChatGLMForCausalLM):

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = dict(config.hf_config.vision_config)
        self.vc = vc
        self.v_h = int(vc["hidden_size"])
        self.v_heads = int(vc["num_heads"])
        self.v_dh = self.v_h // self.v_heads
        self.v_layers = int(vc["num_hidden_layers"])
        self.v_inter = int(vc["intermediate_size"])
        self.v_patch = int(vc["patch_size"])
        self.v_size = int(config.mm_image_size or vc["image_size"])
        self.v_grid = self.v_size // self.v_patch
        self.scaling_factor = float(vc.get("scaling_factor", 8.0))
        self.glu_inter = self.cfg.intermediate_size

    def param_specs(self) -> list[ParamSpec]:
        specs = super().param_specs()
        D, H, VI = self.v_h, self.cfg.hidden_size, self.v_inter
        t = transpose2d
        np_ = self.v_grid * self.v_grid + 1
        specs += [
            ParamSpec("vision.patch_proj",
                      (D, 3, self.v_patch, self.v_patch),
                      P(None, None, None, None),
                      VIS + "patch_embedding.proj.weight",
                      transform=None),
            ParamSpec("vision.patch_bias", (D, ), P(),
                      VIS + "patch_embedding.proj.bias",
                      transform=None),
            ParamSpec("vision.cls", (1, D), P(None, None),
                      VIS + "patch_embedding.cls_embedding",
                      transform=None),
            ParamSpec("vision.pos", (np_, D), P(None, None),
                      VIS + "patch_embedding.position_embedding"
                      ".weight", transform=None),
            ParamSpec("vision.conv", (H, D, 2, 2),
                      P(None, None, None, None),
                      VIS + "conv.weight", transform=None),
            ParamSpec("vision.conv_bias", (H, ), P(),
                      VIS + "conv.bias", transform=None),
            ParamSpec("vision.boi", (1, 1, H), P(None, None, None),
                      VIS + "boi", transform=None),
            ParamSpec("vision.eoi", (1, 1, H), P(None, None, None),
                      VIS + "eoi", transform=None),
            ParamSpec("vision.glu_in", (H, H), P(None, None),
                      VIS + "linear_proj.linear_proj.weight",
                      transform=t),
            ParamSpec("vision.glu_norm", (H, ), P(),
                      VIS + "linear_proj.norm1.weight",
                      transform=None),
            ParamSpec("vision.glu_norm_bias", (H, ), P(),
                      VIS + "linear_proj.norm1.bias", transform=None),
            ParamSpec("vision.glu_gate", (H, self.glu_inter),
                      P(None, None),
                      VIS + "linear_proj.gate_proj.weight",
                      transform=t),
            ParamSpec("vision.glu_up", (H, self.glu_inter),
                      P(None, None),
                      VIS + "linear_proj.dense_h_to_4h.weight",
                      transform=t),
            ParamSpec("vision.glu_down", (self.glu_inter, H),
                      P(None, None),
                      VIS + "linear_proj.dense_4h_to_h.weight",
                      transform=t),
        ]

        def vstk(path, shape, hf_key, transform=t):
            return ParamSpec(
                f"vision.layers.{path}", (self.v_layers, *shape),
                P(*([None] * (len(shape) + 1))),
                VIS + "transformer.layers.{i}." + hf_key,
                stacked=True, transform=transform)

        specs += [
            vstk("ln1", (D, ), "input_layernorm.weight",
                 transform=None),
            vstk("ln1_bias", (D, ), "input_layernorm.bias",
                 transform=None),
            vstk("qkv", (D, 3 * D),
                 "attention.query_key_value.weight"),
            vstk("qkv_bias", (3 * D, ),
                 "attention.query_key_value.bias", transform=None),
            vstk("dense", (D, D), "attention.dense.weight"),
            vstk("dense_bias", (D, ), "attention.dense.bias",
                 transform=None),
            vstk("ln2", (D, ), "post_attention_layernorm.weight",
                 transform=None),
            vstk("ln2_bias", (D, ), "post_attention_layernorm.bias",
                 transform=None),
            vstk("fc1", (D, VI), "mlp.fc1.weight"),
            vstk("fc1_bias", (VI, ), "mlp.fc1.bias", transform=None),
            vstk("fc2", (VI, D), "mlp.fc2.weight"),
            vstk("fc2_bias", (D, ), "mlp.fc2.bias", transform=None),
        ]
        return specs

    # ------------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N, 2 + (g/2)^2, H]."""
        if pixel_values.ndim == 3:
            pixel_values = pixel_values[None]
        vw = params["vision"]
        n = pixel_values.shape[0]
        D, g = self.v_h, self.v_grid
        x = jax.lax.conv_general_dilated(
            pixel_values.astype(jnp.float32),
            vw["patch_proj"].astype(jnp.float32),
            (self.v_patch, self.v_patch), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x.reshape(n, D, g * g).transpose(0, 2, 1) + \
            vw["patch_bias"]
        cls = jnp.broadcast_to(vw["cls"][None], (n, 1, D))
        x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
        x = x + vw["pos"][None]
        for li in range(self.v_layers):
            w = jax.tree.map(lambda a, li=li: a[li], vw["layers"])
            t = x.shape[1]
            qkv = (x @ w["qkv"] + w["qkv_bias"]).reshape(
                n, t, 3, self.v_heads, self.v_dh)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_dh**-0.5)
            p = jax.nn.softmax(s.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(n, t, D)
            o = o @ w["dense"] + w["dense_bias"]
            # POST-norm sandwich: residual + LN(block output)
            x = x + layer_norm(o, w["ln1"], w["ln1_bias"], 1e-5)
            m = jax.nn.gelu(x @ w["fc1"] + w["fc1_bias"],
                            approximate=False)
            m = m @ w["fc2"] + w["fc2_bias"]
            x = x + layer_norm(m, w["ln2"], w["ln2_bias"], 1e-5)
        x = x[:, 1:]  # drop cls
        x = x.reshape(n, g, g, D).transpose(0, 3, 1, 2)
        x = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), vw["conv"].astype(jnp.float32),
            (2, 2), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + vw["conv_bias"][None, :, None, None]
        h2 = g // 2
        x = x.reshape(n, -1, h2 * h2).transpose(0, 2, 1).astype(
            self.cfg.jax_dtype)
        x = x @ vw["glu_in"]
        x = jax.nn.gelu(
            layer_norm(x, vw["glu_norm"], vw["glu_norm_bias"], 1e-5),
            approximate=False)
        x = jax.nn.silu(x @ vw["glu_gate"]) * (x @ vw["glu_up"])
        x = x @ vw["glu_down"]
        boi = jnp.broadcast_to(vw["boi"], (n, 1, x.shape[-1]))
        eoi = jnp.broadcast_to(vw["eoi"], (n, 1, x.shape[-1]))
        x = jnp.concatenate(
            [boi.astype(x.dtype), x, eoi.astype(x.dtype)], axis=1)
        return x / self.scaling_factor

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        if mm_embeds is not None:
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds.astype(x.dtype), mode="drop")
        return super().__call__(params, input_ids, positions,
                                kv_caches, attn_meta,
                                use_pallas=use_pallas,
                                inputs_embeds=x)
