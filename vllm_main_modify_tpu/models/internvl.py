"""InternVL 2.5/3 (HF-native InternVLForConditionalGeneration).

Reference: vllm/model_executor/models/internvl.py (remote-code layout)
+ HF modeling_internvl (hub layout used here). Components:

- InternViT vision tower: CLS token + learned absolute positions,
  pre-norm blocks with LAYER-SCALE residuals (lambda_1/lambda_2),
  optional full-width RMS q/k norm, gelu MLP — keys under
  ``vision_tower.`` with q/k/v + ``projection_layer``;
- pixel shuffle (downsample_ratio, HF InternVLModel.pixel_shuffle):
  grid tokens fold into channels, tokens / r², channels × r²;
- projector: LayerNorm → linear_1 → gelu → linear_2;
- any registered decoder as ``language_model.`` (Qwen2/InternLM2/...).

Fixed canonical resolution: one image = one tile of
``vision_config.image_size`` (the reference's dynamic tiling would be
extra encode calls at other shapes)."""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.layers.normalization import (layer_norm,
                                                       rms_norm)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.registry import resolve_model_cls

VP = "vision_tower."


class InternVLForConditionalGeneration:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        self.v_hidden = vc.hidden_size
        self.v_inter = vc.intermediate_size
        self.v_layers = vc.num_hidden_layers
        self.v_heads = vc.num_attention_heads
        self.v_head_dim = self.v_hidden // self.v_heads
        self.patch = vc.patch_size if not isinstance(
            vc.patch_size, (list, tuple)) else vc.patch_size[0]
        img = getattr(hf, "force_image_size", None) or vc.image_size
        self.image_size = img if not isinstance(
            img, (list, tuple)) else img[0]
        self.grid = self.image_size // self.patch
        self.num_patches = self.grid * self.grid
        self.v_eps = getattr(vc, "layer_norm_eps", 1e-6)
        self.v_attn_bias = bool(getattr(vc, "attention_bias", False)
                                or getattr(vc, "qkv_bias", False))
        self.v_qk_norm = bool(getattr(vc, "use_qk_norm", False)
                              or getattr(vc, "qk_normalization",
                                         False))
        if getattr(vc, "norm_type", "layer_norm") != "layer_norm":
            raise NotImplementedError(
                "InternViT rms_norm block norms are not supported yet")
        r = float(getattr(hf, "downsample_ratio", 0.5))
        self.ds = int(round(1 / r))
        self.num_image_tokens = self.num_patches // (self.ds**2)
        # remote-code checkpoints pick an intermediate feature layer
        # (select_layer, default -1 = final) — run only that many
        # blocks (reference: internvl.py InternVLChatModel
        # _init_vision_model num_hidden_layers_override)
        sel = int(getattr(hf, "select_layer", -1))
        self.v_layers_used = (self.v_layers + sel + 1) if sel < 0 \
            else (sel + 1)

        text_hf = getattr(hf, "text_config", None)
        if text_hf is None:
            text_hf = hf.llm_config  # remote-code InternVLChatConfig
        text_archs = getattr(text_hf, "architectures",
                             None) or ["Qwen2ForCausalLM"]
        text_cfg = replace(config, hf_config=text_hf,
                           is_multimodal=False)
        text_cfg.architecture = text_archs[0]
        self.language_model = resolve_model_cls(text_archs[0])(
            text_cfg)
        self.text_cfg = text_cfg
        # projector dims: pd -> proj_mid -> H (hub layout: mid == H)
        self.proj_mid = self.cfg.hidden_size
        self.proj_bias = True

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        D, I, L = self.v_hidden, self.v_inter, self.v_layers
        H = self.cfg.hidden_size
        pd = D * self.ds**2
        t = transpose2d

        def vstk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"vision.layers.{path}", (L, *shape),
                             spec, VP + "encoder.layer.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("vision.patch_embedding",
                      (D, 3, self.patch, self.patch),
                      P(None, None, None, None),
                      VP + "embeddings.patch_embeddings.projection"
                      ".weight", transform=None),
            ParamSpec("vision.patch_bias", (D, ), P(),
                      VP + "embeddings.patch_embeddings.projection"
                      ".bias", transform=None),
            ParamSpec("vision.cls_token", (1, 1, D), P(),
                      VP + "embeddings.cls_token", transform=None),
            ParamSpec("vision.position_embeddings",
                      (1, self.num_patches + 1, D), P(),
                      VP + "embeddings.position_embeddings",
                      transform=None),
            ParamSpec("proj_norm", (pd, ), P(),
                      "multi_modal_projector.layer_norm.weight",
                      transform=None),
            ParamSpec("proj_norm_bias", (pd, ), P(),
                      "multi_modal_projector.layer_norm.bias",
                      transform=None),
            ParamSpec("proj_fc1", (pd, H), P(None, None),
                      "multi_modal_projector.linear_1.weight",
                      transform=t),
            ParamSpec("proj_fc1_bias", (H, ), P(),
                      "multi_modal_projector.linear_1.bias",
                      transform=None),
            ParamSpec("proj_fc2", (H, H), P(None, None),
                      "multi_modal_projector.linear_2.weight",
                      transform=t),
            ParamSpec("proj_fc2_bias", (H, ), P(),
                      "multi_modal_projector.linear_2.bias",
                      transform=None),
        ]
        for n in ("layernorm_before", "layernorm_after"):
            specs += [
                vstk(n, (D, ), P(None, None), f"{n}.weight",
                     transform=None),
                vstk(f"{n}_bias", (D, ), P(None, None), f"{n}.bias",
                     transform=None),
            ]
        specs += [
            vstk("lambda_1", (D, ), P(None, None), "lambda_1",
                 transform=None),
            vstk("lambda_2", (D, ), P(None, None), "lambda_2",
                 transform=None),
        ]
        for n in ("q_proj", "k_proj", "v_proj"):
            specs.append(vstk(n, (D, D), P(None, None, None),
                              f"attention.{n}.weight"))
            if self.v_attn_bias:
                specs.append(
                    vstk(f"{n}_bias", (D, ), P(None, None),
                         f"attention.{n}.bias", transform=None))
        specs += [
            vstk("out_proj", (D, D), P(None, None, None),
                 "attention.projection_layer.weight"),
            vstk("out_proj_bias", (D, ), P(None, None),
                 "attention.projection_layer.bias", transform=None),
            vstk("fc1", (D, I), P(None, None, None),
                 "mlp.fc1.weight"),
            vstk("fc1_bias", (I, ), P(None, None), "mlp.fc1.bias",
                 transform=None),
            vstk("fc2", (I, D), P(None, None, None),
                 "mlp.fc2.weight"),
            vstk("fc2_bias", (D, ), P(None, None), "mlp.fc2.bias",
                 transform=None),
        ]
        if self.v_qk_norm:
            specs += [
                vstk("q_norm", (D, ), P(None, None),
                     "attention.q_norm.weight", transform=None),
                vstk("k_norm", (D, ), P(None, None),
                     "attention.k_norm.weight", transform=None),
            ]
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N, num_image_tokens, text_H]."""
        v = params["vision"]
        n = pixel_values.shape[0]
        x = jax.lax.conv_general_dilated(
            pixel_values.astype(jnp.float32),
            v["patch_embedding"].astype(jnp.float32),
            window_strides=(self.patch, self.patch), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x.reshape(n, self.v_hidden, self.num_patches)
        x = jnp.transpose(x, (0, 2, 1)) + \
            v["patch_bias"].astype(jnp.float32)
        cls = jnp.broadcast_to(
            v["cls_token"].astype(jnp.float32),
            (n, 1, self.v_hidden))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + v["position_embeddings"].astype(jnp.float32)

        layers = v["layers"]

        def layer_fn(l, x):
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            t = x.shape[1]
            h = layer_norm(x, w["layernorm_before"],
                           w["layernorm_before_bias"], self.v_eps)
            if "qkv_proj" in w:  # remote-code fused attn.qkv
                qkv = h @ w["qkv_proj"]
                if "qkv_proj_bias" in w:
                    qkv = qkv + w["qkv_proj_bias"]
                q, k, val = jnp.split(qkv, 3, axis=-1)
            else:
                q = h @ w["q_proj"]
                k = h @ w["k_proj"]
                val = h @ w["v_proj"]
                if "q_proj_bias" in w:
                    q = q + w["q_proj_bias"]
                    k = k + w["k_proj_bias"]
                    val = val + w["v_proj_bias"]
            if "q_norm" in w:
                q = rms_norm(q, w["q_norm"], self.v_eps)
                k = rms_norm(k, w["k_norm"], self.v_eps)
            q = q.reshape(n, t, self.v_heads, self.v_head_dim)
            k = k.reshape(n, t, self.v_heads, self.v_head_dim)
            val = val.reshape(n, t, self.v_heads, self.v_head_dim)
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_head_dim**-0.5)
            p_ = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", p_, val)
            o = o.reshape(n, t, -1) @ w["out_proj"] + \
                w["out_proj_bias"]
            x = x + w["lambda_1"] * o  # layer scale
            h = layer_norm(x, w["layernorm_after"],
                           w["layernorm_after_bias"], self.v_eps)
            h = jax.nn.gelu(h @ w["fc1"] + w["fc1_bias"],
                            approximate=False)
            h = h @ w["fc2"] + w["fc2_bias"]
            return x + w["lambda_2"] * h

        x = jax.lax.fori_loop(0, self.v_layers_used, layer_fn, x)
        x = x[:, 1:]  # drop CLS
        # HF InternVLModel.pixel_shuffle (scale r = 1/ds)
        g, ds = self.grid, self.ds
        c = self.v_hidden
        x = x.reshape(n, g, g, c)
        x = x.reshape(n, g, g // ds, c * ds)
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(n, g // ds, g // ds, c * ds * ds)
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(n, self.num_image_tokens, c * ds * ds)
        # projector: LN → fc1 → gelu → fc2 (remote-code mlp1.{0,1,3};
        # NVLM_D widens fc1 to llm intermediate and drops biases)
        x = layer_norm(x, params["proj_norm"],
                       params["proj_norm_bias"], 1e-5)
        x = x @ params["proj_fc1"]
        if "proj_fc1_bias" in params:
            x = x + params["proj_fc1_bias"]
        x = jax.nn.gelu(x, approximate=False)
        x = x @ params["proj_fc2"]
        if "proj_fc2_bias" in params:
            x = x + params["proj_fc2_bias"]
        return x

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


class InternVLChatModel(InternVLForConditionalGeneration):
    """Remote-code OpenGVLab checkpoint layout (reference:
    vllm/model_executor/models/internvl.py InternVLChatModel +
    intern_vit.py): same InternViT compute as the hub layout but with
    fused ``attn.qkv``, ``ls1``/``ls2`` layer scales,
    ``norm1``/``norm2`` block norms, a ``mlp1.{0,1,3}`` projector and
    the text tree under ``llm_config``. NVLM-D / H2OVL / Skywork-R1V
    reuse this with projector tweaks (reference: nvlm_d.py:160,
    h2ovl.py, skyworkr1v.py)."""

    RVP = "vision_model."

    def param_specs(self) -> list[ParamSpec]:
        D, I, L = self.v_hidden, self.v_inter, self.v_layers
        H = self.cfg.hidden_size
        pd = D * self.ds**2
        mid = self.proj_mid
        t = transpose2d
        RVP = self.RVP

        def vstk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"vision.layers.{path}", (L, *shape),
                             spec, RVP + "encoder.layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("vision.patch_embedding",
                      (D, 3, self.patch, self.patch),
                      P(None, None, None, None),
                      RVP + "embeddings.patch_embedding.weight",
                      transform=None),
            ParamSpec("vision.patch_bias", (D, ), P(),
                      RVP + "embeddings.patch_embedding.bias",
                      transform=None),
            ParamSpec("vision.cls_token", (1, 1, D), P(),
                      RVP + "embeddings.class_embedding",
                      transform=None),
            ParamSpec("vision.position_embeddings",
                      (1, self.num_patches + 1, D), P(),
                      RVP + "embeddings.position_embedding",
                      transform=None),
            ParamSpec("proj_norm", (pd, ), P(), "mlp1.0.weight",
                      transform=None),
            ParamSpec("proj_norm_bias", (pd, ), P(), "mlp1.0.bias",
                      transform=None),
            ParamSpec("proj_fc1", (pd, mid), P(None, None),
                      "mlp1.1.weight", transform=t),
            ParamSpec("proj_fc2", (mid, H), P(None, None),
                      "mlp1.3.weight", transform=t),
        ]
        if self.proj_bias:
            specs += [
                ParamSpec("proj_fc1_bias", (mid, ), P(),
                          "mlp1.1.bias", transform=None),
                ParamSpec("proj_fc2_bias", (H, ), P(),
                          "mlp1.3.bias", transform=None),
            ]
        for name, hf in (("layernorm_before", "norm1"),
                         ("layernorm_after", "norm2")):
            specs += [
                vstk(name, (D, ), P(None, None), f"{hf}.weight",
                     transform=None),
                vstk(f"{name}_bias", (D, ), P(None, None),
                     f"{hf}.bias", transform=None),
            ]
        specs += [
            vstk("lambda_1", (D, ), P(None, None), "ls1",
                 transform=None),
            vstk("lambda_2", (D, ), P(None, None), "ls2",
                 transform=None),
            vstk("qkv_proj", (D, 3 * D), P(None, None, None),
                 "attn.qkv.weight"),
            vstk("out_proj", (D, D), P(None, None, None),
                 "attn.proj.weight"),
            vstk("out_proj_bias", (D, ), P(None, None),
                 "attn.proj.bias", transform=None),
            vstk("fc1", (D, I), P(None, None, None),
                 "mlp.fc1.weight"),
            vstk("fc1_bias", (I, ), P(None, None), "mlp.fc1.bias",
                 transform=None),
            vstk("fc2", (I, D), P(None, None, None),
                 "mlp.fc2.weight"),
            vstk("fc2_bias", (D, ), P(None, None), "mlp.fc2.bias",
                 transform=None),
        ]
        if self.v_attn_bias:
            specs.append(vstk("qkv_proj_bias", (3 * D, ),
                              P(None, None), "attn.qkv.bias",
                              transform=None))
        if self.v_qk_norm:
            specs += [
                vstk("q_norm", (D, ), P(None, None),
                     "attn.q_norm.weight", transform=None),
                vstk("k_norm", (D, ), P(None, None),
                     "attn.k_norm.weight", transform=None),
            ]
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs


class NVLM_D_Model(InternVLChatModel):
    """NVLM-D (reference: nvlm_d.py NVLM_D_Model): InternVLChatModel
    with a wide bias-free projector pd → llm_intermediate → H."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.proj_mid = self.text_cfg.intermediate_size
        self.proj_bias = False
