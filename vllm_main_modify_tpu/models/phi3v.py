"""Phi-3-Vision (reference: vllm/model_executor/models/phi3v.py).

Microsoft's HD-transform VLM: a CLIP ViT-L/14-336 tower read at
``layer_idx`` (-2), 2x2 patch merge into 4-wide channels, learned
``sub_GN`` newline per merged row and ``glb_GN`` separator between the
sub-image block and the global image, then a 2-layer MLP projector
into the Phi-3 decoder. The top-level HF config IS the Phi-3 text
config with the vision tower described by the ``img_processor`` /
``embd_layer`` dicts (phi3v.py:63-209).

TPU-native simplification (same policy as the LLaVA-NeXT family):
fixed canonical resolution — one 336x336 global image plus a 1x1 crop
grid, so every image compiles to ONE static encode shape with
2*m*(m+1)+1 tokens (m = grid/2; 313 for ViT-L/14-336).
"""

from __future__ import annotations

from dataclasses import replace

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.llava import \
    LlavaForConditionalGeneration

VP = "model.vision_embed_tokens.img_processor.vision_model."
PP = "model.vision_embed_tokens."


def phi3v_vision_dims(hf) -> dict:
    """CLIP tower dims: the real checkpoint hardcodes ViT-L/14-336
    (reference: phi3v.py:63 CLIP_VIT_LARGE_PATCH14_336_CONFIG);
    tiny-test configs may override via extra img_processor keys."""
    ip = dict(getattr(hf, "img_processor", None) or {})
    return dict(
        hidden_size=ip.get("hidden_size",
                           ip.get("image_dim_out", 1024)),
        intermediate_size=ip.get("intermediate_size", 4096),
        num_hidden_layers=ip.get("num_hidden_layers", 24),
        num_attention_heads=ip.get("num_attention_heads", 16),
        image_size=ip.get("image_size", 336),
        patch_size=ip.get("patch_size", 14),
        layer_norm_eps=ip.get("layer_norm_eps", 1e-5),
        layer_idx=ip.get("layer_idx", -2),
    )


class Phi3VForCausalLM(LlavaForConditionalGeneration):

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        d = phi3v_vision_dims(hf)
        self.v_hidden = d["hidden_size"]
        self.v_inter = d["intermediate_size"]
        self.v_layers = d["num_hidden_layers"]
        self.v_heads = d["num_attention_heads"]
        self.v_head_dim = self.v_hidden // self.v_heads
        self.patch = d["patch_size"]
        self.image_size = d["image_size"]
        self.grid = self.image_size // self.patch
        self.num_patches = self.grid * self.grid
        self.v_eps = d["layer_norm_eps"]
        li = d["layer_idx"]
        self.n_encoder_layers = li if li >= 0 else \
            self.v_layers + 1 + li
        self.drop_cls = True  # type_feature 'patch'
        m = self.grid // 2
        self.num_image_tokens = 2 * m * (m + 1) + 1

        from vllm_main_modify_tpu.models.registry import \
            resolve_model_cls

        text_cfg = replace(config, is_multimodal=False)
        text_cfg.architecture = "Phi3ForCausalLM"
        self.language_model = resolve_model_cls("Phi3ForCausalLM")(
            text_cfg)
        self.text_cfg = text_cfg
        self.tie_embeddings = text_cfg.tie_word_embeddings

    def param_specs(self) -> list[ParamSpec]:
        D, I, L = self.v_hidden, self.v_inter, self.v_layers
        H = self.cfg.hidden_size
        t = transpose2d

        def vstk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(
                f"vision.layers.{path}", (L, *shape), spec,
                VP + "encoder.layers.{i}." + hf_key,
                stacked=True, transform=transform)

        specs = [
            ParamSpec("vision.class_embedding", (D, ), P(),
                      VP + "embeddings.class_embedding",
                      transform=None),
            ParamSpec("vision.patch_embedding",
                      (D, 3, self.patch, self.patch),
                      P(None, None, None, None),
                      VP + "embeddings.patch_embedding.weight",
                      transform=None),
            ParamSpec("vision.position_embedding",
                      (self.num_patches + 1, D), P(None, None),
                      VP + "embeddings.position_embedding.weight",
                      transform=None),
            ParamSpec("vision.pre_norm", (D, ), P(),
                      VP + "pre_layrnorm.weight", transform=None),
            ParamSpec("vision.pre_norm_bias", (D, ), P(),
                      VP + "pre_layrnorm.bias", transform=None),
            # HD-transform separators (phi3v.py:198-201)
            ParamSpec("glb_GN", (1, 1, 4 * D), P(), PP + "glb_GN",
                      transform=None),
            ParamSpec("sub_GN", (1, 1, 1, 4 * D), P(), PP + "sub_GN",
                      transform=None),
            # img_projection: Sequential(Linear(4D→H), GELU,
            # Linear(H→H)) (phi3v.py:202-209)
            ParamSpec("projector.linear_1", (4 * D, H), P(None, None),
                      PP + "img_projection.0.weight", transform=t),
            ParamSpec("projector.linear_1_bias", (H, ), P(),
                      PP + "img_projection.0.bias", transform=None),
            ParamSpec("projector.linear_2", (H, H), P(None, None),
                      PP + "img_projection.2.weight", transform=t),
            ParamSpec("projector.linear_2_bias", (H, ), P(),
                      PP + "img_projection.2.bias", transform=None),
        ]
        for name in ("layer_norm1", "layer_norm2"):
            specs += [
                vstk(name, (D, ), P(None, None), f"{name}.weight",
                     transform=None),
                vstk(f"{name}_bias", (D, ), P(None, None),
                     f"{name}.bias", transform=None),
            ]
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            specs += [
                vstk(name, (D, D), P(None, None, None),
                     f"self_attn.{name}.weight"),
                vstk(f"{name}_bias", (D, ), P(None, None),
                     f"self_attn.{name}.bias", transform=None),
            ]
        specs += [
            vstk("fc1", (D, I), P(None, None, None), "mlp.fc1.weight"),
            vstk("fc1_bias", (I, ), P(None, None), "mlp.fc1.bias",
                 transform=None),
            vstk("fc2", (I, D), P(None, None, None), "mlp.fc2.weight"),
            vstk("fc2_bias", (D, ), P(None, None), "mlp.fc2.bias",
                 transform=None),
        ]
        # Phi-3 text tree lives at the TOP level of the checkpoint
        # (model.layers... / lm_head): pytree path prefixed for the
        # shared Llava forward, HF key unprefixed
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            specs.append(s)
        return specs

    def _merge2x2(self, x):
        """[B, P, D] grid features → [B, m, m, 4D] (reference:
        reshape_hd_patches_2x2merge, phi3v.py:281)."""
        b = x.shape[0]
        g, d = self.grid, self.v_hidden
        m = g // 2
        x = x.reshape(b, m, 2, m, 2, d)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
        return x.reshape(b, m, m, 4 * d)

    def encode_images(self, params, pixel_values):
        """[B, 2, 3, S, S] (global + 1x1 crop) → [B, 2m(m+1)+1, H]
        in hd_transform_order='sub_glb' (phi3v.py:229-279)."""
        b = pixel_values.shape[0]
        px = pixel_values.reshape(-1, *pixel_values.shape[-3:])
        feats = self._clip_features(params, px)  # [2B, P, D]
        feats = feats.reshape(b, 2, self.num_patches, self.v_hidden)
        glb = self._merge2x2(feats[:, 0])  # [B, m, m, 4D]
        sub = self._merge2x2(feats[:, 1])
        m = self.grid // 2
        wide = 4 * self.v_hidden
        newline = jnp.broadcast_to(
            params["sub_GN"].astype(feats.dtype), (b, m, 1, wide))
        sub = jnp.concatenate([sub, newline], axis=2).reshape(
            b, m * (m + 1), wide)
        glb = jnp.concatenate([glb, newline], axis=2).reshape(
            b, m * (m + 1), wide)
        sep = jnp.broadcast_to(
            params["glb_GN"].astype(feats.dtype), (b, 1, wide))
        x = jnp.concatenate([sub, sep, glb], axis=1)
        return self._project(params, x)
