"""LLaVA: CLIP vision tower + projector + decoder backbone.

Reference parity: vllm/model_executor/models/llava.py + clip.py.
TPU-native structure:

- the vision tower is a from-scratch JAX ViT (CLIP vision): conv
  patch embedding (lax.conv), CLS + learned positions, pre-LN, a
  stacked-layer encoder run with ``fori_loop`` up to the configured
  ``vision_feature_layer``, quick-gelu MLPs — compiled ONCE per image
  count and run only on steps that ingest images;
- image features are projected to the text width (two-layer
  projector) and merged into the token-embedding stream by a scatter
  (``mm_scatter`` rows built host-side), so the decoder step function
  stays a single jit with static shapes;
- the decoder is whatever registry family ``text_config`` names
  (Llama/Mistral/Qwen2), reused verbatim via ``inputs_embeds``.
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

# serialized (hub) checkpoint layout — HF save_pretrained maps the
# in-memory "model.vision_tower..." names back to these
VISION_PREFIX = "vision_tower.vision_model."
PROJ_PREFIX = "multi_modal_projector."


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class LlavaForConditionalGeneration:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        self.v_hidden = vc.hidden_size
        self.v_inter = vc.intermediate_size
        self.v_layers = vc.num_hidden_layers
        self.v_heads = vc.num_attention_heads
        self.v_head_dim = self.v_hidden // self.v_heads
        self.patch = vc.patch_size
        self.image_size = vc.image_size
        self.grid = self.image_size // self.patch
        self.num_patches = self.grid * self.grid
        self.v_eps = getattr(vc, "layer_norm_eps", 1e-5)
        feature_layer = getattr(hf, "vision_feature_layer", -2)
        # hidden_states[k] = output of encoder layer k-1; negative
        # indices count from the full L+1-entry list
        idx = feature_layer if feature_layer >= 0 else \
            self.v_layers + 1 + feature_layer
        self.n_encoder_layers = idx
        strategy = getattr(hf, "vision_feature_select_strategy",
                           "default")
        assert strategy in ("default", "full"), strategy
        self.drop_cls = strategy == "default"
        self.num_image_tokens = self.num_patches + \
            (0 if self.drop_cls else 1)

        # decoder backbone from the registry (via text_config)
        from vllm_main_modify_tpu.models.registry import \
            resolve_model_cls

        text_archs = getattr(hf.text_config, "architectures",
                             None) or ["LlamaForCausalLM"]
        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = text_archs[0]
        self.language_model = resolve_model_cls(text_archs[0])(
            text_cfg)
        self.text_cfg = text_cfg
        self.tie_embeddings = text_cfg.tie_word_embeddings

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        D, I, L = self.v_hidden, self.v_inter, self.v_layers
        H = self.cfg.hidden_size
        t = transpose2d

        def vstk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(
                f"vision.layers.{path}", (L, *shape), spec,
                VISION_PREFIX + "encoder.layers.{i}." + hf_key,
                stacked=True, transform=transform)

        specs = [
            ParamSpec("vision.class_embedding", (D, ), P(),
                      VISION_PREFIX + "embeddings.class_embedding",
                      transform=None),
            # conv [D, 3, p, p] kept in torch OIHW layout
            ParamSpec("vision.patch_embedding",
                      (D, 3, self.patch, self.patch),
                      P(None, None, None, None),
                      VISION_PREFIX + "embeddings.patch_embedding"
                      ".weight", transform=None),
            ParamSpec("vision.position_embedding",
                      (self.num_patches + 1, D), P(None, None),
                      VISION_PREFIX + "embeddings.position_embedding"
                      ".weight", transform=None),
            ParamSpec("vision.pre_norm", (D, ), P(),
                      VISION_PREFIX + "pre_layrnorm.weight",
                      transform=None),
            ParamSpec("vision.pre_norm_bias", (D, ), P(),
                      VISION_PREFIX + "pre_layrnorm.bias",
                      transform=None),
            ParamSpec("projector.linear_1", (D, H),
                      P(None, None, ),
                      PROJ_PREFIX + "linear_1.weight", transform=t),
            ParamSpec("projector.linear_1_bias", (H, ), P(),
                      PROJ_PREFIX + "linear_1.bias", transform=None),
            ParamSpec("projector.linear_2", (H, H), P(None, None),
                      PROJ_PREFIX + "linear_2.weight", transform=t),
            ParamSpec("projector.linear_2_bias", (H, ), P(),
                      PROJ_PREFIX + "linear_2.bias", transform=None),
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
        # decoder specs: pytree under "language_model.", HF keys
        # under "language_model." (serialized layout keeps the
        # backbone's own "model."/"lm_head" nesting)
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.language_model.kv_cache_spec()

    def __getattr__(self, name):
        # delegate optional decoder capabilities (hybrid KV groups —
        # MiniMax-VL's lightning-attention states — etc.) so composite
        # wrappers inherit whatever the inner decoder declares
        if name in ("kv_cache_groups", ):
            return getattr(self.language_model, name)
        raise AttributeError(name)

    # ------------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] f32 → [N, num_image_tokens, text_H] projected
        features (reference: vllm clip.py + llava.py
        _process_image_input)."""
        return self._project(params,
                             self._clip_features(params, pixel_values))

    def _project(self, params, x: jax.Array) -> jax.Array:
        p = params["projector"]
        x = jax.nn.gelu(x @ p["linear_1"] + p["linear_1_bias"],
                        approximate=False)
        return x @ p["linear_2"] + p["linear_2_bias"]

    def _clip_features(self, params, pixel_values: jax.Array
                       ) -> jax.Array:
        """CLIP tower up to the feature-select layer, CLS dropped per
        strategy — pre-projector features [N, P(+1), D]."""
        v = params["vision"]
        n = pixel_values.shape[0]
        x = jax.lax.conv_general_dilated(
            pixel_values.astype(jnp.float32),
            v["patch_embedding"].astype(jnp.float32),
            window_strides=(self.patch, self.patch), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x.reshape(n, self.v_hidden, self.num_patches)
        x = jnp.transpose(x, (0, 2, 1))  # [N, P, D]
        cls = jnp.broadcast_to(
            v["class_embedding"].astype(jnp.float32)[None, None, :],
            (n, 1, self.v_hidden))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + v["position_embedding"].astype(jnp.float32)[None]
        x = layer_norm(x, v["pre_norm"], v["pre_norm_bias"],
                       self.v_eps)

        layers = v["layers"]

        def layer_fn(l, x):
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = layer_norm(x, w["layer_norm1"], w["layer_norm1_bias"],
                           self.v_eps)
            t = h.shape[1]
            q = (h @ w["q_proj"] + w["q_proj_bias"]).reshape(
                n, t, self.v_heads, self.v_head_dim)
            k = (h @ w["k_proj"] + w["k_proj_bias"]).reshape(
                n, t, self.v_heads, self.v_head_dim)
            val = (h @ w["v_proj"] + w["v_proj_bias"]).reshape(
                n, t, self.v_heads, self.v_head_dim)
            scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_head_dim**-0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", probs, val)
            x = res + (o.reshape(n, t, -1) @ w["out_proj"] +
                       w["out_proj_bias"])
            res = x
            h = layer_norm(x, w["layer_norm2"], w["layer_norm2_bias"],
                           self.v_eps)
            h = quick_gelu(h @ w["fc1"] + w["fc1_bias"])
            return res + (h @ w["fc2"] + w["fc2_bias"])

        x = jax.lax.fori_loop(0, self.n_encoder_layers, layer_fn, x)
        if self.drop_cls:
            x = x[:, 1:]
        return x  # [N, tokens, D] f32

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None):
        lm_params = params["language_model"]
        x = jnp.take(lm_params["embed_tokens"], input_ids, axis=0)
        if mm_embeds is not None:
            # merge image features at placeholder rows (-1 = pad,
            # dropped by scatter mode="drop")
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds.astype(x.dtype), mode="drop")
        return self.language_model(lm_params, input_ids, positions,
                                   kv_caches, attn_meta,
                                   use_pallas=use_pallas,
                                   inputs_embeds=x)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(
            params["language_model"], hidden)


def select_best_resolution(orig_size: tuple,
                           pinpoints: list) -> tuple:
    """HF select_best_resolution (image_processing_llava_next):
    maximize effective resolution, tie-break on minimal waste."""
    oh, ow = orig_size
    best, best_eff, best_waste = None, -1, float("inf")
    for ph, pw in pinpoints:
        scale = min(pw / ow, ph / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = pw * ph - eff
        if eff > best_eff or (eff == best_eff
                              and waste < best_waste):
            best, best_eff, best_waste = (ph, pw), eff, waste
    return best


class LlavaNextForConditionalGeneration(LlavaForConditionalGeneration):
    """LLaVA-NeXT / 1.6 (reference: vllm llava_next.py): anyres —
    the base image plus a grid of high-res tiles through the SAME
    CLIP tower, packed spatially with an image_newline column.

    TPU-native simplification: the processor SQUASH-resizes to the
    selected grid pinpoint (no aspect padding), so the HF unpad step
    is the identity and every pinpoint compiles to ONE static encode
    shape. Token count per image = 576 + grid_h*24*(grid_w*24+1),
    static per pinpoint."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.pinpoints = [tuple(p) for p in getattr(
            hf, "image_grid_pinpoints", [[336, 672], [672, 336],
                                         [672, 672], [1008, 336],
                                         [336, 1008]])]

    def param_specs(self) -> list[ParamSpec]:
        specs = super().param_specs()
        specs.append(
            ParamSpec("image_newline", (self.cfg.hidden_size, ), P(),
                      "image_newline", transform=None))
        return specs

    def tokens_for_grid(self, ph: int, pw: int) -> int:
        g = self.grid
        base = self.num_patches + (0 if self.drop_cls else 1)
        return base + ph * g * (pw * g + 1)

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[1, 1+T, 3, S, S] (base + row-major tiles of ONE image) →
        [1, tokens, text_H] packed features."""
        if pixel_values.ndim == 5:
            pixel_values = pixel_values[0]
        n_tiles = pixel_values.shape[0] - 1
        # static grid from the tile count: find the pinpoint with
        # this many tiles (processor guarantees uniqueness per call)
        s = self.image_size
        grids = [(ph // s, pw // s) for ph, pw in self.pinpoints
                 if (ph // s) * (pw // s) == n_tiles]
        assert grids, f"no pinpoint with {n_tiles} tiles"
        ph, pw = grids[0]
        feats = super().encode_images(params, pixel_values)
        # [1+T, per_tile, H]
        base = feats[0]
        g, h = self.grid, feats.shape[-1]
        spatial = feats[1:].reshape(ph, pw, g, g, h)
        spatial = jnp.transpose(spatial, (0, 2, 1, 3, 4)).reshape(
            ph * g, pw * g, h)
        newline = jnp.broadcast_to(
            params["image_newline"].astype(feats.dtype)[None, None],
            (ph * g, 1, h))
        spatial = jnp.concatenate([spatial, newline],
                                  axis=1).reshape(-1, h)
        return jnp.concatenate([base, spatial], axis=0)[None]


class LlavaNextVideoForConditionalGeneration(
        LlavaNextForConditionalGeneration):
    """LLaVA-NeXT-Video (reference: vllm llava_next_video.py /
    HF modeling_llava_next_video.py). Images take the anyres path
    (inherited); videos run every frame through the SAME CLIP tower,
    spatially pool the per-frame grid by ``spatial_pool_stride``
    (LlavaNextVideoPooler), project, and concatenate frames — token
    count = frames * (grid // stride)**2."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.pool_mode = getattr(hf, "spatial_pool_mode", "average")
        assert self.pool_mode in ("average", "max"), self.pool_mode
        self.pool_stride = getattr(hf, "spatial_pool_stride", 2)
        self.video_token_index = getattr(hf, "video_token_index",
                                         None)
        g = self.grid // self.pool_stride
        self.video_tokens_per_frame = g * g

    def encode_video(self, params, pixel_values: jax.Array
                     ) -> jax.Array:
        """[1, F, 3, S, S] (or [F, 3, S, S]) → [1, F*t, text_H]."""
        if pixel_values.ndim == 5:
            pixel_values = pixel_values[0]
        f = pixel_values.shape[0]
        x = self._clip_features(params, pixel_values)  # [F, P, D]
        g, s, d = self.grid, self.pool_stride, x.shape[-1]
        x = x.reshape(f, g // s, s, g // s, s, d)
        if self.pool_mode == "average":
            x = x.mean(axis=(2, 4))
        else:
            x = x.max(axis=(2, 4))
        x = x.reshape(f, (g // s) * (g // s), d)
        x = self._project(params, x)
        return x.reshape(1, -1, x.shape[-1])
