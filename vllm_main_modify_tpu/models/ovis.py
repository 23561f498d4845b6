"""Ovis2 (Ovis2ForConditionalGeneration).

Reference: vllm/model_executor/models/ovis.py / ovis2_5.py — the Ovis
"structural embedding" design: an RMS-norm ViT (bias-free attention,
SwiGLU ffn) produces patch features, a 2x2 hidden-stride merge + head
projects them to a VISUAL VOCABULARY distribution (softmax), and the
soft token = probabilities @ visual_embeddings_table. Visual
indicator tokens (<img>/<\\img>/... ids) embed from the table's last
rows instead of the text embedding.

TPU design: tower + probabilistic tokenization run in the jitted
image encoder at the canonical resolution; soft tokens ride the mm
scatter path; the decoder is the registry's Qwen2 (llama family).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.normalization import (layer_norm,
                                                       rms_norm)
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d

VP = "model.vision_tower.transformer."


class Ovis2ForConditionalGeneration:

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
        self.v_eps = getattr(vc, "rms_norm_eps", 1e-5)
        self.stride = int(getattr(vc, "hidden_stride", 1))
        self.n_ind = int(getattr(vc, "num_visual_indicator_tokens", 5))
        self.v_vocab = int(vc.vocab_size)
        self.indicator_ids = tuple(
            getattr(hf, "visual_indicator_token_ids", ()) or ())
        assert self.grid % self.stride == 0
        self.num_image_tokens = (self.grid // self.stride)**2

        from vllm_main_modify_tpu.models.registry import \
            resolve_model_cls

        text_archs = getattr(hf.text_config, "architectures",
                             None) or ["Qwen2ForCausalLM"]
        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = text_archs[0]
        self.language_model = resolve_model_cls(text_archs[0])(
            text_cfg)
        self.text_cfg = text_cfg

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        D, I, L = self.v_hidden, self.v_inter, self.v_layers
        H = getattr(self.text_cfg.hf_config, "hidden_size", 0)
        t = transpose2d
        head_in = D * self.stride**2
        head_out = self.v_vocab - self.n_ind

        def vstk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"vision.layers.{path}", (L, *shape),
                             spec, VP + "encoder.layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        specs = [
            ParamSpec("vision.patch_embedding",
                      (D, 3, self.patch, self.patch),
                      P(None, None, None, None),
                      VP + "embeddings.patch_embedding.weight",
                      transform=None),
            ParamSpec("vision.patch_bias", (D, ), P(),
                      VP + "embeddings.patch_embedding.bias",
                      transform=None),
            ParamSpec("vision.embed_norm", (D, ), P(),
                      VP + "embeddings.rms_norm.weight",
                      transform=None),
            ParamSpec("vision.position_embedding",
                      (self.num_patches, D), P(None, None),
                      VP + "embeddings.position_embedding.weight",
                      transform=None),
            ParamSpec("vision.final_norm", (D, ), P(),
                      VP + "rms_norm.weight", transform=None),
            ParamSpec("vision.head_linear", (head_in, head_out),
                      P(None, None),
                      "model.vision_tower.head_linear.weight",
                      transform=t),
            ParamSpec("vision.head_norm", (head_out, ), P(),
                      "model.vision_tower.head_norm.weight",
                      transform=None),
            ParamSpec("vision.head_norm_bias", (head_out, ), P(),
                      "model.vision_tower.head_norm.bias",
                      transform=None),
            ParamSpec("vte", (self.v_vocab, H), P(None, None),
                      "model.visual_embeddings_table.weight",
                      transform=None),
        ]
        for n in ("rms_norm1", "rms_norm2"):
            specs.append(vstk(n, (D, ), P(None, None), f"{n}.weight",
                              transform=None))
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            specs.append(vstk(n, (D, D), P(None, None, None),
                              f"attention.{n}.weight"))
        specs += [
            vstk("gate_proj", (D, I), P(None, None, None),
                 "ffn.gate_proj.weight"),
            vstk("up_proj", (D, I), P(None, None, None),
                 "ffn.up_proj.weight"),
            vstk("down_proj", (I, D), P(None, None, None),
                 "ffn.down_proj.weight"),
        ]
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            if not s.hf_key.startswith("lm_head"):
                s.hf_key = s.hf_key.replace(
                    "model.", "model.language_model.", 1)
            specs.append(s)
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N, tokens, H] soft visual tokens."""
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
        x = rms_norm(x, v["embed_norm"], self.v_eps)
        x = x + v["position_embedding"].astype(jnp.float32)[None]
        layers = v["layers"]

        def layer_fn(l, x):
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            h = rms_norm(x, w["rms_norm1"], self.v_eps)
            t = h.shape[1]
            q = (h @ w["q_proj"]).reshape(n, t, self.v_heads,
                                          self.v_head_dim)
            k = (h @ w["k_proj"]).reshape(n, t, self.v_heads,
                                          self.v_head_dim)
            val = (h @ w["v_proj"]).reshape(n, t, self.v_heads,
                                            self.v_head_dim)
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_head_dim**-0.5)
            p_ = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", p_, val)
            x = x + o.reshape(n, t, -1) @ w["out_proj"]
            h = rms_norm(x, w["rms_norm2"], self.v_eps)
            h = jax.nn.silu(h @ w["gate_proj"]) * (h @ w["up_proj"])
            return x + h @ w["down_proj"]

        x = jax.lax.fori_loop(0, self.v_layers, layer_fn, x)
        x = rms_norm(x, v["final_norm"], self.v_eps)
        # hidden-stride 2x2 merge (row-major within each cell)
        hs, g = self.stride, self.grid
        x = x.reshape(n, g // hs, hs, g // hs, hs, self.v_hidden)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            n, (g // hs)**2, hs * hs * self.v_hidden)
        logits = x @ v["head_linear"]
        logits = layer_norm(logits, v["head_norm"],
                            v["head_norm_bias"], 1e-5)
        probs = jax.nn.softmax(logits, axis=-1)
        probs = jnp.pad(probs, ((0, 0), (0, 0), (0, self.n_ind)))
        return probs @ params["vte"].astype(jnp.float32)

    # ------------------------------------------------------------------

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
            # visual indicator ids embed from the table's last rows
            vte = params["vte"].astype(x.dtype)
            base = self.v_vocab - self.n_ind
            for i, tok in enumerate(self.indicator_ids):
                x = jnp.where((input_ids == tok)[:, None],
                              vte[base + i][None, :], x)
        return self.language_model(lm_params, input_ids, positions,
                                   kv_caches, attn_meta,
                                   use_pallas=use_pallas,
                                   inputs_embeds=x)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(
            params["language_model"], hidden)
