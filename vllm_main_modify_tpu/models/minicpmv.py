"""MiniCPM-V (2.6 / 4.0 family): SigLIP-navit tower + perceiver
resampler over a Qwen2/Llama decoder.

Reference parity: vllm/model_executor/models/minicpmv.py (MiniCPMV2_6:
Idefics2VisionTransformer + Resampler2_5 + Qwen2ForCausalLM;
layers/resampler.py holds the shared perceiver math). Remote-code
checkpoint layout: ``vpm.*`` (idefics2-vision = SigLIP blocks with
biased projections), ``resampler.*`` (learned queries, kv_proj,
nn.MultiheadAttention packed in_proj, ln_q/ln_kv/ln_post, proj),
``llm.model.*`` / ``llm.lm_head``.

The resampler cross-attends ``query_num`` learned queries against the
patch features plus a 2-D sincos position embedding (version-(2,5)
layout: first half encodes the COLUMN coordinate, second half the
row — the reference's meshgrid puts w first). One canonical square
slice per image (the repo-wide VLM simplification); tokens per image
= query_num.
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
from vllm_main_modify_tpu.models.gemma3_mm import (siglip_encode,
                                                   siglip_specs)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.registry import resolve_model_cls


def _sincos_2d(h: int, w: int, dim: int) -> np.ndarray:
    """Version-(2,5) 2-D sincos table [h, w, dim]."""
    omega = 1.0 / 10000**(np.arange(dim // 4, dtype=np.float32) /
                          (dim // 4))
    col = np.einsum("w,d->wd", np.arange(w, dtype=np.float32), omega)
    row = np.einsum("h,d->hd", np.arange(h, dtype=np.float32), omega)
    col2 = np.concatenate([np.sin(col), np.cos(col)], axis=-1)
    row2 = np.concatenate([np.sin(row), np.cos(row)], axis=-1)
    out = np.concatenate([
        np.broadcast_to(col2[None, :, :], (h, w, dim // 2)),
        np.broadcast_to(row2[:, None, :], (h, w, dim // 2)),
    ], axis=-1)
    return out.astype(np.float32)


class MiniCPMV:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        if isinstance(vc, dict):
            from types import SimpleNamespace
            vc = SimpleNamespace(**vc)
        self.vc = vc
        self.v_hidden = vc.hidden_size
        self.v_heads = vc.num_attention_heads
        self.v_head_dim = self.v_hidden // self.v_heads
        self.v_layers = vc.num_hidden_layers
        self.drop_last = bool(getattr(hf, "drop_vision_last_layer",
                                      False))
        self.patch = vc.patch_size
        self.image_size = int(config.mm_image_size or vc.image_size)
        self.grid = self.image_size // self.patch
        self.num_patches = self.grid * self.grid
        self.v_eps = getattr(vc, "layer_norm_eps", 1e-6)
        self.query_num = int(getattr(hf, "query_num", 64))

        # version routes the decoder family (2.6 → Qwen2 with
        # unconditional qkv biases; 2.5/4.0 → Llama graph)
        ver = str(getattr(hf, "version", "2.6"))
        self.version = tuple(int(x) for x in ver.split("."))
        text_cfg = replace(config, is_multimodal=False)
        if self.version >= (2, 6) and self.version < (4, 0):
            text_cfg.attention_bias = True
        text_cfg.architecture = "LlamaForCausalLM"
        self.language_model = resolve_model_cls("LlamaForCausalLM")(
            text_cfg)

    def param_specs(self) -> list[ParamSpec]:
        H = self.cfg.hidden_size
        D = self.v_hidden
        t = transpose2d
        specs = siglip_specs(D, self.vc.intermediate_size,
                             self.v_layers, self.patch,
                             self.num_patches, prefix="vpm.")
        rs = "resampler."
        specs += [
            ParamSpec("resampler.query", (self.query_num, H),
                      P(None, None), rs + "query", transform=None),
            ParamSpec("resampler.kv_proj", (D, H), P(None, None),
                      rs + "kv_proj.weight", transform=t),
            ParamSpec("resampler.in_proj", (3 * H, H), P(None, None),
                      rs + "attn.in_proj_weight", transform=None),
            ParamSpec("resampler.in_proj_bias", (3 * H, ), P(),
                      rs + "attn.in_proj_bias", transform=None),
            ParamSpec("resampler.out_proj", (H, H), P(None, None),
                      rs + "attn.out_proj.weight", transform=t),
            ParamSpec("resampler.out_proj_bias", (H, ), P(),
                      rs + "attn.out_proj.bias", transform=None),
            ParamSpec("resampler.proj", (H, H), P(None, None),
                      rs + "proj", transform=None),
        ]
        for ln in ("ln_q", "ln_kv", "ln_post"):
            specs += [
                ParamSpec(f"resampler.{ln}", (H, ), P(),
                          rs + f"{ln}.weight", transform=None),
                ParamSpec(f"resampler.{ln}_bias", (H, ), P(),
                          rs + f"{ln}.bias", transform=None),
            ]
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "llm." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self):
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N, query_num, H]."""
        if pixel_values.ndim == 3:
            pixel_values = pixel_values[None]
        n = pixel_values.shape[0]
        run = self.v_layers - (1 if self.drop_last else 0)
        feats = siglip_encode(params["vision"], pixel_values,
                              patch=self.patch,
                              num_patches=self.num_patches,
                              v_hidden=self.v_hidden,
                              v_heads=self.v_heads,
                              v_head_dim=self.v_head_dim,
                              v_layers=run, eps=self.v_eps,
                              post_norm=True)  # [N, P, D]
        r = params["resampler"]
        H = self.cfg.hidden_size
        nh = max(1, H // 128)
        dh = H // nh
        eps = 1e-6
        q = layer_norm(r["query"], r["ln_q"], r["ln_q_bias"], eps)
        kv = layer_norm(feats @ r["kv_proj"], r["ln_kv"],
                        r["ln_kv_bias"], eps)  # [N, P, H]
        pos = jnp.asarray(
            _sincos_2d(self.grid, self.grid, H).reshape(-1, H))
        wq, wk, wv = (r["in_proj"][:H], r["in_proj"][H:2 * H],
                      r["in_proj"][2 * H:])
        bq, bk, bv = (r["in_proj_bias"][:H],
                      r["in_proj_bias"][H:2 * H],
                      r["in_proj_bias"][2 * H:])
        qh = (q @ wq.T + bq).reshape(self.query_num, nh, dh)
        kh = ((kv + pos[None].astype(kv.dtype)) @ wk.T +
              bk).reshape(n, -1, nh, dh)
        vh = (kv @ wv.T + bv).reshape(n, -1, nh, dh)
        s = jnp.einsum("qhd,nkhd->nhqk", qh, kh) * (dh**-0.5)
        p = jax.nn.softmax(s.astype(jnp.float32),
                           axis=-1).astype(kv.dtype)
        o = jnp.einsum("nhqk,nkhd->nqhd", p, vh).reshape(
            n, self.query_num, H)
        o = o @ r["out_proj"] + r["out_proj_bias"]
        o = layer_norm(o, r["ln_post"], r["ln_post_bias"], eps)
        return o @ r["proj"]

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
