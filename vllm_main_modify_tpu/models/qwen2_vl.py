"""Qwen2-VL / Qwen2.5-VL: mrope decoder + dynamic-grid ViT.

Reference parity: vllm/model_executor/models/qwen2_vl.py +
qwen2_5_vl.py (+ rotary_embedding/mrope.py). TPU-native choices:

- the decoder is the Llama/Qwen2 graph with MROPE: positions are
  [3, T] (temporal/height/width streams); frequency dim i takes its
  angle from the stream named by ``mrope_section`` — text tokens carry
  identical t/h/w so mrope degenerates to rope for them. The host
  computes each request's 3-D positions once at ingest
  (``compute_mrope_positions``, mirroring HF get_rope_index) plus the
  scalar decode delta.
- the ViT runs at a CANONICAL square resolution (images are resized by
  the processor), so every image compiles to ONE static program —
  dynamic per-image grids would retrace XLA per shape. Patchify is
  done in-model from [N, 3, S, S] pixels reproducing the HF
  merge-group raster; 2-D rotary over (h, w) patch ids; full attention
  per image (Qwen2-VL) or windowed with full-attention exception
  blocks (Qwen2.5-VL, handled by a static window permutation).
- the 2x2 PatchMerger output feeds the shared mm_buffer/mm_scatter
  merge path (same as LLaVA).
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
from vllm_main_modify_tpu.layers.normalization import (layer_norm,
                                                       rms_norm)
from vllm_main_modify_tpu.layers.rotary import apply_mrope
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.llama import LlamaForCausalLM


def compute_mrope_positions(token_ids, image_token: int,
                            grids: list, merge: int
                            ) -> tuple[np.ndarray, int]:
    """HF Qwen2VLModel.get_rope_index for one request (images only).

    ``grids``: per-image (t, h, w) in PATCHES. Returns
    (positions [3, len] int32, mrope_delta)."""
    n = len(token_ids)
    pos = np.zeros((3, n), dtype=np.int32)
    ids = np.asarray(token_ids)
    img_starts = np.flatnonzero(ids == image_token)
    # contiguous placeholder runs, one per image
    runs = []
    if len(img_starts):
        run_start = img_starts[0]
        prev = img_starts[0]
        for i in img_starts[1:]:
            if i != prev + 1:
                runs.append((run_start, prev + 1))
                run_start = i
            prev = i
        runs.append((run_start, prev + 1))
    st = 0
    st_idx = 0
    for (rs, re), (t, h, w) in zip(runs, grids):
        text_len = rs - st
        if text_len:
            pos[:, st:rs] = st_idx + np.arange(text_len)
        st_idx += text_len
        gh, gw = h // merge, w // merge
        t_idx = np.repeat(np.arange(t), gh * gw)
        h_idx = np.tile(np.repeat(np.arange(gh), gw), t)
        w_idx = np.tile(np.tile(np.arange(gw), gh), t)
        pos[0, rs:re] = st_idx + t_idx
        pos[1, rs:re] = st_idx + h_idx
        pos[2, rs:re] = st_idx + w_idx
        st_idx += max(t, gh, gw)
        st = re
    if st < n:
        pos[:, st:] = st_idx + np.arange(n - st)
        st_idx += n - st
    delta = int(st_idx - n)
    return pos, delta


def _vit_qkv(h, w):
    """Fused qkv (Qwen2-VL) or separate q/k/v stitched at trace time
    (Qwen2.5-Omni stores them unfused)."""
    if "qkv" in w:
        return h @ w["qkv"] + w["qkv_bias"]
    return jnp.concatenate(
        [h @ w[f"qkv_{n}"] + w[f"qkv_{n}_bias"]
         for n in ("q", "k", "v")], axis=-1)


class Qwen2VLTextModel(LlamaForCausalLM):
    """Qwen2 graph + mrope (positions arrive as [3, T])."""

    uses_mrope = True

    def __init__(self, config: ModelConfig):
        config.attention_bias = True
        super().__init__(config)
        rs = config.rope_scaling or {}
        self.mrope_section = tuple(
            rs.get("mrope_section") or
            (self.head_dim // 6, ) * 3)

    def _apply_rope(self, q, k, positions):
        if positions.ndim == 1:  # text-only fallback
            positions = jnp.broadcast_to(positions[None],
                                         (3, positions.shape[0]))
        return apply_mrope(q, k, positions, self.inv_freq,
                           self.mrope_section)


class Qwen2VLForConditionalGeneration:
    """Vision tower + merger + mrope decoder."""

    is_qwen2_5 = False
    uses_mrope = True
    # hub-serialized layout: HF save_pretrained maps the in-memory
    # "model.visual."/"model.language_model." names back to the
    # legacy "visual."/"model." checkpoint keys
    VISION_PREFIX = "visual."

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        self.merge = getattr(vc, "spatial_merge_size", 2)
        self.patch = getattr(vc, "patch_size", 14)
        self.tp = getattr(vc, "temporal_patch_size", 2)
        self.v_hidden = getattr(vc, "embed_dim", None) or \
            vc.hidden_size  # Qwen2.5 names it hidden_size
        self.v_layers = getattr(vc, "depth", 32)
        self.v_heads = vc.num_heads
        self.v_head_dim = self.v_hidden // self.v_heads
        if self.is_qwen2_5:
            self.v_inter = vc.intermediate_size
            self.out_hidden = getattr(vc, "out_hidden_size",
                                      config.hidden_size)
            self.window = getattr(vc, "window_size", 112)
            self.fullatt_blocks = set(
                getattr(vc, "fullatt_block_indexes", ()))
        else:
            self.v_inter = int(self.v_hidden *
                               getattr(vc, "mlp_ratio", 4))
            self.out_hidden = getattr(vc, "hidden_size",
                                      config.hidden_size)
        # canonical square input in pixels (static ViT shapes); the
        # processor resizes to this. Grid must divide by merge (and by
        # the 2.5 window in merged patches).
        self.image_size = int(config.mm_image_size or 448)
        self.grid = self.image_size // self.patch
        assert self.grid % self.merge == 0
        self.num_image_tokens = (self.grid // self.merge)**2

        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = "Qwen2VLTextModel"
        self.language_model = Qwen2VLTextModel(text_cfg)
        self.tie_embeddings = text_cfg.tie_word_embeddings

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        D, I, L = self.v_hidden, self.v_inter, self.v_layers
        m2 = self.merge**2
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
            vstk("qkv", (D, 3 * D), P(None, None, "model"),
                 "attn.qkv.weight"),
            vstk("qkv_bias", (3 * D, ), P(None, "model"),
                 "attn.qkv.bias", transform=None),
            vstk("proj", (D, D), P(None, "model", None),
                 "attn.proj.weight"),
            vstk("proj_bias", (D, ), P(None, None), "attn.proj.bias",
                 transform=None),
        ]
        if self.is_qwen2_5:
            specs += [
                vstk("norm1", (D, ), P(None, None), "norm1.weight",
                     transform=None),
                vstk("norm2", (D, ), P(None, None), "norm2.weight",
                     transform=None),
                vstk("gate_proj", (D, I), P(None, None, "model"),
                     "mlp.gate_proj.weight"),
                vstk("up_proj", (D, I), P(None, None, "model"),
                     "mlp.up_proj.weight"),
                vstk("down_proj", (I, D), P(None, "model", None),
                     "mlp.down_proj.weight"),
                vstk("gate_bias", (I, ), P(None, "model"),
                     "mlp.gate_proj.bias", transform=None),
                vstk("up_bias", (I, ), P(None, "model"),
                     "mlp.up_proj.bias", transform=None),
                vstk("down_bias", (D, ), P(None, None),
                     "mlp.down_proj.bias", transform=None),
                ParamSpec("merger.ln_q", (D, ), P(),
                          VP + "merger.ln_q.weight", transform=None),
            ]
        else:
            for n in ("norm1", "norm2"):
                specs += [
                    vstk(n, (D, ), P(None, None), f"{n}.weight",
                         transform=None),
                    vstk(f"{n}_bias", (D, ), P(None, None),
                         f"{n}.bias", transform=None),
                ]
            specs += [
                vstk("fc1", (D, I), P(None, None, "model"),
                     "mlp.fc1.weight"),
                vstk("fc1_bias", (I, ), P(None, "model"),
                     "mlp.fc1.bias", transform=None),
                vstk("fc2", (I, D), P(None, "model", None),
                     "mlp.fc2.weight"),
                vstk("fc2_bias", (D, ), P(None, None), "mlp.fc2.bias",
                     transform=None),
                ParamSpec("merger.ln_q", (D, ), P(),
                          VP + "merger.ln_q.weight", transform=None),
                ParamSpec("merger.ln_q_bias", (D, ), P(),
                          VP + "merger.ln_q.bias", transform=None),
            ]
        specs += [
            ParamSpec("merger.mlp0", (m2 * D, m2 * D), P(None, None),
                      VP + "merger.mlp.0.weight", transform=t),
            ParamSpec("merger.mlp0_bias", (m2 * D, ), P(),
                      VP + "merger.mlp.0.bias", transform=None),
            ParamSpec("merger.mlp2", (m2 * D, self.out_hidden),
                      P(None, None), VP + "merger.mlp.2.weight",
                      transform=t),
            ParamSpec("merger.mlp2_bias", (self.out_hidden, ), P(),
                      VP + "merger.mlp.2.bias", transform=None),
        ]
        for s in self.language_model.param_specs():
            # LM checkpoint keys keep the plain "model."/"lm_head"
            # layout (hub serialization)
            s.path = "language_model." + s.path
            specs.append(s)
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def _patchify(self, pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] → [N * grid², 3*tp*p*p] in the HF merge-group
        raster (Qwen2VLImageProcessor patch order)."""
        n = pixel_values.shape[0]
        g, m, p = self.grid, self.merge, self.patch
        x = jnp.broadcast_to(pixel_values[:, None],
                             (n, self.tp, 3, g * p, g * p))
        x = x.reshape(n, self.tp, 3, g // m, m, p, g // m, m, p)
        # → [n, gh/m, gw/m, m, m, C, tp, p, p]
        x = jnp.transpose(x, (0, 3, 6, 4, 7, 2, 1, 5, 8))
        return x.reshape(n * g * g, 3 * self.tp * p * p)

    def _vit_pos_ids(self) -> tuple[np.ndarray, np.ndarray]:
        """(hpos, wpos) [grid²] in merge-group raster."""
        g, m = self.grid, self.merge
        hh = np.arange(g)[:, None] * np.ones(g, np.int32)[None]
        ww = np.ones(g, np.int32)[:, None] * np.arange(g)[None]

        def reorder(a):
            return a.reshape(g // m, m, g // m,
                             m).transpose(0, 2, 1, 3).reshape(-1)

        return reorder(hh), reorder(ww)

    def _window_perm(self) -> tuple[np.ndarray, np.ndarray, int]:
        """Qwen2.5: permutation gathering patches into window order
        (+ inverse), and patches per window. Canonical square grids
        divide evenly, so no padding windows."""
        g, m = self.grid, self.merge
        win_m = self.window // self.patch // m  # merged pats per side
        gm = g // m
        assert gm % win_m == 0, (
            f"grid {gm} (merged) must tile {win_m}-wide windows; "
            "pick mm_image_size accordingly")
        idx = np.arange(gm * gm).reshape(gm, gm)
        idx = idx.reshape(gm // win_m, win_m, gm // win_m, win_m)
        idx = idx.transpose(0, 2, 1, 3).reshape(-1)  # merged order
        # expand merged index -> m*m patch indices (merge-group raster
        # stores each merged cell's m² patches contiguously)
        patch_idx = (idx[:, None] * (m * m) +
                     np.arange(m * m)[None]).reshape(-1)
        inv = np.empty_like(patch_idx)
        inv[patch_idx] = np.arange(patch_idx.size)
        return patch_idx, inv, (win_m * win_m * m * m)

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] f32 → [N, num_image_tokens, out_hidden]."""
        v = params["vision"]
        n = pixel_values.shape[0]
        flat = self._patchify(pixel_values.astype(jnp.float32))
        x = flat @ v["patch_embed"].astype(jnp.float32)
        x = x.reshape(n, self.grid * self.grid, self.v_hidden)

        hpos, wpos = self._vit_pos_ids()
        half = self.v_head_dim // 4
        inv_freq = 1.0 / (10000.0**(
            np.arange(0, self.v_head_dim // 2, 2, dtype=np.float64) /
            (self.v_head_dim // 2)))
        angles = np.concatenate([
            hpos[:, None] * inv_freq[None, :half],
            wpos[:, None] * inv_freq[None, :half],
        ], axis=-1)  # [P, head_dim/2]
        if self.is_qwen2_5:
            perm, inv_perm, win_len = self._window_perm()
            angles_w = angles[perm]
        cos_full = jnp.asarray(np.cos(angles),
                               jnp.float32)[None, :, None, :]
        sin_full = jnp.asarray(np.sin(angles),
                               jnp.float32)[None, :, None, :]
        if self.is_qwen2_5:
            cos_win = jnp.asarray(np.cos(angles_w),
                                  jnp.float32)[None, :, None, :]
            sin_win = jnp.asarray(np.sin(angles_w),
                                  jnp.float32)[None, :, None, :]

        layers = v["layers"]

        def layer_fn(l, x):
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            if self.is_qwen2_5:
                # all blocks run in WINDOW order; full-attn blocks
                # attend across everything (order-invariant), window
                # blocks attend within their window only
                h = rms_norm(x, w["norm1"], 1e-6)
                full = jnp.isin(
                    l, jnp.asarray(sorted(self.fullatt_blocks),
                                   jnp.int32)) if self.fullatt_blocks \
                    else jnp.asarray(False)

                def do_attn(windowed):
                    def f(h):
                        t_ = h.shape[1]
                        qkv = _vit_qkv(h, w)
                        q, k, val = jnp.split(qkv, 3, axis=-1)

                        def rs(z, grp):
                            return z.reshape(grp, -1, self.v_heads,
                                             self.v_head_dim)

                        def rot(z):
                            d2 = z.shape[-1] // 2
                            z1, z2 = z[..., :d2], z[..., d2:]
                            return jnp.concatenate(
                                [z1 * cos_win - z2 * sin_win,
                                 z2 * cos_win + z1 * sin_win],
                                axis=-1)

                        q = rot(rs(q, n).reshape(
                            n, t_, self.v_heads, self.v_head_dim))
                        k = rot(rs(k, n).reshape(
                            n, t_, self.v_heads, self.v_head_dim))
                        val = rs(val, n).reshape(
                            n, t_, self.v_heads, self.v_head_dim)
                        if windowed:
                            grp = n * (t_ // win_len)
                            q = q.reshape(grp, win_len, self.v_heads,
                                          self.v_head_dim)
                            k = k.reshape(grp, win_len, self.v_heads,
                                          self.v_head_dim)
                            val = val.reshape(grp, win_len,
                                              self.v_heads,
                                              self.v_head_dim)
                        s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                            (self.v_head_dim**-0.5)
                        p_ = jax.nn.softmax(s, axis=-1)
                        o = jnp.einsum("nhqk,nkhd->nqhd", p_, val)
                        return o.reshape(n, t_, -1)

                    return f

                o = jax.lax.cond(full, do_attn(False), do_attn(True),
                                 h)
                x = x + (o @ w["proj"] + w["proj_bias"])
                h = rms_norm(x, w["norm2"], 1e-6)
                h2 = jax.nn.silu(h @ w["gate_proj"] + w["gate_bias"]
                                 ) * (h @ w["up_proj"] + w["up_bias"])
                return x + (h2 @ w["down_proj"] + w["down_bias"])
            h = layer_norm(x, w["norm1"], w["norm1_bias"], 1e-6)
            t_ = h.shape[1]
            qkv = _vit_qkv(h, w)
            q, k, val = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(n, t_, self.v_heads, self.v_head_dim)
            k = k.reshape(n, t_, self.v_heads, self.v_head_dim)
            val = val.reshape(n, t_, self.v_heads, self.v_head_dim)

            def rot(z):
                d2 = z.shape[-1] // 2
                z1, z2 = z[..., :d2], z[..., d2:]
                return jnp.concatenate(
                    [z1 * cos_full - z2 * sin_full,
                     z2 * cos_full + z1 * sin_full], axis=-1)

            q, k = rot(q), rot(k)
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_head_dim**-0.5)
            p_ = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", p_, val).reshape(
                n, t_, -1)
            x = x + (o @ w["proj"] + w["proj_bias"])
            h = layer_norm(x, w["norm2"], w["norm2_bias"], 1e-6)
            h = x + ((_quick_gelu(h @ w["fc1"] + w["fc1_bias"])
                      @ w["fc2"]) + w["fc2_bias"])
            return h

        if self.is_qwen2_5:
            x = x[:, jnp.asarray(perm)]
        x = jax.lax.fori_loop(0, self.v_layers, layer_fn, x)
        if self.is_qwen2_5:
            x = x[:, jnp.asarray(inv_perm)]

        mg = params["merger"]
        if self.is_qwen2_5:
            x = rms_norm(x, mg["ln_q"], 1e-6)
        else:
            x = layer_norm(x, mg["ln_q"], mg["ln_q_bias"], 1e-6)
        m2 = self.merge**2
        x = x.reshape(n, (self.grid**2) // m2, m2 * self.v_hidden)
        x = jax.nn.gelu(x @ mg["mlp0"] + mg["mlp0_bias"],
                        approximate=False)
        return x @ mg["mlp2"] + mg["mlp2_bias"]

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
        return self.language_model(lm_params, input_ids, positions,
                                   kv_caches, attn_meta,
                                   use_pallas=use_pallas,
                                   inputs_embeds=x)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(
            params["language_model"], hidden)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class Qwen2_5_VLForConditionalGeneration(Qwen2VLForConditionalGeneration):
    is_qwen2_5 = True


class JinaVLForSequenceClassification(Qwen2VLForConditionalGeneration):
    """jina-reranker-m0 (reference: vllm/model_executor/models/
    jina_vl.py — Qwen2-VL backbone + JinaVLScorer: Linear(H,H)+bias →
    ReLU → Linear(H,num_labels)+bias over the last-token hidden state;
    checkpoint keys score.0.* / score.2.*). Registered under the
    ``JinaVLForRanking`` architecture name."""

    def __init__(self, config: ModelConfig):
        config.is_pooling_model = True
        super().__init__(config)
        hf = config.hf_config
        self.num_labels = getattr(hf, "num_labels", 1) or 1

    def param_specs(self) -> list[ParamSpec]:
        H = self.language_model.hidden
        specs = super().param_specs()
        specs += [
            ParamSpec("score_dense", (H, H), P(None, None),
                      "score.0.weight", transform=transpose2d),
            ParamSpec("score_dense_bias", (H, ), P(), "score.0.bias",
                      transform=None),
            ParamSpec("score", (H, self.num_labels), P(None, None),
                      "score.2.weight", transform=transpose2d),
            ParamSpec("score_bias", (self.num_labels, ), P(),
                      "score.2.bias", transform=None),
        ]
        return specs

    def pool_projection(self, params, pooled):
        h = pooled @ params["score_dense"].astype(pooled.dtype) + \
            params["score_dense_bias"].astype(pooled.dtype)
        return jax.nn.relu(h)

    def classify_logits(self, params, pooled_hidden):
        return pooled_hidden  # score head applied by the runner
