"""Qwen3-VL / Qwen3-VL-MoE: DeepStack ViT + interleaved-mrope Qwen3.

Reference parity: vllm/model_executor/models/qwen3_vl.py +
qwen3_vl_moe.py (+ HF modeling_qwen3_vl.py). Deltas vs Qwen2-VL:

- the ViT has NO window attention; learned position embeddings are
  bilinearly interpolated from a ``num_position_embeddings`` grid to
  the image grid (fast_pos_embed_interpolate) — static gather weights
  at the canonical resolution — plus the same (h, w) half/half rotary;
- blocks are bias-LN + fused-qkv + gelu_pytanh MLP (linear_fc1/2);
- DeepStack: after blocks[deepstack_visual_indexes[i]] a dedicated
  post-shuffle-norm PatchMerger produces an extra feature set; the
  text model ADDS set i to the hidden state at the image positions
  after decoder layer i (qwen3_vl.py _deepstack_process). The runner's
  mm buffer carries ``(1 + n_deepstack) * H`` per image token
  (``mm_embed_width``), split by the wrapper;
- the text decoder is Qwen3 with INTERLEAVED mrope
  (apply_interleaved_mrope: [THW THW ... TT] frequency layout).

TPU choice: canonical square image (processor resizes), one static
encode shape; the Qwen2-VL merge-group patch raster is reused.
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
from vllm_main_modify_tpu.layers.rotary import apply_mrope_interleaved
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.qwen3 import (Qwen3ForCausalLM,
                                               Qwen3MoeForCausalLM)

VP = "model.visual."


class Qwen3VLTextModel(Qwen3ForCausalLM):
    """Qwen3 graph + interleaved mrope ([3, T] positions)."""

    uses_mrope = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        rs = config.rope_scaling or {}
        self.mrope_section = tuple(
            rs.get("mrope_section") or (24, 20, 20))

    def _apply_rope(self, q, k, positions):
        if positions.ndim == 1:
            positions = jnp.broadcast_to(positions[None],
                                         (3, positions.shape[0]))
        return apply_mrope_interleaved(q, k, positions, self.inv_freq,
                                       self.mrope_section)


class Qwen3VLMoeTextModel(Qwen3MoeForCausalLM):
    """Qwen3-MoE graph + interleaved mrope; experts are serialized
    FUSED per layer (qwen3_vl_moe.py Qwen3VLMoeTextExperts:
    gate_up_proj [E, H, 2*mi] raw parameter, gate first chunk;
    down_proj [E, mi, H] — both already [in, out])."""

    uses_mrope = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.renormalize = True  # always norm_topk_prob
        rs = config.rope_scaling or {}
        self.mrope_section = tuple(
            rs.get("mrope_section") or (24, 20, 20))

    _apply_rope = Qwen3VLTextModel._apply_rope

    def param_specs(self) -> list[ParamSpec]:
        mi = self.cfg.moe_intermediate_size

        def gate_slice(x):
            return np.ascontiguousarray(x[..., :mi])

        def up_slice(x):
            return np.ascontiguousarray(x[..., mi:])

        out = []
        for s in super().param_specs():
            if s.path == "layers.w_gate":
                s = ParamSpec(s.path, s.shape, s.sharding,
                              "model.layers.{i}.mlp.experts"
                              ".gate_up_proj", stacked=True,
                              transform=gate_slice)
            elif s.path == "layers.w_up":
                s = ParamSpec(s.path, s.shape, s.sharding,
                              "model.layers.{i}.mlp.experts"
                              ".gate_up_proj", stacked=True,
                              transform=up_slice)
            elif s.path == "layers.w_down":
                s = ParamSpec(s.path, s.shape, s.sharding,
                              "model.layers.{i}.mlp.experts"
                              ".down_proj", stacked=True,
                              transform=None)
            out.append(s)
        return out


class Qwen3VLForConditionalGeneration:

    uses_mrope = True
    TEXT_CLS = Qwen3VLTextModel

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        self.merge = getattr(vc, "spatial_merge_size", 2)
        self.patch = vc.patch_size
        self.tp = getattr(vc, "temporal_patch_size", 2)
        self.v_hidden = vc.hidden_size
        self.v_layers = vc.depth
        self.v_heads = vc.num_heads
        self.v_head_dim = self.v_hidden // self.v_heads
        self.v_inter = vc.intermediate_size
        self.out_hidden = getattr(vc, "out_hidden_size",
                                  config.hidden_size)
        self.n_pos = getattr(vc, "num_position_embeddings", 2304)
        self.n_grid_side = int(self.n_pos**0.5)
        self.ds_ids = tuple(
            getattr(vc, "deepstack_visual_indexes", ()) or ())
        self.nds = len(self.ds_ids)
        self.mm_embed_width = self.out_hidden * (1 + self.nds)
        self.image_size = int(config.mm_image_size or 448)
        self.grid = self.image_size // self.patch
        assert self.grid % self.merge == 0
        self.num_image_tokens = (self.grid // self.merge)**2

        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = self.TEXT_CLS.__name__
        self.language_model = self.TEXT_CLS(text_cfg)
        self.tie_embeddings = text_cfg.tie_word_embeddings

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        D, I, L = self.v_hidden, self.v_inter, self.v_layers
        m2 = self.merge**2
        t = transpose2d

        def vstk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"vision.layers.{path}", (L, *shape),
                             spec, VP + "blocks.{i}." + hf_key,
                             stacked=True, transform=transform)

        def merger(prefix, key_prefix, norm_dim):
            return [
                ParamSpec(f"{prefix}.norm", (norm_dim, ), P(),
                          key_prefix + "norm.weight", transform=None),
                ParamSpec(f"{prefix}.norm_bias", (norm_dim, ), P(),
                          key_prefix + "norm.bias", transform=None),
                ParamSpec(f"{prefix}.fc1", (m2 * D, m2 * D),
                          P(None, None),
                          key_prefix + "linear_fc1.weight",
                          transform=t),
                ParamSpec(f"{prefix}.fc1_bias", (m2 * D, ), P(),
                          key_prefix + "linear_fc1.bias",
                          transform=None),
                ParamSpec(f"{prefix}.fc2", (m2 * D, self.out_hidden),
                          P(None, None),
                          key_prefix + "linear_fc2.weight",
                          transform=t),
                ParamSpec(f"{prefix}.fc2_bias", (self.out_hidden, ),
                          P(), key_prefix + "linear_fc2.bias",
                          transform=None),
            ]

        specs = [
            ParamSpec("vision.patch_embed",
                      (3 * self.tp * self.patch**2, D), P(None, None),
                      VP + "patch_embed.proj.weight",
                      transform=lambda x: np.ascontiguousarray(
                          x.reshape(x.shape[0], -1).T)),
            ParamSpec("vision.patch_bias", (D, ), P(),
                      VP + "patch_embed.proj.bias", transform=None),
            ParamSpec("vision.pos_embed", (self.n_pos, D),
                      P(None, None), VP + "pos_embed.weight",
                      transform=None),
            vstk("norm1", (D, ), P(None, None), "norm1.weight",
                 transform=None),
            vstk("norm1_bias", (D, ), P(None, None), "norm1.bias",
                 transform=None),
            vstk("norm2", (D, ), P(None, None), "norm2.weight",
                 transform=None),
            vstk("norm2_bias", (D, ), P(None, None), "norm2.bias",
                 transform=None),
            vstk("qkv", (D, 3 * D), P(None, None, "model"),
                 "attn.qkv.weight"),
            vstk("qkv_bias", (3 * D, ), P(None, "model"),
                 "attn.qkv.bias", transform=None),
            vstk("proj", (D, D), P(None, "model", None),
                 "attn.proj.weight"),
            vstk("proj_bias", (D, ), P(None, None), "attn.proj.bias",
                 transform=None),
            vstk("fc1", (D, I), P(None, None, "model"),
                 "mlp.linear_fc1.weight"),
            vstk("fc1_bias", (I, ), P(None, "model"),
                 "mlp.linear_fc1.bias", transform=None),
            vstk("fc2", (I, D), P(None, "model", None),
                 "mlp.linear_fc2.weight"),
            vstk("fc2_bias", (D, ), P(None, None),
                 "mlp.linear_fc2.bias", transform=None),
        ]
        specs += merger("merger", VP + "merger.", D)
        for j in range(self.nds):
            specs += merger(f"ds_merger_{j}",
                            VP + f"deepstack_merger_list.{j}.",
                            m2 * D)
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            # hub layout: model.language_model.* (lm_head stays)
            if s.hf_key.startswith("model."):
                s.hf_key = "model.language_model." + s.hf_key[6:]
            specs.append(s)
        return specs

    def kv_cache_spec(self):
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def _patchify(self, pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] → [N*grid², 3*tp*p*p], merge-group raster
        (same as Qwen2-VL)."""
        n = pixel_values.shape[0]
        g, m, p = self.grid, self.merge, self.patch
        x = jnp.broadcast_to(pixel_values[:, None],
                             (n, self.tp, 3, g * p, g * p))
        x = x.reshape(n, self.tp, 3, g // m, m, p, g // m, m, p)
        x = jnp.transpose(x, (0, 3, 6, 4, 7, 2, 1, 5, 8))
        return x.reshape(n * g * g, 3 * self.tp * p * p)

    def _merge_raster(self, a: np.ndarray) -> np.ndarray:
        g, m = self.grid, self.merge
        return a.reshape(g // m, m, g // m, m,
                         *a.shape[1:]).transpose(
                             0, 2, 1, 3,
                             *range(4, 4 + a.ndim - 1)).reshape(
                                 g * g, *a.shape[1:])

    def _pos_interp(self) -> tuple[np.ndarray, np.ndarray]:
        """Static bilinear gather (idx [4, P], w [4, P]) from the
        n_grid_side² table to the canonical grid, in merge raster."""
        g, ngs = self.grid, self.n_grid_side
        h_idxs = np.linspace(0, ngs - 1, g)
        w_idxs = np.linspace(0, ngs - 1, g)
        hf_, wf_ = h_idxs.astype(np.int32), w_idxs.astype(np.int32)
        hc = np.clip(hf_ + 1, None, ngs - 1)
        wc = np.clip(wf_ + 1, None, ngs - 1)
        dh, dw = h_idxs - hf_, w_idxs - wf_
        idx = np.stack([
            (hf_[:, None] * ngs + wf_[None]).reshape(-1),
            (hf_[:, None] * ngs + wc[None]).reshape(-1),
            (hc[:, None] * ngs + wf_[None]).reshape(-1),
            (hc[:, None] * ngs + wc[None]).reshape(-1),
        ])
        w = np.stack([
            ((1 - dh)[:, None] * (1 - dw)[None]).reshape(-1),
            ((1 - dh)[:, None] * dw[None]).reshape(-1),
            (dh[:, None] * (1 - dw)[None]).reshape(-1),
            (dh[:, None] * dw[None]).reshape(-1),
        ])
        # to merge raster
        idx = np.stack([self._merge_raster(r) for r in idx])
        w = np.stack([self._merge_raster(r) for r in w])
        return idx.astype(np.int32), w.astype(np.float32)

    def _vit_rope(self) -> tuple[np.ndarray, np.ndarray]:
        g = self.grid
        hh = self._merge_raster(
            np.repeat(np.arange(g), g).astype(np.int64))
        ww = self._merge_raster(
            np.tile(np.arange(g), g).astype(np.int64))
        half = self.v_head_dim // 4
        inv = 1.0 / (10000.0**(
            np.arange(0, self.v_head_dim // 2, 2, dtype=np.float64) /
            (self.v_head_dim // 2)))
        ang = np.concatenate([hh[:, None] * inv[None, :half],
                              ww[:, None] * inv[None, :half]],
                             axis=-1)
        return np.cos(ang).astype(np.float32), \
            np.sin(ang).astype(np.float32)

    def _merger(self, params, prefix, x, n, post_shuffle):
        w = params[prefix]
        m2 = self.merge**2
        if post_shuffle:
            x = x.reshape(n, (self.grid**2) // m2, m2 * self.v_hidden)
            x = layer_norm(x, w["norm"], w["norm_bias"], 1e-6)
        else:
            x = layer_norm(x, w["norm"], w["norm_bias"], 1e-6)
            x = x.reshape(n, (self.grid**2) // m2, m2 * self.v_hidden)
        x = jax.nn.gelu(x @ w["fc1"] + w["fc1_bias"],
                        approximate=False)
        return x @ w["fc2"] + w["fc2_bias"]

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N, tokens, (1+nds)*out_hidden]."""
        v = params["vision"]
        if pixel_values.ndim == 5:
            pixel_values = pixel_values[0]
        n = pixel_values.shape[0]
        flat = self._patchify(pixel_values.astype(jnp.float32))
        x = flat @ v["patch_embed"].astype(jnp.float32) + \
            v["patch_bias"].astype(jnp.float32)
        x = x.reshape(n, self.grid**2, self.v_hidden)
        idx, wts = self._pos_interp()
        pe = v["pos_embed"].astype(jnp.float32)
        pos = sum(pe[jnp.asarray(idx[i])] *
                  jnp.asarray(wts[i])[:, None] for i in range(4))
        x = x + pos[None]

        cos_np, sin_np = self._vit_rope()
        cos = jnp.asarray(cos_np)[None, :, None, :]
        sin = jnp.asarray(sin_np)[None, :, None, :]
        layers = v["layers"]
        t_ = self.grid**2

        def rot(z):
            d2 = z.shape[-1] // 2
            z1, z2 = z[..., :d2], z[..., d2:]
            return jnp.concatenate([z1 * cos - z2 * sin,
                                    z2 * cos + z1 * sin], axis=-1)

        def block(x, w):
            h = layer_norm(x, w["norm1"], w["norm1_bias"], 1e-6)
            qkv = h @ w["qkv"] + w["qkv_bias"]
            q, k, val = jnp.split(qkv, 3, axis=-1)
            q = rot(q.reshape(n, t_, self.v_heads, self.v_head_dim))
            k = rot(k.reshape(n, t_, self.v_heads, self.v_head_dim))
            val = val.reshape(n, t_, self.v_heads, self.v_head_dim)
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_head_dim**-0.5)
            p_ = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", p_, val).reshape(
                n, t_, -1)
            x = x + (o @ w["proj"] + w["proj_bias"])
            h = layer_norm(x, w["norm2"], w["norm2_bias"], 1e-6)
            h = jax.nn.gelu(h @ w["fc1"] + w["fc1_bias"],
                            approximate=True)
            return x + (h @ w["fc2"] + w["fc2_bias"])

        # deepstack taps make the loop structure static: unroll over
        # layers (vision depth is small and compiles once)
        ds_feats = []
        for l in range(self.v_layers):
            w = jax.tree.map(lambda a: a[l], layers)
            x = block(x, w)
            if l in self.ds_ids:
                j = self.ds_ids.index(l)
                ds_feats.append(
                    self._merger(params, f"ds_merger_{j}", x, n,
                                 post_shuffle=True))
        main = self._merger(params, "merger", x, n,
                            post_shuffle=False)
        return jnp.concatenate([main] + ds_feats, axis=-1)

    # ------------------------------------------------------------------

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None):
        lm_params = params["language_model"]
        x = jnp.take(lm_params["embed_tokens"], input_ids, axis=0)
        ds = None
        if mm_embeds is not None:
            h = self.out_hidden
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds[:, :h].astype(x.dtype),
                              mode="drop")
            if self.nds:
                t = x.shape[0]
                ds = jnp.zeros((self.nds, t, h), x.dtype)
                for j in range(self.nds):
                    ds = ds.at[j, idx].set(
                        mm_embeds[:, (j + 1) * h:(j + 2) * h].astype(
                            x.dtype), mode="drop")
        return self.language_model(lm_params, input_ids, positions,
                                   kv_caches, attn_meta,
                                   use_pallas=use_pallas,
                                   inputs_embeds=x,
                                   deepstack_embeds=ds)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(
            params["language_model"], hidden)


class Qwen3VLMoeForConditionalGeneration(
        Qwen3VLForConditionalGeneration):
    """Qwen3-VL-MoE: the same DeepStack ViT over the Qwen3-MoE text
    decoder (reference: qwen3_vl_moe.py)."""

    TEXT_CLS = Qwen3VLMoeTextModel
