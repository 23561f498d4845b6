"""Original Qwen-VL (QwenVLForConditionalGeneration /
QWenLMHeadModel + visual): OpenCLIP-style ViT + Resampler2 perceiver
pool over the Qwen-v1 decoder.

Reference parity: vllm/model_executor/models/qwen_vl.py (the upstream
checkpoint is remote-code-only). Structure:

- tower (``transformer.visual.*``): biasless patch conv, 256-entry
  absolute position table bicubic-resized to the patch grid, pre-LN
  blocks (packed ``attn.in_proj``, gelu c_fc/c_proj MLP);
- ``attn_pool``: Resampler2 — n_queries learned queries, version-(2,0)
  2-D sincos added to BOTH queries (at the query grid) and keys
  (bicubic-resized to the patch grid), packed MultiheadAttention, NO
  post projection;
- ln_post + proj to output_dim, spliced at the image-pad placeholder
  (``image_start_id + 2``) — n_queries tokens per image.

Bicubic resampling replicates torch.nn.functional.interpolate
(align_corners=False, a=-0.75) in numpy at trace time — both resizes
are static per canonical grid.
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

VIS = "transformer.visual."


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    at = np.abs(t)
    return np.where(
        at <= 1, (a + 2) * at**3 - (a + 3) * at**2 + 1,
        np.where(at < 2,
                 a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0))


def _bicubic_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] row-stochastic torch-style bicubic weights
    (align_corners=False, a=-0.75, edge clamp)."""
    out = np.zeros((dst, src), np.float64)
    scale = src / dst
    for i in range(dst):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        for k in range(-1, 3):
            j = x0 + k
            w = _cubic_kernel(np.asarray(x - j))
            out[i, min(max(j, 0), src - 1)] += float(w)
    return out.astype(np.float32)


def resize_pos_embed_bicubic(table: np.ndarray,
                             tgt: int) -> np.ndarray:
    """[S*S, D] absolute position table → [tgt*tgt, D] (identity when
    the grids already match)."""
    s = int(round(np.sqrt(table.shape[0])))
    if s == tgt:
        return table
    d = table.shape[-1]
    grid = table.reshape(s, s, d)
    m = _bicubic_matrix(s, tgt)
    grid = np.einsum("ij,jwd->iwd", m, grid)
    grid = np.einsum("ij,hjd->hid", m, grid)
    return grid.reshape(tgt * tgt, d)


def _sincos_2d_v20(g: int, dim: int) -> np.ndarray:
    """Version-(2,0) 2-D sincos table [g*g, dim] (w coordinate in the
    first half, h in the second; w varies fastest in the flatten)."""
    omega = 1.0 / 10000**(np.arange(dim // 4, dtype=np.float32) /
                          (dim // 4))
    hh, ww = np.meshgrid(np.arange(g, dtype=np.float32),
                         np.arange(g, dtype=np.float32),
                         indexing="ij")
    def enc(pos):
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)
    return np.concatenate([enc(ww), enc(hh)],
                          axis=1).astype(np.float32)


class QwenVLForConditionalGeneration:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        v = dict(getattr(hf, "visual", {}) or {})
        self.width = int(v["width"])
        self.v_layers = int(v["layers"])
        self.v_heads = int(v["heads"])
        self.v_dh = self.width // self.v_heads
        self.patch = int(v["patch_size"])
        self.image_size = int(config.mm_image_size
                              or v["image_size"])
        self.grid = self.image_size // self.patch
        self.mlp_width = int(self.width * float(v.get("mlp_ratio",
                                                      4.0)))
        self.out_dim = int(v.get("output_dim", 512))
        self.n_queries = int(v.get("n_queries", 256))
        self.q_grid = int(round(np.sqrt(self.n_queries)))

        # import the decoder class directly — the registry name routes
        # back through the visual-detecting factory
        from vllm_main_modify_tpu.models.internlm2_baichuan import \
            QWenLMHeadModel

        text_cfg = replace(config, is_multimodal=False)
        text_cfg.architecture = "QWenLMHeadModel"
        self.language_model = QWenLMHeadModel(text_cfg)

    def param_specs(self) -> list[ParamSpec]:
        W, MW, OD = self.width, self.mlp_width, self.out_dim
        t = transpose2d
        g = self.grid

        def pos_resize(x):
            return resize_pos_embed_bicubic(x, g)

        specs = [
            ParamSpec("vision.conv1", (W, 3, self.patch, self.patch),
                      P(None, None, None, None), VIS + "conv1.weight",
                      transform=None),
            ParamSpec("vision.pos", (g * g, W), P(None, None),
                      VIS + "positional_embedding",
                      transform=pos_resize),
            ParamSpec("vision.ln_pre", (W, ), P(),
                      VIS + "ln_pre.weight", transform=None),
            ParamSpec("vision.ln_pre_bias", (W, ), P(),
                      VIS + "ln_pre.bias", transform=None),
            ParamSpec("vision.ln_post", (OD, ), P(),
                      VIS + "ln_post.weight", transform=None),
            ParamSpec("vision.ln_post_bias", (OD, ), P(),
                      VIS + "ln_post.bias", transform=None),
            ParamSpec("vision.proj", (OD, OD), P(None, None),
                      VIS + "proj", transform=None),
        ]

        def vstk(path, shape, hf_key, transform=t):
            return ParamSpec(
                f"vision.layers.{path}", (self.v_layers, *shape),
                P(*([None] * (len(shape) + 1))),
                VIS + "transformer.resblocks.{i}." + hf_key,
                stacked=True, transform=transform)

        specs += [
            vstk("ln_1", (W, ), "ln_1.weight", transform=None),
            vstk("ln_1_bias", (W, ), "ln_1.bias", transform=None),
            vstk("in_proj", (W, 3 * W), "attn.in_proj.weight"),
            vstk("in_proj_bias", (3 * W, ), "attn.in_proj.bias",
                 transform=None),
            vstk("out_proj", (W, W), "attn.out_proj.weight"),
            vstk("out_proj_bias", (W, ), "attn.out_proj.bias",
                 transform=None),
            vstk("ln_2", (W, ), "ln_2.weight", transform=None),
            vstk("ln_2_bias", (W, ), "ln_2.bias", transform=None),
            vstk("c_fc", (W, MW), "mlp.c_fc.weight"),
            vstk("c_fc_bias", (MW, ), "mlp.c_fc.bias",
                 transform=None),
            vstk("c_proj", (MW, W), "mlp.c_proj.weight"),
            vstk("c_proj_bias", (W, ), "mlp.c_proj.bias",
                 transform=None),
        ]
        ap = VIS + "attn_pool."
        specs += [
            ParamSpec("pool.query", (self.n_queries, OD),
                      P(None, None), ap + "query", transform=None),
            ParamSpec("pool.kv_proj", (W, OD), P(None, None),
                      ap + "kv_proj.weight", transform=t),
            ParamSpec("pool.in_proj", (3 * OD, OD), P(None, None),
                      ap + "attn.in_proj_weight", transform=None),
            ParamSpec("pool.in_proj_bias", (3 * OD, ), P(),
                      ap + "attn.in_proj_bias", transform=None),
            ParamSpec("pool.out_proj", (OD, OD), P(None, None),
                      ap + "attn.out_proj.weight", transform=t),
            ParamSpec("pool.out_proj_bias", (OD, ), P(),
                      ap + "attn.out_proj.bias", transform=None),
            ParamSpec("pool.ln_q", (OD, ), P(), ap + "ln_q.weight",
                      transform=None),
            ParamSpec("pool.ln_q_bias", (OD, ), P(),
                      ap + "ln_q.bias", transform=None),
            ParamSpec("pool.ln_kv", (OD, ), P(), ap + "ln_kv.weight",
                      transform=None),
            ParamSpec("pool.ln_kv_bias", (OD, ), P(),
                      ap + "ln_kv.bias", transform=None),
        ]
        specs += self.language_model.param_specs()
        return specs

    def kv_cache_spec(self):
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N, n_queries, output_dim]."""
        if pixel_values.ndim == 3:
            pixel_values = pixel_values[None]
        vw = params["vision"]
        n = pixel_values.shape[0]
        W = self.width
        x = jax.lax.conv_general_dilated(
            pixel_values.astype(jnp.float32),
            vw["conv1"].astype(jnp.float32),
            (self.patch, self.patch), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x.reshape(n, W, -1).transpose(0, 2, 1)
        x = x + vw["pos"].astype(x.dtype)[None]
        x = layer_norm(x, vw["ln_pre"], vw["ln_pre_bias"], 1e-6)
        for li in range(self.v_layers):
            w = jax.tree.map(lambda a, li=li: a[li],
                             vw["layers"])
            h = layer_norm(x, w["ln_1"], w["ln_1_bias"], 1e-6)
            t = h.shape[1]
            qkv = (h @ w["in_proj"] + w["in_proj_bias"]).reshape(
                n, t, 3, self.v_heads, self.v_dh)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_dh**-0.5)
            p = jax.nn.softmax(s.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(n, t, W)
            x = x + (o @ w["out_proj"] + w["out_proj_bias"])
            h = layer_norm(x, w["ln_2"], w["ln_2_bias"], 1e-6)
            h = jax.nn.gelu(h @ w["c_fc"] + w["c_fc_bias"],
                            approximate=False)
            x = x + (h @ w["c_proj"] + w["c_proj_bias"])
        # Resampler2 pool (reference resampler.py): sincos at the
        # QUERY grid on queries, bicubic-resized to the patch grid on
        # keys; no post projection inside the pool
        pw = params["pool"]
        OD = self.out_dim
        nh = max(1, OD // 128)
        dh = OD // nh
        q_pos = jnp.asarray(_sincos_2d_v20(self.q_grid, OD))
        k_pos = jnp.asarray(resize_pos_embed_bicubic(
            _sincos_2d_v20(self.q_grid, OD), self.grid))
        q = layer_norm(pw["query"], pw["ln_q"], pw["ln_q_bias"],
                       1e-6) + q_pos
        kv = layer_norm(x @ pw["kv_proj"], pw["ln_kv"],
                        pw["ln_kv_bias"], 1e-6)
        wq, wk, wv = (pw["in_proj"][:OD], pw["in_proj"][OD:2 * OD],
                      pw["in_proj"][2 * OD:])
        bq, bk, bv = (pw["in_proj_bias"][:OD],
                      pw["in_proj_bias"][OD:2 * OD],
                      pw["in_proj_bias"][2 * OD:])
        qh = (q @ wq.T + bq).reshape(self.n_queries, nh, dh)
        kh = ((kv + k_pos[None].astype(kv.dtype)) @ wk.T +
              bk).reshape(n, -1, nh, dh)
        vh = (kv @ wv.T + bv).reshape(n, -1, nh, dh)
        s = jnp.einsum("qhd,nkhd->nhqk", qh, kh) * (dh**-0.5)
        p = jax.nn.softmax(s.astype(jnp.float32),
                           axis=-1).astype(kv.dtype)
        o = jnp.einsum("nhqk,nkhd->nqhd", p, vh).reshape(
            n, self.n_queries, OD)
        o = o @ pw["out_proj"] + pw["out_proj_bias"]
        o = layer_norm(o, vw["ln_post"], vw["ln_post_bias"], 1e-6)
        return o @ vw["proj"]

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        if mm_embeds is not None:
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds.astype(x.dtype), mode="drop")
        return self.language_model(
            params, input_ids, positions, kv_caches, attn_meta,
            use_pallas=use_pallas, inputs_embeds=x)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(params, hidden)
