"""Molmo (allenai/Molmo-7B-D/O): CLIP-style ViT with two-layer feature
concat + 2x2 attention pooling + SwiGLU projector over an OLMo-style
decoder.

Reference parity: vllm/model_executor/models/molmo.py.

- Vision (:98-363, :624-787): linear bias-free patch embed over
  row-major 14px patches, cls token + learned pos (bicubic-interp),
  pre_ln, pre-LN residual blocks with separate biased wq/wk/wv/wo and
  quick-gelu w1/w2 MLP. Features from VIT_LAYERS [-2, -9] concatenate
  (2x width), cls dropped; 2x2 patch blocks pool through an attention
  layer whose query is the block mean (image_pooling_2d, nlayers=2
  input width); the SwiGLU image_projector (w1 gate / w3 up / w2
  down) maps to the text width. One crop yields ((g+1)//2)^2 tokens.
- Decoder (:365-622): fused att_proj qkv (bias per qkv_bias),
  optional q_norm over the FULL q width and k_norm over the kv width
  (attention_layer_norm), standard neox rope, MulAndSilu MLP
  (ff_proj fused [inter], out = first * silu(second), ff_out down);
  ``norm_after`` swaps to post-sublayer norms. Embeddings are
  wte.embedding plus the 128-row wte.new_embedding (special tokens);
  lm_head is the top-level transformer.ff_out.

Checkpoint keys follow the HF remote-code layout
(model.transformer.blocks.{i}.att_proj / attn_out / ff_proj / ff_out,
model.vision_backbone.*, hf_to_vllm_mapper :1337-1363).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.normalization import (layer_norm,
                                                       rms_norm)
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.quantization.weights import matmul

VIT_LAYERS = (-2, -9)
POOLING = 2
ADDITIONAL_VOCAB = 128
TB = "model.transformer.blocks.{i}."
VB = "model.vision_backbone."


class MolmoForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self.hidden = config.hidden_size
        self.inter = config.intermediate_size  # fused ff width
        self.L = config.num_layers
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = self.hidden // self.num_q
        self.sm_scale = self.head_dim**-0.5
        self.eps = float(g("layer_norm_eps", 1e-5))
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta, None))
        self.qkv_bias = bool(g("qkv_bias", False))
        self.qk_norm = bool(g("attention_layer_norm", False))
        self.norm_after = bool(g("norm_after", False))
        self.embedding_size = int(g("embedding_size", None)
                                  or config.vocab_size)

        # vision backbone (VisionBackboneConfig defaults, molmo.py:98)
        vc = g("vision_config", None) or {}
        vg = lambda k, d: (vc.get(k, d) if isinstance(vc, dict)
                           else getattr(vc, k, d))
        self.v_dim = int(vg("image_emb_dim", 1024))
        self.v_heads = int(vg("image_num_heads", 16))
        self.v_kv_heads = int(vg("image_num_key_value_heads",
                                 self.v_heads))
        self.v_dh = self.v_dim // self.v_heads
        self.v_layers = int(vg("image_num_layers", 23))
        self.v_mlp = int(vg("image_mlp_dim", 4096))
        self.patch = int(vg("image_patch_size", 14))
        self.v_eps = float(vg("image_norm_eps", 1e-5))
        default_size = vg("image_default_input_size", (336, 336))
        self.native_grid = int(default_size[0]) // self.patch
        self.image_size = int(config.mm_image_size
                              or default_size[0])
        self.grid = self.image_size // self.patch
        self.pooled = (self.grid + 1) // POOLING
        self.tie_embeddings = False

    def num_image_tokens(self) -> int:
        return self.pooled * self.pooled

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, I = self.hidden, self.inter
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        D, MD = self.v_dim, self.v_mlp
        t = transpose2d

        def stk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"layers.{path}", (self.L, *shape), spec,
                             TB + hf_key, stacked=True,
                             transform=transform)

        specs = [
            ParamSpec("embed_tokens", (self.embedding_size, H),
                      P("model", None),
                      "model.transformer.wte.embedding",
                      transform=None),
            ParamSpec("embed_extra", (ADDITIONAL_VOCAB, H),
                      P(None, None),
                      "model.transformer.wte.new_embedding",
                      transform=None),
            ParamSpec("final_norm", (H, ), P(),
                      "model.transformer.ln_f.weight",
                      transform=None),
            ParamSpec("lm_head", (H, self.embedding_size),
                      P(None, "model"), "model.transformer.ff_out.weight",
                      transform=t),
            stk("att_proj", (H, qd + 2 * kd), P(None, None, "model"),
                "att_proj.weight"),
            stk("attn_out", (qd, H), P(None, "model", None),
                "attn_out.weight"),
            stk("attn_norm", (H, ), P(None, None),
                "attn_norm.weight", transform=None),
            stk("ff_norm", (H, ), P(None, None), "ff_norm.weight",
                transform=None),
            stk("ff_proj", (H, I), P(None, None, "model"),
                "ff_proj.weight"),
            stk("ff_out", (I // 2, H), P(None, "model", None),
                "ff_out.weight"),
        ]
        if self.qkv_bias:
            specs.append(
                stk("att_bias", (qd + 2 * kd, ), P(None, "model"),
                    "att_proj.bias", transform=None))
        if self.qk_norm:
            specs += [
                stk("q_norm", (qd, ), P(None, None), "q_norm.weight",
                    transform=None),
                stk("k_norm", (kd, ), P(None, None), "k_norm.weight",
                    transform=None),
            ]
        if not self.cfg.is_multimodal:
            return specs

        def vstk(path, shape, hf_key, transform=t):
            return ParamSpec(
                f"vision.layers.{path}", (self.v_layers, *shape),
                P(*([None] * (len(shape) + 1))),
                VB + "image_vit.transformer.resblocks.{i}." + hf_key,
                stacked=True, transform=transform)

        specs += [
            ParamSpec("vision.cls", (D, ), P(),
                      VB + "image_vit.class_embedding",
                      transform=None),
            ParamSpec("vision.pos",
                      (self.native_grid**2 + 1, D), P(None, None),
                      VB + "image_vit.positional_embedding",
                      transform=None),
            ParamSpec("vision.patch_embed", (3 * self.patch**2, D),
                      P(None, None),
                      VB + "image_vit.patch_embedding.weight",
                      transform=t),
            ParamSpec("vision.pre_ln", (D, ), P(),
                      VB + "image_vit.pre_ln.weight", transform=None),
            ParamSpec("vision.pre_ln_bias", (D, ), P(),
                      VB + "image_vit.pre_ln.bias", transform=None),
        ]
        for n in ("wq", "wk", "wv"):
            width = D if n == "wq" else \
                self.v_kv_heads * self.v_dh
            specs += [
                vstk(n, (D, width), f"attention.{n}.weight"),
                vstk(f"{n}_bias", (width, ), f"attention.{n}.bias",
                     transform=None),
            ]
        specs += [
            vstk("wo", (D, D), "attention.wo.weight"),
            vstk("wo_bias", (D, ), "attention.wo.bias",
                 transform=None),
            vstk("attn_norm", (D, ), "attention_norm.weight",
                 transform=None),
            vstk("attn_norm_bias", (D, ), "attention_norm.bias",
                 transform=None),
            vstk("ffn_norm", (D, ), "ffn_norm.weight",
                 transform=None),
            vstk("ffn_norm_bias", (D, ), "ffn_norm.bias",
                 transform=None),
            vstk("w1", (D, MD), "feed_forward.w1.weight"),
            vstk("w1_bias", (MD, ), "feed_forward.w1.bias",
                 transform=None),
            vstk("w2", (MD, D), "feed_forward.w2.weight"),
            vstk("w2_bias", (D, ), "feed_forward.w2.bias",
                 transform=None),
        ]
        nl = len(VIT_LAYERS)
        for n, din in (("wq", nl * D), ("wk", nl * D), ("wv",
                                                        nl * D)):
            width = D if n == "wq" else self.v_kv_heads * self.v_dh
            specs += [
                ParamSpec(f"pool.{n}", (din, width), P(None, None),
                          VB + f"image_pooling_2d.{n}.weight",
                          transform=t),
                ParamSpec(f"pool.{n}_bias", (width, ), P(),
                          VB + f"image_pooling_2d.{n}.bias",
                          transform=None),
            ]
        specs += [
            ParamSpec("pool.wo", (D, D), P(None, None),
                      VB + "image_pooling_2d.wo.weight", transform=t),
            ParamSpec("pool.wo_bias", (D, ), P(),
                      VB + "image_pooling_2d.wo.bias",
                      transform=None),
            ParamSpec("proj.gate", (D, I // 2), P(None, None),
                      VB + "image_projector.w1.weight", transform=t),
            ParamSpec("proj.up", (D, I // 2), P(None, None),
                      VB + "image_projector.w3.weight", transform=t),
            ParamSpec("proj.down", (I // 2, H), P(None, None),
                      VB + "image_projector.w2.weight", transform=t),
        ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    # ------------------------------------------------------------------

    def _vit_attn(self, x, q_in, w, prefix=""):
        """Attention with separate wq/wk/wv/wo; q from q_in, k/v
        from x. Shapes [n, t, D_in]."""
        n, tk = x.shape[0], x.shape[1]
        tq = q_in.shape[1]
        heads, kvh, dh = self.v_heads, self.v_kv_heads, self.v_dh
        q = (q_in @ w[prefix + "wq"] + w[prefix + "wq_bias"]).reshape(
            n, tq, heads, dh)
        k = (x @ w[prefix + "wk"] + w[prefix + "wk_bias"]).reshape(
            n, tk, kvh, dh)
        v = (x @ w[prefix + "wv"] + w[prefix + "wv_bias"]).reshape(
            n, tk, kvh, dh)
        if kvh != heads:
            rep = heads // kvh
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * (dh**-0.5)
        p = jax.nn.softmax(s.astype(jnp.float32),
                           axis=-1).astype(x.dtype)
        o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(
            n, tq, heads * dh)
        return o @ w[prefix + "wo"] + w[prefix + "wo_bias"]

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N*pooled^2, H]."""
        vw = params["vision"]
        n = pixel_values.shape[0]
        D = self.v_dim
        g, p = self.grid, self.patch
        x = pixel_values.astype(jnp.float32).reshape(
            n, 3, g, p, g, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(n, g * g,
                                                  3 * p * p)
        x = x @ vw["patch_embed"].astype(jnp.float32)
        cls = jnp.broadcast_to(vw["cls"].astype(x.dtype)[None, None],
                               (n, 1, D))
        x = jnp.concatenate([cls, x], axis=1)
        pos = vw["pos"].astype(jnp.float32)
        if self.native_grid != g:
            grid_pos = jax.image.resize(
                pos[1:].reshape(self.native_grid, self.native_grid,
                                D), (g, g, D),
                method="cubic").reshape(g * g, D)
            pos = jnp.concatenate([pos[:1], grid_pos], axis=0)
        x = x + pos[None]
        x = layer_norm(x, vw["pre_ln"], vw["pre_ln_bias"], self.v_eps)

        keep = sorted((li % self.v_layers) for li in VIT_LAYERS)
        feats = {}
        for li in range(max(keep) + 1):
            w = jax.tree.map(lambda a, li=li: a[li], vw["layers"])
            h = layer_norm(x, w["attn_norm"], w["attn_norm_bias"],
                           self.v_eps)
            x = x + self._vit_attn(h, h, w)
            h = layer_norm(x, w["ffn_norm"], w["ffn_norm_bias"],
                           self.v_eps)
            h = h @ w["w1"] + w["w1_bias"]
            h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu
            x = x + (h @ w["w2"] + w["w2_bias"])
            if li in keep:
                feats[li] = x
        # VIT_LAYERS order ([-2, -9]) defines the concat order
        ordered = [feats[li % self.v_layers] for li in VIT_LAYERS]
        x = jnp.concatenate(ordered, axis=-1)[:, 1:]  # drop cls
        # 2x2 attention pooling, query = block mean
        g2 = self.pooled
        pad = g2 * POOLING - g
        nl = len(VIT_LAYERS)
        x = x.reshape(n, g, g, nl * D)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
        x = x.reshape(n, g2, POOLING, g2, POOLING, nl * D)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            n * g2 * g2, POOLING * POOLING, nl * D)
        query = x.mean(axis=1, keepdims=True)
        pooled = self._vit_attn(x, query, params["pool"],
                                prefix="")[:, 0]  # [n*g2*g2, D]
        pw = params["proj"]
        y = jax.nn.silu(pooled @ pw["gate"]) * (pooled @ pw["up"])
        return y @ pw["down"]

    # ------------------------------------------------------------------

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        embed = jnp.concatenate(
            [params["embed_tokens"], params["embed_extra"]], axis=0)
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(embed, input_ids, axis=0)
        if mm_embeds is not None:
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds.astype(x.dtype), mode="drop")
        t = x.shape[0]
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        layers = params["layers"]

        def layer_fn(l, carry):
            x, kv_caches = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = x if self.norm_after else rms_norm(
                x, w["attn_norm"], self.eps)
            qkv = matmul(h, w["att_proj"])
            if self.qkv_bias:
                qkv = qkv + w["att_bias"]
            q, k, v = (qkv[:, :qd], qkv[:, qd:qd + kd],
                       qkv[:, qd + kd:])
            if self.qk_norm:
                q = rms_norm(q, w["q_norm"], self.eps)
                k = rms_norm(k, w["k_norm"], self.eps)
            q = q.reshape(t, self.num_q, self.head_dim)
            k = k.reshape(t, self.num_kv, self.head_dim)
            v = v.reshape(t, self.num_kv, self.head_dim)
            q, k = apply_rope(q, k, positions, self.inv_freq)
            o, kv_caches = attention(q, k, v, kv_caches, l, attn_meta,
                                     self.sm_scale,
                                     use_pallas=use_pallas)
            attn_out = matmul(o.reshape(t, -1), w["attn_out"])
            if self.norm_after:
                attn_out = rms_norm(attn_out, w["attn_norm"],
                                    self.eps)
            x = res + attn_out

            res = x
            h = x if self.norm_after else rms_norm(
                x, w["ff_norm"], self.eps)
            gu = matmul(h, w["ff_proj"])
            half = self.inter // 2
            # MulAndSilu: first half * silu(second half)
            y = gu[:, :half] * jax.nn.silu(gu[:, half:])
            y = matmul(y, w["ff_out"])
            if self.norm_after:
                y = rms_norm(y, w["ff_norm"], self.eps)
            return res + y, kv_caches

        x, kv_caches = jax.lax.fori_loop(0, self.L, layer_fn,
                                         (x, kv_caches))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        return hidden.astype(jnp.float32) @ params["lm_head"].astype(
            jnp.float32)
