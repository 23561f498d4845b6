"""Mllama (Llama 3.2 Vision): tiled ViT encoder + cross-attending
Llama decoder.

Reference parity: vllm/model_executor/models/mllama.py. TPU-native
structure: the vision tower (tile/positional embeddings, local +
gated-global transformers, intermediate-layer concat, projector) runs
ONCE per request at ingest — like the Whisper audio encoder — and the
per-cross-layer K/V projections (with k_norm baked in) are written
into the paged cross pool. The decoder is a plain Llama stack whose
cross-attention layers (config.cross_attention_layers) read the cross
pool through the same non-causal ragged kernel, with the tanh-gated
residuals applied decoder-side. Self-attention layers run as
contiguous fori_loop segments over their own stacked weights (the
cross layers are statically interleaved), so the self-KV pool holds
only the self layers and compile size stays O(#segments).

Semantics note: every decoder token attends to the request's full
valid tile prefix (n_tiles * num_patches rows) — the per-token
cross_attention_mask restriction of HF/vLLM degenerates to exactly
this for the standard single-image chat layout (image before text).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   cross_attention)
from vllm_main_modify_tpu.layers.normalization import (layer_norm,
                                                       rms_norm)
from vllm_main_modify_tpu.models.interface import (ParamSpec,
                                                   transpose2d)
from vllm_main_modify_tpu.models.llama import LlamaForCausalLM

_NEG = float(np.finfo(np.float32).min)


class MllamaForConditionalGeneration(LlamaForCausalLM):

    is_encoder_decoder = True

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        txt = hf.text_config
        self.vis = hf.vision_config
        self.cross_ids = list(txt.cross_attention_layers)
        cross_set = set(self.cross_ids)
        self.total_layers = txt.num_hidden_layers
        self.self_ids = [i for i in range(self.total_layers)
                         if i not in cross_set]
        # the self-KV pool holds only the self-attention layers
        config.num_layers = len(self.self_ids)
        super().__init__(config)
        v = self.vis
        self.v_heads = v.attention_heads
        self.v_h = v.hidden_size
        self.v_dh = self.v_h // self.v_heads
        self.grid = v.image_size // v.patch_size
        self.num_patches = self.grid**2 + 1
        self.patches_pad = -(-self.num_patches // 8) * 8
        self.max_tiles = v.max_num_tiles
        self.n_intermediate = len(v.intermediate_layers_indices)
        self.supported_ratios = [tuple(r)
                                 for r in v.supported_aspect_ratios]
        # contiguous self-layer runs between cross layers:
        # [(si_start, si_len, cross_idx_or_None), ...]
        self.segments = []
        si = 0
        run = 0
        for i in range(self.total_layers):
            if i in cross_set:
                self.segments.append((si, run,
                                      self.cross_ids.index(i)))
                si += run
                run = 0
            else:
                run += 1
        if run:
            self.segments.append((si, run, None))

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H = self.hidden
        Dh = self.head_dim
        t = transpose2d
        specs = super().param_specs()
        for s in specs:
            # serialized layout (matches real Llama-3.2-Vision
            # checkpoints): language_model.model.* /
            # language_model.lm_head.* / vision_model.* /
            # multi_modal_projector.*
            if s.hf_key.startswith("model."):
                s.hf_key = s.hf_key.replace(
                    "model.", "language_model.model.", 1)
            elif s.hf_key == "lm_head.weight":
                s.hf_key = "language_model.lm_head.weight"
            if s.stacked:
                # stacked over the NON-contiguous self-attention
                # layer ids
                s.layer_ids = tuple(self.self_ids)
            if s.path == "embed_tokens":
                # HF reserves 8 extra rows past vocab_size for the
                # <|image|> and media special tokens
                s.shape = (c.vocab_size + 8, H)
        Lx = len(self.cross_ids)
        kd = self.num_kv * Dh

        def xstk(path, shape, hf_key, transform=t):
            return ParamSpec(
                f"xlayers.{path}", (Lx, *shape),
                P(*([None] * (len(shape) + 1))),
                "language_model.model.layers.{i}." + hf_key,
                stacked=True, layer_ids=tuple(self.cross_ids),
                transform=transform)

        specs += [
            xstk("input_layernorm", (H, ), "input_layernorm.weight",
                 transform=None),
            xstk("q_proj", (H, self.num_q * Dh),
                 "cross_attn.q_proj.weight"),
            xstk("k_proj", (H, kd), "cross_attn.k_proj.weight"),
            xstk("v_proj", (H, kd), "cross_attn.v_proj.weight"),
            xstk("o_proj", (self.num_q * Dh, H),
                 "cross_attn.o_proj.weight"),
            xstk("q_norm", (Dh, ), "cross_attn.q_norm.weight",
                 transform=None),
            xstk("k_norm", (Dh, ), "cross_attn.k_norm.weight",
                 transform=None),
            xstk("attn_gate", (1, ), "cross_attn_attn_gate",
                 transform=None),
            xstk("mlp_gate", (1, ), "cross_attn_mlp_gate",
                 transform=None),
            xstk("post_attention_layernorm", (H, ),
                 "post_attention_layernorm.weight", transform=None),
            xstk("gate_proj", (H, self.inter), "mlp.gate_proj.weight"),
            xstk("up_proj", (H, self.inter), "mlp.up_proj.weight"),
            xstk("down_proj", (self.inter, H), "mlp.down_proj.weight"),
        ]
        # ---- vision tower -------------------------------------------
        v = self.vis
        vh, vi = self.v_h, v.intermediate_size
        n_ar = len(self.supported_ratios) + 1  # id 0 = padding
        npp = self.num_patches
        vp = "vision_model."
        specs += [
            ParamSpec("vision.patch_embed",
                      (vh, 3, v.patch_size, v.patch_size),
                      P(None, None, None, None),
                      vp + "patch_embedding.weight", transform=None),
            ParamSpec("vision.class_embedding", (vh, ), P(),
                      vp + "class_embedding", transform=None),
            ParamSpec("vision.pos_embed", (npp, vh), P(None, None),
                      vp + "gated_positional_embedding.embedding",
                      transform=None),
            ParamSpec("vision.pos_gate", (1, ), P(),
                      vp + "gated_positional_embedding.gate",
                      transform=None),
            ParamSpec("vision.tile_pos_embed",
                      (n_ar, self.max_tiles * npp * vh), P(None, None),
                      vp + "gated_positional_embedding."
                      "tile_embedding.weight", transform=None),
            ParamSpec("vision.pre_tile_embed",
                      (n_ar, self.max_tiles * vh), P(None, None),
                      vp + "pre_tile_positional_embedding."
                      "embedding.weight", transform=None),
            ParamSpec("vision.pre_tile_gate", (1, ), P(),
                      vp + "pre_tile_positional_embedding.gate",
                      transform=None),
            ParamSpec("vision.post_tile_embed",
                      (n_ar, self.max_tiles * vh), P(None, None),
                      vp + "post_tile_positional_embedding."
                      "embedding.weight", transform=None),
            ParamSpec("vision.post_tile_gate", (1, ), P(),
                      vp + "post_tile_positional_embedding.gate",
                      transform=None),
            ParamSpec("vision.ln_pre", (vh, ), P(),
                      vp + "layernorm_pre.weight", transform=None),
            ParamSpec("vision.ln_pre_bias", (vh, ), P(),
                      vp + "layernorm_pre.bias", transform=None),
            ParamSpec("vision.ln_post", (vh, ), P(),
                      vp + "layernorm_post.weight", transform=None),
            ParamSpec("vision.ln_post_bias", (vh, ), P(),
                      vp + "layernorm_post.bias", transform=None),
            ParamSpec("projector", (v.vision_output_dim, H),
                      P(None, None),
                      "multi_modal_projector.weight", transform=t),
            ParamSpec("projector_bias", (H, ), P(),
                      "multi_modal_projector.bias",
                      transform=None),
        ]

        def vis_block(tag, n, tower, gated):
            def vstk(path, shape, hf_key, transform=t):
                return ParamSpec(
                    f"vision.{tag}.{path}", (n, *shape),
                    P(*([None] * (len(shape) + 1))),
                    vp + tower + ".layers.{i}." + hf_key,
                    stacked=True, transform=transform)

            out = [
                vstk("ln1", (vh, ), "input_layernorm.weight",
                     transform=None),
                vstk("ln1_bias", (vh, ), "input_layernorm.bias",
                     transform=None),
                vstk("q_proj", (vh, vh), "self_attn.q_proj.weight"),
                vstk("k_proj", (vh, vh), "self_attn.k_proj.weight"),
                vstk("v_proj", (vh, vh), "self_attn.v_proj.weight"),
                vstk("o_proj", (vh, vh), "self_attn.o_proj.weight"),
                vstk("ln2", (vh, ), "post_attention_layernorm.weight",
                     transform=None),
                vstk("ln2_bias", (vh, ),
                     "post_attention_layernorm.bias", transform=None),
                vstk("fc1", (vh, vi), "mlp.fc1.weight"),
                vstk("fc1_bias", (vi, ), "mlp.fc1.bias",
                     transform=None),
                vstk("fc2", (vi, vh), "mlp.fc2.weight"),
                vstk("fc2_bias", (vh, ), "mlp.fc2.bias",
                     transform=None),
            ]
            if gated:
                out += [
                    vstk("gate_attn", (1, ), "gate_attn",
                         transform=None),
                    vstk("gate_ffn", (1, ), "gate_ffn",
                         transform=None),
                ]
            return out

        specs += vis_block("layers", v.num_hidden_layers,
                           "transformer", False)
        specs += vis_block("glayers", v.num_global_layers,
                           "global_transformer", True)
        return specs

    def cross_cache_spec(self) -> tuple[int, int, int, int]:
        """(kv_heads, head_dim, cross_layers, max_encoder_len)."""
        return (self.num_kv, self.head_dim, len(self.cross_ids),
                self.max_tiles * self.num_patches)

    # ------------------------------------------------------------------
    # vision tower (runs at ingest)
    # ------------------------------------------------------------------

    def _vit_layer(self, w, x, add_mask, gated):
        """Pre-LN ViT block; LayerNorm default eps (1e-5), biasless
        q/k/v/o, biased fc1/fc2, exact gelu, optional tanh gates."""
        seq = x.shape[0]
        res = x
        h = layer_norm(x, w["ln1"], w["ln1_bias"], 1e-5)
        q = (h @ w["q_proj"]).reshape(seq, self.v_heads, self.v_dh)
        k = (h @ w["k_proj"]).reshape(seq, self.v_heads, self.v_dh)
        v = (h @ w["v_proj"]).reshape(seq, self.v_heads, self.v_dh)
        scores = jnp.einsum("qhd,khd->hqk", q, k).astype(
            jnp.float32) * (self.v_dh**-0.5)
        scores = scores + add_mask[None]
        p = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("hqk,khd->qhd", p, v).reshape(seq, self.v_h)
        o = o @ w["o_proj"]
        if gated:
            o = jnp.tanh(w["gate_attn"]) * o
        x = res + o
        res = x
        h = layer_norm(x, w["ln2"], w["ln2_bias"], 1e-5)
        h = jax.nn.gelu(h @ w["fc1"] + w["fc1_bias"],
                        approximate=False)
        h = h @ w["fc2"] + w["fc2_bias"]
        if gated:
            h = jnp.tanh(w["gate_ffn"]) * h
        return res + h

    def encode_vision_cross(self, params, tiles: jax.Array,
                            ar_id) -> jax.Array:
        """[max_tiles, 3, S, S] padded tiles + aspect-ratio id →
        [max_tiles * num_patches, H_text] cross-attention states
        (valid rows are the first n_tiles * num_patches; padding
        tiles run through the tower exactly like HF so their
        attention leakage into valid tiles matches bit-for-bit)."""
        vw = params["vision"]
        T = self.max_tiles
        g = self.grid
        vh = self.v_h
        npp = self.num_patches
        pp = self.patches_pad
        x = jax.lax.conv_general_dilated(
            tiles.astype(vw["patch_embed"].dtype), vw["patch_embed"],
            (self.vis.patch_size, self.vis.patch_size), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x.reshape(T, vh, g * g).transpose(0, 2, 1)  # [T, P, vh]
        # pre-tile positional embedding (gated, per aspect ratio)
        pre = jnp.take(vw["pre_tile_embed"], ar_id, axis=0).reshape(
            T, 1, vh)
        x = x + pre * jnp.tanh(vw["pre_tile_gate"])
        # class token at position 0
        cls = jnp.broadcast_to(vw["class_embedding"], (T, 1, vh))
        x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
        # gated positional embedding: (1-tanh g)*pos + tanh g * tile
        gate = jnp.tanh(vw["pos_gate"])
        x = x + (1.0 - gate) * vw["pos_embed"][None]
        tile_pos = jnp.take(vw["tile_pos_embed"], ar_id,
                            axis=0).reshape(T, npp, vh)
        x = x + gate * tile_pos
        x = layer_norm(x, vw["ln_pre"], vw["ln_pre_bias"], 1e-5)
        # pad patches to the 8-sublane tile like HF (zeros)
        x = jnp.pad(x, ((0, 0), (0, pp - npp), (0, 0)))
        # HF's quirky aspect-ratio mask: additive[i, j] =
        # (1-valid_i)*(1-valid_j)*finfo.min — valid QUERY rows are
        # never masked (they attend padding keys); replicated exactly
        n_tiles = self._num_tiles(ar_id)
        tile_ok = (jnp.arange(T) < n_tiles)
        patch_ok = jnp.arange(pp) < npp
        valid = (tile_ok[:, None] & patch_ok[None, :]).reshape(T * pp)
        inv = 1.0 - valid.astype(jnp.float32)
        add_mask = inv[:, None] * inv[None, :] * _NEG
        x = x.reshape(T * pp, vh)
        inters = []
        nloc = self.vis.num_hidden_layers
        for li in range(nloc):
            w = jax.tree.map(lambda a, li=li: a[li],
                             params["vision"]["layers"])
            x = self._vit_layer(w, x, add_mask, gated=False)
            # HF hidden_states[i] = OUTPUT of layer i
            if li in self.vis.intermediate_layers_indices:
                inters.append(x)
        x = layer_norm(x, vw["ln_post"], vw["ln_post_bias"], 1e-5)
        # post-tile embedding then the gated global transformer
        x = x.reshape(T, pp, vh)
        post = jnp.take(vw["post_tile_embed"], ar_id, axis=0).reshape(
            T, 1, vh)
        x = x + post * jnp.tanh(vw["post_tile_gate"])
        x = x.reshape(T * pp, vh)
        for li in range(self.vis.num_global_layers):
            w = jax.tree.map(lambda a, li=li: a[li],
                             params["vision"]["glayers"])
            x = self._vit_layer(w, x, add_mask, gated=True)
        # concat [final | interleave(intermediates) by hidden dim]
        # (HF: stack(dim=-1) then reshape — n_int fastest)
        x = x.reshape(T, pp, vh)[:, :npp]
        ints = jnp.stack([h.reshape(T, pp, vh)[:, :npp]
                          for h in inters], axis=-1)
        ints = ints.reshape(T, npp, vh * self.n_intermediate)
        feats = jnp.concatenate([x, ints], axis=-1)
        out = feats @ params["projector"] + params["projector_bias"]
        return out.reshape(T * npp, self.hidden)

    def _num_tiles(self, ar_id):
        """Tile count per aspect-ratio id (id 0 = padding = 0)."""
        counts = jnp.asarray(
            [0] + [h * w for h, w in self.supported_ratios],
            jnp.int32)
        return counts[ar_id]

    def encode_cross_kv(self, params, enc: jax.Array) -> jax.Array:
        """[T_enc, H] vision states → [Lx, T_enc, 2*Hk*Dh] per-layer
        cross K/V with the per-head k_norm baked in (HF applies
        k_norm to key states inside MllamaTextCrossAttention)."""
        xw = params["xlayers"]
        t = enc.shape[0]
        eps = self.cfg.rms_norm_eps

        def layer_kv(wk, wv, knorm):
            k = (enc @ wk).reshape(t, self.num_kv, self.head_dim)
            k = rms_norm(k, knorm, eps)
            v = (enc @ wv).reshape(t, self.num_kv, self.head_dim)
            return jnp.stack([k, v], axis=2).reshape(t, -1)

        return jax.vmap(layer_kv)(xw["k_proj"], xw["v_proj"],
                                  xw["k_norm"])

    # ------------------------------------------------------------------
    # decoder
    # ------------------------------------------------------------------

    def _cross_layer(self, w, x, ci, attn_meta, use_pallas,
                     cross_kv_cache, t):
        eps = self.cfg.rms_norm_eps
        res = x
        h = rms_norm(x, w["input_layernorm"], eps)
        q = (h @ w["q_proj"]).reshape(t, self.num_q, self.head_dim)
        q = rms_norm(q, w["q_norm"], eps)
        o = cross_attention(q, cross_kv_cache, ci, attn_meta,
                            self.sm_scale, self.num_kv,
                            use_pallas=use_pallas)
        o = o.reshape(t, -1) @ w["o_proj"]
        x = res + jnp.tanh(w["attn_gate"]) * o
        res = x
        h = rms_norm(x, w["post_attention_layernorm"], eps)
        h = self.act_fn(h @ w["gate_proj"], h @ w["up_proj"])
        return res + jnp.tanh(w["mlp_gate"]) * (h @ w["down_proj"])

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 cross_kv_cache: Optional[jax.Array] = None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        layers = params["layers"]

        def self_fn(l, carry):
            x, kv = carry
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            return self._layer_step(w, x, kv, l, positions, attn_meta,
                                    params, use_pallas, t)

        for (si0, n, ci) in self.segments:
            if n:
                x, kv_caches = jax.lax.fori_loop(
                    si0, si0 + n, self_fn, (x, kv_caches))
            if ci is not None:
                w = jax.tree.map(lambda a, ci=ci: a[ci],
                                 params["xlayers"])
                x = self._cross_layer(w, x, ci, attn_meta, use_pallas,
                                      cross_kv_cache, t)
        x = rms_norm(x, params["final_norm"], self.cfg.rms_norm_eps)
        return x, kv_caches
