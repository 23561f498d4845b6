"""GOT-OCR2: SAM-style windowed ViT encoder + conv neck/upsampler
over a Qwen2 decoder.

Reference parity: vllm/model_executor/models/got_ocr2.py (HF
modeling_got_ocr2.py is the oracle). The tower is the SAM ViT-B
recipe: patch conv + absolute position grid, pre-LN blocks where most
layers attend within window_size x window_size windows (the
global_attn_indexes layers attend globally), with MViTv2-style
decomposed relative position biases (rel_pos_h/w tables indexed by
coordinate difference — the tables are sized 2*size-1 so HF's
interpolation path is the identity), then a 1x1+3x3 conv neck with
channels-first LayerNorm. The projector downsamples 4x via two
stride-2 convs and a linear; tokens per image = (grid/4)^2. Runs once
per request at ingest (encode_images), embeddings splice at the
<image> placeholders like LLaVA."""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.layers.normalization import layer_norm
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.registry import resolve_model_cls

VT = "vision_tower."


def _ln_cf(x, w, b, eps=1e-6):
    """LayerNorm over the CHANNEL axis of [N, C, H, W]."""
    mu = x.mean(axis=1, keepdims=True)
    var = ((x - mu)**2).mean(axis=1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    return xn * w[None, :, None, None] + b[None, :, None, None]


class GotOcr2ForConditionalGeneration:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        self.vc = vc
        self.v_h = vc.hidden_size
        self.v_heads = vc.num_attention_heads
        self.v_dh = self.v_h // self.v_heads
        self.grid = vc.image_size // vc.patch_size
        self.window = vc.window_size
        self.global_ids = set(vc.global_attn_indexes)
        self.v_eps = getattr(vc, "layer_norm_eps", 1e-6)
        self.out_ch = vc.output_channels

        text_archs = getattr(hf.text_config, "architectures",
                             None) or ["Qwen2ForCausalLM"]
        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = text_archs[0]
        self.language_model = resolve_model_cls(text_archs[0])(
            text_cfg)

    def param_specs(self) -> list[ParamSpec]:
        vc = self.vc
        vh, md = self.v_h, vc.mlp_dim
        t = transpose2d
        g = self.grid
        specs = [
            ParamSpec("vision.patch_embed", (vh, 3, vc.patch_size,
                                             vc.patch_size),
                      P(None, None, None, None),
                      VT + "patch_embed.projection.weight",
                      transform=None),
            ParamSpec("vision.patch_embed_bias", (vh, ), P(),
                      VT + "patch_embed.projection.bias",
                      transform=None),
        ]
        if getattr(vc, "use_abs_pos", True):
            specs.append(
                ParamSpec("vision.pos_embed", (1, g, g, vh),
                          P(None, None, None, None),
                          VT + "pos_embed", transform=None))
        specs += [
            ParamSpec("vision.neck_conv1", (self.out_ch, vh, 1, 1),
                      P(None, None, None, None),
                      VT + "neck.conv1.weight", transform=None),
            ParamSpec("vision.neck_ln1", (self.out_ch, ), P(),
                      VT + "neck.layer_norm1.weight", transform=None),
            ParamSpec("vision.neck_ln1_bias", (self.out_ch, ), P(),
                      VT + "neck.layer_norm1.bias", transform=None),
            ParamSpec("vision.neck_conv2",
                      (self.out_ch, self.out_ch, 3, 3),
                      P(None, None, None, None),
                      VT + "neck.conv2.weight", transform=None),
            ParamSpec("vision.neck_ln2", (self.out_ch, ), P(),
                      VT + "neck.layer_norm2.weight", transform=None),
            ParamSpec("vision.neck_ln2_bias", (self.out_ch, ), P(),
                      VT + "neck.layer_norm2.bias", transform=None),
            ParamSpec("projector.conv1",
                      (2 * self.out_ch, self.out_ch, 3, 3),
                      P(None, None, None, None),
                      "multi_modal_projector.conv_upsampler1.weight",
                      transform=None),
            ParamSpec("projector.conv2",
                      (self.cfg.hidden_size, 2 * self.out_ch, 3, 3),
                      P(None, None, None, None),
                      "multi_modal_projector.conv_upsampler2.weight",
                      transform=None),
            ParamSpec("projector.linear",
                      (self.cfg.hidden_size, self.cfg.hidden_size),
                      P(None, None),
                      "multi_modal_projector.multimodal_projector"
                      ".weight", transform=t),
            ParamSpec("projector.linear_bias", (self.cfg.hidden_size, ),
                      P(), "multi_modal_projector"
                      ".multimodal_projector.bias", transform=None),
        ]

        def vstk(path, shape, hf_key, transform=t):
            return ParamSpec(
                f"vision.layers.{path}",
                (vc.num_hidden_layers, *shape),
                P(*([None] * (len(shape) + 1))),
                VT + "layers.{i}." + hf_key, stacked=True,
                transform=transform)

        specs += [
            vstk("ln1", (vh, ), "layer_norm1.weight", transform=None),
            vstk("ln1_bias", (vh, ), "layer_norm1.bias",
                 transform=None),
            vstk("qkv", (vh, 3 * vh), "attn.qkv.weight"),
            vstk("qkv_bias", (3 * vh, ), "attn.qkv.bias",
                 transform=None),
            vstk("proj", (vh, vh), "attn.proj.weight"),
            vstk("proj_bias", (vh, ), "attn.proj.bias",
                 transform=None),
            vstk("ln2", (vh, ), "layer_norm2.weight", transform=None),
            vstk("ln2_bias", (vh, ), "layer_norm2.bias",
                 transform=None),
            vstk("lin1", (vh, md), "mlp.lin1.weight"),
            vstk("lin1_bias", (md, ), "mlp.lin1.bias",
                 transform=None),
            vstk("lin2", (md, vh), "mlp.lin2.weight"),
            vstk("lin2_bias", (vh, ), "mlp.lin2.bias",
                 transform=None),
        ]
        # decomposed rel-pos tables: per-layer shapes differ (window
        # layers 2*window-1, global layers 2*grid-1) — unstacked
        if getattr(vc, "use_rel_pos", True):
            for i in range(vc.num_hidden_layers):
                size = g if i in self.global_ids else self.window
                for ax in ("h", "w"):
                    specs.append(
                        ParamSpec(f"vision.rel_{ax}_{i}",
                                  (2 * size - 1, self.v_dh),
                                  P(None, None),
                                  VT + f"layers.{i}.attn.rel_pos_{ax}",
                                  transform=None))
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self):
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def _sam_attn(self, w, x, rel_h, rel_w, size):
        """[B, s, s, vh] windowed/global attention with decomposed
        relative position biases (rel tables exactly 2*size-1 rows →
        HF's interpolation is the identity)."""
        b = x.shape[0]
        hw = size * size
        qkv = (x.reshape(b, hw, self.v_h) @ w["qkv"] +
               w["qkv_bias"]).reshape(b, hw, 3, self.v_heads,
                                      self.v_dh)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)  # [b, H, hw, dh]
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (
            self.v_dh**-0.5)
        if rel_h is not None:
            # R[qi, kj] = table[(size-1) + qi - kj]
            qi = jnp.arange(size)[:, None]
            kj = jnp.arange(size)[None, :]
            Rh = rel_h[(size - 1) + qi - kj]  # [s, s, dh]
            Rw = rel_w[(size - 1) + qi - kj]
            qg = q.reshape(b, self.v_heads, size, size, self.v_dh)
            bh = jnp.einsum("bnhwc,hkc->bnhwk", qg, Rh)
            bw = jnp.einsum("bnhwc,wkc->bnhwk", qg, Rw)
            bias = (bh[..., :, None] + bw[..., None, :]).reshape(
                b, self.v_heads, hw, hw)
            scores = scores + bias
        p = jax.nn.softmax(scores.astype(jnp.float32),
                           axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, size, size, self.v_h)
        return o @ w["proj"] + w["proj_bias"]

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N, (g/4)^2, H_text]."""
        if pixel_values.ndim == 5:
            pixel_values = pixel_values[0]
        vw = params["vision"]
        n = pixel_values.shape[0]
        g = self.grid
        x = jax.lax.conv_general_dilated(
            pixel_values.astype(jnp.float32),
            vw["patch_embed"].astype(jnp.float32),
            (self.vc.patch_size, self.vc.patch_size), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x.transpose(0, 2, 3, 1) + vw["patch_embed_bias"]
        if "pos_embed" in vw:
            x = x + vw["pos_embed"]
        x = x.astype(self.cfg.jax_dtype)  # [n, g, g, vh]
        ws = self.window
        pad = (ws - g % ws) % ws
        gp = g + pad
        nw = gp // ws
        for li in range(self.vc.num_hidden_layers):
            w = jax.tree.map(lambda a, li=li: a[li],
                             vw["layers"])
            rel_h = vw.get(f"rel_h_{li}")
            rel_w = vw.get(f"rel_w_{li}")
            res = x
            h = layer_norm(x, w["ln1"], w["ln1_bias"], self.v_eps)
            if li in self.global_ids:
                h = self._sam_attn(w, h, rel_h, rel_w, g)
            else:
                # window partition → attend → unpartition
                h = jnp.pad(h, ((0, 0), (0, pad), (0, pad), (0, 0)))
                h = h.reshape(n, nw, ws, nw, ws, self.v_h)
                h = h.transpose(0, 1, 3, 2, 4, 5).reshape(
                    n * nw * nw, ws, ws, self.v_h)
                h = self._sam_attn(w, h, rel_h, rel_w, ws)
                h = h.reshape(n, nw, nw, ws, ws, self.v_h)
                h = h.transpose(0, 1, 3, 2, 4, 5).reshape(
                    n, gp, gp, self.v_h)[:, :g, :g]
            x = res + h
            res = x
            h = layer_norm(x, w["ln2"], w["ln2_bias"], self.v_eps)
            h = jax.nn.gelu(h @ w["lin1"] + w["lin1_bias"],
                            approximate=False)
            x = res + (h @ w["lin2"] + w["lin2_bias"])
        # neck: 1x1 conv → channels-first LN → 3x3 conv → LN
        x = x.transpose(0, 3, 1, 2).astype(jnp.float32)  # [n, vh, g, g]
        x = jax.lax.conv_general_dilated(
            x, vw["neck_conv1"].astype(jnp.float32), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = _ln_cf(x, vw["neck_ln1"], vw["neck_ln1_bias"])
        x = jax.lax.conv_general_dilated(
            x, vw["neck_conv2"].astype(jnp.float32), (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = _ln_cf(x, vw["neck_ln2"], vw["neck_ln2_bias"])
        # projector: two stride-2 convs then a linear
        pw = params["projector"]
        x = jax.lax.conv_general_dilated(
            x, pw["conv1"].astype(jnp.float32), (2, 2),
            [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.lax.conv_general_dilated(
            x, pw["conv2"].astype(jnp.float32), (2, 2),
            [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        go = x.shape[-1]
        x = x.reshape(n, self.cfg.hidden_size, go * go).transpose(
            0, 2, 1).astype(self.cfg.jax_dtype)
        return x @ pw["linear"] + pw["linear_bias"]

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
