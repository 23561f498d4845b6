"""GraniteSpeech (GraniteSpeechForConditionalGeneration).

Reference: vllm/model_executor/models/granite_speech.py — a conformer
CTC audio encoder (half-step feedforwards, Shaw-relative block
attention over ``context_size`` windows, GLU conv module with eval-
mode batch norm, mid-stack CTC injection) + a windowed BLIP-2
Q-Former projector (``window_size`` frames → window/downsample_rate
query tokens per block) over a Granite decoder.

TPU design: the conformer + projector run in the jitted mm encoder;
audio lengths snap to whole ``window_size`` blocks (HF pads the same
way, so the padded-block query outputs match bit-for-bit); the
decoder and Q-Former ride the registry Granite implementation and the
shared blip2 qformer_forward. The checkpoint's LoRA adapter
(has_lora_adapter) loads through the standard multi-LoRA path when
supplied as an adapter; base weights here.
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
from vllm_main_modify_tpu.models.blip2 import qformer_forward
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d

EP = "encoder."
PQ = "projector.qformer.encoder.layer.{i}."


class GraniteSpeechForConditionalGeneration:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        ec = hf.encoder_config
        g = (ec.get if isinstance(ec, dict)
             else lambda k, d=None: getattr(ec, k, d))
        self.in_dim = int(g("input_dim"))
        self.a_hidden = int(g("hidden_dim"))
        self.a_layers = int(g("num_layers"))
        self.a_heads = int(g("num_heads"))
        self.a_head_dim = int(g("dim_head"))
        self.ff_mult = int(g("feedforward_mult"))
        self.a_out = int(g("output_dim"))
        self.context = int(g("context_size", 200))
        self.max_pos = int(g("max_pos_emb", 512))
        self.conv_k = int(g("conv_kernel_size", 15))
        self.conv_exp = int(g("conv_expansion_factor", 2))

        pc = hf.projector_config
        pg = (pc.get if isinstance(pc, dict)
              else lambda k, d=None: getattr(pc, k, d))
        self.q_hidden = int(pg("hidden_size"))
        self.q_layers = int(pg("num_hidden_layers"))
        self.q_heads = int(pg("num_attention_heads"))
        self.q_head_dim = self.q_hidden // self.q_heads
        self.q_inter = int(pg("intermediate_size"))
        self.x_freq = int(pg("cross_attention_frequency", 1))
        self.q_eps = float(pg("layer_norm_eps", 1e-12))
        self.window = int(getattr(hf, "window_size", 15))
        self.ds = int(getattr(hf, "downsample_rate", 5))
        self.num_query = self.window // self.ds

        # Shaw relative-distance table indices [C, C]
        seq = np.arange(self.context)
        dist = np.clip(seq[:, None] - seq[None, :], -self.context,
                       self.context) + self.max_pos
        self._attn_dists = jnp.asarray(dist, jnp.int32)

        from vllm_main_modify_tpu.models.registry import \
            resolve_model_cls

        text_archs = getattr(hf.text_config, "architectures",
                             None) or ["GraniteForCausalLM"]
        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = text_archs[0]
        self.language_model = resolve_model_cls(text_archs[0])(
            text_cfg)
        self.text_cfg = text_cfg

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        D, L = self.a_hidden, self.a_layers
        F = D * self.ff_mult
        Dq, Iq, Lq = self.q_hidden, self.q_inter, self.q_layers
        H = getattr(self.text_cfg.hf_config, "hidden_size", 0)
        C2 = D * self.conv_exp
        t = transpose2d

        def astk(path, shape, hf_key, transform=t):
            return ParamSpec(f"audio.layers.{path}", (L, *shape),
                             P(*([None] * (len(shape) + 1))),
                             EP + "layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        def qstk(path, shape, hf_key, transform=t):
            return ParamSpec(f"projq.layers.{path}", (Lq, *shape),
                             P(*([None] * (len(shape) + 1))),
                             PQ + hf_key, stacked=True,
                             transform=transform, fill_missing=0.0)

        specs = [
            ParamSpec("audio.input_linear", (self.in_dim, D),
                      P(None, None), EP + "input_linear.weight",
                      transform=t),
            ParamSpec("audio.input_linear_bias", (D, ), P(),
                      EP + "input_linear.bias", transform=None),
            ParamSpec("audio.out", (D, self.a_out), P(None, None),
                      EP + "out.weight", transform=t),
            ParamSpec("audio.out_bias", (self.a_out, ), P(),
                      EP + "out.bias", transform=None),
            ParamSpec("audio.out_mid", (self.a_out, D), P(None, None),
                      EP + "out_mid.weight", transform=t),
            ParamSpec("audio.out_mid_bias", (D, ), P(),
                      EP + "out_mid.bias", transform=None),
            ParamSpec("projq.query", (1, self.num_query, Dq),
                      P(None, None, None), "projector.query",
                      transform=None),
            ParamSpec("projq.input_norm", (Dq, ), P(),
                      "projector.qformer.layernorm.weight",
                      transform=None),
            ParamSpec("projq.input_norm_bias", (Dq, ), P(),
                      "projector.qformer.layernorm.bias",
                      transform=None),
            ParamSpec("projq.linear", (Dq, H), P(None, None),
                      "projector.linear.weight", transform=t),
            ParamSpec("projq.linear_bias", (H, ), P(),
                      "projector.linear.bias", transform=None),
        ]
        # conformer blocks
        for ff in ("ff1", "ff2"):
            specs += [
                astk(f"{ff}.pre_norm", (D, ), f"{ff}.pre_norm.weight",
                     transform=None),
                astk(f"{ff}.pre_norm_bias", (D, ),
                     f"{ff}.pre_norm.bias", transform=None),
                astk(f"{ff}.up_proj", (D, F), f"{ff}.up_proj.weight"),
                astk(f"{ff}.up_proj_bias", (F, ),
                     f"{ff}.up_proj.bias", transform=None),
                astk(f"{ff}.down_proj", (F, D),
                     f"{ff}.down_proj.weight"),
                astk(f"{ff}.down_proj_bias", (D, ),
                     f"{ff}.down_proj.bias", transform=None),
            ]
        qk = self.a_heads * self.a_head_dim
        specs += [
            astk("attn.pre_norm", (D, ), "attn.pre_norm.weight",
                 transform=None),
            astk("attn.pre_norm_bias", (D, ), "attn.pre_norm.bias",
                 transform=None),
            astk("attn.to_q", (D, qk), "attn.to_q.weight"),
            astk("attn.to_kv", (D, 2 * qk), "attn.to_kv.weight"),
            astk("attn.to_out", (qk, D), "attn.to_out.weight"),
            astk("attn.to_out_bias", (D, ), "attn.to_out.bias",
                 transform=None),
            astk("attn.rel_pos_emb",
                 (2 * self.max_pos + 1, self.a_head_dim),
                 "attn.rel_pos_emb.weight", transform=None),
            astk("conv.norm", (D, ), "conv.norm.weight",
                 transform=None),
            astk("conv.norm_bias", (D, ), "conv.norm.bias",
                 transform=None),
            astk("conv.up_conv", (C2 * 2, D, 1),
                 "conv.up_conv.weight", transform=None),
            astk("conv.up_conv_bias", (C2 * 2, ),
                 "conv.up_conv.bias", transform=None),
            astk("conv.depth_conv", (C2, 1, self.conv_k),
                 "conv.depth_conv.conv.weight", transform=None),
            astk("conv.bn_w", (C2, ), "conv.batch_norm.weight",
                 transform=None),
            astk("conv.bn_b", (C2, ), "conv.batch_norm.bias",
                 transform=None),
            astk("conv.bn_mean", (C2, ),
                 "conv.batch_norm.running_mean", transform=None),
            astk("conv.bn_var", (C2, ),
                 "conv.batch_norm.running_var", transform=None),
            astk("conv.down_conv", (D, C2, 1),
                 "conv.down_conv.weight", transform=None),
            astk("conv.down_conv_bias", (D, ),
                 "conv.down_conv.bias", transform=None),
            astk("post_norm", (D, ), "post_norm.weight",
                 transform=None),
            astk("post_norm_bias", (D, ), "post_norm.bias",
                 transform=None),
        ]
        # projector qformer (shared blip2 layer layout)
        for mod, dk in (("attention", Dq), ("crossattention",
                                            self.a_hidden)):
            for nm in ("query", "key", "value"):
                din = Dq if nm == "query" else dk
                specs += [
                    qstk(f"{mod}.{nm}", (din, Dq),
                         f"{mod}.attention.{nm}.weight"),
                    qstk(f"{mod}.{nm}_bias", (Dq, ),
                         f"{mod}.attention.{nm}.bias",
                         transform=None),
                ]
            specs += [
                qstk(f"{mod}.dense", (Dq, Dq),
                     f"{mod}.output.dense.weight"),
                qstk(f"{mod}.dense_bias", (Dq, ),
                     f"{mod}.output.dense.bias", transform=None),
                qstk(f"{mod}.norm", (Dq, ),
                     f"{mod}.output.LayerNorm.weight",
                     transform=None),
                qstk(f"{mod}.norm_bias", (Dq, ),
                     f"{mod}.output.LayerNorm.bias", transform=None),
            ]
        specs += [
            qstk("intermediate_query", (Dq, Iq),
                 "intermediate_query.dense.weight"),
            qstk("intermediate_query_bias", (Iq, ),
                 "intermediate_query.dense.bias", transform=None),
            qstk("output_query", (Iq, Dq),
                 "output_query.dense.weight"),
            qstk("output_query_bias", (Dq, ),
                 "output_query.dense.bias", transform=None),
            qstk("output_query_norm", (Dq, ),
                 "output_query.LayerNorm.weight", transform=None),
            qstk("output_query_norm_bias", (Dq, ),
                 "output_query.LayerNorm.bias", transform=None),
        ]
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.language_model.kv_cache_spec()

    # ------------------------------------------------------------------

    def _conformer_block(self, w, x):
        """[B, T, D] → [B, T, D] (reference:
        GraniteSpeechConformerBlock)."""
        def ff(fw, x):
            h = layer_norm(x, fw["pre_norm"], fw["pre_norm_bias"],
                           1e-5)
            h = jax.nn.silu(h @ fw["up_proj"] + fw["up_proj_bias"])
            return h @ fw["down_proj"] + fw["down_proj_bias"]

        x = 0.5 * ff(w["ff1"], x) + x
        x = self._attn(w["attn"], x) + x
        x = self._conv(w["conv"], x) + x
        x = 0.5 * ff(w["ff2"], x) + x
        return layer_norm(x, w["post_norm"], w["post_norm_bias"],
                          1e-5)

    def _attn(self, w, x):
        b, tt, _ = x.shape
        c = self.context
        nb = -(-tt // c)
        rem = tt % c
        h = layer_norm(x, w["pre_norm"], w["pre_norm_bias"], 1e-5)
        if rem:
            h = jnp.pad(h, ((0, 0), (0, c - rem), (0, 0)))
        hd, nh = self.a_head_dim, self.a_heads
        q = (h @ w["to_q"]).reshape(b, nb, c, nh, hd)
        kv = (h @ w["to_kv"]).reshape(b, nb, c, 2, nh, hd)
        k, v = kv[:, :, :, 0], kv[:, :, :, 1]
        q = jnp.transpose(q, (0, 1, 3, 2, 4))  # [b, nb, h, c, d]
        k = jnp.transpose(k, (0, 1, 3, 2, 4))
        v = jnp.transpose(v, (0, 1, 3, 2, 4))
        scale = hd**-0.5
        rel = jnp.take(w["rel_pos_emb"], self._attn_dists,
                       axis=0)  # [c, c, d]
        pos = jnp.einsum("bmhcd,crd->bmhcr", q, rel) * scale
        if rem:
            # the tail block attends only within the valid prefix
            mask = jnp.ones((c, c), bool)
            mask = mask.at[:rem, :rem].set(False)
            tail = jnp.where(mask, jnp.float32(-1e30), pos[:, -1])
            pos = pos.at[:, -1].set(tail)
        scores = jnp.einsum("bmhcd,bmhrd->bmhcr", q, k) * scale + pos
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bmhcr,bmhrd->bmhcd", p, v)
        o = jnp.transpose(o, (0, 1, 3, 2, 4)).reshape(b, nb * c, -1)
        return o[:, :tt] @ w["to_out"] + w["to_out_bias"]

    def _conv(self, w, x):
        b, tt, d = x.shape
        h = layer_norm(x, w["norm"], w["norm_bias"], 1e-5)
        h = jnp.transpose(h, (0, 2, 1))  # [b, d, t]
        up = jax.lax.conv_general_dilated(
            h, w["up_conv"].astype(jnp.float32), (1, ), [(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"))
        up = up + w["up_conv_bias"].astype(jnp.float32)[None, :, None]
        a, g = jnp.split(up, 2, axis=1)
        h = a * jax.nn.sigmoid(g)
        pad = self.conv_k // 2
        pad_off = (self.conv_k + 1) % 2
        h = jax.lax.conv_general_dilated(
            h, w["depth_conv"].astype(jnp.float32), (1, ),
            [(pad, pad - pad_off)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=h.shape[1])
        # eval-mode batch norm (running statistics)
        mean = w["bn_mean"].astype(jnp.float32)[None, :, None]
        var = w["bn_var"].astype(jnp.float32)[None, :, None]
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        h = h * w["bn_w"].astype(jnp.float32)[None, :, None] + \
            w["bn_b"].astype(jnp.float32)[None, :, None]
        h = jax.nn.silu(h)
        down = jax.lax.conv_general_dilated(
            h, w["down_conv"].astype(jnp.float32), (1, ), [(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"))
        down = down + \
            w["down_conv_bias"].astype(jnp.float32)[None, :, None]
        return jnp.transpose(down, (0, 2, 1))

    def encode_audio_mm(self, params, feats: jax.Array) -> jax.Array:
        """[N, T, input_dim] → [N * (T/ds), H] projected tokens (T a
        multiple of window_size)."""
        a = params["audio"]
        x = feats.astype(jnp.float32) @ a["input_linear"] + \
            a["input_linear_bias"]
        layers = a["layers"]
        for li in range(self.a_layers):
            w = jax.tree.map(lambda v, li=li: v[li], layers)
            x = self._conformer_block(w, x)
            if li + 1 == self.a_layers // 2:
                mid = x @ a["out"] + a["out_bias"]
                x = x + (jax.nn.softmax(mid, axis=-1) @
                         a["out_mid"] + a["out_mid_bias"])
        # (the ``out`` head is the CTC vocabulary — used only for
        # the mid-stack injection above; the projector consumes the
        # hidden_dim states)
        # windowed qformer projector
        pq = params["projq"]
        n, tt, _ = x.shape
        nb = tt // self.window
        enc = x.reshape(n * nb, self.window, self.a_hidden)
        query = jnp.broadcast_to(
            pq["query"].astype(jnp.float32),
            (n * nb, self.num_query, self.q_hidden))
        query = layer_norm(query, pq["input_norm"],
                           pq["input_norm_bias"], self.q_eps)
        out = qformer_forward(pq["layers"], query, enc, self.q_layers,
                              self.q_heads, self.q_head_dim,
                              self.x_freq, self.q_eps)
        out = out.reshape(n, nb * self.num_query, self.q_hidden)
        out = out @ pq["linear"] + pq["linear_bias"]
        return out.reshape(n * out.shape[1], -1)

    def encode_images(self, params, feats: jax.Array) -> jax.Array:
        # the mm buffer routes audio features here ([N, T, input_dim])
        return self.encode_audio_mm(params, feats)

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
