"""Step3 text decoder (Step3TextForCausalLM): MFA low-rank shared-q
MQA attention + shared-expert MoE.

Reference parity: vllm/model_executor/models/step3_text.py (upstream
is remote-code-only). Per layer:

- attention: one fused ``qkv_proj`` emits a low-rank q
  (``share_q_dim``) plus ONE 256-wide k and v head; q is RMS-normed
  (``inter_norm``) then expanded to all heads by ``wq`` — multi-query
  attention over the single cached KV head;
- MoE layers (``moe_layers_enum``, default all but layer 0): experts
  ship STACKED ([E, inter, H] ``moe.gate_proj/up_proj/down_proj``)
  with a ``moe.gate`` router (softmax top-k, renormalize per
  ``norm_expert_weight``) plus a dense ``share_expert`` MLP summed in;
- dense layers: plain silu MLP.

The layer loop is a static Python loop — dense/moe routing and the
stacked-array index per layer are compile-time constants.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.activation import ACT2FN
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.moe import moe_ffn
from vllm_main_modify_tpu.layers.normalization import (layer_norm,
                                                       rms_norm)
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d


def _t_experts(x):
    return np.ascontiguousarray(np.swapaxes(x, -1, -2))


class Step3TextForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        self.hidden = config.hidden_size
        self.L = config.num_layers
        self.num_q = config.num_attention_heads
        self.head_dim = int(getattr(hf, "head_dim", 256))
        self.share_q = int(getattr(hf, "share_q_dim",
                                   self.head_dim))
        self.inter = config.intermediate_size
        self.E = int(getattr(hf, "moe_num_experts", 0))
        self.top_k = int(getattr(hf, "moe_top_k", 1))
        self.moe_inter = int(getattr(hf, "moe_intermediate_size", 0))
        self.share_inter = int(getattr(hf, "share_expert_dim",
                                       self.inter))
        self.renorm = bool(getattr(hf, "norm_expert_weight", False))
        enum = getattr(hf, "moe_layers_enum", None)
        if enum is not None:
            self.moe_ids = [int(i) for i in
                            str(enum).strip().split(",")]
        else:
            self.moe_ids = list(range(1, self.L))
        self.dense_ids = [i for i in range(self.L)
                          if i not in set(self.moe_ids)]
        self.sm_scale = self.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta,
                             config.rope_scaling))
        self.act_fn = ACT2FN["silu"]
        self.tie_embeddings = config.tie_word_embeddings

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, Dh = self.hidden, self.head_dim
        qd = self.num_q * Dh
        t = transpose2d
        specs = [
            ParamSpec("embed_tokens", (c.vocab_size, H),
                      P("model", None), "model.embed_tokens.weight",
                      transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=None),
        ]
        if not self.tie_embeddings:
            specs.append(
                ParamSpec("lm_head", (H, c.vocab_size),
                          P(None, "model"), "lm_head.weight",
                          transform=t))

        def stk(tag, ids, path, shape, hf_key, transform=t):
            return ParamSpec(f"{tag}.{path}", (len(ids), *shape),
                             P(*([None] * (len(shape) + 1))),
                             "model.layers.{i}." + hf_key,
                             stacked=True, layer_ids=tuple(ids),
                             transform=transform)

        all_ids = list(range(self.L))
        specs += [
            stk("layers", all_ids, "input_layernorm", (H, ),
                "input_layernorm.weight", transform=None),
            stk("layers", all_ids, "post_attention_layernorm", (H, ),
                "post_attention_layernorm.weight", transform=None),
            stk("layers", all_ids, "q_proj", (H, self.share_q),
                "self_attn.q_proj.weight"),
            stk("layers", all_ids, "k_proj", (H, Dh),
                "self_attn.k_proj.weight"),
            stk("layers", all_ids, "v_proj", (H, Dh),
                "self_attn.v_proj.weight"),
            stk("layers", all_ids, "inter_norm", (self.share_q, ),
                "self_attn.inter_norm.weight", transform=None),
            stk("layers", all_ids, "wq", (self.share_q, qd),
                "self_attn.wq.weight"),
            stk("layers", all_ids, "o_proj", (qd, H),
                "self_attn.o_proj.weight"),
        ]
        if self.dense_ids:
            specs += [
                stk("dense", self.dense_ids, "gate_proj",
                    (H, self.inter), "mlp.gate_proj.weight"),
                stk("dense", self.dense_ids, "up_proj",
                    (H, self.inter), "mlp.up_proj.weight"),
                stk("dense", self.dense_ids, "down_proj",
                    (self.inter, H), "mlp.down_proj.weight"),
            ]
        if self.moe_ids:
            mi = self.moe_inter
            specs += [
                stk("moe", self.moe_ids, "router", (H, self.E),
                    "moe.gate.weight"),
                stk("moe", self.moe_ids, "w_gate",
                    (self.E, H, mi), "moe.gate_proj.weight",
                    transform=_t_experts),
                stk("moe", self.moe_ids, "w_up",
                    (self.E, H, mi), "moe.up_proj.weight",
                    transform=_t_experts),
                stk("moe", self.moe_ids, "w_down",
                    (self.E, mi, H), "moe.down_proj.weight",
                    transform=_t_experts),
                stk("moe", self.moe_ids, "share_gate",
                    (H, self.share_inter),
                    "share_expert.gate_proj.weight"),
                stk("moe", self.moe_ids, "share_up",
                    (H, self.share_inter),
                    "share_expert.up_proj.weight"),
                stk("moe", self.moe_ids, "share_down",
                    (self.share_inter, H),
                    "share_expert.down_proj.weight"),
            ]
        return specs

    def kv_cache_spec(self):
        return 1, self.head_dim, self.L

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        cfg = self.cfg
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        dense_pos = {l: j for j, l in enumerate(self.dense_ids)}
        moe_pos = {l: j for j, l in enumerate(self.moe_ids)}
        for li in range(self.L):
            w = jax.tree.map(lambda a, li=li: a[li],
                             params["layers"])
            res = x
            h = rms_norm(x, w["input_layernorm"], cfg.rms_norm_eps)
            qlow = rms_norm(h @ w["q_proj"], w["inter_norm"],
                            cfg.rms_norm_eps)
            q = (qlow @ w["wq"]).reshape(t, self.num_q,
                                         self.head_dim)
            k = (h @ w["k_proj"]).reshape(t, 1, self.head_dim)
            v = (h @ w["v_proj"]).reshape(t, 1, self.head_dim)
            q, k = apply_rope(q, k, positions, self.inv_freq)
            o, kv_caches = attention(q, k, v, kv_caches, li,
                                     attn_meta, self.sm_scale,
                                     use_pallas=use_pallas)
            x = res + o.reshape(t, -1) @ w["o_proj"]
            res = x
            h = rms_norm(x, w["post_attention_layernorm"],
                         cfg.rms_norm_eps)
            if li in moe_pos:
                mw = jax.tree.map(lambda a, j=moe_pos[li]: a[j],
                                  params["moe"])
                share = self.act_fn(h @ mw["share_gate"],
                                    h @ mw["share_up"]) @ \
                    mw["share_down"]
                moe = moe_ffn(h, mw["router"], mw["w_gate"],
                              mw["w_up"], mw["w_down"], self.top_k,
                              self.act_fn, renormalize=self.renorm)
                x = res + share + moe
            else:
                dw = jax.tree.map(lambda a, j=dense_pos[li]: a[j],
                                  params["dense"])
                h = self.act_fn(h @ dw["gate_proj"],
                                h @ dw["up_proj"])
                x = res + h @ dw["down_proj"]
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)


class Step3VLForConditionalGeneration:
    """Step3-VL (stepfun-ai/step3): Step3 vision tower + two-conv
    downsampler projector over the Step3 text decoder.

    Reference parity: vllm/model_executor/models/step3_vl.py. Vision
    (step3_vl.py:595-830): CLIP-style patch conv + cls token + learned
    abs pos (P+1, interpolated), the cls row REPEATED pad_tp_size-1
    extra times at the front (:624-640), then POST-norm residual
    blocks — x += LN1(attn(x)); x += LN2(mlp(x)) — with quick-gelu
    MLP. The first 4 rows are dropped after the tower (:970). The
    projector (:866-880, :951-961): [B, W, g, g] → Conv2d(k=2,
    stride=understand_projector_stride) → Conv2d(k=3, s=2, p=1, 2x
    channels) → Linear to text hidden. At the canonical square one
    image yields g2^2 tokens, g2 = ((g-2)//s + 1 - 1)//2 + 1.
    Checkpoint: vision under vision_model.* at top level, text under
    model.* (hf_to_vllm_mapper, :835-838).
    """

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        g = lambda c, k, d=None: (c.get(k, d) if isinstance(c, dict)
                                  else getattr(c, k, d))
        self.width = int(g(vc, "hidden_size", 1792))
        self.v_layers = int(g(vc, "num_hidden_layers", 63))
        self.v_heads = int(g(vc, "num_attention_heads", 16))
        self.v_dh = self.width // self.v_heads
        self.v_mlp = int(g(vc, "intermediate_size", 3072))
        self.out_hidden = int(g(vc, "output_hidden_size", 4096))
        self.patch = int(g(vc, "patch_size", 14))
        self.native_size = int(g(vc, "image_size", 728))
        self.image_size = int(config.mm_image_size or self.native_size)
        self.grid = self.image_size // self.patch
        self.proj_stride = int(getattr(hf, "understand_projector_stride",
                                       1))
        self.proj_bias = bool(getattr(hf, "projector_bias", True))
        self.pad_tp = 4

        txt = hf.text_config
        text_cfg = replace(config, hf_config=txt, is_multimodal=False)
        text_cfg.architecture = "Step3TextForCausalLM"
        self.language_model = Step3TextForCausalLM(text_cfg)
        self.n_embed = text_cfg.hidden_size

    def param_specs(self) -> list[ParamSpec]:
        W, MW, OH = self.width, self.v_mlp, self.out_hidden
        t = transpose2d
        npos = (self.native_size // self.patch)**2 + 1
        VIS = "vision_model."
        specs = [
            ParamSpec("vision.cls", (1, W), P(None, None),
                      VIS + "embeddings.class_embedding",
                      transform=None),
            ParamSpec("vision.patch_embed", (W, 3, self.patch,
                                             self.patch),
                      P(None, None, None, None),
                      VIS + "embeddings.patch_embedding.weight",
                      transform=None),
            ParamSpec("vision.patch_bias", (W, ), P(),
                      VIS + "embeddings.patch_embedding.bias",
                      transform=None),
            ParamSpec("vision.pos_embed", (npos, W), P(None, None),
                      VIS + "embeddings.position_embedding.weight",
                      transform=None),
            ParamSpec("proj.ds1", (OH, W, 2, 2),
                      P(None, None, None, None),
                      "vit_downsampler.weight", transform=None),
            ParamSpec("proj.ds1_bias", (OH, ), P(),
                      "vit_downsampler.bias", transform=None),
            ParamSpec("proj.ds2", (2 * OH, OH, 3, 3),
                      P(None, None, None, None),
                      "vit_downsampler2.weight", transform=None),
            ParamSpec("proj.ds2_bias", (2 * OH, ), P(),
                      "vit_downsampler2.bias", transform=None),
            ParamSpec("proj.lin", (2 * OH, self.n_embed),
                      P(None, None), "vit_large_projector.weight",
                      transform=t),
        ]
        if self.proj_bias:
            specs.append(
                ParamSpec("proj.lin_bias", (self.n_embed, ), P(),
                          "vit_large_projector.bias", transform=None))

        def vstk(path, shape, hf_key, transform=t):
            return ParamSpec(
                f"vision.layers.{path}", (self.v_layers, *shape),
                P(*([None] * (len(shape) + 1))),
                VIS + "transformer.layers.{i}." + hf_key,
                stacked=True, transform=transform)

        specs += [
            vstk("qkv", (W, 3 * W), "self_attn.qkv_proj.weight"),
            vstk("qkv_bias", (3 * W, ), "self_attn.qkv_proj.bias",
                 transform=None),
            vstk("out_proj", (W, W), "self_attn.out_proj.weight"),
            vstk("out_bias", (W, ), "self_attn.out_proj.bias",
                 transform=None),
            vstk("ln1", (W, ), "layer_norm1.weight", transform=None),
            vstk("ln1_bias", (W, ), "layer_norm1.bias",
                 transform=None),
            vstk("ln2", (W, ), "layer_norm2.weight", transform=None),
            vstk("ln2_bias", (W, ), "layer_norm2.bias",
                 transform=None),
            vstk("fc1", (W, MW), "mlp.fc1.weight"),
            vstk("fc1_bias", (MW, ), "mlp.fc1.bias", transform=None),
            vstk("fc2", (MW, W), "mlp.fc2.weight"),
            vstk("fc2_bias", (W, ), "mlp.fc2.bias", transform=None),
        ]
        # text specs stay top-level (this wrapper forwards the full
        # params dict to the text decoder); checkpoint keys are
        # already model.* per the reference's hf_to_vllm_mapper
        specs += self.language_model.param_specs()
        return specs

    def kv_cache_spec(self):
        return self.language_model.kv_cache_spec()

    def encode_images(self, params, pixel_values):
        """[N, 3, S, S] → [N*g2^2, text_H]."""
        vw = params["vision"]
        n = pixel_values.shape[0]
        W = self.width
        g = self.grid
        x = jax.lax.conv_general_dilated(
            pixel_values.astype(jnp.float32),
            vw["patch_embed"].astype(jnp.float32),
            (self.patch, self.patch), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x.reshape(n, W, g * g).transpose(0, 2, 1) + \
            vw["patch_bias"]
        cls = jnp.broadcast_to(vw["cls"].astype(x.dtype), (n, 1, W))
        x = jnp.concatenate([cls, x], axis=1)  # [n, P+1, W]
        pos = vw["pos_embed"].astype(jnp.float32)
        npos = pos.shape[0]
        if npos != g * g + 1:
            # get_abs_pos: cls pos kept, grid part bicubic-resized
            src = int((npos - 1)**0.5)
            grid_pos = jax.image.resize(
                pos[1:].reshape(src, src, W), (g, g, W),
                method="cubic").reshape(g * g, W)
            pos = jnp.concatenate([pos[:1], grid_pos], axis=0)
        x = x + pos[None]
        # cls row repeated pad_tp-1 extra times at the front
        x = jnp.concatenate(
            [jnp.repeat(x[:, :1], self.pad_tp - 1, axis=1), x],
            axis=1)
        for li in range(self.v_layers):
            w = jax.tree.map(lambda a, li=li: a[li], vw["layers"])
            t = x.shape[1]
            qkv = (x @ w["qkv"] + w["qkv_bias"]).reshape(
                n, t, 3, self.v_heads, self.v_dh)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_dh**-0.5)
            p = jax.nn.softmax(s.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(n, t, W)
            o = o @ w["out_proj"] + w["out_bias"]
            x = x + layer_norm(o, w["ln1"], w["ln1_bias"], 1e-5)
            h = x @ w["fc1"] + w["fc1_bias"]
            h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu
            h = h @ w["fc2"] + w["fc2_bias"]
            x = x + layer_norm(h, w["ln2"], w["ln2_bias"], 1e-5)
        x = x[:, self.pad_tp:]  # drop the 4 leading cls rows
        # projector: [n, g, g, W] → conv k2/s → conv k3/s2/p1 → linear
        pw = params["proj"]
        x = x.transpose(0, 2, 1).reshape(n, W, g, g)
        x = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), pw["ds1"].astype(jnp.float32),
            (self.proj_stride, self.proj_stride), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + pw["ds1_bias"][None, :, None, None]
        x = jax.lax.conv_general_dilated(
            x, pw["ds2"].astype(jnp.float32), (2, 2),
            [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + pw["ds2_bias"][None, :, None, None]
        n_dim = x.shape[1]
        x = x.reshape(n, n_dim, -1).transpose(0, 2, 1).reshape(
            -1, n_dim)
        out = x @ pw["lin"]
        if self.proj_bias:
            out = out + pw["lin_bias"]
        return out

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta, use_pallas=None, mm_embeds=None,
                 mm_scatter=None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        if mm_embeds is not None:
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds.astype(x.dtype), mode="drop")
        return self.language_model(params, input_ids, positions,
                                   kv_caches, attn_meta,
                                   use_pallas=use_pallas,
                                   inputs_embeds=x)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(params, hidden)
