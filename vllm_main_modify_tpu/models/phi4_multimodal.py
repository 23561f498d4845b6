"""Phi-4-multimodal: SigLIP tower with HD crop layout + conformer
audio encoder over a Phi-3 decoder.

Reference parity: vllm/model_executor/models/phi4_multimodal.py (HF
modeling_phi4_multimodal.py is the oracle). The decoder is exactly
Phi-3 (fused qkv/gate_up checkpoint tensors); the image path:

- each image is a GLOBAL crop + h x w SUB crops at
  ``vision_config.crop_size``; the tower is SigLIP (gelu_tanh) whose
  ``feature_layer`` (-2: stop one layer early, no post-LN) features
  are 2x2 average-pooled ("image token compression");
- the merged token stream is [sub rows (each followed by a
  sub_img_feature_extensor row token), global_img_feature_extensor,
  global rows (same per-row extensor)], projected by
  gelu(up) -> down into the decoder width;
- embeddings splice at <image> placeholder positions.

The audio path: mean-variance norm → NeMo stride-2 conv subsampling
(time_reduction x) → conformer blocks (half-step macaron FFNs,
relative-position-bias attention with the chunked streaming mask,
GLU + causal depthwise-separable conv module) → gelu(up) -> down
speech projection; tokens = T through the stride-2 stack.

This build handles the square single-crop image layout (global + one
identical sub crop — the HF anyres choice at the canonical square
resolution), matching the Phi-3V treatment in this repo; audio-only
requests use the "speech" projection mode (the vision_speech variants
load for completeness).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.layers.normalization import layer_norm

from vllm_main_modify_tpu.models.gemma3_mm import (siglip_encode,
                                                   siglip_specs)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.llama import Phi3ForCausalLM

IMG = "model.embed_tokens_extend.image_embed."


class Phi4MultimodalForCausalLM(Phi3ForCausalLM):

    def __init__(self, config):
        super().__init__(config)
        vc = config.hf_config.vision_config
        if isinstance(vc, dict):
            from types import SimpleNamespace
            vc = SimpleNamespace(**vc)
        self.vc = vc
        self.v_hidden = vc.hidden_size
        self.v_heads = vc.num_attention_heads
        self.v_head_dim = self.v_hidden // self.v_heads
        self.v_layers = vc.num_hidden_layers
        self.patch = vc.patch_size
        self.crop = getattr(vc, "crop_size", vc.image_size)
        self.grid = self.crop // self.patch
        assert self.grid % 2 == 0, \
            "odd patch grids (reflection-pad path) not yet supported"
        self.bf = self.grid // 2  # after 2x2 token compression
        self.v_eps = getattr(vc, "layer_norm_eps", 1e-6)
        # feature_layer -2: stop |feature_layer|-1 layers early
        fl = getattr(vc, "feature_layer", -2)
        self.run_layers = self.v_layers + fl + 1
        ac = getattr(config.hf_config, "audio_config", None)
        if isinstance(ac, dict):
            from types import SimpleNamespace
            ac = SimpleNamespace(**ac)
        self.ac = ac

    def param_specs(self) -> list[ParamSpec]:
        specs = super().param_specs()
        if self.ac is not None:
            specs += _audio_specs(self.ac, self.hidden)
        D, H = self.v_hidden, self.hidden
        t = transpose2d
        specs += siglip_specs(D, self.vc.intermediate_size,
                              self.v_layers, self.patch,
                              self.grid * self.grid,
                              prefix=IMG + "img_processor.")
        specs += [
            ParamSpec("img_up", (D, H), P(None, None),
                      IMG + "img_projection_up.weight", transform=t),
            ParamSpec("img_up_bias", (H, ), P(),
                      IMG + "img_projection_up.bias", transform=None),
            ParamSpec("img_down", (H, H), P(None, None),
                      IMG + "img_projection_down.weight", transform=t),
            ParamSpec("img_down_bias", (H, ), P(),
                      IMG + "img_projection_down.bias",
                      transform=None),
            ParamSpec("glb_extensor", (1, 1, D), P(None, None, None),
                      IMG + "global_img_feature_extensor",
                      transform=None),
            ParamSpec("sub_extensor", (1, 1, 1, D),
                      P(None, None, None, None),
                      IMG + "sub_img_feature_extensor",
                      transform=None),
        ]
        return specs

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[2, 3, S, S] (global + square sub crop) →
        [2*bf*(bf+1)+1, H] merged image tokens. Rank-2 input is the
        AUDIO feature path ([T, input_size] log-mel — the engine's mm
        encode hook dispatches both modalities here)."""
        if pixel_values.ndim == 5:
            pixel_values = pixel_values[0]
        if self.ac is not None and pixel_values.ndim <= 3 and \
                pixel_values.shape[-1] == self.ac.input_size:
            feats = (pixel_values[0] if pixel_values.ndim == 3
                     else pixel_values)
            return self.encode_audio_feats(params, feats)
        feats = siglip_encode(params["vision"], pixel_values,
                              patch=self.patch,
                              num_patches=self.grid * self.grid,
                              v_hidden=self.v_hidden,
                              v_heads=self.v_heads,
                              v_head_dim=self.v_head_dim,
                              v_layers=self.run_layers,
                              eps=self.v_eps,
                              post_norm=False)  # [2, g*g, D]
        g, bf, D = self.grid, self.bf, self.v_hidden
        # 2x2 average-pool token compression
        feats = feats.reshape(2, g, g, D)
        feats = feats.reshape(2, bf, 2, bf, 2, D).mean(axis=(2, 4))
        sub_ext = params["sub_extensor"][0]  # [1, 1, D]
        row_ext = jnp.broadcast_to(sub_ext, (bf, 1, D))

        def with_row_extensor(x):  # [bf, bf, D] → [bf*(bf+1), D]
            return jnp.concatenate(
                [x, row_ext.astype(x.dtype)], axis=1).reshape(-1, D)

        glb = with_row_extensor(feats[0])
        sub = with_row_extensor(feats[1])
        merged = jnp.concatenate(
            [sub, params["glb_extensor"][0].astype(sub.dtype), glb],
            axis=0)
        h = jax.nn.gelu(
            merged @ params["img_up"] + params["img_up_bias"],
            approximate=False)
        return h @ params["img_down"] + params["img_down_bias"]

    # ------------------------------------------------------------------
    # audio (conformer) tower
    # ------------------------------------------------------------------

    def _audio_sub_lens(self, t: int) -> int:
        for _ in range(int(np.log2(self.ac.time_reduction))):
            t = (t - 1) // 2 + 1
        return t

    def encode_audio_feats(self, params, feats: jax.Array
                           ) -> jax.Array:
        """[T, input_size] log-mel → [T', H] audio tokens (speech
        projection mode; T' = T after the nemo stride-2 stack)."""
        ac = self.ac
        aw = params["audio"]
        x = (feats - aw["global_mean"]) * aw["global_invstd"]
        # nemo conv subsampling on [1, 1, T, F]
        x = x[None, None].astype(jnp.float32)

        def conv2d(x, w, b, stride, groups=1):
            y = jax.lax.conv_general_dilated(
                x, w.astype(jnp.float32), (stride, stride),
                [(1, 1), (1, 1)] if w.shape[-1] == 3 else
                [(0, 0), (0, 0)],
                feature_group_count=groups,
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            return y + b[None, :, None, None]

        C = ac.nemo_conv_channels
        x = jax.nn.relu(conv2d(x, aw["sub_conv0"],
                               aw["sub_conv0_bias"], 2))
        sampling = int(np.log2(ac.time_reduction))
        for j in range(sampling - 1):
            x = conv2d(x, aw[f"sub_dw{j}"], aw[f"sub_dw{j}_bias"], 2,
                       groups=C)
            x = jax.nn.relu(conv2d(x, aw[f"sub_pw{j}"],
                                   aw[f"sub_pw{j}_bias"], 1))
        _, _, t3, f3 = x.shape
        x = x.transpose(0, 2, 1, 3).reshape(1, t3, C * f3)
        x = (x @ aw["sub_out"] + aw["sub_out_bias"])[0]  # [T', h]

        # additive attention "mask": HF adds the BOOLEAN chunk mask
        # (0/1, not -inf — replicated faithfully) plus the clipped
        # relative-position bias table
        cs = getattr(ac, "chunk_size", -1)
        if cs and cs > 0:
            starts = np.arange(0, t3, cs)
            chunk_of = np.searchsorted(starts, np.arange(t3),
                                       side="right") - 1
            left = np.maximum(chunk_of - ac.left_chunk, 0)
            lo = starts[left]
            ends = np.append(starts[1:], t3)
            hi = ends[chunk_of]
            j = np.arange(t3)
            mask01 = ((j[None, :] >= lo[:, None]) &
                      (j[None, :] < hi[:, None])).astype(np.float32)
        else:
            mask01 = np.ones((t3, t3), np.float32)
        rel = np.arange(t3)[None, :] - np.arange(t3)[:, None]
        rel = np.clip(rel, -ac.bias_max_distance,
                      ac.bias_max_distance - 1)
        if getattr(ac, "bias_symmetric", False):
            idx = np.abs(rel)
        else:
            idx = rel + ac.bias_max_distance
        bias = aw["bias_values"][jnp.asarray(idx)]  # [T', T', heads]
        add_mask = jnp.asarray(mask01)[None] + \
            bias.transpose(2, 0, 1)  # [heads, T', T']

        h = ac.hidden_size
        heads = ac.num_attention_heads
        dh = h // heads
        k_sz = ac.kernel_size
        x = x.astype(self.cfg.jax_dtype)

        def ff(w, tag, x):
            y = layer_norm(x, w[f"{tag}_ln"], w[f"{tag}_ln_bias"],
                           1e-5)
            y = y @ w[f"{tag}_gate_up"] + w[f"{tag}_gate_up_bias"]
            up, gate = jnp.split(y, 2, axis=-1)
            y = up * jax.nn.silu(gate)  # "swish"
            return y @ w[f"{tag}_down"] + w[f"{tag}_down_bias"]

        for li in range(ac.num_blocks):
            w = jax.tree.map(lambda a, li=li: a[li],
                             params["audio"]["layers"])
            x = x + 0.5 * ff(w, "feed_forward_in", x)
            res = x
            hn = layer_norm(x, w["ln_att"], w["ln_att_bias"], 1e-5)
            t = hn.shape[0]
            q = (hn @ w["q_proj"] + w["q_proj_bias"]).reshape(
                t, heads, dh)
            k = (hn @ w["k_proj"] + w["k_proj_bias"]).reshape(
                t, heads, dh)
            v = (hn @ w["v_proj"] + w["v_proj_bias"]).reshape(
                t, heads, dh)
            s = jnp.einsum("qhd,khd->hqk", q, k) * (dh**-0.5)
            s = s + add_mask.astype(s.dtype)
            p = jax.nn.softmax(s.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
            o = jnp.einsum("hqk,khd->qhd", p, v).reshape(t, h)
            x = res + (o @ w["o_proj"] + w["o_proj_bias"])
            # conv module: LN → GLU pointwise → causal depthwise-
            # separable → swish → pointwise
            cn = layer_norm(x, w["conv_ln"], w["conv_ln_bias"], 1e-5)
            y = cn @ w["glu_conv"][:, :, 0].T + w["glu_conv_bias"]
            ek = self.ac.ext_pw_out_channel
            y = ((y[:, :ek] + w["glu_b1"][0, :, 0]) *
                 jax.nn.silu(y[:, ek:] + w["glu_b2"][0, :, 0]))
            # depthwise conv1d, left-causal (pad k-1 then truncate)
            yc = y.T[None]  # [1, h, T']
            yc = jax.lax.conv_general_dilated(
                yc.astype(jnp.float32),
                w["dw_conv"].astype(jnp.float32), (1, ),
                [(k_sz - 1, k_sz - 1)],
                feature_group_count=h,
                dimension_numbers=("NCH", "OIH", "NCH"))
            yc = yc + w["dw_conv_bias"][None, :, None]
            yc = jax.lax.conv_general_dilated(
                yc, w["pw_conv"].astype(jnp.float32), (1, ),
                [(0, 0)],
                dimension_numbers=("NCH", "OIH", "NCH"))
            yc = yc + w["pw_conv_bias"][None, :, None]
            yc = yc[:, :, :-(k_sz - 1)] if k_sz > 1 else yc
            yc = jax.nn.silu(yc)
            yc = jax.lax.conv_general_dilated(
                yc, w["ext_pw_conv"].astype(jnp.float32), (1, ),
                [(0, 0)],
                dimension_numbers=("NCH", "OIH", "NCH"))
            yc = (yc + w["ext_pw_conv_bias"][None, :, None])[0].T
            x = x + yc.astype(x.dtype)
            x = x + 0.5 * ff(w, "feed_forward_out", x)
            x = layer_norm(x, w["ln_out"], w["ln_out_bias"], 1e-5)
        h_up = jax.nn.gelu(
            x @ params["audio"]["up_speech"] +
            params["audio"]["up_speech_bias"], approximate=False)
        return h_up @ params["audio"]["down_speech"] + \
            params["audio"]["down_speech_bias"]

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta, use_pallas: Optional[bool] = None,
                 mm_embeds: Optional[jax.Array] = None,
                 mm_scatter: Optional[jax.Array] = None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        if mm_embeds is not None:
            idx = jnp.where(mm_scatter >= 0, mm_scatter, x.shape[0])
            x = x.at[idx].set(mm_embeds.astype(x.dtype), mode="drop")
        return super().__call__(params, input_ids, positions,
                                kv_caches, attn_meta,
                                use_pallas=use_pallas,
                                inputs_embeds=x)


AUD = "model.embed_tokens_extend.audio_embed."


def _audio_specs(ac, hidden):
    """Conformer audio tower specs (Phi4MultimodalAudioModel)."""
    t = transpose2d
    h = ac.hidden_size
    inter = ac.intermediate_size
    heads = ac.num_attention_heads
    C = ac.nemo_conv_channels
    sampling = int(np.log2(ac.time_reduction))
    fdim = ac.input_size
    for _ in range(sampling):
        fdim = (fdim - 1) // 2 + 1
    nb = ac.bias_max_distance * (1 if ac.bias_symmetric else 2)
    enc = AUD + "encoder."
    specs = [
        ParamSpec("audio.global_mean", (ac.input_size, ), P(),
                  enc + "encoder_embedding.global_mean",
                  transform=None),
        ParamSpec("audio.global_invstd", (ac.input_size, ), P(),
                  enc + "encoder_embedding.global_invstd",
                  transform=None),
        ParamSpec("audio.bias_values", (nb, heads), P(None, None),
                  enc + "relative_attention_bias_layer"
                  ".bias_values.weight", transform=None),
        ParamSpec("audio.sub_out", (C * fdim, h), P(None, None),
                  enc + "embed.out.weight", transform=t),
        ParamSpec("audio.sub_out_bias", (h, ), P(),
                  enc + "embed.out.bias", transform=None),
    ]
    # nemo conv stack: conv.0 (full), then pairs (depthwise, 1x1) at
    # sequential indices 2,3 / 5,6 ... (activations hold 1, 4, ...)
    convs = [("sub_conv0", 0, (C, 1, 3, 3))]
    idx = 2
    for j in range(sampling - 1):
        convs.append((f"sub_dw{j}", idx, (C, 1, 3, 3)))
        convs.append((f"sub_pw{j}", idx + 1, (C, C, 1, 1)))
        idx += 3
    for name, ci, shape in convs:
        specs += [
            ParamSpec(f"audio.{name}", shape,
                      P(*([None] * 4)), enc + f"embed.conv.{ci}.weight",
                      transform=None),
            ParamSpec(f"audio.{name}_bias", (shape[0], ), P(),
                      enc + f"embed.conv.{ci}.bias", transform=None),
        ]

    def astk(path, shape, hf_key, transform=t):
        return ParamSpec(
            f"audio.layers.{path}", (ac.num_blocks, *shape),
            P(*([None] * (len(shape) + 1))),
            enc + "encoders.{i}." + hf_key, stacked=True,
            transform=transform)

    def lin(tag, hf, din, dout):
        return [astk(tag, (din, dout), hf + ".weight"),
                astk(f"{tag}_bias", (dout, ), hf + ".bias",
                     transform=None)]

    for ff in ("feed_forward_in", "feed_forward_out"):
        specs += [
            astk(f"{ff}_ln", (h, ), f"{ff}.layer_norm.weight",
                 transform=None),
            astk(f"{ff}_ln_bias", (h, ), f"{ff}.layer_norm.bias",
                 transform=None),
        ]
        specs += lin(f"{ff}_gate_up", f"{ff}.gate_up_proj", h,
                     2 * inter)
        specs += lin(f"{ff}_down", f"{ff}.down_proj", inter, h)
    specs += [
        astk("ln_att", (h, ), "layer_norm_att.weight",
             transform=None),
        astk("ln_att_bias", (h, ), "layer_norm_att.bias",
             transform=None),
        astk("ln_out", (h, ), "layer_norm.weight", transform=None),
        astk("ln_out_bias", (h, ), "layer_norm.bias",
             transform=None),
    ]
    for p in ("q", "k", "v", "o"):
        specs += lin(f"{p}_proj", f"self_attn.{p}_proj", h, h)
    ek = ac.ext_pw_out_channel
    specs += [
        astk("conv_ln", (h, ), "conv.layer_norm.weight",
             transform=None),
        astk("conv_ln_bias", (h, ), "conv.layer_norm.bias",
             transform=None),
        astk("glu_conv", (2 * ek, h, 1),
             "conv.glu.ext_pw_conv_1d.weight", transform=None),
        astk("glu_conv_bias", (2 * ek, ),
             "conv.glu.ext_pw_conv_1d.bias", transform=None),
        astk("glu_b1", (1, ek, 1), "conv.glu.b1", transform=None),
        astk("glu_b2", (1, ek, 1), "conv.glu.b2", transform=None),
        astk("dw_conv", (h * ac.depthwise_multiplier, 1,
                         ac.kernel_size),
             "conv.dw_sep_conv_1d.dw_conv.weight", transform=None),
        astk("dw_conv_bias", (h * ac.depthwise_multiplier, ),
             "conv.dw_sep_conv_1d.dw_conv.bias", transform=None),
        astk("pw_conv", (ac.depthwise_separable_out_channel,
                         h * ac.depthwise_multiplier, 1),
             "conv.dw_sep_conv_1d.pw_conv.weight", transform=None),
        astk("pw_conv_bias", (ac.depthwise_separable_out_channel, ),
             "conv.dw_sep_conv_1d.pw_conv.bias", transform=None),
        astk("ext_pw_conv", (ek, h, 1), "conv.ext_pw_conv_1d.weight",
             transform=None),
        astk("ext_pw_conv_bias", (ek, ), "conv.ext_pw_conv_1d.bias",
             transform=None),
    ]
    # projections (speech mode — vision_speech variants load too for
    # completeness but the engine routes audio-only requests)
    for mode in ("speech", "vision_speech"):
        specs += [
            ParamSpec(f"audio.up_{mode}",
                      (h * ac.downsample_rate, hidden), P(None, None),
                      AUD + f"up_proj_for_{mode}.weight", transform=t),
            ParamSpec(f"audio.up_{mode}_bias", (hidden, ), P(),
                      AUD + f"up_proj_for_{mode}.bias",
                      transform=None),
            ParamSpec(f"audio.down_{mode}", (hidden, hidden),
                      P(None, None),
                      AUD + f"down_proj_for_{mode}.weight",
                      transform=t),
            ParamSpec(f"audio.down_{mode}_bias", (hidden, ), P(),
                      AUD + f"down_proj_for_{mode}.bias",
                      transform=None),
        ]
    return specs


# reference registry also lists the original remote-code name
Phi4MMForCausalLM = Phi4MultimodalForCausalLM
