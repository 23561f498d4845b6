"""Llama 4 multimodal (Scout/Maverick vision): unfold-patch ViT with
2-D rope + pixel-shuffle adapter feeding the Llama4 MoE decoder.

Reference parity: vllm/model_executor/models/mllama4.py (+ HF
modeling_llama4.py Llama4VisionModel). Structure:

- patch embedding is an UNFOLD + linear (no conv weights): p x p
  patches flattened channel-major; the CLS token is appended at the
  END of the sequence (mllama4 quirk), learned positions added;
- encoder layers are post-bias LN blocks with interleaved-pair 2-D
  rotary embeddings over (x, y) patch coordinates (freqs zeroed on
  the CLS row);
- after the post layer norm the CLS row is dropped, pixel_shuffle
  regroups the g x g grid into (g*r)^2 tokens of width hidden/r^2,
  then the two bias-free adapter MLPs (gelu after BOTH) and the
  bias-free multi_modal_projector map into the text width.

TPU simplification: one global chunk per image (the processor resizes
to vision image_size); tokens per image = (g * pixel_shuffle_ratio)^2.
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

VP = "vision_model."


def _vision_rope_tables(grid: int, head_dim: int,
                        theta: float) -> tuple[np.ndarray, np.ndarray]:
    """cos/sin [P+1, head_dim//2] replicating HF
    Llama4VisionRotaryEmbedding (interleaved-pair complex rotation;
    CLS row rotation = identity)."""
    idx = grid
    img_idx = np.arange(idx * idx, dtype=np.int32).reshape(-1, 1)
    img_idx = np.concatenate([img_idx, img_idx[:1]], axis=0)
    img_idx[-1, -1] = -2
    fx = img_idx % idx
    fy = img_idx // idx
    freq_dim = head_dim // 2
    rope_freq = 1.0 / theta**(
        np.arange(0, freq_dim, 2)[:freq_dim // 2] / freq_dim)
    freqs_x = np.repeat((fx + 1)[..., None] * rope_freq[None, None],
                        2, axis=-1)
    freqs_y = np.repeat((fy + 1)[..., None] * rope_freq[None, None],
                        2, axis=-1)
    freqs = np.concatenate([freqs_x, freqs_y], axis=-1)[..., ::2]
    freqs = np.where(img_idx.reshape(-1, 1, 1) < 0, 0.0, freqs)
    freqs = freqs[:, 0, :]  # [P+1, head_dim//2]
    return np.cos(freqs).astype(np.float32), \
        np.sin(freqs).astype(np.float32)


class Llama4ForConditionalGeneration:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        vc = hf.vision_config
        self.v_hidden = vc.hidden_size
        self.v_inter = vc.intermediate_size
        self.v_layers = vc.num_hidden_layers
        self.v_heads = vc.num_attention_heads
        self.v_head_dim = self.v_hidden // self.v_heads
        self.patch = vc.patch_size
        self.image_size = vc.image_size
        self.grid = self.image_size // self.patch
        self.num_patches = self.grid * self.grid
        self.shuffle = float(getattr(vc, "pixel_shuffle_ratio", 0.5))
        self.proj_in = getattr(vc, "projector_input_dim", 4096)
        self.proj_out = getattr(vc, "projector_output_dim", 4096)
        self.v_out = getattr(vc, "vision_output_dim", self.proj_out)
        cos, sin = _vision_rope_tables(
            self.grid, self.v_head_dim,
            float(getattr(vc, "rope_theta", 10000.0)))
        self.rope_cos = jnp.asarray(cos)
        self.rope_sin = jnp.asarray(sin)

        text_archs = getattr(hf.text_config, "architectures",
                             None) or ["Llama4ForCausalLM"]
        text_cfg = replace(config, hf_config=hf.text_config,
                           is_multimodal=False)
        text_cfg.architecture = text_archs[0]
        self.language_model = resolve_model_cls(text_archs[0])(
            text_cfg)
        self.text_cfg = text_cfg
        self.tie_embeddings = text_cfg.tie_word_embeddings

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        D, I, L = self.v_hidden, self.v_inter, self.v_layers
        H = self.cfg.hidden_size
        t = transpose2d

        def vstk(path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"vision.layers.{path}", (L, *shape),
                             spec, VP + "model.layers.{i}." + hf_key,
                             stacked=True, transform=transform)

        pdim = 3 * self.patch * self.patch
        sh = int(D / (self.shuffle**2))
        specs = [
            ParamSpec("vision.patch_linear", (pdim, D), P(None, None),
                      VP + "patch_embedding.linear.weight",
                      transform=t),
            ParamSpec("vision.class_embedding", (D, ), P(),
                      VP + "class_embedding", transform=None),
            ParamSpec("vision.positional_embedding",
                      (self.num_patches + 1, D), P(None, None),
                      VP + "positional_embedding_vlm",
                      transform=None),
            ParamSpec("vision.pre_norm", (D, ), P(),
                      VP + "layernorm_pre.weight", transform=None),
            ParamSpec("vision.pre_norm_bias", (D, ), P(),
                      VP + "layernorm_pre.bias", transform=None),
            ParamSpec("vision.post_norm", (D, ), P(),
                      VP + "layernorm_post.weight", transform=None),
            ParamSpec("vision.post_norm_bias", (D, ), P(),
                      VP + "layernorm_post.bias", transform=None),
            ParamSpec("vision.adapter_fc1", (sh, self.proj_in),
                      P(None, None),
                      VP + "vision_adapter.mlp.fc1.weight",
                      transform=t),
            ParamSpec("vision.adapter_fc2",
                      (self.proj_out, self.proj_out), P(None, None),
                      VP + "vision_adapter.mlp.fc2.weight",
                      transform=t),
            ParamSpec("projector", (self.v_out, H), P(None, None),
                      "multi_modal_projector.linear_1.weight",
                      transform=t),
        ]
        for n in ("input_layernorm", "post_attention_layernorm"):
            specs += [
                vstk(n, (D, ), P(None, None), f"{n}.weight",
                     transform=None),
                vstk(f"{n}_bias", (D, ), P(None, None), f"{n}.bias",
                     transform=None),
            ]
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            specs += [
                vstk(n, (D, D), P(None, None, None),
                     f"self_attn.{n}.weight"),
                vstk(f"{n}_bias", (D, ), P(None, None),
                     f"self_attn.{n}.bias", transform=None),
            ]
        specs += [
            vstk("fc1", (D, I), P(None, None, None), "mlp.fc1.weight"),
            vstk("fc1_bias", (I, ), P(None, None), "mlp.fc1.bias",
                 transform=None),
            vstk("fc2", (I, D), P(None, None, None), "mlp.fc2.weight"),
            vstk("fc2_bias", (D, ), P(None, None), "mlp.fc2.bias",
                 transform=None),
        ]
        for s in self.language_model.param_specs():
            s.path = "language_model." + s.path
            s.hf_key = "language_model." + s.hf_key
            specs.append(s)
        return specs

    def kv_cache_spec(self):
        return self.language_model.kv_cache_spec()

    def kv_cache_groups(self):
        if hasattr(self.language_model, "kv_cache_groups"):
            return self.language_model.kv_cache_groups()
        from vllm_main_modify_tpu.core.kv_cache_interface import \
            single_full_group

        kh, hd, nl = self.kv_cache_spec()
        return single_full_group(kh, hd, nl)

    # ------------------------------------------------------------------

    def _rope(self, x):
        """Interleaved-pair rotation with the 2-D tables: treats
        (x[2i], x[2i+1]) as a complex number (HF
        vision_apply_rotary_emb)."""
        c = self.rope_cos[None, :, None, :]
        s = self.rope_sin[None, :, None, :]
        xr, xi = x[..., ::2], x[..., 1::2]
        outr = xr * c - xi * s
        outi = xr * s + xi * c
        return jnp.stack([outr, outi], axis=-1).reshape(x.shape)

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N, (g*r)^2, text_H]."""
        v = params["vision"]
        if pixel_values.ndim == 5:
            pixel_values = pixel_values[0]
        n = pixel_values.shape[0]
        g, p = self.grid, self.patch
        # unfold: [N, 3, g, p, g, p] -> [N, g*g, 3*p*p] channel-major
        x = pixel_values.astype(jnp.float32).reshape(
            n, 3, g, p, g, p)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(
            n, g * g, 3 * p * p)
        x = x @ v["patch_linear"]
        cls = jnp.broadcast_to(
            v["class_embedding"].astype(jnp.float32)[None, None],
            (n, 1, self.v_hidden))
        x = jnp.concatenate([x, cls], axis=1)  # CLS at the END
        x = x + v["positional_embedding"].astype(jnp.float32)[None]
        x = layer_norm(x, v["pre_norm"], v["pre_norm_bias"], 1e-5)

        layers = v["layers"]
        t = self.num_patches + 1

        def layer_fn(l, x):
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), layers)
            res = x
            h = layer_norm(x, w["input_layernorm"],
                           w["input_layernorm_bias"], 1e-5)
            q = (h @ w["q_proj"] + w["q_proj_bias"]).reshape(
                n, t, self.v_heads, self.v_head_dim)
            k = (h @ w["k_proj"] + w["k_proj_bias"]).reshape(
                n, t, self.v_heads, self.v_head_dim)
            val = (h @ w["v_proj"] + w["v_proj_bias"]).reshape(
                n, t, self.v_heads, self.v_head_dim)
            q, k = self._rope(q), self._rope(k)
            scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) * \
                (self.v_head_dim**-0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", probs, val)
            x = res + (o.reshape(n, t, -1) @ w["o_proj"] +
                       w["o_proj_bias"])
            res = x
            h = layer_norm(x, w["post_attention_layernorm"],
                           w["post_attention_layernorm_bias"], 1e-5)
            h = jax.nn.gelu(h @ w["fc1"] + w["fc1_bias"],
                            approximate=False)
            return res + (h @ w["fc2"] + w["fc2_bias"])

        x = jax.lax.fori_loop(0, self.v_layers, layer_fn, x)
        x = layer_norm(x, v["post_norm"], v["post_norm_bias"], 1e-5)
        x = x[:, :-1]  # drop trailing CLS
        # pixel shuffle: [N, g*g, D] -> [N, (g*r)^2, D/r^2]
        r = self.shuffle
        d = x.shape[-1]
        x = x.reshape(n, g, int(g * r), int(d / r))
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(n, int(g * r), int(g * r), int(d / (r * r)))
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(
            n, -1, int(d / (r * r)))
        # nn.GELU() in Llama4VisionMLP2 is the exact (erf) gelu, and
        # it is applied after BOTH linears
        x = jax.nn.gelu(x @ v["adapter_fc1"], approximate=False)
        x = jax.nn.gelu(x @ v["adapter_fc2"], approximate=False)
        return x @ params["projector"]

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
