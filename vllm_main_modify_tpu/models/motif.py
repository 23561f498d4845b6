"""Motif (Motif-Technologies/Motif-2.6B): Llama-shaped decoder with
**differential attention** and a PolyNorm MLP activation.

Reference parity: vllm/model_executor/models/motif.py (which registers
the model but depends on a DIFFERENTIAL_FLASH_ATTN backend that does
not exist in the reference tree — the model is V0-only and effectively
unrunnable there). This implementation executes the differential
attention semantics of the Differential Transformer
(arXiv:2410.05258, the `lambda_*`/`subln` parameters visible in
vllm .../motif.py:157-181):

    q, k split into per-pair components (q1, q2), (k1, k2);
    v viewed as pairs of width 2*D;
    out_pair = subln(A1·V − λ·A2·V) · (1 − λ_init),
    λ = exp(λq1·λk1) − exp(λq2·λk2) + λ_init,
    λ_init(depth) = 0.8 − 0.6·exp(−0.3·(depth−1)).

TPU-native mapping: both softmaxes and all four (component × v-half)
combinations run as ONE ragged-paged-attention call over a
head-expanded layout — cache head 4m+2c_q+c_v stores (k_{c_q} of kv
pair m, v half c_v of pair m) and the query array is expanded to 2·Hq
rows so the kernel's GQA head mapping computes exactly the needed
combination per row. Costs 2x KV cache vs a plain decoder (both K
components and both V halves are stored twice); correctness over
memory for this niche architecture.

PolyNorm (vllm .../layernorm.py:336-370):
    act(x) = w0·rms(x³) + w1·rms(x²) + w2·rms(x) + b.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import attention
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.models.llama import LlamaForCausalLM
from vllm_main_modify_tpu.quantization.weights import matmul


def _poly_norm(x: jax.Array, weight: jax.Array, bias: jax.Array,
               eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)

    def _rms(y):
        return y * jax.lax.rsqrt(
            jnp.mean(y * y, axis=-1, keepdims=True) + eps)

    w = weight.astype(jnp.float32)
    out = (w[0] * _rms(xf**3) + w[1] * _rms(xf**2) + w[2] * _rms(xf) +
           bias.astype(jnp.float32))
    return out.astype(x.dtype)


class MotifForCausalLM(LlamaForCausalLM):

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        if hf is not None and getattr(hf, "hidden_act",
                                      None) == "poly_norm":
            # PolyNorm runs in our overridden _layer_step (per-layer
            # learned weights); keep the base ACT2FN lookup happy
            hf.hidden_act = "silu"
        super().__init__(config)
        if self.num_q % 2 or self.num_kv % 2:
            raise ValueError(
                "Motif differential attention needs even head counts")
        self.attn_rms_eps = getattr(hf, "attn_rms_norm_eps", 1e-5) \
            if hf is not None else 1e-5
        hc = 2 * self.num_kv  # cache heads (see module docstring)
        # cache head e = 4m + 2*cq + cv → K source head 2m+cq,
        # V source head 2m+cv
        self._k_idx = jnp.asarray(
            [2 * (e // 4) + (e // 2) % 2 for e in range(hc)])
        self._v_idx = jnp.asarray(
            [2 * (e // 4) + e % 2 for e in range(hc)])
        # q slot e*g + r holds q head 2*(m*g + r) + cq
        g = self.num_q // self.num_kv
        q_idx = []
        for e in range(hc):
            m, cq = e // 4, (e // 2) % 2
            q_idx += [2 * (m * g + r) + cq for r in range(g)]
        self._q_idx = jnp.asarray(q_idx)  # [2*Hq]
        # output gather: result for (pair j=m*g+r, cq, cv) lives at
        # expanded head (4m + 2cq + cv)*g + r
        out_idx = []
        for j in range(self.num_q // 2):
            m, r = j // g, j % g
            out_idx.append([[(4 * m + 2 * cq + cv) * g + r
                             for cv in (0, 1)] for cq in (0, 1)])
        self._out_idx = jnp.asarray(out_idx)  # [Hq/2, 2, 2]

    def kv_cache_spec(self) -> tuple[int, int, int]:
        # 2x: every K component and V half is cached twice (docstring)
        return 2 * self.num_kv, self.head_dim, self.L

    def param_specs(self) -> list[ParamSpec]:
        specs = super().param_specs()
        L, D = self.L, self.head_dim

        def stk(path, shape, hf_key):
            return ParamSpec(path, (L, *shape), P(None, None), hf_key,
                             stacked=True, transform=None)

        specs += [
            stk("layers.lambda_q1", (D, ),
                "model.layers.{i}.self_attn.lambda_q1"),
            stk("layers.lambda_k1", (D, ),
                "model.layers.{i}.self_attn.lambda_k1"),
            stk("layers.lambda_q2", (D, ),
                "model.layers.{i}.self_attn.lambda_q2"),
            stk("layers.lambda_k2", (D, ),
                "model.layers.{i}.self_attn.lambda_k2"),
            stk("layers.subln", (2 * D, ),
                "model.layers.{i}.self_attn.subln.weight"),
            stk("layers.poly_weight", (3, ),
                "model.layers.{i}.mlp.act_fn.weight"),
            stk("layers.poly_bias", (1, ),
                "model.layers.{i}.mlp.act_fn.bias"),
        ]
        return specs

    def _layer_step(self, w, x, kv_caches, l, positions, attn_meta,
                    params, use_pallas, t, rope_l=None):
        cfg = self.cfg
        D = self.head_dim
        res = x
        h = rms_norm(x, w["input_layernorm"], cfg.rms_norm_eps)
        q = matmul(h, w["q_proj"]).reshape(t, self.num_q, D)
        k = matmul(h, w["k_proj"]).reshape(t, self.num_kv, D)
        v = matmul(h, w["v_proj"]).reshape(t, self.num_kv, D)
        q, k = self._apply_rope(q, k, positions)

        q_ext = q[:, self._q_idx, :]  # [T, 2*Hq, D]
        k_c = k[:, self._k_idx, :]  # [T, 2*Hk, D]
        v_c = v[:, self._v_idx, :]
        o, kv_caches = attention(q_ext, k_c, v_c, kv_caches, l,
                                 attn_meta, self.sm_scale,
                                 use_pallas=use_pallas)

        # λ = exp(λq1·λk1) − exp(λq2·λk2) + λ_init(depth)
        lam_init = 0.8 - 0.6 * jnp.exp(
            -0.3 * (l.astype(jnp.float32) - 1.0)
            if hasattr(l, "astype") else -0.3 * (float(l) - 1.0))
        lam = (jnp.exp(jnp.sum(w["lambda_q1"].astype(jnp.float32) *
                               w["lambda_k1"].astype(jnp.float32))) -
               jnp.exp(jnp.sum(w["lambda_q2"].astype(jnp.float32) *
                               w["lambda_k2"].astype(jnp.float32))) +
               lam_init)

        gathered = o[:, self._out_idx, :]  # [T, Hq/2, 2, 2, D]
        a1 = gathered[:, :, 0].reshape(t, self.num_q // 2, 2 * D)
        a2 = gathered[:, :, 1].reshape(t, self.num_q // 2, 2 * D)
        diff = (a1.astype(jnp.float32) -
                lam * a2.astype(jnp.float32))
        diff = rms_norm(diff, w["subln"], self.attn_rms_eps)
        diff = (diff.astype(x.dtype) *
                (1.0 - lam_init).astype(x.dtype))
        attn_out = matmul(diff.reshape(t, -1), w["o_proj"])
        x = res + attn_out

        res = x
        h = rms_norm(x, w["post_attention_layernorm"],
                     cfg.rms_norm_eps)
        g = _poly_norm(matmul(h, w["gate_proj"]), w["poly_weight"],
                       w["poly_bias"])
        h = g * matmul(h, w["up_proj"])
        x = res + matmul(h, w["down_proj"])
        return x, kv_caches
