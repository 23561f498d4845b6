"""PLaMo-2 (pfnet/plamo-2-*): Mamba-2 + attention hybrid decoder with
sandwich norms.

Reference parity: vllm/model_executor/models/plamo2.py. Structure:
- layers alternate by ``mamba_step``: layer i is attention when
  ``i % mamba_step == mamba_step // 2`` (all-but-last attention when
  the model is shallower than step/2), Mamba-2 otherwise
  (plamo2.py:78-84);
- every layer is norm-sandwiched: x += post_mixer_norm(mixer(
  pre_mixer_norm(x))), then the same around the SwiGLU MLP
  (plamo2.py:664-700). The four sandwich norms and the final norm are
  stored as offsets in the checkpoint (+1, +1/5, +1, +5^-1.5, +1 —
  plamo2.py:957-967); the offsets fold in at load time;
- the Mamba-2 mixer differs from Bamba/Mamba2 (plamo2.py:91-380):
  in_proj yields only (gate, hidden) with per-head interleaving
  (de-interleaved at load, plamo2.py:930-950); the causal conv runs on
  ``hidden`` only; B/C/dt are projected from the POST-conv activations
  (bcdt_proj), each through a learned RMSNorm, dt through an extra
  rank→heads projection; B/C are shared across heads (n_groups=1,
  B.view(T,1,-1)); the gate applies as y*silu(z) with no gated norm;
- attention layers carry per-head q/k RMSNorm weights
  ([Hq, D]/[Hk, D], checkpoint keys mixer.q_weight/k_weight,
  plamo2.py:585-597) and plain neox rope.
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
from vllm_main_modify_tpu.layers.mamba import (_segmented_linear_scan,
                                               build_seg_info,
                                               causal_conv1d_ragged,
                                               update_conv_state)
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d
from vllm_main_modify_tpu.quantization.weights import matmul


def _is_mamba(num_layers: int, step: int, i: int) -> bool:
    if num_layers <= step // 2:
        return i != num_layers - 1
    return (i % step) != (step // 2)


def _offset(delta: float):
    return lambda x: np.ascontiguousarray(x + delta)


def _deinterleave_in_proj(num_heads: int, head_dim: int):
    """Checkpoint in_proj [2*inter, H] orders rows per mamba head as
    (gate_hd, hidden_hd); produce [H, 2*inter] with all gate columns
    first (reference load rearrangement plamo2.py:930-950)."""

    def f(x: np.ndarray) -> np.ndarray:
        two_i, h = x.shape
        xr = x.reshape(num_heads, 2, head_dim, h)
        gate = xr[:, 0].reshape(num_heads * head_dim, h)
        hid = xr[:, 1].reshape(num_heads * head_dim, h)
        return np.ascontiguousarray(
            np.concatenate([gate, hid], axis=0).T)

    return f


def _conv_t(x: np.ndarray) -> np.ndarray:
    """conv1d weight [inter, K] (or [inter, 1, K]) → [K, inter]."""
    if x.ndim == 3:
        x = x[:, 0, :]
    return np.ascontiguousarray(x.T)


class Plamo2ForCausalLM:

    def __init__(self, config: ModelConfig):
        self.cfg = config
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d)
        self.hidden = config.hidden_size
        self.inter = config.intermediate_size
        self.L = config.num_layers
        self.num_q = config.num_attention_heads
        self.num_kv = config.num_kv_heads
        self.head_dim = g("hidden_size_per_head",
                          config.head_dim or
                          self.hidden // self.num_q)
        config.head_dim = self.head_dim
        self.sm_scale = self.head_dim**-0.5
        self.eps = g("rms_norm_eps", 1e-6)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, g("rope_theta", 10000.0),
                             g("rope_scaling", None)))
        # mamba dims (plamo2.py:102-112)
        self.m_heads = g("mamba_num_heads", 32)
        self.m_head_dim = self.head_dim
        self.d_inner = self.m_heads * self.m_head_dim
        self.d_state = g("mamba_d_state", 64)
        self.d_conv = g("mamba_d_conv", 4)
        self.dt_rank = max(64, self.hidden // 16)
        step = g("mamba_step", 2)
        self.mamba_ids = tuple(i for i in range(self.L)
                               if _is_mamba(self.L, step, i))
        self.attn_ids = tuple(i for i in range(self.L)
                              if i not in set(self.mamba_ids))
        self.tie_embeddings = config.tie_word_embeddings

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        H, V, I = self.hidden, c.vocab_size, self.inter
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        di, ds, nh, rk = (self.d_inner, self.d_state, self.m_heads,
                          self.dt_rank)
        t = transpose2d

        def stk(group, ids, path, shape, spec, hf_key, transform=t):
            return ParamSpec(f"{group}.{path}", (len(ids), *shape),
                             spec, "model.layers.layers.{i}." + hf_key,
                             stacked=True, layer_ids=tuple(ids),
                             transform=transform)

        def row_t(lo, hi):
            return lambda x: np.ascontiguousarray(x[lo:hi].T)

        all_ids = tuple(range(self.L))
        specs = [
            ParamSpec("embed_tokens", (V, H), P("model", None),
                      "model.embed_tokens.weight", transform=None),
            ParamSpec("final_norm", (H, ), P(), "model.norm.weight",
                      transform=_offset(1.0)),
        ]
        if not self.tie_embeddings:
            specs.append(
                ParamSpec("lm_head", (H, V), P(None, "model"),
                          "lm_head.weight", transform=t))
        # sandwich norms (checkpoint offsets per plamo2.py:957-967)
        for name, delta in (("pre_mixer_norm", 1.0),
                            ("post_mixer_norm", 1.0 / 5),
                            ("pre_mlp_norm", 1.0),
                            ("post_mlp_norm", 1.0 / 5**1.5)):
            specs.append(
                stk("layers", all_ids, name, (H, ), P(None, None),
                    f"{name}.weight", transform=_offset(delta)))
        specs += [
            stk("layers", all_ids, "gate_proj", (H, I),
                P(None, None, "model"), "mlp.gate_up_proj.weight",
                transform=row_t(0, I)),
            stk("layers", all_ids, "up_proj", (H, I),
                P(None, None, "model"), "mlp.gate_up_proj.weight",
                transform=row_t(I, 2 * I)),
            stk("layers", all_ids, "down_proj", (I, H),
                P(None, "model", None), "mlp.down_proj.weight"),
        ]
        if self.attn_ids:
            specs += [
                stk("attn", self.attn_ids, "q_proj", (H, qd),
                    P(None, None, "model"), "mixer.q_proj.weight"),
                stk("attn", self.attn_ids, "k_proj", (H, kd),
                    P(None, None, "model"), "mixer.k_proj.weight"),
                stk("attn", self.attn_ids, "v_proj", (H, kd),
                    P(None, None, "model"), "mixer.v_proj.weight"),
                stk("attn", self.attn_ids, "o_proj", (qd, H),
                    P(None, "model", None), "mixer.o_proj.weight"),
                stk("attn", self.attn_ids, "q_norm",
                    (self.num_q, self.head_dim), P(None, "model",
                                                   None),
                    "mixer.q_weight", transform=None),
                stk("attn", self.attn_ids, "k_norm",
                    (self.num_kv, self.head_dim), P(None, "model",
                                                    None),
                    "mixer.k_weight", transform=None),
            ]
        if self.mamba_ids:
            specs += [
                stk("mamba", self.mamba_ids, "in_proj", (H, 2 * di),
                    P(None, None, "model"), "mixer.in_proj.weight",
                    transform=_deinterleave_in_proj(
                        nh, self.m_head_dim)),
                stk("mamba", self.mamba_ids, "conv_w",
                    (self.d_conv, di), P(None, None, "model"),
                    "mixer.conv1d.weight", transform=_conv_t),
                stk("mamba", self.mamba_ids, "bcdt_proj",
                    (di, 2 * ds + rk), P(None, "model", None),
                    "mixer.bcdt_proj.weight"),
                stk("mamba", self.mamba_ids, "dt_proj", (rk, nh),
                    P(None, None, "model"), "mixer.dt_proj.weight"),
                stk("mamba", self.mamba_ids, "dt_norm", (rk, ), P(),
                    "mixer.dt_norm_weight", transform=None),
                stk("mamba", self.mamba_ids, "B_norm", (ds, ), P(),
                    "mixer.B_norm_weight", transform=None),
                stk("mamba", self.mamba_ids, "C_norm", (ds, ), P(),
                    "mixer.C_norm_weight", transform=None),
                stk("mamba", self.mamba_ids, "dt_bias", (nh, ),
                    P(None, "model"), "mixer.dt_bias",
                    transform=None),
                stk("mamba", self.mamba_ids, "A_log", (nh, ),
                    P(None, "model"), "mixer.A_log", transform=None),
                stk("mamba", self.mamba_ids, "D", (nh, ),
                    P(None, "model"), "mixer.D", transform=None),
                stk("mamba", self.mamba_ids, "out_proj", (di, H),
                    P(None, "model", None), "mixer.out_proj.weight"),
            ]
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, len(self.attn_ids)

    def kv_cache_groups(self):
        from vllm_main_modify_tpu.core.kv_cache_interface import \
            KVCacheGroupSpec

        return [
            KVCacheGroupSpec(kind="full", layer_ids=self.attn_ids,
                             kv_heads=self.num_kv,
                             head_dim=self.head_dim),
            KVCacheGroupSpec(
                kind="mamba", layer_ids=self.mamba_ids,
                state_shapes=(
                    ((self.d_conv - 1, self.d_inner), "float32"),
                    ((self.m_heads, self.m_head_dim, self.d_state),
                     "float32"),
                )),
        ]

    # ------------------------------------------------------------------

    def _mamba_mixer(self, h, w, conv_state, ssm_state, seg, t):
        """PLaMo-2 Mamba-2 mixer (see module docstring for the deltas
        vs layers/mamba.py mamba2_mixer)."""
        di, ds, nh, hd = (self.d_inner, self.d_state, self.m_heads,
                          self.m_head_dim)
        proj = matmul(h, w["in_proj"])
        z = proj[:, :di]
        xs_raw = proj[:, di:].astype(jnp.float32)

        conv_w = w["conv_w"].astype(jnp.float32)
        u = causal_conv1d_ragged(xs_raw, conv_w, None, conv_state,
                                 seg)
        new_conv = update_conv_state(xs_raw, conv_state, seg)
        u = jax.nn.silu(u)

        bcdt = u @ w["bcdt_proj"].astype(jnp.float32)
        b_in = rms_norm(bcdt[:, :ds], w["B_norm"], self.eps)
        c_in = rms_norm(bcdt[:, ds:2 * ds], w["C_norm"], self.eps)
        tsr = rms_norm(bcdt[:, 2 * ds:], w["dt_norm"], self.eps)
        dt_raw = tsr @ w["dt_proj"].astype(jnp.float32)  # [T, nh]

        dt = jax.nn.softplus(dt_raw +
                             w["dt_bias"].astype(jnp.float32))
        a = -jnp.exp(w["A_log"].astype(jnp.float32))  # [nh]
        dA = jnp.exp(dt * a[None])  # [T, nh]
        xs = u.reshape(t, nh, hd)
        b_h = jnp.broadcast_to(b_in[:, None, :], (t, nh, ds))
        c_h = jnp.broadcast_to(c_in[:, None, :], (t, nh, ds))
        dBx = (dt[:, :, None] * xs)[..., None] * b_h[:, :, None, :]
        dA4 = jnp.broadcast_to(dA[:, :, None, None], dBx.shape)

        h0 = ssm_state[seg.state_slots[seg.req_of_tok]]
        carry = seg.is_first & ~seg.fresh_req[seg.req_of_tok]
        dBx = jnp.where(carry[:, None, None, None], dBx + dA4 * h0,
                        dBx)
        hs = _segmented_linear_scan(
            dA4.reshape(t, nh * hd, ds), dBx.reshape(t, nh * hd, ds),
            seg.req_of_tok).reshape(t, nh, hd, ds)

        h_last = jnp.take(hs, jnp.minimum(seg.last_idx, t - 1),
                          axis=0)
        slots = jnp.where(seg.valid_req, seg.state_slots,
                          ssm_state.shape[0])
        new_ssm = ssm_state.at[slots].set(
            h_last.astype(ssm_state.dtype), mode="drop")

        y = jnp.einsum("thdn,thn->thd", hs, c_h)
        y = y + w["D"].astype(jnp.float32)[None, :, None] * xs
        y = y.reshape(t, di) * jax.nn.silu(z.astype(jnp.float32))
        out = matmul(y.astype(h.dtype), w["out_proj"])
        return out, new_conv, new_ssm

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_meta: AttentionMetadata,
                 use_pallas: Optional[bool] = None):
        x = jnp.take(params["embed_tokens"], input_ids, axis=0)
        t = x.shape[0]
        kv0, states = kv_caches
        conv_all, ssm_all = states
        slots = attn_meta.groups[0].state_slots
        seg = build_seg_info(attn_meta.query_start_loc,
                             attn_meta.num_seqs, t, slots,
                             fresh_req=attn_meta.groups[0].state_fresh)
        common = params["layers"]

        def idx_map(ids):
            m = np.zeros(self.L, dtype=np.int32)
            for i, l in enumerate(ids):
                m[l] = i
            return jnp.asarray(m)

        attn_map = idx_map(self.attn_ids)
        mamba_map = idx_map(self.mamba_ids)
        is_attn = jnp.asarray(
            [l in set(self.attn_ids) for l in range(self.L)], bool)

        def pick(group, gl):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, gl, 0, keepdims=False), params[group])

        def attn_branch(l, h, kv0, conv_all, ssm_all):
            w = pick("attn", attn_map[l])
            q = matmul(h, w["q_proj"]).reshape(t, self.num_q,
                                               self.head_dim)
            k = matmul(h, w["k_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            v = matmul(h, w["v_proj"]).reshape(t, self.num_kv,
                                               self.head_dim)
            # per-head q/k RMSNorm with per-head affine
            q = rms_norm(q, jnp.ones((self.head_dim, ), q.dtype),
                         self.eps) * w["q_norm"][None]
            k = rms_norm(k, jnp.ones((self.head_dim, ), k.dtype),
                         self.eps) * w["k_norm"][None]
            q, k = apply_rope(q, k, positions, self.inv_freq)
            o, kv0 = attention(q, k, v, kv0, attn_map[l], attn_meta,
                               self.sm_scale, use_pallas=use_pallas)
            return matmul(o.reshape(t, -1),
                          w["o_proj"]), kv0, conv_all, ssm_all

        def mamba_branch(l, h, kv0, conv_all, ssm_all):
            gl = mamba_map[l]
            w = pick("mamba", gl)
            out, cs, ss = self._mamba_mixer(h, w, conv_all[gl],
                                            ssm_all[gl], seg, t)
            conv_all = jax.lax.dynamic_update_index_in_dim(
                conv_all, cs, gl, 0)
            ssm_all = jax.lax.dynamic_update_index_in_dim(
                ssm_all, ss, gl, 0)
            return out, kv0, conv_all, ssm_all

        def layer_fn(l, carry):
            x, kv0, conv_all, ssm_all = carry
            wc = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), common)
            res = x
            h = rms_norm(x, wc["pre_mixer_norm"], self.eps)
            if not self.attn_ids:
                mix, kv0, conv_all, ssm_all = mamba_branch(
                    l, h, kv0, conv_all, ssm_all)
            elif not self.mamba_ids:
                mix, kv0, conv_all, ssm_all = attn_branch(
                    l, h, kv0, conv_all, ssm_all)
            else:
                mix, kv0, conv_all, ssm_all = jax.lax.cond(
                    is_attn[l], attn_branch, mamba_branch, l, h, kv0,
                    conv_all, ssm_all)
            mix = rms_norm(mix, wc["post_mixer_norm"], self.eps)
            x = res + mix
            res = x
            h = rms_norm(x, wc["pre_mlp_norm"], self.eps)
            y = matmul(
                jax.nn.silu(matmul(h, wc["gate_proj"])) *
                matmul(h, wc["up_proj"]), wc["down_proj"])
            y = rms_norm(y, wc["post_mlp_norm"], self.eps)
            return res + y, kv0, conv_all, ssm_all

        x, kv0, conv_all, ssm_all = jax.lax.fori_loop(
            0, self.L, layer_fn, (x, kv0, conv_all, ssm_all))
        x = rms_norm(x, params["final_norm"], self.eps)
        return x, (kv0, (conv_all, ssm_all))

    def compute_logits(self, params, hidden):
        w = params["embed_tokens"].T if self.tie_embeddings \
            else params["lm_head"]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)
