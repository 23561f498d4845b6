"""Mamba-1 selective-SSM mixer over the engine's packed ragged batch.

Reference capability: csrc/mamba/mamba_ssm/selective_scan_fwd.cu +
csrc/mamba/causal_conv1d/ and vllm/model_executor/layers/mamba/
(mamba_mixer.py). TPU-native design:

- ONE code path serves prefill, chunked-prefill continuation, and
  decode: the recurrence runs as a *segmented* ``associative_scan``
  over the packed token buffer — segment boundaries come from
  ``query_start_loc``, so a mixed batch (some rows prefilling, some
  decoding single tokens) is a single fused device program, exactly
  like the attention path.
- Cross-chunk state lives in two fixed-size per-request slot arrays
  (conv tail [d_conv-1, d_inner] and SSM state [d_inner, d_state]),
  managed by the "mamba" KV-cache group (core/kv_cache_interface.py):
  gathered by slot at the start, scattered back at each segment's last
  token. The h0 carry-in folds into the scan as
  ``b[first] += dA[first] * h0`` — the recurrence is linear, so the
  initial state is just an extra additive term.
- The depthwise causal conv is unrolled over its (static, tiny) kernel
  width: k shifted gathers, positions before the segment start read
  from the conv-tail slot.

States are float32 (parity with the reference kernels). The scan
materializes [T, d_inner, d_state] f32 intermediates; a chunk-local
Pallas kernel is the planned optimization once profiles demand it.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RaggedSegInfo(NamedTuple):
    """Packed-batch segment geometry, shared by every mamba layer of a
    step (compute once in the model, reuse per layer)."""

    req_of_tok: jax.Array  # [T] int32 — owning request row
    seg_start: jax.Array  # [T] int32 — first packed index of that row
    is_first: jax.Array  # [T] bool — token is its segment's first
    valid_tok: jax.Array  # [T] bool
    last_idx: jax.Array  # [R] int32 — packed index of row's last token
    valid_req: jax.Array  # [R] bool
    state_slots: jax.Array  # [R] int32 — mamba state slot per row
    # True when this step holds the request's FIRST tokens: its slot
    # may carry a freed request's stale state, so the carry-in must be
    # suppressed (slots are never zeroed on reuse)
    fresh_req: jax.Array = None  # [R] bool


def build_seg_info(query_start_loc: jax.Array, num_seqs: jax.Array,
                   num_tokens: int,
                   state_slots: jax.Array,
                   fresh_req: jax.Array = None) -> RaggedSegInfo:
    qsl = query_start_loc
    r = qsl.shape[0] - 1
    t = jnp.arange(num_tokens, dtype=jnp.int32)
    req_of_tok = (jnp.searchsorted(qsl, t, side="right").astype(
        jnp.int32) - 1).clip(0, r - 1)
    seg_start = qsl[req_of_tok]
    total = qsl[jnp.minimum(num_seqs[0], r)]
    valid_tok = t < total
    rows = jnp.arange(r, dtype=jnp.int32)
    return RaggedSegInfo(
        req_of_tok=req_of_tok,
        seg_start=seg_start,
        is_first=(t == seg_start) & valid_tok,
        valid_tok=valid_tok,
        last_idx=jnp.maximum(qsl[1:] - 1, qsl[:-1]),
        valid_req=(rows < num_seqs[0]) & (qsl[1:] > qsl[:-1]),
        state_slots=state_slots,
        fresh_req=(jnp.zeros((r, ), bool)
                   if fresh_req is None else fresh_req.astype(bool)),
    )


def _segmented_linear_scan(dA: jax.Array, b: jax.Array,
                           seg: jax.Array) -> jax.Array:
    """h_t = dA_t * h_{t-1} + b_t with h reset at segment boundaries.
    dA/b: [T, D, N] f32, seg: [T] int32. Returns h: [T, D, N] f32."""
    seg3 = seg[:, None, None]

    def combine(left, right):
        a_l, b_l, s_l = left
        a_r, b_r, s_r = right
        same = s_l == s_r
        a = jnp.where(same, a_r * a_l, a_r)
        bb = jnp.where(same, a_r * b_l + b_r, b_r)
        return a, bb, s_r

    _, h, _ = jax.lax.associative_scan(combine, (dA, b, seg3), axis=0)
    return h


def causal_conv1d_ragged(x_in: jax.Array, conv_w: jax.Array,
                         conv_b: Optional[jax.Array],
                         conv_state: jax.Array,
                         seg: RaggedSegInfo) -> jax.Array:
    """Depthwise causal conv over packed segments. x_in: [T, D],
    conv_w: [K, D], conv_state: [S, K-1, D] (slot-gathered tails).
    Positions before a segment's start read the request's conv tail."""
    t_idx = jnp.arange(x_in.shape[0], dtype=jnp.int32)
    k_w = conv_w.shape[0]
    tail = conv_state[seg.state_slots[seg.req_of_tok]]  # [T, K-1, D]
    # first-chunk requests must not read a reused slot's stale tail
    tail = jnp.where(seg.fresh_req[seg.req_of_tok][:, None, None],
                     0.0, tail)
    acc = x_in * conv_w[k_w - 1]
    for k in range(1, k_w):
        j = t_idx - k
        in_chunk = j >= seg.seg_start
        from_buf = x_in[jnp.maximum(j, 0)]
        # delta into the stored tail: delta = seg_start - j in [1, K-1]
        delta = jnp.clip(seg.seg_start - j, 1, k_w - 1)
        from_tail = jnp.take_along_axis(
            tail, (k_w - 1 - delta)[:, None, None].astype(jnp.int32),
            axis=1)[:, 0]
        acc = acc + jnp.where(in_chunk[:, None], from_buf,
                              from_tail) * conv_w[k_w - 1 - k]
    if conv_b is not None:
        acc = acc + conv_b
    return acc


def update_conv_state(x_in: jax.Array, conv_state: jax.Array,
                      seg: RaggedSegInfo) -> jax.Array:
    """New conv tails: the last K-1 inputs of each segment (falling
    back to the old tail when the segment is shorter than K-1)."""
    k_m1 = conv_state.shape[1]
    last = seg.last_idx  # [R]
    old = conv_state[seg.state_slots]  # [R, K-1, D]
    cols = []
    for i in range(k_m1):
        pos = last - (k_m1 - 1 - i)
        in_chunk = pos >= jnp.take(
            seg.seg_start, jnp.minimum(last, x_in.shape[0] - 1))
        from_buf = x_in[jnp.maximum(pos, 0)]
        delta = jnp.clip(
            jnp.take(seg.seg_start, jnp.minimum(
                last, x_in.shape[0] - 1)) - pos, 1, k_m1)
        from_old = jnp.take_along_axis(
            old, (k_m1 - delta)[:, None, None].astype(jnp.int32),
            axis=1)[:, 0]
        cols.append(jnp.where(in_chunk[:, None], from_buf, from_old))
    new_tail = jnp.stack(cols, axis=1)  # [R, K-1, D]
    slots = jnp.where(seg.valid_req, seg.state_slots,
                      conv_state.shape[0])
    return conv_state.at[slots].set(new_tail.astype(conv_state.dtype),
                                    mode="drop")


def _maybe_rms(x: jax.Array, enable: bool, eps: float) -> jax.Array:
    """Parameterless RMSNorm (FalconMamba's B/C/dt normalization)."""
    if not enable:
        return x
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps)


def mamba2_mixer(
    x: jax.Array,  # [T, H] layer input (post-norm)
    w: dict,  # this layer's mixer weights
    conv_state: jax.Array,  # [S, K-1, conv_dim] f32
    ssm_state: jax.Array,  # [S, heads, head_dim, d_state] f32
    seg: RaggedSegInfo,
    num_heads: int,
    head_dim: int,
    n_groups: int,
    d_state: int,
    eps: float,
    time_step_limit: tuple = (0.0, float("inf")),
    zxbcdt_multipliers: Optional[tuple] = None,  # FalconH1
    norm_groups: int = 1,  # Zamba2: grouped gated-norm variance
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Mamba-2 (SSD) block over the packed ragged batch (reference:
    csrc/mamba/ + vllm/model_executor/layers/mamba/mamba_mixer2.py).

    Same segmented-scan skeleton as mamba1_mixer; the Mamba-2 deltas:
    x/B/C all pass through ONE grouped causal conv; the decay dA is
    scalar PER HEAD (A_log is [heads]); B/C are shared per head-group;
    the output gate is a gated RMSNorm. The scan materializes
    [T, heads, head_dim, N] f32 — bound prefill chunks accordingly;
    the chunked SSD kernel is the planned optimization."""
    t = x.shape[0]
    d_inner = num_heads * head_dim
    gn = n_groups * d_state
    conv_dim = d_inner + 2 * gn

    proj = x @ w["in_proj"]
    if "in_bias" in w:
        proj = proj + w["in_bias"]
    z = proj[:, :d_inner]
    xbc = proj[:, d_inner:d_inner + conv_dim].astype(jnp.float32)
    dt_raw = proj[:, d_inner + conv_dim:]  # [T, heads]
    if zxbcdt_multipliers is not None:
        # FalconH1 µP multipliers on the (z, x, B, C, dt) chunks
        mz, mx, mb, mc, mdt = [float(v) for v in zxbcdt_multipliers]
        z = z * mz
        xbc = jnp.concatenate([
            xbc[:, :d_inner] * mx,
            xbc[:, d_inner:d_inner + gn] * mb,
            xbc[:, d_inner + gn:] * mc,
        ], axis=-1)
        dt_raw = dt_raw * mdt

    conv_w = w["conv_w"].astype(jnp.float32)  # [K, conv_dim]
    u = causal_conv1d_ragged(xbc, conv_w, w.get("conv_b"),
                             conv_state, seg)
    new_conv = update_conv_state(xbc, conv_state, seg)
    u = jax.nn.silu(u)

    xs = u[:, :d_inner].reshape(t, num_heads, head_dim)
    b_in = u[:, d_inner:d_inner + gn].reshape(t, n_groups, d_state)
    c_in = u[:, d_inner + gn:].reshape(t, n_groups, d_state)
    heads_per_group = num_heads // n_groups
    b_h = jnp.repeat(b_in, heads_per_group, axis=1)  # [T, heads, N]
    c_h = jnp.repeat(c_in, heads_per_group, axis=1)

    dt = jax.nn.softplus(
        dt_raw.astype(jnp.float32) + w["dt_bias"].astype(jnp.float32))
    lo, hi = time_step_limit
    if lo > 0.0 or hi != float("inf"):
        dt = jnp.clip(dt, lo, hi)
    a = -jnp.exp(w["A_log"].astype(jnp.float32))  # [heads]
    dA = jnp.exp(dt * a[None])  # [T, heads]
    # b term: dt * x ⊗ B  → [T, heads, head_dim, N]
    dBx = (dt[:, :, None] * xs)[..., None] * b_h[:, :, None, :]
    dA4 = jnp.broadcast_to(dA[:, :, None, None], dBx.shape)

    h0 = ssm_state[seg.state_slots[seg.req_of_tok]]
    carry = seg.is_first & ~seg.fresh_req[seg.req_of_tok]
    dBx = jnp.where(carry[:, None, None, None],
                    dBx + dA4 * h0, dBx)
    h = _segmented_linear_scan(
        dA4.reshape(t, num_heads * head_dim, d_state),
        dBx.reshape(t, num_heads * head_dim, d_state),
        seg.req_of_tok).reshape(t, num_heads, head_dim, d_state)

    h_last = jnp.take(h, jnp.minimum(seg.last_idx, t - 1), axis=0)
    slots = jnp.where(seg.valid_req, seg.state_slots,
                      ssm_state.shape[0])
    new_ssm = ssm_state.at[slots].set(h_last.astype(ssm_state.dtype),
                                      mode="drop")

    y = jnp.einsum("thdn,thn->thd", h, c_h)  # [T, heads, head_dim]
    y = y + w["D"].astype(jnp.float32)[None, :, None] * xs
    y = y.reshape(t, d_inner)
    # gated RMSNorm (Mamba2RMSNorm gated=True); FalconH1 variants omit
    # the norm and gate directly
    y = y * jax.nn.silu(z.astype(jnp.float32))
    if "norm" in w:
        # Zamba2RMSNormGated computes the variance per n_groups-sized
        # group of the inner dim; norm_groups=1 is the Bamba/Mamba2
        # full-width norm
        yg = y.reshape(t, norm_groups, d_inner // norm_groups)
        var = jnp.mean(jnp.square(yg), axis=-1, keepdims=True)
        y = (yg * jax.lax.rsqrt(var + eps)).reshape(t, d_inner) * \
            w["norm"].astype(jnp.float32)
    out = y.astype(x.dtype) @ w["out_proj"]
    if "out_bias" in w:
        out = out + w["out_bias"]
    return out, new_conv, new_ssm


def mamba1_mixer(
    x: jax.Array,  # [T, H] layer input (post-norm)
    w: dict,  # this layer's mixer weights
    conv_state: jax.Array,  # [S, K-1, d_inner] f32
    ssm_state: jax.Array,  # [S, d_inner, d_state] f32
    seg: RaggedSegInfo,
    dt_rank: int,
    d_state: int,
    mixer_rms_eps: Optional[float] = None,  # FalconMamba
    rms_eps: float = 1e-6,  # Jamba dt/b/c weighted norms
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One Mamba-1 block. Returns (out [T, H], new_conv_state,
    new_ssm_state)."""
    t = x.shape[0]
    d_inner = conv_state.shape[-1]
    xz = x @ w["in_proj"]  # [T, 2*d_inner]
    if "in_bias" in w:
        xz = xz + w["in_bias"]
    x_in, z = xz[:, :d_inner], xz[:, d_inner:]
    x_in = x_in.astype(jnp.float32)

    # depthwise causal conv (+ cross-chunk tail) then SiLU
    conv_w = w["conv_w"].astype(jnp.float32)  # [K, d_inner]
    u = causal_conv1d_ragged(x_in, conv_w, w.get("conv_b"),
                             conv_state, seg)
    new_conv = update_conv_state(x_in, conv_state, seg)
    u = jax.nn.silu(u)  # [T, d_inner] f32

    # input-dependent dt, B, C
    proj = u.astype(x.dtype) @ w["x_proj"]  # [T, dt_rank + 2N]
    dt_in = proj[:, :dt_rank]
    b_in = proj[:, dt_rank:dt_rank + d_state].astype(jnp.float32)
    c_in = proj[:, dt_rank + d_state:].astype(jnp.float32)
    falcon = mixer_rms_eps is not None
    eps = mixer_rms_eps or 0.0
    dt_in = _maybe_rms(dt_in.astype(jnp.float32), falcon, eps)
    b_in = _maybe_rms(b_in, falcon, eps)
    c_in = _maybe_rms(c_in, falcon, eps)
    if "dt_norm" in w:  # Jamba: weighted RMS on dt/B/C
        from vllm_main_modify_tpu.layers.normalization import rms_norm
        dt_in = rms_norm(dt_in.astype(jnp.float32), w["dt_norm"],
                         rms_eps)
        b_in = rms_norm(b_in, w["b_norm"], rms_eps)
        c_in = rms_norm(c_in, w["c_norm"], rms_eps)
    dt = dt_in.astype(x.dtype) @ w["dt_proj"] + w["dt_bias"]
    dt = jax.nn.softplus(dt.astype(jnp.float32))  # [T, d_inner]

    a = -jnp.exp(w["A_log"].astype(jnp.float32))  # [d_inner, N]
    dA = jnp.exp(dt[:, :, None] * a[None])  # [T, d_inner, N]
    dBx = (dt * u)[:, :, None] * b_in[:, None, :]  # [T, d_inner, N]

    # fold the carried-in state into each segment's first element
    h0 = ssm_state[seg.state_slots[seg.req_of_tok]]  # [T, d_inner, N]
    carry = seg.is_first & ~seg.fresh_req[seg.req_of_tok]
    dBx = jnp.where(carry[:, None, None], dBx + dA * h0, dBx)

    h = _segmented_linear_scan(dA, dBx, seg.req_of_tok)

    # state writeback at each segment's last token
    h_last = jnp.take(h, jnp.minimum(seg.last_idx, t - 1), axis=0)
    slots = jnp.where(seg.valid_req, seg.state_slots,
                      ssm_state.shape[0])
    new_ssm = ssm_state.at[slots].set(h_last.astype(ssm_state.dtype),
                                      mode="drop")

    y = jnp.einsum("tdn,tn->td", h, c_in)  # [T, d_inner] f32
    y = y + w["D"].astype(jnp.float32) * u
    y = y * jax.nn.silu(z.astype(jnp.float32))
    out = y.astype(x.dtype) @ w["out_proj"]
    if "out_bias" in w:
        out = out + w["out_bias"]
    return out, new_conv, new_ssm
