"""Quantized weight containers + the universal ``matmul`` entry point.

Reference capability: vllm/model_executor/layers/quantization/ (~35
methods — GPTQ gptq.py:30, AWQ awq.py:124, FP8 fp8.py:71, tpu_int8
tpu_int8.py:19) and their CUDA kernels (csrc/quantization/). TPU-native
design:

- a weight is either a plain ``jax.Array`` or a registered-pytree
  container below; every model matmul goes through :func:`matmul`, so
  quantization is a pure load-time substitution — models never change;
- INT8 weight-only: native int8 MXU via XLA (x_bf16 @ w_int8 with
  preferred f32 accumulation, then per-channel scale);
- FP8 (e4m3) weight-only: storage halved, dequant fused by XLA into
  the matmul epilogue;
- INT4 (GPTQ/AWQ): packed 8-per-int32 in the canonical layout
  [in, out/8], per-group scales/zeros; the Pallas dequant-matmul
  kernel (ops/pallas/int4_matmul.py) is the production decode path,
  with an XLA reference used on CPU and as oracle.

All containers stack cleanly along a leading layer axis, so the
lax.scan-over-layers model structure is preserved under quantization.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class Int8Weight:
    """Per-output-channel symmetric int8 (compressed-tensors W8A16
    weight-only / tpu_int8 equivalent)."""

    qweight: jax.Array  # [..., in, out] int8
    scale: jax.Array  # [..., out] f32

    def tree_flatten(self):
        return (self.qweight, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.qweight.shape


@jax.tree_util.register_pytree_node_class
@dataclass
class Fp8Weight:
    """Per-output-channel (or per-tensor) float8_e4m3 weights."""

    qweight: jax.Array  # [..., in, out] f8e4m3
    scale: jax.Array  # [..., out] or [..., 1] f32

    def tree_flatten(self):
        return (self.qweight, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.qweight.shape


@jax.tree_util.register_pytree_node_class
@dataclass
class Int4Weight:
    """Group-quantized 4-bit weights, canonical layout.

    ``packed``: [..., in, out//8] int32 — 8 nibbles per int32 along the
    OUT axis (nibble j of word o = column o*8+j), chosen so unpacking
    broadcasts along lanes.
    ``scales``/``zeros``: [..., in//group, out] f32 — w = (q - zero) *
    scale. GPTQ (with g_idx act-order re-sorted at load) and AWQ (its
    interleaved nibble order linearized at load) both repack to this.
    ``perm``: optional [..., in] int32 — activation permutation for
    GPTQ act-order checkpoints (rows were sorted by group at load).
    ``w4a8``: static flag — quantize activations to int8 per token and
    run the int8-MXU W4A8 kernel (Marlin/QServe-style; opt-in via
    quantization="gptq_w4a8"/"awq_w4a8"/"w4a8").
    ``layer``: optional traced int32 scalar — when set, ``packed`` /
    ``scales`` / ``zeros`` / ``perm`` carry a leading layer axis
    [L, ...] and the kernel streams layer ``layer`` directly from the
    stacked HBM buffer (scalar-prefetch block index). This is how the
    stacked-layer ``fori_loop`` models avoid materializing a per-layer
    copy of the weights: XLA cannot fuse a dynamic-slice into a
    custom-call operand, so slicing before the Pallas call costs a
    full extra HBM read+write of the weights EVERY layer (measured
    +33 % on the decode gate_up matmul).
    """

    packed: jax.Array
    scales: jax.Array
    zeros: jax.Array
    perm: jax.Array | None = None
    w4a8: bool = False
    layer: jax.Array | None = None
    # QServe-style progressive requantization (reference capability:
    # w4a8 GEMMs, csrc/quantization/gptq_marlin + QServe paper): the
    # group scale factors as s[g,o] ~= requant_s[o] * requant_m[g,o]
    # with an INTEGER group multiplier m (adaptive cap
    # 127 // max|q - z|_g so (q - z) * m stays int8). Prefill tiles
    # then run ONE int8 matmul per K tile with pure int32
    # accumulation (|sum| <= 127*127*K < 2^31) and apply the
    # per-channel scale once in the epilogue — removing the
    # per-group f32 partial-scaling VPU work. requant_s is stored
    # row-replicated at [..., in//group, out] so it tiles like
    # ``scales``. Decode tiles keep the exact per-group path.
    requant_m: jax.Array | None = None  # int32 [..., in//group, out]
    requant_s: jax.Array | None = None  # f32 [..., in//group, out]

    def tree_flatten(self):
        children = [self.packed, self.scales, self.zeros]
        opt = (self.perm, self.layer, self.requant_m, self.requant_s)
        flags = tuple(a is not None for a in opt)
        children.extend(a for a in opt if a is not None)
        return tuple(children), (flags, self.w4a8)

    @classmethod
    def tree_unflatten(cls, aux, children):
        flags, w4a8 = aux
        base, rest = list(children[:3]), list(children[3:])
        vals = [rest.pop(0) if f else None for f in flags]
        return cls(*base, perm=vals[0], w4a8=w4a8, layer=vals[1],
                   requant_m=vals[2], requant_s=vals[3])

    @property
    def shape(self):
        *lead, k, o8 = self.packed.shape
        return (*lead, k, o8 * 8)

    @property
    def group_size(self):
        return self.packed.shape[-2] // self.scales.shape[-2]


@jax.tree_util.register_pytree_node_class
@dataclass
class Fp8W8A8Weight:
    """FP8 weights *and* FP8 activations (W8A8): the matmul runs on
    the fp8 MXU path with f32 accumulation. Activations are quantized
    per-token dynamically unless a static ``act_scale`` was loaded
    from the checkpoint (reference: Fp8LinearOp
    vllm/model_executor/layers/quantization/fp8.py:71,209 →
    cutlass_scaled_mm, csrc/quantization/cutlass_w8a8/)."""

    qweight: jax.Array  # [..., in, out] f8e4m3
    scale: jax.Array  # [..., out] or [..., 1] f32 (per-chan / tensor)
    act_scale: jax.Array | None = None  # [..., 1] f32 static, or None

    def tree_flatten(self):
        if self.act_scale is None:
            return (self.qweight, self.scale), False
        return (self.qweight, self.scale, self.act_scale), True

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.qweight.shape


@jax.tree_util.register_pytree_node_class
@dataclass
class Int8W8A8Weight:
    """INT8 weights and INT8 activations: s8 x s8 → s32 MXU matmul
    (reference: compressed-tensors INT8 w8a8 schemes +
    csrc/quantization/w8a8/)."""

    qweight: jax.Array  # [..., in, out] int8
    scale: jax.Array  # [..., out] f32
    act_scale: jax.Array | None = None  # [..., 1] f32 static, or None

    def tree_flatten(self):
        if self.act_scale is None:
            return (self.qweight, self.scale), False
        return (self.qweight, self.scale, self.act_scale), True

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.qweight.shape


# fp4 e2m1 value table (sign = top nibble bit)
FP4_E2M1 = (0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
            -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0)


@jax.tree_util.register_pytree_node_class
@dataclass
class Mxfp4Weight:
    """OCP MX-FP4 weights (GPT-OSS checkpoints — reference:
    vllm/model_executor/layers/quantization/mxfp4.py).

    ``packed``: [..., in, out//2] uint8 — two e2m1 nibbles per byte
    along OUT (low nibble = even column), repacked at load from the
    checkpoint's 32-element in-dim blocks.
    ``scales``: [..., in//32, out] f32 — the e8m0 block scale (2^e),
    decoded at load; blocks run along IN, so this is exactly the
    Int4Weight group layout with group_size 32 and no zero point.
    """

    packed: jax.Array
    scales: jax.Array

    def tree_flatten(self):
        return (self.packed, self.scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        *lead, k, o2 = self.packed.shape
        return (*lead, k, o2 * 2)


def dequant_mxfp4(w: Mxfp4Weight, dtype=jnp.bfloat16) -> jax.Array:
    lut = jnp.asarray(FP4_E2M1, jnp.float32)
    lo = jnp.take(lut, (w.packed & 0xF).astype(jnp.int32))
    hi = jnp.take(lut, (w.packed >> 4).astype(jnp.int32))
    *lead, k, o2 = w.packed.shape
    vals = jnp.stack([lo, hi], axis=-1).reshape(*lead, k, o2 * 2)
    g = k // w.scales.shape[-2]
    vg = vals.reshape(*lead, k // g, g, o2 * 2)
    deq = vg * w.scales[..., :, None, :]
    return deq.reshape(*lead, k, o2 * 2).astype(dtype)


def quantize_mxfp4(w: jax.Array) -> Mxfp4Weight:
    """Float → MXFP4 (tests / on-the-fly): per-32-block e8m0 scale =
    2^ceil(log2(amax/6)), values snapped to the e2m1 grid."""
    *lead, k, o = w.shape
    g = 32
    wf = jnp.asarray(w, jnp.float32).reshape(*lead, k // g, g, o)
    amax = jnp.abs(wf).max(axis=-2)
    e = jnp.ceil(jnp.log2(jnp.maximum(amax / 6.0, 2.0**-126)))
    scales = (2.0**e).astype(jnp.float32)  # [..., k/g, o]
    scaled = jnp.abs(wf) / scales[..., None, :]
    lut = jnp.asarray(FP4_E2M1[:8], jnp.float32)
    idx = jnp.argmin(jnp.abs(scaled[..., None] - lut),
                     axis=-1).astype(jnp.uint8)
    idx = jnp.where(wf < 0, idx + 8, idx)
    nib = idx.reshape(*lead, k, o)
    packed = (nib[..., 0::2] | (nib[..., 1::2] << 4)).astype(jnp.uint8)
    return Mxfp4Weight(packed, scales)


@jax.tree_util.register_pytree_node_class
@dataclass
class Fp8BlockWeight:
    """128x128-block-scaled FP8 (DeepSeek-family checkpoints —
    reference: vllm fp8.py weight_block_size / weight_scale_inv).

    ``qweight``: [..., in, out] f8e4m3.
    ``scales``: [..., in/bk, out/bn] f32 (multiplied during dequant —
    the checkpoint's ``weight_scale_inv`` naming notwithstanding).
    """

    qweight: jax.Array
    scales: jax.Array
    block: tuple = (128, 128)

    def tree_flatten(self):
        return (self.qweight, self.scales), self.block

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, block=aux)

    @property
    def shape(self):
        return self.qweight.shape


def dequant_fp8_block(w: Fp8BlockWeight,
                      dtype=jnp.bfloat16) -> jax.Array:
    *lead, k, o = w.qweight.shape
    bk, bn = w.block
    nk, no = w.scales.shape[-2], w.scales.shape[-1]
    q = w.qweight.astype(jnp.float32).reshape(
        *lead, nk, k // nk, no, o // no)
    deq = q * w.scales[..., :, None, :, None]
    return deq.reshape(*lead, k, o).astype(dtype)


def quantize_fp8_block(w: jax.Array,
                       block: tuple = (128, 128)) -> Fp8BlockWeight:
    *lead, k, o = w.shape
    bk = min(block[0], k)
    bn = min(block[1], o)
    wf = jnp.asarray(w, jnp.float32).reshape(
        *lead, k // bk, bk, o // bn, bn)
    amax = jnp.abs(wf).max(axis=(-3, -1))
    scales = jnp.maximum(amax / FP8_MAX, 1e-12)
    q = (wf / scales[..., :, None, :, None]).astype(jnp.float8_e4m3fn)
    return Fp8BlockWeight(
        q.reshape(*lead, k, o), scales.astype(jnp.float32), (bk, bn))


@jax.tree_util.register_pytree_node_class
@dataclass
class LoraWeight:
    """A base weight (plain or quantized) plus stacked multi-LoRA
    adapter slots (reference capability: vllm/lora/layers/ applies
    adapters to every linear of every model; punica TPU
    punica_wrapper/punica_tpu.py:21).

    ``base``: [..., in, out] — any weight ``matmul`` accepts.
    ``a``/``b``: [..., S, in, r] / [..., S, r, out] adapter stacks
    (slot 0 = null adapter). Layer-stacked models carry a leading L
    axis on all three, so lax.scan layer slicing works unchanged.

    ``matmul`` adds the per-token adapter delta whenever a
    :func:`lora_context` is active (the model runner opens one around
    the forward with the step's per-token slot ids) — models need no
    LoRA code at all."""

    base: object
    a: jax.Array
    b: jax.Array

    def tree_flatten(self):
        return (self.base, self.a, self.b), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.base.shape


_LORA_CTX: list = []


class lora_context:
    """Context manager active during model tracing: (scales [S],
    token_slots [T]). matmul() reads it for LoraWeight operands."""

    def __init__(self, scales, token_slots):
        self.val = (scales, token_slots)

    def __enter__(self):
        _LORA_CTX.append(self.val)
        return self

    def __exit__(self, *exc):
        _LORA_CTX.pop()
        return False


QuantizedWeight = Union[Int8Weight, Fp8Weight, Int4Weight,
                        Fp8W8A8Weight, Int8W8A8Weight, Mxfp4Weight,
                        Fp8BlockWeight]

FP8_MAX = 448.0  # float8_e4m3fn max normal


def quantize_activations_fp8(x: jax.Array, act_scale=None):
    """Per-token (row) dynamic fp8 quantization — or static when the
    checkpoint carries an input_scale. XLA fuses the amax/scale/cast
    into the producer's epilogue (reference: per-token dynamic quant
    kernels, csrc/quantization/fp8/)."""
    xf = x.astype(jnp.float32)
    if act_scale is not None:
        s = jnp.broadcast_to(act_scale.astype(jnp.float32).reshape(-1),
                             (1, ))[0]
        q = jnp.clip(xf / s, -FP8_MAX, FP8_MAX).astype(
            jnp.float8_e4m3fn)
        return q, s
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax / FP8_MAX, 1e-12)
    q = (xf / s).astype(jnp.float8_e4m3fn)
    return q, s


def quantize_activations_int8(x: jax.Array, act_scale=None):
    xf = x.astype(jnp.float32)
    if act_scale is not None:
        s = jnp.broadcast_to(act_scale.astype(jnp.float32).reshape(-1),
                             (1, ))[0]
    else:
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        s = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


INT4_TILE = 1024  # lane-blocked packing tile (see int4_pack)


def _int4_blocked(out_dim: int) -> bool:
    """Blocked layout iff the Pallas kernel can run (o % 1024 == 0);
    both pack and unpack and the kernel share this predicate."""
    return out_dim % INT4_TILE == 0


def int4_unpack(packed: jax.Array) -> jax.Array:
    """[..., in, out//8] int32 → [..., in, out] int32 nibbles."""
    o = packed.shape[-1] * 8
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    nib = (packed[..., :, :, None] >> shifts) & 0xF
    if not _int4_blocked(o):
        return nib.reshape(*packed.shape[:-1], o)
    # blocked layout: words grouped 128 per tile; nibble j of word
    # t*128+w holds column t*1024 + j*128 + w
    *lead, k, o8 = packed.shape
    nib = nib.reshape(*lead, k, o8 // 128, 128, 8)
    nib = jnp.swapaxes(nib, -1, -2)  # [..., tiles, 8, 128]
    return nib.reshape(*lead, k, o)


def dequant_int4(w: Int4Weight, dtype=jnp.bfloat16) -> jax.Array:
    q = int4_unpack(w.packed).astype(jnp.float32)  # [..., in, out]
    g = w.group_size
    *lead, k, o = q.shape
    qg = q.reshape(*lead, k // g, g, o)
    deq = (qg - w.zeros[..., :, None, :]) * w.scales[..., :, None, :]
    return deq.reshape(*lead, k, o).astype(dtype)


def matmul(x: jax.Array, w) -> jax.Array:
    """x @ w for plain or quantized weights; models call ONLY this."""
    if isinstance(w, jax.Array):
        return x @ w
    if isinstance(w, LoraWeight):
        y = matmul(x, w.base)
        if _LORA_CTX:
            from vllm_main_modify_tpu.lora.ops import lora_apply

            scales, slots = _LORA_CTX[-1]
            x2 = x.reshape(-1, x.shape[-1])
            delta = lora_apply(x2, w.a, w.b, scales, slots)
            y = y + delta.reshape(y.shape).astype(y.dtype)
        return y
    if isinstance(w, Int8Weight):
        # int8 MXU: accumulate f32, scale per out-channel
        acc = jax.lax.dot_general(
            x, w.qweight.astype(x.dtype),
            dimension_numbers=(((x.ndim - 1, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32)
        return (acc * w.scale.astype(jnp.float32)).astype(x.dtype)
    if isinstance(w, Fp8Weight):
        acc = jax.lax.dot_general(
            x, w.qweight.astype(x.dtype),
            dimension_numbers=(((x.ndim - 1, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32)
        return (acc * w.scale.astype(jnp.float32)).astype(x.dtype)
    if isinstance(w, Fp8W8A8Weight):
        qx, s_a = quantize_activations_fp8(x, w.act_scale)
        acc = jax.lax.dot_general(
            qx, w.qweight,
            dimension_numbers=(((x.ndim - 1, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32)
        return (acc * s_a * w.scale.astype(jnp.float32)).astype(
            x.dtype)
    if isinstance(w, Int8W8A8Weight):
        qx, s_a = quantize_activations_int8(x, w.act_scale)
        acc = jax.lax.dot_general(
            qx, w.qweight,
            dimension_numbers=(((x.ndim - 1, ), (0, )), ((), ())),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * s_a *
                w.scale.astype(jnp.float32)).astype(x.dtype)
    if isinstance(w, Mxfp4Weight):
        # LUT dequant fused by XLA into the matmul's producer; Pallas
        # kernel (int4-style) is a future optimization
        return x @ dequant_mxfp4(w, x.dtype)
    if isinstance(w, Fp8BlockWeight):
        return x @ dequant_fp8_block(w, x.dtype)
    if isinstance(w, Int4Weight):
        from vllm_main_modify_tpu.quantization.int4_dispatch import \
            int4_matmul

        if w.perm is not None:
            # GPTQ act-order: weights were row-sorted by group at
            # load; apply the same permutation to activations
            perm = w.perm if w.layer is None else \
                jax.lax.dynamic_index_in_dim(w.perm, w.layer, 0,
                                             keepdims=False)
            x = jnp.take(x, perm, axis=-1)
        return int4_matmul(x, w)
    raise TypeError(f"unsupported weight type {type(w)}")


def index_layer_weights(layers, l):
    """Per-layer view of a stacked [L, ...] layer pytree for use
    inside a ``fori_loop``/unrolled layer loop. Plain arrays are
    dynamic-indexed (XLA fuses the slice into consumer dots);
    Pallas-consumed quantized weights (Int4Weight) stay STACKED with
    the traced layer id attached, so the kernel block-indexes the
    layer axis in HBM instead of forcing a materialized copy
    (custom-call operands cannot alias a slice)."""

    def f(node):
        if isinstance(node, Int4Weight):
            return Int4Weight(node.packed, node.scales, node.zeros,
                              perm=node.perm, w4a8=node.w4a8,
                              layer=jnp.asarray(l, jnp.int32),
                              requant_m=node.requant_m,
                              requant_s=node.requant_s)
        return jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(
                a, l, 0, keepdims=False), node)

    return jax.tree.map(f, layers,
                        is_leaf=lambda n: isinstance(n, Int4Weight))


# ---------------------------------------------------------------------------
# quantizers (tests + on-the-fly quantization of bf16 checkpoints)
# ---------------------------------------------------------------------------


def quantize_int8(w: jax.Array) -> Int8Weight:
    """Per-out-channel symmetric int8 of [..., in, out]."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale[..., None, :]), -127,
        127).astype(jnp.int8)
    return Int8Weight(q, scale.astype(jnp.float32))


def quantize_fp8(w: jax.Array) -> Fp8Weight:
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.maximum(amax / 448.0, 1e-8)  # e4m3 max
    q = (w.astype(jnp.float32) / scale[..., None, :]).astype(
        jnp.float8_e4m3fn)
    return Fp8Weight(q, scale.astype(jnp.float32))


def quantize_fp8_w8a8(w: jax.Array) -> Fp8W8A8Weight:
    wo = quantize_fp8(w)
    return Fp8W8A8Weight(wo.qweight, wo.scale)


def quantize_int8_w8a8(w: jax.Array) -> Int8W8A8Weight:
    wo = quantize_int8(w)
    return Int8W8A8Weight(wo.qweight, wo.scale)


def quantize_int4(w: jax.Array, group_size: int = 128) -> Int4Weight:
    """Asymmetric per-group int4 of [..., in, out]."""
    *lead, k, o = w.shape
    g = min(group_size, k)
    wf = w.astype(jnp.float32).reshape(*lead, k // g, g, o)
    wmin = wf.min(axis=-2)
    wmax = wf.max(axis=-2)
    scale = jnp.maximum((wmax - wmin) / 15.0, 1e-8)
    zero = jnp.round(-wmin / scale)
    q = jnp.clip(jnp.round(wf / scale[..., None, :]) +
                 zero[..., None, :], 0, 15).astype(jnp.int32)
    q = q.reshape(*lead, k, o)
    packed = int4_pack(q)
    return Int4Weight(packed, scale.astype(jnp.float32),
                      zero.astype(jnp.float32))


def int4_pack(q: jax.Array) -> jax.Array:
    """[..., in, out] int32 nibbles → [..., in, out//8] int32.

    Lane-blocked layout when out % 1024 == 0 (the Pallas kernel's
    tile): within each 1024-column tile, nibble j of word w holds
    column j*128 + w — so the kernel unpacks with an 8-way lane
    concat, which Mosaic lowers (lane-expanding reshapes and
    element-repeat do not). Linear layout otherwise (XLA path only).
    """
    *lead, k, o = q.shape
    if _int4_blocked(o):
        qt = q.reshape(*lead, k, o // INT4_TILE, 8, 128)
        qt = jnp.swapaxes(qt, -1, -2)  # [..., tiles, 128, 8]
        qr = qt.reshape(*lead, k, o // 8, 8).astype(jnp.uint32)
    else:
        qr = q.reshape(*lead, k, o // 8, 8).astype(jnp.uint32)
    shifts = jnp.arange(8, dtype=jnp.uint32) * 4
    words = (qr << shifts).sum(axis=-1, dtype=jnp.uint32)
    return words.astype(jnp.int32)


def _requant_arrays(packed, scales, zeros):
    q = int4_unpack(packed)  # [K, O] int32
    k, o = q.shape
    g = k // scales.shape[-2]
    qg = q.reshape(k // g, g, o)
    dev = jnp.abs(qg - zeros.astype(jnp.int32)[:, None, :]
                  ).max(axis=-2)  # [K/g, O]
    m_cap = 127 // jnp.maximum(dev, 1)
    s_chan = jnp.max(scales / m_cap.astype(jnp.float32),
                     axis=-2)  # [O]
    m = jnp.clip(jnp.round(scales / s_chan[None, :]), 1,
                 m_cap).astype(jnp.int32)
    rs = s_chan[None, :] + jnp.zeros_like(scales)  # row-replicated
    return m, rs


def attach_requant(w: Int4Weight) -> Int4Weight:
    """Derive the progressive-requantization arrays (see Int4Weight
    docstring) from an already-quantized weight: per-channel scale
    ``S[o] = max_g s[g,o] / m_cap[g,o]`` and integer group multiplier
    ``m = round(s / S)`` clipped to the adaptive cap
    ``127 // max|q - z|_g`` so the in-kernel product (q - z) * m fits
    int8 exactly. Load-time only; stacked [L, ...] weights are
    processed one layer at a time to bound the unpack transient
    ([K, O] int32), and the outputs adopt ``scales``' sharding."""
    if w.packed.ndim > 2:
        parts = [
            _requant_arrays(w.packed[i], w.scales[i], w.zeros[i])
            for i in range(w.packed.shape[0])
        ]
        m = jnp.stack([p[0] for p in parts])
        rs = jnp.stack([p[1] for p in parts])
    else:
        m, rs = _requant_arrays(w.packed, w.scales, w.zeros)
    try:  # match the group-scale sharding (no-op on single device)
        m = jax.device_put(m, w.scales.sharding)
        rs = jax.device_put(rs, w.scales.sharding)
    except Exception:  # noqa: BLE001 — tracer/aval inputs in tests
        pass
    return Int4Weight(w.packed, w.scales, w.zeros, perm=w.perm,
                      w4a8=w.w4a8, layer=w.layer, requant_m=m,
                      requant_s=rs)


def quantize_int4_w4a8(w: jax.Array, group_size: int = 128
                       ) -> Int4Weight:
    """As :func:`quantize_int4` but flagged for the W4A8 (int8-MXU)
    matmul path, with the progressive-requant arrays attached for the
    prefill kernel."""
    q = quantize_int4(w, group_size)
    return attach_requant(
        Int4Weight(q.packed, q.scales, q.zeros, q.perm, w4a8=True))
