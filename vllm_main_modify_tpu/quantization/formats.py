"""GPTQ / AWQ checkpoint repacking → canonical Int4Weight.

Reference semantics implemented from scratch (behavioral parity with
vllm/model_executor/layers/quantization/gptq.py:30 and awq.py:124 and
their CUDA kernels):

GPTQ (4-bit):
- ``qweight``  int32 [in/8, out] — 8 nibbles per word along IN
- ``qzeros``   int32 [in/g, out/8] — nibbles along OUT, stored with
  the historical ``+1`` offset (v1 checkpoints; ``gptq_v2`` drops it)
- ``scales``   f16  [in/g, out]
- ``g_idx``    int32 [in] — per-row group (act-order); handled by
  sorting rows at load and carrying the activation permutation
- w[k, o] = scales[g(k), o] * (q[k, o] - zeros[g(k), o])

AWQ (4-bit):
- ``qweight`` int32 [in, out/8] with nibble order [0,2,4,6,1,3,5,7]
- ``qzeros``  int32 [in/g, out/8] same interleave (no +1)
- ``scales``  f16  [in/g, out]

Both unpack on host (numpy) and repack to the canonical layout
(8 nibbles per int32 along OUT, linear order).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def _unpack_rows(packed: np.ndarray) -> np.ndarray:
    """int32 [a/8, b] nibbles along axis0 → [a, b]."""
    shifts = (np.arange(8) * 4).reshape(1, 8, 1)
    nib = (packed[:, None, :] >> shifts) & 0xF
    return nib.reshape(packed.shape[0] * 8, packed.shape[1])


def _unpack_cols(packed: np.ndarray,
                 order: Optional[np.ndarray] = None) -> np.ndarray:
    """int32 [a, b/8] nibbles along axis1 → [a, b]."""
    shifts = (np.arange(8) * 4).reshape(1, 1, 8)
    nib = (packed[:, :, None] >> shifts) & 0xF
    if order is not None:
        nib = nib[:, :, np.argsort(order)]
    return nib.reshape(packed.shape[0], packed.shape[1] * 8)


def _pack_cols(q: np.ndarray) -> np.ndarray:
    """[a, b] nibbles → canonical int32 [a, b/8] (lane-blocked when
    b % 1024 == 0 — must match quantization/weights.py int4_pack)."""
    a, b = q.shape
    if b % 1024 == 0:
        qt = q.reshape(a, b // 1024, 8, 128)
        qt = np.swapaxes(qt, -1, -2)
        qr = qt.reshape(a, b // 8, 8).astype(np.uint32)
    else:
        qr = q.reshape(a, b // 8, 8).astype(np.uint32)
    shifts = (np.arange(8, dtype=np.uint32) * 4).reshape(1, 1, 8)
    return (qr << shifts).sum(axis=2, dtype=np.uint32).astype(np.int32)


def repack_gptq(qweight: np.ndarray, qzeros: np.ndarray,
                scales: np.ndarray, g_idx: Optional[np.ndarray],
                sym_no_zero_offset: bool = False):
    """→ (packed [in, out/8], scales [in/g, out], zeros [in/g, out],
    perm [in] or None)."""
    q = _unpack_rows(qweight.view(np.int32))  # [in, out]
    zeros = _unpack_cols(qzeros.view(np.int32))  # [in/g, out]
    if not sym_no_zero_offset:
        zeros = zeros + 1  # GPTQ v1 offset quirk
    scales = scales.astype(np.float32)
    k = q.shape[0]
    groups = scales.shape[0]
    group_size = k // groups

    perm = None
    if g_idx is not None:
        g_idx = np.asarray(g_idx)
        if not np.array_equal(g_idx,
                              np.arange(k) // group_size):
            # act-order: sort rows by group; activations get the same
            # permutation at runtime
            perm = np.argsort(g_idx, kind="stable").astype(np.int32)
            q = q[perm]
    return (_pack_cols(q), scales, zeros.astype(np.float32), perm)


def repack_awq(qweight: np.ndarray, qzeros: np.ndarray,
               scales: np.ndarray):
    q = _unpack_cols(qweight.view(np.int32), AWQ_ORDER)  # [in, out]
    zeros = _unpack_cols(qzeros.view(np.int32), AWQ_ORDER)
    return (_pack_cols(q), scales.astype(np.float32),
            zeros.astype(np.float32), None)


def dequant_reference(q: np.ndarray, scales: np.ndarray,
                      zeros: np.ndarray,
                      g_idx: Optional[np.ndarray] = None,
                      zero_offset: int = 0) -> np.ndarray:
    """Per-spec oracle: w[k, o] = s[g(k), o] * (q[k,o] - z[g(k),o])."""
    k = q.shape[0]
    group_size = k // scales.shape[0]
    g = g_idx if g_idx is not None else np.arange(k) // group_size
    return scales[g] * (q.astype(np.float32) - (zeros[g] + zero_offset))


def repack_mxfp4(blocks: np.ndarray, scales_u8: np.ndarray):
    """OCP MX-FP4 checkpoint tensors → canonical Mxfp4Weight arrays
    (reference: vllm/model_executor/layers/quantization/mxfp4.py;
    HF GPT-OSS ships ``*_blocks`` uint8 [..., out, in/32, 16] — two
    e2m1 nibbles per byte, element 2j in the LOW nibble — and
    ``*_scales`` uint8 e8m0 [..., out, in/32]).

    Returns (packed [..., in, out/2] uint8 with the even column in the
    low nibble, scales [..., in/32, out] f32 = 2^(e8m0-127))."""
    blocks = np.asarray(blocks)
    scales_u8 = np.asarray(scales_u8)
    *lead, out, nblk = scales_u8.shape
    # flatten any trailing block axes to [..., out, in/2]
    b2 = blocks.reshape(*lead, out, -1)
    k = b2.shape[-1] * 2
    assert k == nblk * 32, (blocks.shape, scales_u8.shape)
    lo = (b2 & 0xF).astype(np.uint8)
    hi = (b2 >> 4).astype(np.uint8)
    nib = np.empty((*lead, out, k), np.uint8)
    nib[..., 0::2] = lo
    nib[..., 1::2] = hi
    nib = np.swapaxes(nib, -1, -2)  # [..., in, out]
    packed = (nib[..., 0::2] | (nib[..., 1::2] << 4)).astype(np.uint8)
    scales = np.swapaxes(
        2.0**(scales_u8.astype(np.float32) - 127.0), -1, -2)
    return packed, np.ascontiguousarray(scales)
