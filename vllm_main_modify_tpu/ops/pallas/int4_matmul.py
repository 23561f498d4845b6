"""Pallas TPU kernel: fused INT4 dequant + matmul (W4A16).

Replaces the reference's GPTQ/AWQ/Marlin/Machete CUDA GEMMs
(csrc/quantization/{gptq,awq,gptq_marlin,machete}/) with one kernel
over the canonical packed layout (quantization/weights.py Int4Weight).

Decode is HBM-bandwidth-bound: streaming 4-bit weights instead of
bf16 is a 4x traffic cut — the nibble unpack + dequant runs on the
VPU while the MXU consumes the previous tile (automatic BlockSpec
pipelining double-buffers the weight stream). Accumulation is f32 in
VMEM scratch across K tiles.

Grid: (num_m_tiles, num_out_tiles, num_k_tiles) — K is the inner
(fastest) axis so the output tile stays resident while partial
products accumulate. Decode batches (T ≤ 512) run as one M tile;
prefill T is gridded in 512-row tiles, which amortizes the per-weight-
tile nibble unpack over many MXU rows and keeps prefill on the int8
MXU (2x bf16 peak on v5e) instead of falling back to XLA dequant.

Measured on this environment's tunneled v5e (serialized-scan
microbench, benchmarks/microbench_int4.py — naive timing through the
tunnel is invalid, see its docstring): the W4A16 variant is VPU-bound
on the unpack+dequant and lands at par with the bf16 XLA matmul
(~740 GB/s effective weight stream); the W4A8 variant below reaches
2.1-3.4x over bf16 at decode batch sizes (T=8..32).

W4A8 variant (``int4_matmul_w4a8_pallas``): activations are quantized
per-token to int8 (quantization/weights.py quantize_activations_int8)
and the matmul runs on the int8 MXU. The group dequant moves into the
INTEGER domain — (q - zero) fits int8 exactly (q, zero in [0, 15]) —
so the per-element VPU work drops to unpack + subtract + narrow, and
the f32 scale applies to the [T, BO] per-group partial products
instead of the [BK, BO] weight tile (a T/BK-fold cut at decode batch
sizes). Reference target: Marlin/QServe-style W4A8 GEMMs
(csrc/quantization/gptq_marlin/, q_gemm.cu:1848-era).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _int4_kernel(*refs, group_size: int, n_k_tiles: int):
    # stacked-layer variant carries a leading layer-index scalar ref
    # (PrefetchScalarGridSpec); weight blocks are squeezed by None
    # block dims, so the body is identical either way
    (x_ref, packed_ref, scales_ref, zeros_ref, out_ref,
     acc_ref) = refs[1:] if len(refs) == 7 else refs
    j = pl.program_id(2)

    # unpack nibbles WITHOUT reshapes or repeats (Mosaic lowers
    # neither lane-dim splits nor element-repeat): the lane-blocked
    # packing (quantization/weights.py int4_pack) puts nibble j of
    # word w at column j*128 + w of each 1024-column tile, so an
    # 8-way lane concat of shifted copies IS the unpack
    packed = packed_ref[...]
    bk, bo8 = packed.shape
    q = jnp.concatenate(
        [(packed >> (4 * j)) & 0xF for j in range(8)],
        axis=1).astype(jnp.float32)  # [BK, BO]

    # per-row scales/zeros: the scales block is this K tile's groups
    # (BlockSpec-sliced; the tile is 8-group aligned so the thin axis
    # is legal). Expand groups → rows with a COMPILE-TIME one-hot
    # matmul (Mosaic lowers neither sublane element-repeat nor
    # value dynamic_slice; a constant [BK, BK/g] one-hot GEMM is
    # cheap and fuses)
    gpt = bk // group_size
    row_group = jax.lax.broadcasted_iota(jnp.int32, (bk, gpt),
                                         0) // group_size
    have = jax.lax.broadcasted_iota(jnp.int32, (bk, gpt), 1)
    sel = (row_group == have).astype(jnp.float32)
    scales_rows = jnp.dot(sel, scales_ref[...],
                          preferred_element_type=jnp.float32)
    zeros_rows = jnp.dot(sel, zeros_ref[...],
                         preferred_element_type=jnp.float32)
    deq = ((q - zeros_rows) * scales_rows).astype(x_ref.dtype)

    partial = jnp.dot(x_ref[...], deq,
                      preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = partial

    @pl.when(j > 0)
    def _():
        acc_ref[...] = acc_ref[...] + partial

    @pl.when(j == n_k_tiles - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _int4_w4a8_kernel(*refs, group_size: int, n_k_tiles: int,
                      zero_correct: bool = False,
                      requant: bool = False):
    if requant:
        return _w4a8_requant_body(refs, group_size, n_k_tiles)
    (qx_ref, packed_ref, scales_ref, zeros_ref, sa_ref, out_ref,
     acc_ref) = refs[1:] if len(refs) == 8 else refs
    j = pl.program_id(2)

    # unpack nibbles (same lane-blocked layout as the W4A16 kernel)
    packed = packed_ref[...]
    bk = packed.shape[0]
    q = jnp.concatenate(
        [(packed >> (4 * jj)) & 0xF for jj in range(8)],
        axis=1)  # [BK, BO] int32

    zeros_i = zeros_ref[...].astype(jnp.int32)  # [BK/g, BO] exact
    scales = scales_ref[...]  # [BK/g, BO] f32
    qx = qx_ref[...]  # [T, BK] int8

    if zero_correct:
        # decode (small T): skip the [BK, BO] per-element zero
        # subtract entirely — matmul the UNSIGNED nibbles (q ∈ [0,15]
        # fits int8) and subtract the exact group correction
        # Σ_k qx[t,k] · z[g,o] = gsum[t,g] · z[g,o] from the [T, BO]
        # partial instead. Exact for integral zeros; the correction
        # costs one extra [T, BO] op per group, a win while
        # T < group_size (the weight tile has group_size× more
        # elements than the partial).
        acc = None
        for gi in range(bk // group_size):
            lo, hi = gi * group_size, (gi + 1) * group_size
            xg = qx[:, lo:hi]
            gsum = jnp.sum(xg.astype(jnp.int32), axis=1,
                           keepdims=True)  # [T, 1]
            part = jax.lax.dot_general(
                xg, q[lo:hi].astype(jnp.int8),
                dimension_numbers=(((1, ), (0, )), ((), ())),
                preferred_element_type=jnp.int32)
            # integer-domain correction: no f32 rounding anywhere
            # before the per-group scale (Mosaic may demote f32
            # elementwise chains to bf16 under excess-precision)
            part = (part - gsum * zeros_i[gi:gi + 1, :]).astype(
                jnp.float32)
            part = part * scales[gi:gi + 1, :]
            acc = part if acc is None else acc + part
    else:
        # per-group: (q - z) fits int8 exactly; one int8 MXU matmul
        # per group, f32 scale applied to the [T, BO] partial (not
        # the [BK, BO] weight tile)
        acc = None
        for gi in range(bk // group_size):
            lo, hi = gi * group_size, (gi + 1) * group_size
            wq8 = (q[lo:hi] - zeros_i[gi:gi + 1, :]).astype(jnp.int8)
            part = jax.lax.dot_general(
                qx[:, lo:hi], wq8,
                dimension_numbers=(((1, ), (0, )), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            part = part * scales[gi:gi + 1, :]
            acc = part if acc is None else acc + part

    @pl.when(j == 0)
    def _():
        acc_ref[...] = acc

    @pl.when(j > 0)
    def _():
        acc_ref[...] = acc_ref[...] + acc

    @pl.when(j == n_k_tiles - 1)
    def _():
        # per-token activation scale in the epilogue: sa is tiled to
        # 128 lanes on the host (thin [T, 1] blocks don't tile); the
        # in-kernel [BM, 1] slice broadcast is a plain VPU op. Casting
        # here (not outside) keeps the HBM out-stream at x.dtype width
        # — at prefill sizes a f32 [T, O] round trip would dominate.
        out_ref[...] = (acc_ref[...] *
                        sa_ref[:, 0:1]).astype(out_ref.dtype)


def _w4a8_requant_body(refs, group_size: int, n_k_tiles: int):
    """Prefill W4A8 via progressive requantization (see
    quantization/weights.py attach_requant): reconstruct int8 weights
    as (q - z) * m per group, run ONE int8 MXU matmul per K tile with
    pure int32 accumulation across tiles (|sum| <= 127*127*K < 2^31),
    and apply the per-channel scale + per-token activation scale once
    in the epilogue. Removes the per-group f32 partial scaling that
    cost ~40% VPU time on top of the int8 MXU stream at prefill
    sizes."""
    (qx_ref, packed_ref, zeros_ref, m_ref, rs_ref, sa_ref, out_ref,
     acc_ref) = refs[1:] if len(refs) == 9 else refs
    j = pl.program_id(2)

    packed = packed_ref[...]
    bk = packed.shape[0]
    q = jnp.concatenate(
        [(packed >> (4 * jj)) & 0xF for jj in range(8)],
        axis=1)  # [BK, BO] int32
    zeros_i = zeros_ref[...].astype(jnp.int32)  # [BK/g, BO]
    m_i = m_ref[...]  # [BK/g, BO] int32
    w8s = []
    for gi in range(bk // group_size):
        lo, hi = gi * group_size, (gi + 1) * group_size
        w8s.append(((q[lo:hi] - zeros_i[gi:gi + 1, :]) *
                    m_i[gi:gi + 1, :]).astype(jnp.int8))
    w8 = jnp.concatenate(w8s, axis=0)  # [BK, BO] int8
    part = jax.lax.dot_general(
        qx_ref[...], w8,
        dimension_numbers=(((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _():
        acc_ref[...] = acc_ref[...] + part

    @pl.when(j == n_k_tiles - 1)
    def _():
        out_ref[...] = (acc_ref[...].astype(jnp.float32) *
                        rs_ref[0:1, :] *
                        sa_ref[:, 0:1]).astype(out_ref.dtype)


def _pick_tile(dim: int, group: int, cap: int) -> int:
    """Largest multiple of `group` that divides `dim`, capped."""
    best = 0
    t = group
    while t <= min(dim, cap):
        if dim % t == 0:
            best = t
        t += group
    return best


def _pick_k_tile(k: int, g: int, cap: int = 1024) -> int:
    """K tile must cover a multiple of 8 groups (Mosaic thin-axis
    rule for the scales block)."""
    step = 8 * g
    best = 0
    t = step
    while t <= min(k, cap):
        if k % t == 0:
            best = t
        t += step
    if best == 0 and k % step == 0:
        best = step
    return best


def _pick_m_tile(t: int, cap: int = 512) -> int:
    """Token-axis tile: decode batches (≤512) stay single-tile; large
    prefill T is gridded in up-to-``cap``-row tiles (256 for odd
    buckets) so the per-tile nibble unpack amortizes over many MXU
    rows. 0 = no tiling (caller falls back to XLA)."""
    if t <= 512:
        return t if t % 8 == 0 else 0
    for bm in (cap, 512, 256):
        if bm and t % bm == 0:
            return bm
    return 0


def _call_int4_kernel(kernel, layer, grid, act_specs, acts, weights,
                      weight_dims, out_spec, out_shape, scratch,
                      interpret):
    """Issue the pallas_call either flat (per-layer weight arrays) or
    stacked (leading [L] layer axis block-indexed by a scalar-prefetch
    layer id — avoids the materialized per-layer weight copy a
    dynamic-slice into a custom-call operand would force)."""
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024)
    if layer is None:
        in_specs = list(act_specs[:1]) + [
            pl.BlockSpec(dims, lambda m, i, j: (j, i))
            for dims in weight_dims
        ] + list(act_specs[1:])
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs,
            out_specs=out_spec, out_shape=out_shape,
            scratch_shapes=scratch, compiler_params=compiler_params,
            interpret=interpret,
        )(acts[0], *weights, *acts[1:])

    # stacked: activation index_maps grow the trailing scalar-ref arg
    def _amap(spec):
        f = spec.index_map
        return pl.BlockSpec(spec.block_shape,
                            lambda m, i, j, l, f=f: f(m, i, j))

    in_specs = [_amap(act_specs[0])] + [
        pl.BlockSpec((None, *dims), lambda m, i, j, l: (l[0], j, i))
        for dims in weight_dims
    ] + [_amap(s) for s in act_specs[1:]]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec(out_spec.block_shape,
                               lambda m, i, j, l: (m, i)),
        scratch_shapes=scratch)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=compiler_params, interpret=interpret,
    )(layer, acts[0], *weights, *acts[1:])


@functools.partial(jax.jit, static_argnames=["interpret"])
def int4_matmul_pallas(x: jax.Array, w, interpret: bool = False
                       ) -> jax.Array:
    from vllm_main_modify_tpu.quantization.int4_dispatch import \
        int4_matmul_xla

    t_dim, k = x.shape[:-1], x.shape[-1]
    x2 = x.reshape(-1, k)
    t = x2.shape[0]
    packed, scales = w.packed, w.scales
    o = packed.shape[-1] * 8
    g = k // scales.shape[-2]

    bk = _pick_k_tile(k, g)
    bm = _pick_m_tile(t)
    bo = 0
    # packed tile width bo/8 must be a multiple of 128 lanes
    for cand in (1024, 2048, 3072):
        if o % cand == 0:
            bo = cand
            break
    if bk == 0 or bo == 0 or bm == 0 or \
            (k // g) % (k // bk) != 0:
        return int4_matmul_xla(x, w)

    n_k_tiles = k // bk
    grid = (t // bm, o // bo, n_k_tiles)

    out = _call_int4_kernel(
        functools.partial(_int4_kernel, group_size=g,
                          n_k_tiles=n_k_tiles),
        w.layer, grid,
        act_specs=[pl.BlockSpec((bm, bk), lambda m, i, j: (m, j))],
        acts=(x2, ),
        weights=(w.packed, w.scales, w.zeros),
        weight_dims=[(bk, bo // 8), (bk // g, bo), (bk // g, bo)],
        out_spec=pl.BlockSpec((bm, bo), lambda m, i, j: (m, i)),
        out_shape=jax.ShapeDtypeStruct((t, o), x.dtype),
        scratch=[pltpu.VMEM((bm, bo), jnp.float32)],
        interpret=interpret)
    return out.reshape(*t_dim, o)


@functools.partial(jax.jit, static_argnames=["interpret"])
def int4_matmul_w4a8_pallas(x: jax.Array, w, interpret: bool = False
                            ) -> jax.Array:
    """W4A8: per-token int8 activations on the int8 MXU (see module
    docstring). Falls back to the XLA W4A16 path for shapes the
    kernel does not tile."""
    from vllm_main_modify_tpu.quantization.int4_dispatch import \
        int4_matmul_xla
    from vllm_main_modify_tpu.quantization.weights import \
        quantize_activations_int8

    t_dim, k = x.shape[:-1], x.shape[-1]
    x2 = x.reshape(-1, k)
    t = x2.shape[0]
    packed, scales = w.packed, w.scales
    o = packed.shape[-1] * 8
    g = k // scales.shape[-2]

    bk = _pick_k_tile(k, g)
    # requant tiles afford 1024 rows (int32 acc 4 MB in VMEM): the
    # in-kernel w8 build amortizes over 2x the MXU rows
    bm = _pick_m_tile(t, cap=1024 if w.requant_m is not None else 512)
    bo = 0
    # the lane-blocked nibble layout is per-1024-column tile
    # (weights.py int4_pack), so bo is pinned to 1024 where possible
    for cand in (1024, 2048, 3072):
        if o % cand == 0:
            bo = cand
            break
    if bk == 0 or bo == 0 or bm == 0 or \
            (k // g) % (k // bk) != 0:
        return int4_matmul_xla(x, w)

    qx, s_a = quantize_activations_int8(x2)  # [T,K] int8, [T,1] f32
    # activation scale tiled to a full 128-lane block (thin [T, 1]
    # operands don't tile); applied in the kernel epilogue
    sa = jnp.broadcast_to(s_a.astype(jnp.float32), (t, 128))
    n_k_tiles = k // bk
    grid = (t // bm, o // bo, n_k_tiles)

    # prefill tiles with requant arrays use the progressive-requant
    # body (single int8 matmul per K tile, int32 accumulation);
    # decode tiles keep the exact per-group path (zero-correction)
    requant = w.requant_m is not None and bm >= 256
    if requant:
        weights = (w.packed, w.zeros, w.requant_m, w.requant_s)
        wdims = [(bk, bo // 8), (bk // g, bo), (bk // g, bo),
                 (bk // g, bo)]
        scratch = [pltpu.VMEM((bm, bo), jnp.int32)]
    else:
        weights = (w.packed, w.scales, w.zeros)
        wdims = [(bk, bo // 8), (bk // g, bo), (bk // g, bo)]
        scratch = [pltpu.VMEM((bm, bo), jnp.float32)]
    out = _call_int4_kernel(
        functools.partial(_int4_w4a8_kernel, group_size=g,
                          n_k_tiles=n_k_tiles,
                          zero_correct=bm < g, requant=requant),
        w.layer, grid,
        act_specs=[
            pl.BlockSpec((bm, bk), lambda m, i, j: (m, j)),
            pl.BlockSpec((bm, 128), lambda m, i, j: (m, 0)),
        ],
        acts=(qx, sa),
        weights=weights,
        weight_dims=wdims,
        out_spec=pl.BlockSpec((bm, bo), lambda m, i, j: (m, i)),
        out_shape=jax.ShapeDtypeStruct((t, o), x.dtype),
        scratch=scratch,
        interpret=interpret)
    return out.reshape(*t_dim, o)
