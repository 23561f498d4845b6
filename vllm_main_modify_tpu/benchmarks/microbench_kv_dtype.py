"""Decode-attention KV-dtype microbench: bf16 vs fp8 vs int8 KV at
the 8B decode shape (hk=8, hq=32, D=128, bs=32, ctx 580). Run on a
real chip from the repo root: ``python -m
vllm_main_modify_tpu.benchmarks.microbench_kv_dtype``.

Round-5 v5e numbers: bf16 59.6 us, fp8 31.5 us, int8 28.5 us per
layer-call — quantized KV decode attention tracks the halved HBM
stream, and int8 (native VPU upcast + per-token scales, see
ops/kv_cache.py QuantizedKV) beats the fp8 e4m3 path by ~10%
(docs/perf_v5e.md gap #1)."""

import time, numpy as np, jax, jax.numpy as jnp
from vllm_main_modify_tpu.ops.pallas.ragged_attn import ragged_paged_attention_pallas

hk, hq, d, ps = 8, 32, 128, 32
W = 2*hk*d
bs, ctx = 32, 580
num_pages = 8192
mp = -(-ctx//ps) + 2
rng = np.random.default_rng(0)
bt = rng.integers(0, num_pages, size=(bs, mp)).astype(np.int32)
qsl = np.arange(bs+1, dtype=np.int32)
lens = np.full(bs, ctx, np.int32)
q = jnp.asarray(rng.standard_normal((bs, hq, d)), jnp.bfloat16)
sm = d**-0.5

def timeit(fn, n=30):
    fn().block_until_ready()
    fn().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    r.block_until_ready()
    return (time.perf_counter()-t0)/n*1e6

for name, dtype in (("bf16", jnp.bfloat16), ("fp8", jnp.float8_e4m3fn), ("int8", jnp.int8)):
    kv = jnp.asarray(rng.standard_normal((num_pages, ps, W))*0.3, dtype=jnp.float32).astype(dtype)
    scales = None
    if name == "int8":
        scales = jnp.asarray(np.abs(rng.standard_normal((num_pages, ps, 2)))*0.02+0.01, jnp.float32)
    f = jax.jit(lambda q, kv, sc: ragged_paged_attention_pallas(
        q, kv, jnp.asarray(bt), jnp.asarray(qsl), jnp.asarray(lens), sm,
        num_kv_heads=hk, pure_decode=True, kv_scales=sc))
    us = timeit(lambda: f(q, kv, scales))
    # KV stream bytes: bs * ctx * W * itemsize
    gb = bs*ctx*W*jnp.dtype(dtype).itemsize/1e9
    print(f"{name}: {us:.1f} us/layer-call  (KV stream {gb*1e3:.2f} MB, roofline ~{gb/819e9*1e15:.1f} us)")
