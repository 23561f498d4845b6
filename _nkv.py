"""Scratch: narrow-KV decode attention microbench (Qwen 1.5B shape),
serialized-scan methodology (see benchmarks/microbench_int4._time)."""
import os, time, sys, numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from vllm_main_modify_tpu.ops.pallas.ragged_attn import ragged_paged_attention_pallas

hk = int(os.environ.get("HK", "2"))
hq = int(os.environ.get("HQ", "12"))
d = 128
ps = int(os.environ.get("PS", "128"))
W = 2*hk*d
bs = int(os.environ.get("BS", "32"))
ctx = int(os.environ.get("CTX", "530"))
num_pages = 8192
mp = -(-ctx//ps) + 2
rng = np.random.default_rng(0)
bt = jnp.asarray(rng.integers(0, num_pages, size=(bs, mp)).astype(np.int32))
qsl = jnp.asarray(np.arange(bs+1, dtype=np.int32))
lens = jnp.asarray(np.full(bs, ctx, np.int32))
q = jnp.asarray(rng.standard_normal((bs, hq, d)), jnp.bfloat16)
sm = d**-0.5
kv = jnp.asarray(rng.standard_normal((num_pages, ps, W))*0.3, jnp.bfloat16)

def attn(q, kv):
    return ragged_paged_attention_pallas(
        q, kv, bt, qsl, lens, sm, num_kv_heads=hk, pure_decode=True)

def loop(iters):
    @jax.jit
    def g(q, kv):
        def body(c, _):
            y = attn(q + c.astype(q.dtype), kv)
            return y.astype(jnp.float32).max() * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c
    float(g(q, kv))  # compile+warm
    t0 = time.perf_counter()
    float(g(q, kv))
    return time.perf_counter() - t0

ta, tb = loop(50), loop(250)
us = (tb - ta) / 200 * 1e6
gb = bs*ctx*W*2/1e9
print(f"hk={hk} hq={hq} ps={ps} bs={bs} ctx={ctx} kvb={os.environ.get('VLLM_TPU_DECODE_KV_BLOCK','-')}: "
      f"{us:.1f} us/layer-call  (KV stream {gb*1e3:.2f} MB, 819GB/s roofline ~{gb/819e9*1e15:.1f} us)")
