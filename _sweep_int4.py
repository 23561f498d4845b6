import sys, functools
sys.path.insert(0, "/root/repo")
import vllm_main_modify_tpu.ops.pallas.int4_matmul as m4
import jax, jax.numpy as jnp, numpy as np
from vllm_main_modify_tpu.benchmarks.microbench_int4 import _time
from vllm_main_modify_tpu.quantization.weights import Int4Weight, int4_pack

def make_w(k, o, g=128):
    rng = np.random.default_rng(0)
    qs = rng.integers(0, 16, size=(k, o)).astype(np.int32)
    packed = int4_pack(qs)
    scales = (rng.random((k//g, o), np.float32)*0.02+0.01)
    zeros = np.full((k//g, o), 8.0, np.float32)
    return Int4Weight(packed=jnp.asarray(packed), scales=jnp.asarray(scales), zeros=jnp.asarray(zeros))

import vllm_main_modify_tpu.ops.pallas.int4_matmul as mm
orig_pick = None

def bench(t, k, o, bo_pref):
    # monkeypatch bo preference
    src_order = bo_pref
    w = make_w(k, o)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((t, k)), jnp.bfloat16)
    import types
    fn = mm.int4_matmul_w4a8_pallas
    # patch the candidate order by shadowing
    code_new = None
    us = _time(lambda a, b: fn(a, b), x, w)
    return us

for (t, k, o, tag) in ((32, 4096, 28672, "gate_up dec"), (512, 4096, 28672, "gate_up pre")):
    us = bench(t, k, o, None)
    gb = k*o*0.5/1e9
    print(f"{tag} T={t}: {us:.1f}us  weightGB={gb*1e3:.1f}MB floor={gb/819e9*1e15:.1f}us")
