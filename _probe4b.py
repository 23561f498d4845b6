import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl

try:
    x8 = jnp.asarray(np.random.randint(-8, 8, (256, 512)), jnp.int8)
    x4 = jax.jit(lambda a: a.astype(jnp.int4))(x8)
    print("device convert to int4 ok:", x4.dtype, x4.shape)
    back = jax.jit(lambda a: a.astype(jnp.int8))(x4)
    print("roundtrip:", np.array_equal(np.asarray(back), np.asarray(x8)))
except Exception as e:
    print("xla int4 FAIL:", repr(e)[:200])

def kern(x_ref, o_ref):
    o_ref[...] = x_ref[...].astype(jnp.int8)
try:
    r = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((256, 512), jnp.int8))(x4)
    print("pallas int4 load+convert:", np.array_equal(np.asarray(r), np.asarray(x8)))
except Exception as e:
    print("pallas int4 FAIL:", repr(e)[:200])

def kern2(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(a_ref[...], b_ref[...].astype(jnp.int8),
        dimension_numbers=(((1,),(0,)),((),())), preferred_element_type=jnp.int32)
try:
    a = jnp.asarray(np.random.randint(-100, 100, (64, 256)), jnp.int8)
    r = pl.pallas_call(kern2, out_shape=jax.ShapeDtypeStruct((64, 512), jnp.int32))(a, x4)
    ref = np.asarray(a, np.int32) @ np.asarray(x8, np.int32)
    print("pallas int8@int4(conv):", np.array_equal(np.asarray(r), ref))
except Exception as e:
    print("pallas dot FAIL:", repr(e)[:200])
