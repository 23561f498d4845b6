import jax, jax.numpy as jnp, numpy as np, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 1. int4 array creation + pallas load + convert
def t1():
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...].astype(jnp.int8)
    x = jnp.asarray(np.random.randint(-8, 8, (256, 512)), jnp.int4)
    r = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((256, 512), jnp.int8))(x)
    ref = np.asarray(x).astype(np.int8)
    print("int4 load+convert:", np.array_equal(np.asarray(r), ref))

# 2. int8 x int4 dot inside pallas
def t2():
    def kern(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(a_ref[...], b_ref[...].astype(jnp.int8),
            dimension_numbers=(((1,),(0,)),((),())), preferred_element_type=jnp.int32)
    a = jnp.asarray(np.random.randint(-100, 100, (64, 256)), jnp.int8)
    b = jnp.asarray(np.random.randint(-8, 8, (256, 512)), jnp.int4)
    r = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((64, 512), jnp.int32))(a, b)
    ref = np.asarray(a, np.int32) @ np.asarray(b).astype(np.int32)
    print("int8@int4 via convert:", np.array_equal(np.asarray(r), ref))

# 3. direct int4 dot (no convert)
def t3():
    def kern(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(a_ref[...], b_ref[...],
            dimension_numbers=(((1,),(0,)),((),())), preferred_element_type=jnp.int32)
    a = jnp.asarray(np.random.randint(-100, 100, (64, 256)), jnp.int8)
    b = jnp.asarray(np.random.randint(-8, 8, (256, 512)), jnp.int4)
    r = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((64, 512), jnp.int32))(a, b)
    ref = np.asarray(a, np.int32) @ np.asarray(b).astype(np.int32)
    print("int8@int4 direct:", np.array_equal(np.asarray(r), ref))

for name, f in (("t1", t1), ("t2", t2), ("t3", t3)):
    try:
        f()
    except Exception as e:
        print(name, "FAIL:", repr(e)[:160])
