import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp

B, J, M = 32768, 1024, 768
NLOOP = 20
rng = np.random.default_rng(0)
A32 = jnp.asarray(rng.standard_normal((B, J)), jnp.float32)
B32 = jnp.asarray(rng.standard_normal((J, M)), jnp.float32)
F32 = jnp.float32
DEF = jax.lax.Precision.DEFAULT

def mask_split3(x):
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(xi & np.uint32(0xFFFF0000), F32)
    r = x - hi
    ri = jax.lax.bitcast_convert_type(r, jnp.uint32)
    mid = jax.lax.bitcast_convert_type(ri & np.uint32(0xFFFF0000), F32)
    lo = r - mid
    return hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)

def body_def(a, b): return jnp.matmul(a, b, precision=DEF)
def body_high(a, b): return jnp.matmul(a, b, precision=jax.lax.Precision.HIGH)
def body_highest(a, b): return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
def body_5(a, b):
    a0, a1, a2 = mask_split3(a)
    b0, b1, b2 = mask_split3(b)
    f = lambda x, y: jnp.matmul(x, y, precision=DEF, preferred_element_type=F32)
    return f(a0,b0) + f(a0,b1) + f(a1,b0) + f(a1,b1) + (f(a0,b2) + f(a2,b0))
def body_5pre(a, b3):
    # constant side pre-split (b3 = tuple of bf16), data side split in-body
    a0, a1, a2 = mask_split3(a)
    b0, b1, b2 = b3
    f = lambda x, y: jnp.matmul(x, y, precision=DEF, preferred_element_type=F32)
    return f(a0,b0) + f(a0,b1) + f(a1,b0) + f(a1,b1) + (f(a0,b2) + f(a2,b0))

B3 = tuple(np.asarray(x) for x in jax.jit(mask_split3)(B32))
B3 = tuple(jnp.asarray(x) for x in B3)

def timeit(name, jf, *args):
    r = jf(*args); jax.block_until_ready(r); np.asarray(r)
    t0 = time.time(); r = jf(*args); np.asarray(r); t1 = time.time()
    tflops = 2.0*B*J*M*NLOOP/(t1-t0)/1e12
    print(f"{name}: t={t1-t0:.3f}s ({tflops:.0f} TF/s f32-equiv)")

for name, body in [("DEFAULT", body_def), ("HIGH3", body_high), ("HIGHEST6", body_highest), ("man5", body_5)]:
    jf = jax.jit(lambda a, b, body=body: jax.lax.fori_loop(0, NLOOP, lambda i, acc: acc + jnp.sum(body(a * (1 + 0e0*i), b)), 0.0))
    timeit(name, jf, A32, B32)
jf = jax.jit(lambda a, b3: jax.lax.fori_loop(0, NLOOP, lambda i, acc: acc + jnp.sum(body_5pre(a * (1 + 0e0*i), b3)), 0.0))
timeit("man5-pre", jf, A32, B3)
