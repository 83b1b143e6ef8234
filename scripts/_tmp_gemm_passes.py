import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp

B, J, M = 8192, 1024, 768
NLOOP = 30
rng = np.random.default_rng(0)
A = rng.standard_normal((B, J)).astype(np.float64)
jj = np.arange(J)[:, None]; mm = np.arange(M)[None, :]
Bmat = np.cos(2*np.pi*jj*mm/J)
truth = A @ Bmat

A32 = jnp.asarray(A, jnp.float32); B32 = jnp.asarray(Bmat, jnp.float32)
DEF = jax.lax.Precision.DEFAULT
F32 = jnp.float32

def split3(x):
    x0 = x.astype(jnp.bfloat16)
    r = x - x0.astype(jnp.float32)
    x1 = r.astype(jnp.bfloat16)
    x2 = (r - x1.astype(jnp.float32)).astype(jnp.bfloat16)
    return x0, x1, x2

def f(x, y): return jnp.matmul(x, y, precision=DEF, preferred_element_type=F32)

def body_high(a, b): return jnp.matmul(a, b, precision=jax.lax.Precision.HIGH)
def body_highest(a, b): return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
def body_5(a, b):
    a0, a1, a2 = split3(a); b0, b1, b2 = split3(b)
    return f(a0,b0) + f(a0,b1) + f(a1,b0) + f(a1,b1) + (f(a0,b2) + f(a2,b0))
def body_4b(a, b):
    a0 = a.astype(jnp.bfloat16); a1 = (a - a0.astype(jnp.float32)).astype(jnp.bfloat16)
    b0, b1, b2 = split3(b)
    return f(a0,b0) + f(a0,b1) + f(a1,b0) + (f(a1,b1) + f(a0,b2))
def body_def(a, b): return f(a, b)

for name, body in [("DEFAULT1", body_def), ("HIGH3", body_high), ("HIGHEST", body_highest), ("man5", body_5), ("man4b", body_4b)]:
    jf = jax.jit(lambda a, b, body=body: jax.lax.fori_loop(0, NLOOP, lambda i, acc: acc + jnp.sum(body(a + i*0.0, b)), 0.0))
    out = np.asarray(jax.jit(body)(A32, B32), np.float64)
    err = np.abs(out - truth).max() / np.abs(truth).max()
    r = jf(A32, B32); jax.block_until_ready(r); np.asarray(r)
    t0 = time.time(); r = jf(A32, B32); np.asarray(r); t1 = time.time()
    tflops = 2.0*B*J*M*NLOOP/ (t1-t0) / 1e12
    print(f"{name}: rel_err={err:.2e}  t={t1-t0:.3f}s  ({tflops:.0f} TFLOP/s-f32-equiv)")
