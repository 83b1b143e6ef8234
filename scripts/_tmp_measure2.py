import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from draco_tpu.ops import sht
nside, lmax = 256, 767
s = sht.get_sht(nside, lmax, lmax)
t0 = time.time()
lam, lam_lo = s.precompute_legendre_split_2f_streamed()
jax.block_until_ready(lam)
t1 = time.time()
print(f"streamed 2f legendre: {t1-t0:.1f}s")
t0 = time.time()
plan = s.precompute_ring_plan_streamed()
jax.block_until_ready(plan)
t1 = time.time()
print(f"streamed ring plan: {t1-t0:.1f}s")
