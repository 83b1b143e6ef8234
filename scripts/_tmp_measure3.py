import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from draco_tpu.ops import sht
nside, lmax = 256, 767
s = sht.get_sht(nside, lmax, lmax)
t00 = time.time()
ring_ids = np.asarray(s._cap_rings)
dtype = jnp.complex64
rdt = jnp.float32

@jax.jit
def cap_chunk(two_ps, mv_row, den, mask, w_rows):
    num = two_ps[:, :, None] * mv_row[:, None, :]
    c, sn = s._phase_turns(num, den, dtype)
    P = (jax.lax.complex(c, -sn) * mask[:, :, None]).astype(dtype)
    return P * w_rows[:, None, None].astype(dtype)

print("ngroups", len(s._cap_wgroups), [ (len(r), w) for r, w in s._cap_wgroups ])
for gi, grp in enumerate(s._cap_wgroups):
    t0 = time.time()
    rows_arr, w = grp
    two_ps = np.asarray(s._cap_2ps[rows_arr][:, :w], np.int64)
    n_rows = np.asarray(s._cap_n[rows_arr], np.int64)
    den_h = (2 * n_rows)[:, None, None]
    two_ps_m = two_ps % den_h[:, :, 0]
    mask_h = np.asarray(s._cap_mask[rows_arr][:, :w], dtype=rdt)
    w_rows_h = np.asarray(s._w[ring_ids[rows_arr]], dtype=rdt)
    t1 = time.time()
    mv_row = np.asarray(s._m, np.int64)[None, :] % den_h[:, 0, :]
    t2 = time.time()
    out = cap_chunk(jnp.asarray(two_ps_m, jnp.int32), jnp.asarray(mv_row, jnp.int32),
                    jnp.asarray(den_h, jnp.int32), jnp.asarray(mask_h), jnp.asarray(w_rows_h))
    jax.block_until_ready(out)
    t3 = time.time()
    print(f"group {gi}: host prep {t1-t0:.2f}+{t2-t1:.2f}s  device {t3-t2:.2f}s  shape {out.shape}")
print("total", time.time()-t00)
