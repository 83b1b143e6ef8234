"""Microbenchmark: XLA sin/cos vs turns-based quadrant sincos on TPU.

The fused round trip computes fringe factors cos/sin(2*pi*t) where
t = frac(b.n) is already reduced to [-0.5, 0.5] turns by
ops.tools.phase_frac.  XLA's sin/cos perform full Payne-Hanek-style
range reduction, which the bounded argument makes redundant; the
turns-based kernel (ops.tools.sincos_turns) does a quadrant split and
two short polynomials instead.

Usage: python scripts/bench_trig.py [nelem] [reps]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from draco_tpu.ops.tools import sincos_turns

NELEM = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 24
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50


def _timed(fn, x, tag):
    # over the axon tunnel block_until_ready can return early; a
    # 1-element np.asarray readback is the only reliable sync
    jfn = jax.jit(lambda x: jnp.sum(fn(x))[None])
    np.asarray(jfn(x))
    t0 = time.perf_counter()
    np.asarray(jfn(x))
    dt = (time.perf_counter() - t0) / REPS
    gel = NELEM / dt / 1e9
    print(f"{tag:14s} {dt * 1e3:8.3f} ms/iter  {gel:8.2f} Gelem/s")
    return dt


def main():
    t = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, NELEM).astype(np.float32)
    )

    def xla_sincos(t):
        def body(i, acc):
            ph = 2 * jnp.pi * (t + i * 1e-9)
            return acc + jnp.cos(ph) - jnp.sin(ph)

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros_like(t))

    def turns_sincos(t):
        def body(i, acc):
            c, s = sincos_turns(t + i * 1e-9)
            return acc + c - s

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros_like(t))

    d_x = _timed(xla_sincos, t, "xla sin/cos")
    d_t = _timed(turns_sincos, t, "turns sincos")
    print(f"speedup: {d_x / d_t:.2f}x")

    # accuracy vs f64 numpy
    tn = np.asarray(t, dtype=np.float64)
    c, s = jax.jit(sincos_turns)(t)
    ce = np.abs(np.asarray(c, np.float64) - np.cos(2 * np.pi * tn)).max()
    se = np.abs(np.asarray(s, np.float64) - np.sin(2 * np.pi * tn)).max()
    print(f"max abs err: cos {ce:.3e}  sin {se:.3e}")


if __name__ == "__main__":
    main()
