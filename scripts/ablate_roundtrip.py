"""Component-cost ablation of the fused round trip on the real TPU.

Times the library round trip with pieces of the fringe builder stubbed
out, to attribute wall-clock between the GEMMs, the fringe-phase
arithmetic, the trig, and the SHT/Legendre prologue.  Usage:

    ABL_MODE=full|cheapfringe|notrig|sht python scripts/ablate_roundtrip.py

- full        : the production program (baseline)
- cheapfringe : fringe (cos, sin) replaced by two broadcast ramps —
                isolates GEMM + prologue/epilogue cost
- notrig      : real phases, sincos replaced by (t, 1-t) — isolates the
                trig cost relative to `full`
- sht         : only the SHT analysis+synthesis pair, in-graph repeated

Each mode is a separate process (separate jit cache keys); run modes
sequentially — the TPU tunnel serialises dispatches anyway.
"""

import os
import time

import numpy as np

NFREQ = int(os.environ.get("ABL_NFREQ", 4))
SIDE = int(os.environ.get("ABL_SIDE", 16))
CHUNK = int(os.environ.get("ABL_CHUNK", 2040))
NRUN = int(os.environ.get("ABL_NRUN", 3))
MODE = os.environ.get("ABL_MODE", "full")

import bench  # noqa: E402  (repo root on sys.path when run from there)

bench._configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from draco_tpu.telescope import roundtrip as rt  # noqa: E402


def _time(fn, tag):
    t0 = time.time()
    out = fn()
    np.asarray(out[0, 0, :8])  # tunnel-safe sync
    print(f"[{tag}] warmup {time.time() - t0:.1f}s", flush=True)
    times = []
    for i in range(NRUN):
        t0 = time.time()
        out = fn()
        np.asarray(out[0, 0, :8])
        times.append(time.time() - t0)
        print(f"[{tag}] run {i}: {times[-1]:.3f}s", flush=True)
    print(f"[{tag}] best {min(times):.3f}s", flush=True)


if MODE == "cheapfringe":

    def _cheap(ba, bb, bc, va, vb, vc, c0, chunk, nfreq, uniform):
        K = va.shape[0]
        t = (
            jnp.arange(chunk, dtype=jnp.float32)[:, None] * 1e-3
            + jnp.arange(K, dtype=jnp.float32) * 1e-5
            + c0 * 1e-6  # loop-carried so XLA cannot hoist it
        )
        c = jnp.broadcast_to(t[None], (nfreq, chunk, K)) * 1e-2
        return c, 1.0 - c

    rt._fringe_trig = _cheap
elif MODE == "notrig":

    def _no_trig(t):
        return t, 1.0 - t

    rt._sincos_turns = _no_trig

tel, bt, sky = bench._build_library_problem(NFREQ, SIDE, autos=False)
print(
    f"mode={MODE} nfreq={NFREQ} side={SIDE} npairs={len(tel.uniquepairs)}",
    flush=True,
)

if MODE == "sht":
    win = bt._beam_window()
    s = win.sht
    _, lam, plan = bt._streaming_ops()
    sky_dev = jnp.asarray(sky)

    @jax.jit
    def sht_pair(x):
        alm = s._analysis_impl(x, lam=lam, plan=plan)
        return s._synthesis_impl(alm, lam=lam, plan=plan)

    _time(lambda: jax.block_until_ready(sht_pair(sky_dev)), "sht")
else:
    run = rt.fused_roundtrip_fn(bt, chunk=CHUNK)
    sky_dev = jnp.asarray(sky)
    _time(lambda: jax.block_until_ready(run(sky_dev)), "roundtrip")
