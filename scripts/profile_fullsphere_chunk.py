"""Per-stage microbenchmark of the full-sphere fused chunk loop.

Decomposes the ~119 ms/chunk of the 2048-feed configuration
(cylinder_chime2048: 8.94 s over 75 chunks at ring-high) into its three
stages, each timed as its own fori_loop-repeated jitted program:

  1. fringe trig + beam combine  (VPU + gathers -> the X tensor)
  2. ring analysis of X          (the dominant MXU DFT GEMMs)
  3. the U/V forward + T adjoint einsums against materialised sections

Run on the real chip: python scripts/profile_fullsphere_chunk.py
[--chunk N] [--iters K].  Use DRACO_TPU_SHT_RING_PRECISION to probe
precision modes.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

CHUNK = 96
ITERS = 8
if "--chunk" in sys.argv:
    CHUNK = int(sys.argv[sys.argv.index("--chunk") + 1])
if "--iters" in sys.argv:
    ITERS = int(sys.argv[sys.argv.index("--iters") + 1])


def main():
    import jax
    import jax.numpy as jnp

    from draco_tpu.ops import healpix
    from draco_tpu.telescope import BeamTransfer, PolarisedCylinderTelescope
    from draco_tpu.telescope import roundtrip as rt

    NSIDE = 256
    f0 = 299.792458 / 0.6
    tel = PolarisedCylinderTelescope(
        num_cylinders=4, cylinder_width=20.0, cylinder_spacing=22.0,
        num_feeds=256, feed_spacing=0.5, latitude=49.0,
        freq_lower=f0, freq_upper=f0, num_freq=1, auto_correlations=True,
        force_lmax=3 * NSIDE - 1, force_mmax=3 * NSIDE - 1,
    )
    bt = BeamTransfer(telescope=tel, nside=NSIDE)
    s, lam, lam_lo, plan = bt._streaming_ops2()
    mmax = s.mmax
    npol = tel.num_pol_sky
    nbase = len(tel.uniquepairs)
    layout = s.padded_layout()
    lclip = np.clip(layout, 0, None)
    vec = healpix.pix2vec(bt.beam_nside)
    va, vb, vc = rt._threefloat_split(
        np.where(layout[:, None] >= 0, np.asarray(vec, np.float64)[lclip], 0.0)
    )
    npad, nchunk, bla, blb, blc, uniform_freq = rt._baseline_prep(
        tel, 1, nbase, CHUNK
    )
    u_re_h, u_im_h, uidx_pad, uniform_real = rt._beam_prep(
        bt, 1, npad, nbase,
        lambda bprod: np.where(layout >= 0, bprod[..., lclip], 0.0),
    )
    va, vb, vc = jnp.asarray(va), jnp.asarray(vb), jnp.asarray(vc)
    bla, blb, blc = jnp.asarray(bla), jnp.asarray(blb), jnp.asarray(blc)
    u_re, u_im = jnp.asarray(u_re_h), jnp.asarray(u_im_h)
    uidx = jnp.asarray(uidx_pad)
    K = len(layout)
    print(f"npairs={nbase} chunk={CHUNK} nchunk={nchunk} padded_pix={K}",
          file=sys.stderr, flush=True)

    def fringe_X(env, c):
        cph, sph = rt._fringe_trig(
            env["bla"], env["blb"], env["blc"], env["va"], env["vb"],
            env["vc"], c * CHUNK, CHUNK, 1, uniform_freq
        )
        idxc = jax.lax.dynamic_slice_in_dim(env["uidx"], c * CHUNK, CHUNK)
        cp = cph[:, :, None]
        sp = sph[:, :, None]
        br = env["u_re"][:, idxc]
        bi = env["u_im"][:, idxc]
        re = br * cp - bi * sp
        im = br * sp + bi * cp
        return jnp.stack([re, im])  # [2, 1, C, p, K]

    # all device tensors travel as ARGUMENTS: closure-captured device
    # arrays are baked into the HLO via a host readback, which the
    # remote-TPU tunnel rejects (UNIMPLEMENTED)
    env = dict(
        bla=bla, blb=blb, blc=blc, va=va, vb=vb, vc=vc,
        u_re=u_re, u_im=u_im, uidx=uidx, plan=plan, lam=lam,
    )

    def timed(name, fn, *args):
        g = jax.jit(fn)
        out = g(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4]
        t0 = time.time()
        out = g(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4]
        dt = (time.time() - t0) / ITERS
        print(f"{name}: {dt * 1e3:.1f} ms/chunk", flush=True)
        return dt

    # stage 1: trig + combine, looped (carry a reduction to defeat DCE)
    def stage1(env):
        def body(c, acc):
            X = fringe_X(env, c)
            return acc + X[0, 0, :, 0, ::4096].sum()
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

    # stage 2: trig + combine + ring analysis
    def stage2(env):
        def body(c, acc):
            X = fringe_X(env, c)
            F_belt, group_F = s._ring_analysis_parts_padded(
                X, raw_belt=True, plan=env["plan"]
            )
            return acc + F_belt[0, 0, 0, 0, ::64].real.sum() + sum(
                g[0, 0, 0, 0, ::64].real.sum() for g in group_F
            )
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

    # stage 3: the full chunk body (analysis + U/V + T accumulate)
    def stage3(env):
        lam_e = env["lam"]
        pw = s.belt_phase_weight(jnp.complex64)
        alm0 = jnp.zeros((1, npol, s.lmax + 1, mmax + 1), jnp.complex64)
        S_secs = []
        for lam_s in [lam_e["belt"], *lam_e["caps"]]:
            r = jnp.einsum("fplm,lmr->fpmr", alm0.real, lam_s)
            S_secs.append(jax.lax.complex(r, r))
        S_secs[0] = S_secs[0] * jnp.conj(pw).T
        sec_rings = [lam_e["belt"].shape[2]] + [
            c.shape[2] for c in lam_e["caps"]
        ]
        T0 = [jnp.zeros((1, npol, r, mmax + 1), jnp.complex64) for r in sec_rings]

        def body(c, T_accs):
            F_belt, group_F = s._ring_analysis_parts_padded(
                fringe_X(env, c), raw_belt=True, plan=env["plan"]
            )
            vp = jnp.zeros((1, mmax + 1, CHUNK), jnp.complex64)
            vm = jnp.zeros((1, mmax + 1, CHUNK), jnp.complex64)
            for F2, S in zip([F_belt, *group_F], S_secs):
                U = jnp.einsum("fcprm,fpmr->fmc", jnp.conj(F2[0]), S)
                V = jnp.einsum("fcprm,fpmr->fmc", jnp.conj(F2[1]), S)
                vp = vp + (U + 1j * V)
                vm = vm + (U - 1j * V)
            v_sum = (vp + vm).transpose(1, 0, 2)
            v_dif = (vm - vp).transpose(1, 0, 2)
            out = []
            for F2, T in zip([F_belt, *group_F], T_accs):
                T = T + jnp.einsum("fcprm,mfc->fprm", F2[0], v_sum)
                T = T + 1j * jnp.einsum("fcprm,mfc->fprm", F2[1], v_dif)
                out.append(T)
            return out

        T = jax.lax.fori_loop(0, ITERS, body, T0)
        return T[0][0, 0, 0, ::64].real.sum()

    # stage 3b: ONE-pass stacked einsums — the U/V pair and the T pair
    # each stream the full F2 tensor once instead of component-wise
    def stage3b(env):
        lam_e = env["lam"]
        pw = s.belt_phase_weight(jnp.complex64)
        alm0 = jnp.zeros((1, npol, s.lmax + 1, mmax + 1), jnp.complex64)
        S_secs = []
        for lam_s in [lam_e["belt"], *lam_e["caps"]]:
            r = jnp.einsum("fplm,lmr->fpmr", alm0.real, lam_s)
            S_secs.append(jax.lax.complex(r, r))
        S_secs[0] = S_secs[0] * jnp.conj(pw).T
        sec_rings = [lam_e["belt"].shape[2]] + [
            c.shape[2] for c in lam_e["caps"]
        ]
        T0 = [jnp.zeros((1, npol, r, mmax + 1), jnp.complex64) for r in sec_rings]

        def body(c, T_accs):
            F_belt, group_F = s._ring_analysis_parts_padded(
                fringe_X(env, c), raw_belt=True, plan=env["plan"]
            )
            vp = jnp.zeros((1, mmax + 1, CHUNK), jnp.complex64)
            vm = jnp.zeros((1, mmax + 1, CHUNK), jnp.complex64)
            for F2, S in zip([F_belt, *group_F], S_secs):
                UV = jnp.einsum("xfcprm,fpmr->xfmc", jnp.conj(F2), S)
                vp = vp + (UV[0] + 1j * UV[1])
                vm = vm + (UV[0] - 1j * UV[1])
            v_sum = (vp + vm).transpose(1, 0, 2)
            v_dif = (vm - vp).transpose(1, 0, 2)
            vst = jnp.stack([v_sum, 1j * v_dif])
            out = []
            for F2, T in zip([F_belt, *group_F], T_accs):
                T = T + jnp.einsum("xfcprm,xmfc->fprm", F2, vst)
                out.append(T)
            return out

        T = jax.lax.fori_loop(0, ITERS, body, T0)
        return T[0][0, 0, 0, ::64].real.sum()

    t1 = timed("stage1 trig+combine      ", stage1, env)
    t2 = timed("stage2 + ring analysis   ", stage2, env)
    t3 = timed("stage3 full chunk body   ", stage3, env)
    t3b = timed("stage3b stacked einsums  ", stage3b, env)
    print(
        f"breakdown: trig+combine {t1*1e3:.1f} | ring GEMMs "
        f"{(t2-t1)*1e3:.1f} | U/V/T einsums {(t3-t2)*1e3:.1f} "
        f"(stacked: {(t3b-t2)*1e3:.1f}) ms/chunk"
    )


if __name__ == "__main__":
    main()
