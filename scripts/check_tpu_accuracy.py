"""End-to-end TPU accuracy check for the simulate->map m-mode spine.

Computes f64 truth on the CPU backend in a subprocess (the interpreter's
sitecustomize pins the main process to the TPU tunnel), then runs the f32
round trip on the TPU and reports the relative error.  This is the
measurement behind the precision policy in draco_tpu/__init__.py: with
JAX's default single-pass-bf16 dots the error is ~6e-2; with the pinned
HIGHEST precision it is ~1.5e-5 (CPU float32 intrinsic: ~9.5e-6).

Usage:  python scripts/check_tpu_accuracy.py [nside]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_args = [a for a in sys.argv[1:] if not a.startswith("-")]
WINDOWED = "--windowed" in sys.argv[1:]
NSIDE = int(_args[0]) if _args else 64

_TRUTH_PROG = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from draco_tpu.ops import healpix, mmode, sht

out_path, nside = sys.argv[1], int(sys.argv[2])
lmax = 3 * nside - 1
npix = healpix.npix_of(nside)
rng = np.random.Generator(np.random.SFC64(1))

base = np.stack(
    np.meshgrid(np.arange(3) * 7.0, np.arange(3) * 7.0, indexing="ij"), -1
).reshape(-1, 2)
pos = base + rng.uniform(-1, 1, base.shape)
ii, jj = np.triu_indices(9, k=0)
bl = pos[ii] - pos[jj]
colat = np.pi / 2 - np.radians(45.0)
east = np.array([0.0, 1.0, 0.0])
north = np.array([-np.cos(colat), 0.0, np.sin(colat)])
zen = np.array([np.sin(colat), 0.0, np.cos(colat)])
bl3 = (bl[:, :1] * east[None] + bl[:, 1:] * north[None]) / 0.6
vec = healpix.pix2vec(nside)
cos_sep = np.clip(vec @ zen, -1, 1)
beam = np.exp(-(np.arccos(cos_sep) ** 2) / (2 * (0.12 / 2.355) ** 2)) * (
    cos_sep > 0
)
beam_omega = beam * (4 * np.pi / npix)
sky = rng.standard_normal(npix)

s = sht.get_sht(nside, lmax)
omega = 4 * np.pi / npix

alm = s._analysis_impl(jnp.asarray(sky))
phase = 2 * jnp.pi * (jnp.asarray(bl3) @ jnp.asarray(vec).T)
bmap = jnp.asarray(beam_omega)[None] * jnp.exp(1j * phase)
ap = s._analysis_impl(bmap)
ac = s._analysis_impl(jnp.conj(bmap))
bp = jnp.conj(ac) / omega
bm = jnp.conj(ap) / omega
vp = jnp.einsum("blm,lm->mb", bp, alm.astype(bp.dtype))
vm = jnp.einsum("blm,lm->mb", bm, alm.astype(bm.dtype))
vis = jnp.stack([vp, vm], 1)
stream = mmode.mmodes_to_sidereal(vis, n=2 * lmax + 1, oddra=True)
vis2 = mmode.make_marray(stream, mmax=lmax)
a = jnp.einsum("blm,mb->lm", jnp.conj(bp), vis2[:, 0])
a = a + jnp.einsum("blm,mb->lm", jnp.conj(bm), vis2[:, 1])
m64 = np.asarray(s._synthesis_impl(a.astype(jnp.complex128)))
np.savez(out_path, m64=m64, sky=sky, bl3=bl3, beam_omega=beam_omega, vec=vec)
"""


def main() -> int:
    with tempfile.TemporaryDirectory() as td:
        truth = os.path.join(td, "truth.npz")
        print("computing f64 truth on CPU backend ...", file=sys.stderr)
        subprocess.run(
            [sys.executable, "-c", _TRUTH_PROG, truth, str(NSIDE)],
            check=True,
            cwd=_REPO,
        )
        d = np.load(truth)

    import jax
    import jax.numpy as jnp

    from draco_tpu.ops import healpix, mmode, sht

    lmax = 3 * NSIDE - 1
    s = sht.get_sht(NSIDE, lmax)
    omega = 4 * np.pi / healpix.npix_of(NSIDE)
    PREC = jax.lax.Precision.HIGHEST

    @jax.jit
    def rt(sky, bl3, beam, vec):
        alm = s._analysis_impl(sky)
        phase = 2 * jnp.pi * jnp.matmul(bl3, vec.T, precision=PREC)
        bmap = beam[None] * jnp.exp(1j * phase)
        ap = s._analysis_impl(bmap)
        ac = s._analysis_impl(jnp.conj(bmap))
        bp = jnp.conj(ac) / omega
        bm = jnp.conj(ap) / omega
        vp = jnp.einsum("blm,lm->mb", bp, alm.astype(bp.dtype), precision=PREC)
        vm = jnp.einsum("blm,lm->mb", bm, alm.astype(bm.dtype), precision=PREC)
        vis = jnp.stack([vp, vm], 1)
        stream = mmode.mmodes_to_sidereal(vis, n=2 * lmax + 1, oddra=True)
        vis2 = mmode.make_marray(stream, mmax=lmax)
        a = jnp.einsum("blm,mb->lm", jnp.conj(bp), vis2[:, 0], precision=PREC)
        a = a + jnp.einsum(
            "blm,mb->lm", jnp.conj(bm), vis2[:, 1], precision=PREC
        )
        return s._synthesis_impl(a.astype(jnp.complex64))

    @jax.jit
    def rt_windowed(sky, bl3, beam_w, vec_w, Ec, Es, lam_band):
        """Beam-band windowed projection (the bench.py default path)."""
        Rb, W = beam_w.shape
        alm = s._analysis_impl(sky)
        Sr = jnp.einsum("lm,lmr->mr", alm.real, lam_band, precision=PREC)
        Si = jnp.einsum("lm,lmr->mr", alm.imag, lam_band, precision=PREC)
        a1 = (Ec * Sr.T[:, None, :] - Es * Si.T[:, None, :]).reshape(
            Rb * W, lmax + 1
        )
        a2 = (Ec * Si.T[:, None, :] + Es * Sr.T[:, None, :]).reshape(
            Rb * W, lmax + 1
        )
        A = 2 * jnp.pi * jnp.einsum("bx,rwx->brw", bl3, vec_w, precision=PREC)
        re = (beam_w[None] * jnp.cos(A)).reshape(bl3.shape[0], Rb * W)
        im = (beam_w[None] * jnp.sin(A)).reshape(bl3.shape[0], Rb * W)
        G1 = jnp.matmul(re, a1, precision=PREC)
        G2 = jnp.matmul(im, a2, precision=PREC)
        G3 = jnp.matmul(re, a2, precision=PREC)
        G4 = jnp.matmul(im, a1, precision=PREC)
        vp = ((G1 - G2) + 1j * (G3 + G4)).T
        vm = ((G1 + G2) + 1j * (G3 - G4)).T
        vis = jnp.stack([vp, vm], 1).astype(jnp.complex64)
        stream = mmode.mmodes_to_sidereal(vis, n=2 * lmax + 1, oddra=True)
        vis2 = mmode.make_marray(stream, mmax=lmax).astype(jnp.complex64)
        v0, v1 = vis2[:, 0], vis2[:, 1]
        Yr = jnp.matmul(re.T, (v0 + v1).T.real, precision=PREC) - jnp.matmul(
            im.T, (v1 - v0).T.imag, precision=PREC
        )
        Yi = jnp.matmul(re.T, (v0 + v1).T.imag, precision=PREC) + jnp.matmul(
            im.T, (v1 - v0).T.real, precision=PREC
        )
        Y = jax.lax.complex(Yr, Yi).reshape(Rb, W, lmax + 1)
        Ew = jax.lax.complex(Ec, -Es)
        T = jnp.einsum("rwm,rwm->rm", Ew, Y, precision=PREC)
        a = jax.lax.complex(
            jnp.einsum("lmr,rm->lm", lam_band, T.real, precision=PREC),
            jnp.einsum("lmr,rm->lm", lam_band, T.imag, precision=PREC),
        )
        return s._synthesis_impl(a.astype(jnp.complex64))

    if WINDOWED:
        beam = d["beam_omega"] / omega
        info = healpix.ring_info(NSIDE)
        TAU = 1e-9
        band, starts, wmax = [], [], 0
        for r in range(info.nring):
            o, n = int(info.offset[r]), int(info.nphi[r])
            bg = beam[o : o + n]
            if bg.max() <= TAU:
                continue
            good = np.nonzero(bg > TAU)[0]
            if len(good) == n:
                p0, width = 0, n
            else:
                gaps = np.diff(np.concatenate([good, [good[0] + n]]))
                k = int(np.argmax(gaps))
                p0 = int(good[(k + 1) % len(good)])
                width = n - int(gaps.max()) + 1
            band.append(r)
            starts.append(p0)
            wmax = max(wmax, width)
        band = np.array(band)
        Rb = len(band)
        W = min(wmax + 2, int(info.nphi[band].min()))
        widx = np.zeros((Rb, W), np.int64)
        phi_w = np.zeros((Rb, W))
        for k, r in enumerate(band):
            o, n = int(info.offset[r]), int(info.nphi[r])
            p = (starts[k] + np.arange(W)) % n
            widx[k] = o + p
            phi_w[k] = info.phi0[r] + 2 * np.pi * p / n
        m_arr = np.arange(lmax + 1)
        lam_band = jnp.take(
            s.precompute_legendre(jnp.float32), jnp.asarray(band), axis=2
        )
        print(
            f"running WINDOWED f32 round trip on {jax.devices()} ...",
            file=sys.stderr,
        )
        m32 = np.asarray(
            rt_windowed(
                jnp.asarray(d["sky"].astype(np.float32)),
                jnp.asarray(d["bl3"].astype(np.float32)),
                jnp.asarray(d["beam_omega"][widx].astype(np.float32)),
                jnp.asarray(d["vec"][widx].astype(np.float32)),
                jnp.asarray(np.cos(phi_w[..., None] * m_arr).astype(np.float32)),
                jnp.asarray(np.sin(phi_w[..., None] * m_arr).astype(np.float32)),
                lam_band,
            )
        )
    else:
        print(f"running f32 round trip on {jax.devices()} ...", file=sys.stderr)
        m32 = np.asarray(
            rt(
                jnp.asarray(d["sky"].astype(np.float32)),
                jnp.asarray(d["bl3"].astype(np.float32)),
                jnp.asarray(d["beam_omega"].astype(np.float32)),
                jnp.asarray(d["vec"].astype(np.float32)),
            )
        )
    rel = np.abs(m32 - d["m64"]).max() / np.abs(d["m64"]).max()
    mode = "windowed " if WINDOWED else ""
    print(f"nside={NSIDE}: {mode}f32-vs-f64 end-to-end relative error {rel:.3e}")
    ok = rel < 5e-5
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
