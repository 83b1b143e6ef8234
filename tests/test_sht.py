"""Spherical-harmonic transform validation.

Checks the native HEALPix SHT against direct spherical-harmonic evaluation
with scipy (independent ground truth), plus round-trip and conjugation
identities.
"""

import numpy as np
import pytest
from scipy.special import sph_harm_y

from draco_tpu.ops import healpix, sht


def direct_ylm_synthesis(alm, nside):
    """Brute-force real-field synthesis from dense alm[l, m] via scipy."""
    lmax = alm.shape[-2] - 1
    theta, phi = healpix.pix2ang(nside)
    out = np.zeros(healpix.npix_of(nside), dtype=np.complex128)
    for ell in range(lmax + 1):
        for m in range(0, min(ell, alm.shape[-1] - 1) + 1):
            Y = sph_harm_y(ell, m, theta, phi)
            out += alm[ell, m] * Y
            if m > 0:
                out += np.conj(alm[ell, m] * Y)
    return out.real


def random_alm(lmax, rng, mmax=None):
    mmax = lmax if mmax is None else mmax
    alm = rng.standard_normal((lmax + 1, mmax + 1)) + 1j * rng.standard_normal(
        (lmax + 1, mmax + 1)
    )
    # zero invalid entries (m > l) and make m=0 real
    for ell in range(lmax + 1):
        alm[ell, ell + 1 :] = 0.0
    alm[:, 0] = alm[:, 0].real
    return alm


def test_healpix_geometry():
    info = healpix.ring_info(4)
    assert info.nring == 15
    assert info.nphi.sum() == healpix.npix_of(4)
    # total solid angle
    assert np.isclose((info.weight * info.nphi).sum(), 4 * np.pi)
    # symmetric rings
    assert np.allclose(info.theta, np.pi - info.theta[::-1])


def test_synthesis_matches_scipy(rng):
    nside, lmax = 8, 12
    alm = random_alm(lmax, rng)
    truth = direct_ylm_synthesis(alm, nside)
    ours = np.asarray(sht.alm2map(alm, nside))
    # f64 identity on CPU; the chip runs f32 (x64 unavailable there)
    import jax

    tol = 1e-8 if jax.config.jax_enable_x64 else 5e-5
    assert np.allclose(ours, truth, rtol=tol, atol=tol * np.abs(truth).max())


def test_analysis_roundtrip_bandlimited(rng):
    """analysis(synthesis(alm)) converges to alm for band-limited fields."""
    nside = 16
    lmax = 2 * nside  # comfortably band-limited for healpix quadrature
    alm = random_alm(lmax, rng)
    s = sht.SHT(nside, lmax)
    maps = s.synthesis(alm)
    alm2 = np.asarray(s.analysis(maps, iter=3))
    # mask to valid region
    mask = np.tril(np.ones((lmax + 1, lmax + 1)))
    err = np.abs(alm2 - alm) * mask
    scale = np.abs(alm).max()
    assert err.max() / scale < 2e-3


def test_complex_analysis_identities(rng):
    """analysis_complex matches scipy coefficients for +m and -m."""
    nside, lmax = 8, 10
    theta, phi = healpix.pix2ang(nside)
    # Build a complex map from known coefficients over ALL m (pos and neg)
    rng_ = np.random.Generator(np.random.SFC64(7))
    f = np.zeros(healpix.npix_of(nside), dtype=np.complex128)
    coeffs = {}
    for ell in range(lmax + 1):
        for m in range(-ell, ell + 1):
            c = rng_.standard_normal() + 1j * rng_.standard_normal()
            coeffs[(ell, m)] = c
            Y = sph_harm_y(ell, abs(m), theta, phi)
            if m < 0:
                Y = (-1) ** m * np.conj(Y)
            f += c * Y
    s = sht.SHT(nside, lmax)
    # Use Jacobi iterations for quadrature accuracy
    def refine(g):
        ap, an = s.analysis_complex(g)
        return np.asarray(ap), np.asarray(an)

    ap, an = refine(f)
    # one iteration manually: rebuild and correct
    for ell in range(lmax + 1):
        for m in range(0, ell + 1):
            assert np.isclose(
                ap[ell, m], coeffs[(ell, m)], rtol=0.05, atol=0.05
            ), (ell, m)
            assert np.isclose(
                an[ell, m], coeffs[(ell, -m)], rtol=0.05, atol=0.05
            ), (ell, m, "neg")


def test_legendre_float32_stability():
    """The rescaled recurrence stays finite and accurate in float32."""
    import jax

    s = sht.SHT(64, lmax=191)
    lam64 = np.asarray(s._legendre_block(np.array([150, 191]), jax.numpy.float64))
    lam32 = np.asarray(s._legendre_block(np.array([150, 191]), jax.numpy.float32))
    assert np.all(np.isfinite(lam32))
    # where values are representable, f32 matches f64
    big = np.abs(lam64) > 1e-30
    rel = np.abs(lam32[big] - lam64[big]) / np.abs(lam64[big]).clip(1e-30)
    assert np.median(rel) < 1e-5
    assert rel.max() < 1e-2


def test_legendre_matches_scipy():
    """Normalised Legendre values agree with scipy sph_harm at phi=0."""
    import jax.numpy as jnp

    nside, lmax = 8, 20
    s = sht.SHT(nside, lmax)
    lam = np.asarray(s._legendre_block(np.array([0, 1, 5, 17]), jnp.float64))
    theta = s.info.theta
    for ci, m in enumerate([0, 1, 5, 17]):
        for ell in [m, m + 1, min(lmax, m + 7)]:
            truth = sph_harm_y(ell, m, theta, 0.0).real
            assert np.allclose(lam[ell, ci], truth, rtol=1e-10, atol=1e-12), (
                ell,
                m,
            )


def test_sphtrans_sky_shape(rng):
    nside = 8
    sky = rng.standard_normal((2, 1, healpix.npix_of(nside)))
    alm = np.asarray(sht.sphtrans_sky(sky, lmax=3 * nside - 1))
    assert alm.shape == (2, 1, 24, 24)
    back = np.asarray(sht.sphtrans_inv_sky(alm, nside))
    assert back.shape == sky.shape


def test_analysis_padded_matches_gathered():
    """analysis_padded on the padded layout == the gathered split path."""
    import jax.numpy as jnp

    from draco_tpu.ops import healpix, sht

    nside = 16
    s = sht.get_sht(nside, 3 * nside - 1)
    npix = healpix.npix_of(nside)
    rng = np.random.Generator(np.random.SFC64(7))
    lam = s.precompute_legendre_split(jnp.float32)
    layout = s.padded_layout()
    lclip = np.clip(layout, 0, None)

    m = rng.standard_normal((3, npix)).astype(np.float32)
    pad = np.where(layout[None] >= 0, m[:, lclip], 0.0).astype(np.float32)

    a0 = np.asarray(s._analysis_impl(jnp.asarray(m), lam=lam))
    a1 = np.asarray(s.analysis_padded(jnp.asarray(pad), lam))
    assert np.allclose(a0, a1, atol=1e-6)


def test_ring_plan_paths_match():
    """plan= (precomputed DFT factors) gives identical transforms."""
    import jax
    import jax.numpy as jnp

    from draco_tpu.ops import healpix, sht

    nside = 16
    s = sht.get_sht(nside, 3 * nside - 1)
    npix = healpix.npix_of(nside)
    rng = np.random.Generator(np.random.SFC64(11))
    lam = s.precompute_legendre_split(jnp.float32)
    plan = s.precompute_ring_plan()

    m = jnp.asarray(rng.standard_normal((2, npix)).astype(np.float32))
    a0 = np.asarray(s._analysis_impl(m, lam=lam))
    a1 = np.asarray(s._analysis_impl(m, lam=lam, plan=plan))
    assert np.allclose(a0, a1, atol=1e-6)

    # padded layout with plan
    layout = s.padded_layout()
    pad = np.where(
        layout[None] >= 0, np.asarray(m)[:, np.clip(layout, 0, None)], 0.0
    ).astype(np.float32)
    a2 = np.asarray(s.analysis_padded(jnp.asarray(pad), lam, plan=plan))
    assert np.allclose(a0, a2, atol=1e-6)

    alm = (
        rng.standard_normal((s.lmax + 1, s.mmax + 1))
        + 1j * rng.standard_normal((s.lmax + 1, s.mmax + 1))
    ).astype(np.complex64)
    alm = np.tril(alm.T).T
    m0 = np.asarray(s._synthesis_impl(jnp.asarray(alm), lam=lam))
    m1 = np.asarray(s._synthesis_impl(jnp.asarray(alm), lam=lam, plan=plan))
    assert np.allclose(m0, m1, atol=1e-6)


def test_analysis_complex_iterated():
    """Jacobi iterations on a complex map converge via re/im linearity."""
    import numpy as np

    from draco_tpu.ops import sht

    nside = 16
    lmax = nside  # well inside the reliable band
    s = sht.get_sht(nside, 3 * nside - 1)
    rng = np.random.default_rng(3)

    def rand_alm():
        a = rng.standard_normal((s.lmax + 1, s.mmax + 1)) + 1j * (
            rng.standard_normal((s.lmax + 1, s.mmax + 1))
        )
        ls = np.arange(s.lmax + 1)[:, None]
        ms = np.arange(s.mmax + 1)[None, :]
        a *= (ms <= ls) & (ls <= lmax)
        a[:, 0] = a[:, 0].real
        return a

    ar, ai = rand_alm(), rand_alm()
    m = np.asarray(s.synthesis(ar)) + 1j * np.asarray(s.synthesis(ai))
    truth = ar + 1j * ai  # the m >= 0 complex-map transform

    e0 = np.abs(np.asarray(s.analysis(m)) - truth).max()
    e3 = np.abs(np.asarray(s.analysis(m, iter=3)) - truth).max()
    assert e3 < 0.35 * e0
    # and the iterated complex path equals the per-part computation
    ref = np.asarray(s.analysis(m.real, iter=3)) + 1j * np.asarray(
        s.analysis(m.imag, iter=3)
    )
    assert np.allclose(np.asarray(s.analysis(m, iter=3)), ref)


def test_synthesis_beyond_azimuthal_band_limit(rng):
    """mmax >= 4*nside synthesis = exact point-sampling (map degrading).

    Aliasing e^{i m phi_k} onto an nphi-point ring IS the correct sample
    value, so healpy-style synthesis to a coarser grid must work — and
    match brute-force scipy evaluation at the pixel centres.
    """
    nside, lmax = 8, 40  # mmax = 40 > 4*nside = 32
    alm = random_alm(lmax, rng)
    truth = direct_ylm_synthesis(alm, nside)
    ours = np.asarray(sht.alm2map(alm, nside))
    assert np.allclose(ours, truth, rtol=1e-4, atol=1e-4 * np.abs(truth).max())
    # the f64 path routes the belt through the dense DFT (the iFFT
    # bin-fill cannot express m >= nphi) — same answer, tighter tol
    s = sht.SHT(nside, lmax)
    ours64 = np.asarray(s._synthesis_impl(np.asarray(alm, np.complex128)))
    assert np.allclose(ours64, truth, rtol=1e-8, atol=1e-8)


def test_analysis_rejects_aliased_mmax(rng):
    """Analysis cannot separate aliased m: entry points raise."""
    s = sht.SHT(8, lmax=40, mmax=40)
    maps = np.asarray(rng.standard_normal(healpix.npix_of(8)), np.float32)
    with pytest.raises(ValueError, match="analysis requires mmax"):
        s.analysis(maps)
    with pytest.raises(ValueError, match="analysis requires mmax"):
        s._ring_analysis_parts(jnp_asarray(maps))


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def test_exact_turns_dft_matrices():
    """The DFT factor builders match exact f64 trig to ~3e-7.

    Round 3: phases are reduced mod 1 in INTEGER arithmetic before any
    floating-point trig (naive f32 `phi*m` reaches ~5e3 rad where
    argument rounding costs ~3e-4 rad — measured as the dominant term
    of the round-trip error budget).
    """
    import jax.numpy as jnp

    from draco_tpu.ops import sht

    s = sht.get_sht(16, 47)
    info = s.info

    # belt matrix vs f64 direct
    W = np.asarray(s._belt_dft_matrix(jnp.complex64))
    j = np.arange(s._belt_nphi, dtype=np.float64)[:, None]
    m = np.arange(s.mmax + 1, dtype=np.float64)[None, :]
    ref = np.exp(-2j * np.pi * j * m / s._belt_nphi)
    assert np.abs(W - ref).max() < 5e-7

    # cap matrix vs f64 direct (first width group)
    grp = s._cap_wgroups[0]
    rows_arr, w = grp
    for mv in [np.arange(0, 8), np.arange(s.mmax - 7, s.mmax + 1)]:
        P = np.asarray(s._cap_dft_matrix(mv, jnp.complex64, group=grp))
        phi = s._cap_phi[rows_arr][:, :w]
        mask = s._cap_mask[rows_arr][:, :w]
        ref = np.exp(-1j * phi[:, :, None] * mv[None, None, :]) * mask[
            :, :, None
        ]
        assert np.abs(P - ref).max() < 5e-7

    # ring phase vs f64 direct
    R = np.asarray(s._ring_phase(s._belt_rings, jnp.complex64))
    phi0 = info.phi0[s._belt_rings]
    ref = np.exp(-1j * phi0[:, None] * np.arange(s.mmax + 1)[None, :])
    assert np.abs(R - ref).max() < 5e-7


def test_two_float_legendre_storage():
    """hi + lo reproduces the f64 Legendre tensor to ~2^-30."""
    import jax

    from draco_tpu.ops import sht

    s = sht.get_sht(8, 23)
    hi, lo = s.precompute_legendre_split_2f()
    with jax.enable_x64(True):
        ref = {
            "belt": np.asarray(s._legendre_block(np.arange(24), np.float64))[
                :, :, s._belt_rings[0] : s._belt_rings[-1] + 1
            ]
        }
    got = np.asarray(hi["belt"], dtype=np.float64) + np.asarray(
        lo["belt"], dtype=np.float64
    )
    scale = np.abs(ref["belt"]).max()
    assert np.abs(got - ref["belt"]).max() < 1e-9 * scale
    # and the lo parts are genuinely sub-ulp corrections
    assert np.abs(np.asarray(lo["belt"], np.float64)).max() < 1e-7 * scale


def test_streamed_constant_builders_match():
    """The argument-streamed builders (round-4 warmup fix: no-input jits
    constant-fold the whole build at compile time) match the one-jit
    originals: Legendre bit-identically, ring-DFT factors to f32 trig
    rounding (the streamed path measured CLOSER to f64 truth)."""
    import jax
    import jax.numpy as jnp

    from draco_tpu.ops import sht

    s = sht.get_sht(16, 47, 47)
    with jax.enable_x64(True):
        lam_a, lo_a = jax.jit(lambda: s.precompute_legendre_split_2f())()
    lam_b, lo_b = s.precompute_legendre_split_2f_streamed()
    assert np.array_equal(np.asarray(lam_a["belt"]), np.asarray(lam_b["belt"]))
    for x, y in zip(lam_a["caps"], lam_b["caps"]):
        assert np.array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(
        [lo_a["belt"], *lo_a["caps"]], [lo_b["belt"], *lo_b["caps"]]
    ):
        assert np.array_equal(
            np.asarray(x, np.float32), np.asarray(y, np.float32)
        )

    plan_a = jax.jit(lambda: s.precompute_ring_plan())()
    plan_b = s.precompute_ring_plan_streamed()
    assert np.abs(np.asarray(plan_a["W"]) - np.asarray(plan_b["W"])).max() < 1e-6
    for x, y in zip(plan_a["P"], plan_b["P"]):
        assert np.abs(np.asarray(x) - np.asarray(y)).max() < 1e-6
