"""Telescope + beam transfer validation.

The key physics check: visibilities computed through the harmonic chain
(beam SHT -> per-m projection -> inverse FFT over RA) must equal the direct
pixel-space quadrature V(phi) = sum_pix B(n) T(theta, phi_pix + phi) Omega,
where T is evaluated exactly (from known alm via scipy) at rotated
coordinates.  This identity is exact up to float error and independently
validates every convention (conjugations, msign packing, rotation sign).
"""

import numpy as np
import pytest
from scipy.special import sph_harm_y

from draco_tpu.ops import healpix, mmode
from draco_tpu.telescope import (
    BeamTransfer,
    PolarisedCylinderTelescope,
    UnpolarisedDishArray,
)


@pytest.fixture(scope="module")
def dish_tel():
    tel = UnpolarisedDishArray(
        grid_ew=2,
        grid_ns=2,
        spacing_ew=4.0,
        spacing_ns=4.0,
        latitude=30.0,
        freq_lower=400.0,
        freq_upper=500.0,
        num_freq=2,
        dish_width=4.0,
        auto_correlations=True,
        force_lmax=15,
        force_mmax=15,
    )
    return tel


def random_sky_alm(lmax, rng):
    alm = rng.standard_normal((lmax + 1, lmax + 1)) + 1j * rng.standard_normal(
        (lmax + 1, lmax + 1)
    )
    for ell in range(lmax + 1):
        alm[ell, ell + 1 :] = 0.0
    alm[:, 0] = alm[:, 0].real
    return alm


def sky_at(alm, theta, phi):
    """Evaluate the real field with harmonics alm at given angles (scipy)."""
    lmax = alm.shape[0] - 1
    out = np.zeros(np.shape(theta), dtype=np.complex128)
    for ell in range(lmax + 1):
        for m in range(0, ell + 1):
            Y = sph_harm_y(ell, m, theta, phi)
            out += alm[ell, m] * Y
            if m > 0:
                out += np.conj(alm[ell, m] * Y)
    return out.real


def test_baseline_structure(dish_tel):
    tel = dish_tel
    assert tel.nfeed == 4
    # 2x2 grid with autos: unique baselines = (0,0),(d,0),(0,d),(d,d),(d,-d)
    assert tel.npairs == 5
    fm = tel.feedmap
    assert fm.shape == (4, 4)
    assert (fm >= 0).all()
    # redundancy sums to total pair count
    assert tel.redundancy.sum() == 4 * 5 // 2
    # reverse map consistency
    rm = tel.reverse_map_stack
    prod = tel.index_map_prod
    for pi in range(len(prod)):
        a, b = prod[pi]["input_a"], prod[pi]["input_b"]
        assert rm[pi]["stack"] == fm[a, b]


def test_observer_times(dish_tel):
    tel = dish_tel
    t = 1.5e9
    lsd = tel.unix_to_lsd(t)
    assert np.isclose(tel.lsd_to_unix(lsd), t)
    lsa = tel.unix_to_lsa(t)
    assert 0 <= lsa < 360


def test_visibilities_match_direct_quadrature(dish_tel, rng):
    """The full harmonic simulate chain vs direct rotated-sky quadrature."""
    tel = dish_tel
    bt = BeamTransfer(telescope=tel).generate()
    lmax = tel.lmax
    alm = random_sky_alm(lmax, rng)

    # harmonic-chain visibilities for all m, then invert onto the RA grid
    alm_in = np.broadcast_to(alm, (tel.nfreq, 1, lmax + 1, lmax + 1))
    vis_m = np.asarray(bt.project_sky_to_telescope(alm_in))  # [M, 2, f, b]
    ntime = 2 * tel.mmax + 1
    vis_ra = np.asarray(
        mmode.mmodes_to_sidereal(vis_m, n=ntime)
    )  # [f, b, ntime]

    # direct quadrature truth at a couple of RA samples
    nside = bt.beam_nside
    theta, phi = healpix.pix2ang(nside)
    omega = 4 * np.pi / healpix.npix_of(nside)
    fi = 1
    bmaps = np.asarray(bt._beam_fringe_maps(fi))[:, 0, :]  # [nbase, npix]
    for k in [0, 3]:
        ra = 2 * np.pi * k / ntime
        sky_rot = sky_at(alm, theta, phi + ra)
        truth = bmaps @ sky_rot  # omega already folded into bmaps
        ours = vis_ra[fi, :, k]
        # B tensors are stored complex64; agreement is f32-limited
        assert np.allclose(ours, truth, rtol=3e-5, atol=1e-7), k


def test_per_m_projection_matches_batched(dish_tel, rng):
    tel = dish_tel
    bt = BeamTransfer(telescope=tel).generate()
    lmax = tel.lmax
    alm = random_sky_alm(lmax, rng)
    alm_in = np.broadcast_to(alm, (tel.nfreq, 1, lmax + 1, lmax + 1))
    vis_all = np.asarray(bt.project_sky_to_telescope(alm_in))
    for m in [0, 3, tel.mmax]:
        per_m = bt.project_vector_sky_to_telescope(m, alm_in[..., m])
        # per_m [f, ntel]: first npairs rows = +m, rest = conj(-m)
        npairs = tel.npairs
        assert np.allclose(per_m[:, :npairs], vis_all[m, 0].reshape(tel.nfreq, npairs), atol=1e-6)
        assert np.allclose(per_m[:, npairs:], vis_all[m, 1].reshape(tel.nfreq, npairs), atol=1e-6)


def test_dirty_projection_is_adjoint(dish_tel, rng):
    """<B a, v> == <a, B^H v> validates the adjoint used by the mapmaker."""
    tel = dish_tel
    bt = BeamTransfer(telescope=tel).generate()
    lmax = tel.lmax
    alm = random_sky_alm(lmax, rng)[None, None].astype(complex)
    alm = np.broadcast_to(alm, (tel.nfreq, 1, lmax + 1, lmax + 1))
    v = np.asarray(bt.project_sky_to_telescope(alm))
    w = np.ones_like(v.real)
    vr = (
        np.random.default_rng(3).standard_normal(v.shape)
        + 1j * np.random.default_rng(4).standard_normal(v.shape)
    )
    a_back = np.asarray(bt.project_telescope_to_sky_dirty(vr, w))
    lhs = np.vdot(vr, v)
    rhs = np.vdot(a_back, np.asarray(alm))
    assert np.isclose(lhs, rhs, rtol=1e-6)


def test_real_sky_gives_hermitian_visibilities(dish_tel, rng):
    """For a real sky, the two msign blocks agree for the auto baseline."""
    tel = dish_tel
    bt = BeamTransfer(telescope=tel).generate()
    lmax = tel.lmax
    alm = random_sky_alm(lmax, rng)
    alm_in = np.broadcast_to(alm, (tel.nfreq, 1, lmax + 1, lmax + 1))
    vis = np.asarray(bt.project_sky_to_telescope(alm_in))
    # find the auto (zero-length) baseline
    bl = np.linalg.norm(tel.baselines, axis=1)
    auto = int(np.argmin(bl))
    assert bl[auto] < 1e-9
    # auto beam is real -> V_m == conj(V_-m) (stored directly as msign=1).
    # m = 0 is excluded: its msign=1 slot is left empty by convention.
    assert np.allclose(vis[1:, 0, :, auto], vis[1:, 1, :, auto], atol=1e-6)


def test_polarised_cylinder_builds():
    tel = PolarisedCylinderTelescope(
        num_cylinders=2,
        num_feeds=2,
        feed_spacing=2.0,
        cylinder_spacing=10.0,
        cylinder_width=10.0,
        latitude=45.0,
        num_freq=1,
        force_lmax=10,
        force_mmax=10,
    )
    assert tel.nfeed == 8
    assert tel.num_pol_sky == 4
    assert set(np.unique(tel.beamclass)) == {0, 1}
    bt = BeamTransfer(telescope=tel).generate()
    assert bt._bp.shape == (1, tel.npairs, 4, 11, 11)
    # SVD products
    bt._ensure_svd()
    assert bt.nmodes().shape == (1, 11)


def test_beamtransfer_save_load(tmp_path, dish_tel):
    bt = BeamTransfer(telescope=dish_tel).generate()
    bt.save(str(tmp_path / "bt"))
    bt2 = BeamTransfer(str(tmp_path / "bt"))
    assert np.allclose(np.asarray(bt2._bp), np.asarray(bt._bp))
    assert bt2.telescope.nfeed == dish_tel.nfeed


def test_productmanager_reference_type_dict(tmp_path):
    """The reference's {class, module} telescope spec resolves

    (reference doc/product_params.yaml: module drift.telescope.cylinder).
    """
    import yaml

    from draco_tpu.telescope.manager import ProductManager

    cfg = {
        "config": {"beamtransfers": True, "output_directory": "beams"},
        "telescope": {
            "type": {
                "class": "PolarisedCylinderTelescope",
                "module": "drift.telescope.cylinder",
            },
            "freq_lower": 400.0,
            "freq_upper": 410.0,
            "num_freq": 2,
            "num_cylinders": 2,
            "num_feeds": 2,
            "feed_spacing": 0.3,
            "cylinder_width": 10.0,
        },
    }
    p = tmp_path / "prod.yaml"
    p.write_text(yaml.safe_dump(cfg))
    m = ProductManager.from_config(str(p))
    assert type(m.telescope).__name__ == "PolarisedCylinderTelescope"
    assert m.telescope.nfeed == 8
