"""Tests for the windowed SHT and windowed beam-transfer generation."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from draco_tpu.ops import healpix, sht
from draco_tpu.ops.sht_window import WindowedSHT, support_fraction
from draco_tpu.telescope import UnpolarisedDishArray
from draco_tpu.telescope.beamtransfer import BeamTransfer


@pytest.fixture()
def gaussian_support():
    nside = 32
    vec = healpix.pix2vec(nside)
    zen = np.array([np.sin(np.pi / 4), 0.15, np.cos(np.pi / 4)])
    zen /= np.linalg.norm(zen)
    cs = np.clip(vec @ zen, -1, 1)
    beam = np.exp(-(np.arccos(cs) ** 2) / (2 * 0.06**2)) * (cs > 0)
    return nside, vec, beam


def test_support_fraction(gaussian_support):
    _, _, beam = gaussian_support
    f = support_fraction(beam)
    assert 0.0 < f < 0.1
    assert support_fraction(np.zeros(10)) == 0.0
    assert support_fraction(np.ones(10)) == 1.0


def test_windowed_analysis_matches_full(gaussian_support):
    nside, vec, beam = gaussian_support
    lmax = 3 * nside - 1
    s = sht.get_sht(nside, lmax)
    w = WindowedSHT(s, beam)
    assert w.coverage < 0.15

    # real compactly-supported map
    rmap = (beam * np.cos(2 * np.pi * (vec @ np.array([5.0, 2.0, -3.0])))).astype(
        np.float32
    )
    af = np.asarray(s.analysis(jnp.asarray(rmap)))
    aw = np.asarray(w.analysis(w.gather(rmap)))
    assert np.abs(aw - af).max() / np.abs(af).max() < 2e-5

    # complex fringe x beam map and the conjugate pair
    fr = np.exp(2j * np.pi * (vec @ np.array([7.0, -3.0, 2.0])))
    bmap = (beam * fr).astype(np.complex64)
    alm_full = np.asarray(s._analysis_j(jnp.asarray(bmap)))
    ac_full = np.asarray(s._analysis_j(jnp.conj(jnp.asarray(bmap))))
    aw = np.asarray(w.analysis(w.gather(bmap)))
    assert np.abs(aw - alm_full).max() / np.abs(alm_full).max() < 5e-5
    p1, p2 = w.analysis_pair(w.gather(bmap.real), w.gather(bmap.imag))
    assert np.abs(np.asarray(p1) - alm_full).max() / np.abs(alm_full).max() < 5e-5
    assert np.abs(np.asarray(p2) - ac_full).max() / np.abs(ac_full).max() < 5e-5


def test_windowed_analysis_wraparound():
    """Support straddling phi = 0 still reconstructs correctly."""
    nside = 16
    lmax = 3 * nside - 1
    vec = healpix.pix2vec(nside)
    # blob centred on phi = 0 at mid-latitude: windows wrap the ring end
    zen = np.array([np.sin(1.1), 0.0, np.cos(1.1)])
    cs = np.clip(vec @ zen, -1, 1)
    beam = np.exp(-(np.arccos(cs) ** 2) / (2 * 0.1**2))
    s = sht.get_sht(nside, lmax)
    w = WindowedSHT(s, beam)
    rmap = (beam * (1.0 + vec[:, 0])).astype(np.float32)
    af = np.asarray(s.analysis(jnp.asarray(rmap)))
    aw = np.asarray(w.analysis(w.gather(rmap)))
    assert np.abs(aw - af).max() / np.abs(af).max() < 2e-5


def test_windowed_rejects_bad_support():
    s = sht.get_sht(16, 47)
    with pytest.raises(ValueError):
        WindowedSHT(s, np.zeros(10))
    with pytest.raises(ValueError):
        WindowedSHT(s, np.zeros(healpix.npix_of(16)))


def test_beamtransfer_windowed_generation():
    """Windowed generate() matches the full-sphere path for dish beams."""
    tel = UnpolarisedDishArray(
        grid_ew=2, grid_ns=2, spacing_ew=6.0, spacing_ns=6.0,
        latitude=45.0, freq_lower=400.0, freq_upper=410.0, num_freq=2,
        auto_correlations=True,
    )
    try:
        os.environ["DRACO_TPU_BT_WINDOW"] = "0"
        bt_full = BeamTransfer(telescope=tel)
        bt_full.generate()
        os.environ["DRACO_TPU_BT_WINDOW"] = "1"
        bt_win = BeamTransfer(telescope=tel)
        win = bt_win._beam_window()
        assert win is not None and win.coverage < 0.3
        bt_win.generate()
    finally:
        os.environ.pop("DRACO_TPU_BT_WINDOW", None)

    bp_f = np.asarray(bt_full._bp)
    bp_w = np.asarray(bt_win._bp)
    bm_f = np.asarray(bt_full._bm)
    bm_w = np.asarray(bt_win._bm)
    assert np.abs(bp_w - bp_f).max() / np.abs(bp_f).max() < 1e-4
    assert np.abs(bm_w - bm_f).max() / np.abs(bm_f).max() < 1e-4


def test_streaming_windowed_projections():
    """Windowed streaming fwd/adjoint match the full-sphere streaming path."""
    tel = UnpolarisedDishArray(
        grid_ew=2, grid_ns=2, spacing_ew=6.0, spacing_ns=6.0,
        latitude=45.0, freq_lower=400.0, freq_upper=410.0, num_freq=2,
        auto_correlations=True,
    )
    rng = np.random.default_rng(0)
    L = tel.lmax + 1
    alm = (
        rng.standard_normal((tel.nfreq, tel.num_pol_sky, L, L))
        + 1j * rng.standard_normal((tel.nfreq, tel.num_pol_sky, L, L))
    ).astype(np.complex64)
    ls = np.arange(L)[:, None]
    ms = np.arange(L)[None, :]
    alm *= ms <= ls

    try:
        os.environ["DRACO_TPU_BT_WINDOW"] = "0"
        bt_full = BeamTransfer(telescope=tel)
        v_full = np.asarray(bt_full.project_sky_to_telescope_streaming(alm))
        w = np.ones_like(v_full.real)
        a_full = np.asarray(
            bt_full.project_telescope_to_sky_dirty_streaming(v_full, w)
        )
        os.environ["DRACO_TPU_BT_WINDOW"] = "1"
        bt_win = BeamTransfer(telescope=tel)
        assert bt_win._beam_window() is not None
        v_win = np.asarray(bt_win.project_sky_to_telescope_streaming(alm))
        a_win = np.asarray(
            bt_win.project_telescope_to_sky_dirty_streaming(v_full, w)
        )
    finally:
        os.environ.pop("DRACO_TPU_BT_WINDOW", None)

    assert np.abs(v_win - v_full).max() / np.abs(v_full).max() < 1e-4
    assert np.abs(a_win - a_full).max() / np.abs(a_full).max() < 1e-4


def test_windowed_analysis_polar_support():
    """Support covering small polar rings: short rings must not be
    double-counted through the modular window wrap."""
    nside = 16
    lmax = 3 * nside - 1
    vec = healpix.pix2vec(nside)
    # beam centred ON the north pole: cap rings are fully inside the
    # support while lower rings need a wide azimuth window
    zen = np.array([0.25, 0.0, 1.0])
    zen /= np.linalg.norm(zen)
    cs = np.clip(vec @ zen, -1, 1)
    beam = np.exp(-(np.arccos(cs) ** 2) / (2 * 0.15**2))
    s = sht.get_sht(nside, lmax)
    w = WindowedSHT(s, beam)
    assert w.W > int(np.min([4]))  # includes rings shorter than W

    rmap = (beam * (1.0 + 0.5 * vec[:, 1])).astype(np.float32)
    af = np.asarray(s.analysis(jnp.asarray(rmap)))
    aw = np.asarray(w.analysis(w.gather(rmap)))
    assert np.abs(aw - af).max() / np.abs(af).max() < 2e-5
