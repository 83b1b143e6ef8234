"""Tests for HybridVisBeamForm and FitBeamFormed."""

import numpy as np
import pytest

from draco_tpu.analysis import beamform
from draco_tpu.core import containers
from draco_tpu.ops.interferometry import fringestop_phase
from draco_tpu.telescope import PolarisedCylinderTelescope

C = 299792458.0


@pytest.fixture()
def ptel():
    return PolarisedCylinderTelescope(
        num_cylinders=2, num_feeds=2, feed_spacing=6.0, cylinder_spacing=20.0,
        latitude=45.0, freq_lower=400.0, freq_upper=420.0, num_freq=2,
        auto_correlations=True,
    )


def test_hybrid_vis_beamform(ptel):
    nra, nel = 64, 9
    el = np.linspace(-0.2, 0.2, nel)
    hv = containers.HybridVisStream(
        freq=ptel.frequencies, pol=np.array(["XX"]),
        ew=np.array([0.0, 20.0]), el=el, ra=nra,
    )

    lat = np.radians(ptel.latitude)
    dec_axis = np.degrees(np.arcsin(el) + lat)
    src_ra = 90.0
    idec = 5
    src_dec = dec_axis[idec]

    ra = np.asarray(hv.ra)
    ha = np.radians((ra - src_ra + 180) % 360 - 180)

    freq = ptel.frequencies
    lmbda = C / (freq * 1e6)
    u = np.array([0.0, 20.0])[None, :] / lmbda[:, None]  # [freq, ew]

    # Source fringe at the matching el: vis = conj(fringestop phase) so the
    # beamformed output is unity at the source
    phase = np.asarray(
        fringestop_phase(
            ha[None, None, :], lat, np.radians(src_dec),
            u[:, :, None], 0.0,
        )
    )  # [freq, ew, ha]
    vis = np.zeros(hv.vis.shape, dtype=np.complex64)
    vis[0, :, :, idec, :] = np.conj(phase)
    hv.vis[:] = vis
    hv.weight[:] = np.ones(hv.weight.shape, dtype=np.float32)

    cat = containers.SourceCatalog(object_id=np.arange(1))
    pos = np.zeros(1, dtype=[("ra", np.float64), ("dec", np.float64)])
    pos["ra"], pos["dec"] = src_ra, src_dec
    cat["position"][:] = pos

    task = beamform.HybridVisBeamForm()
    task.read_config({"window": 20.0})
    task.setup(ptel, cat)
    out = task.process(hv)

    assert isinstance(out, containers.FormedBeamHAEW)
    fb = np.asarray(out.beam[:])[0, 0]  # [freq, ew, nha]
    oha = np.asarray(out.ha[:])[0]
    nha_valid = np.sum(np.abs(((ra - src_ra + 180) % 360) - 180) <= 20.0)
    # The fringestopped source is coherent (= 1) at every HA in the window
    assert np.allclose(fb[..., :nha_valid], 1.0, atol=1e-5)
    # Output hour angles are within the window and sorted contiguously
    assert np.all(np.abs(oha[:nha_valid]) <= 20.0)


def _grid_beam(freq, dec0):
    """Celestial GridBeam with a Gaussian transit shape."""
    dec_grid = np.linspace(dec0 - 5, dec0 + 5, 11)
    ha_grid = np.linspace(-20, 20, 81)
    gb = containers.GridBeam(
        coords="celestial", freq=freq, pol=np.array(["XX"]),
        input=np.array(["common"]), theta=dec_grid, phi=ha_grid,
    )
    barr = np.zeros(gb.beam.shape, dtype=np.complex64)
    shape = np.exp(-0.5 * (ha_grid / 3.0) ** 2)
    barr[:, 0, 0] = shape[None, :] * np.ones((len(dec_grid), 1))
    gb.beam[:] = barr
    gb.weight[:] = np.ones(gb.weight.shape, dtype=np.float32)
    return gb


def test_fit_beamformed(ptel, rng):
    freq = ptel.frequencies
    dec0 = 50.0
    gb = _grid_beam(freq, dec0)

    nha = 41
    ha = np.linspace(-10, 10, nha)
    amp, bkg = 5.0, 0.7

    fb = containers.FormedBeamHA(
        object_id=np.arange(1), freq=freq, pol=np.array(["XX"]), ha=nha
    )
    template = np.exp(-0.5 * (ha / 3.0) ** 2)
    fb.beam[:] = (bkg + amp * template)[None, None, None, :] * np.ones(
        (1, 1, len(freq), 1)
    )
    fb.weight[:] = np.full(fb.weight.shape, 100.0)
    fb.ha[:] = ha[None, :]
    pos = np.zeros(1, dtype=[("ra", np.float64), ("dec", np.float64)])
    pos["dec"] = dec0
    fb.position[:] = pos

    task = beamform.FitBeamFormed()
    task.read_config({"weight": "inverse_variance"})
    task.setup(gb)
    out = task.process(fb)

    assert isinstance(out, containers.FitFormedBeam)
    assert np.allclose(np.asarray(out.beam[:])[0, 0].real, amp, rtol=1e-3)
    assert np.allclose(np.asarray(out.background[:])[0, 0].real, bkg, rtol=1e-2)
    assert (np.asarray(out.weight[:]) > 0).all()
