"""Beamforming tests: a simulated point source is recovered at its position."""

import numpy as np
import pytest

from draco_tpu.analysis import beamform
from draco_tpu.analysis.ringmapmaker import RingMapMaker
from draco_tpu.core import containers
from draco_tpu.ops import sht
from draco_tpu.ops.interferometry import beamform_kernel, fringestop_phase
from draco_tpu.synthesis.stream import SimulateSidereal
from draco_tpu.telescope import BeamTransfer, UnpolarisedDishArray


def test_beamform_kernel_fringestop_identity(rng):
    """Fringestopping a pure fringe gives a coherent (real) sum."""
    nfreq, nha, nprod = 2, 5, 4
    lat = np.radians(45.0)
    dec = np.radians(30.0)
    ha = np.linspace(-0.1, 0.1, nha)
    u = rng.uniform(-20, 20, (nfreq, nprod))
    v = rng.uniform(-20, 20, (nfreq, nprod))
    # vis that is exactly the conjugate of the fringestop phase -> sum = N
    phase = np.asarray(
        fringestop_phase(
            ha[None, :, None], lat, dec, u[:, None, :], v[:, None, :]
        )
    )
    vis = np.conj(phase)
    w = np.ones_like(vis.real)
    formed = np.asarray(
        beamform_kernel(vis, w, dec, lat, np.cos(ha), np.sin(ha), u, v)
    )
    assert np.allclose(formed, nprod, atol=1e-10)


@pytest.fixture(scope="module")
def source_setup():
    tel = UnpolarisedDishArray(
        grid_ew=3, grid_ns=3, spacing_ew=6.0, spacing_ns=6.0,
        latitude=45.0, freq_lower=400.0, freq_upper=420.0, num_freq=2,
        dish_width=6.0, auto_correlations=True, force_lmax=31, force_mmax=31,
    )
    bt = BeamTransfer(telescope=tel).generate()
    nside = bt.beam_nside

    # Put a single bright point source at the telescope declination
    src_ra, src_dec = 90.0, tel.latitude
    from draco_tpu.ops import healpix

    pix = healpix.ang2pix(
        nside, np.radians(90 - src_dec), np.radians(src_ra)
    )
    m = containers.Map(nside=nside, polarisation=False, freq=tel.frequencies)
    marr = np.zeros(m.map.shape)
    marr[:, 0, pix] = 1000.0
    m.map[:] = marr

    sim = SimulateSidereal()
    sim.read_config({})
    sim.setup(bt)
    ss = sim.process(m)
    ss.attrs["lsd"] = 100
    ss.input_flags[:] = np.ones(ss.input_flags.shape, dtype=np.float32)
    return tel, bt, ss, (src_ra, src_dec)


def test_beamform_task_recovers_source(source_setup):
    tel, bt, ss, (src_ra, src_dec) = source_setup

    cat = containers.SourceCatalog(object_id=np.arange(2))
    pos = np.zeros(2, dtype=[("ra", np.float64), ("dec", np.float64)])
    pos["ra"] = [src_ra, (src_ra + 120.0) % 360]
    pos["dec"] = [src_dec, src_dec]
    cat["position"][:] = pos
    cat.attrs["coordinates"] = "CIRS"

    task = beamform.BeamForm()
    task.read_config(
        {
            "polarization": "I",
            "weight": "natural",
            "no_beam_model": True,
            "timetrack": 1800.0,
        }
    )
    task.setup(tel, cat)
    fb = task.process(ss)
    assert isinstance(fb, containers.FormedBeam)
    b = np.asarray(fb.beam[:])  # [nsrc, pol, freq]
    # The response at the true source is much larger than at the empty spot
    assert (b[0, 0] > 5 * np.abs(b[1, 0])).all()
    assert np.isfinite(np.asarray(fb.weight[:])).all()


def test_beamform_batched_matches_per_source(source_setup):
    """The batched-sources device path equals the per-source loop."""
    tel, bt, ss, (src_ra, src_dec) = source_setup

    cat = containers.SourceCatalog(object_id=np.arange(3))
    pos = np.zeros(3, dtype=[("ra", np.float64), ("dec", np.float64)])
    pos["ra"] = [src_ra, (src_ra + 40.0) % 360, (src_ra + 200.0) % 360]
    pos["dec"] = [src_dec, src_dec - 10.0, src_dec + 5.0]
    cat["position"][:] = pos
    cat.attrs["coordinates"] = "CIRS"

    for weight in ["natural", "inverse_variance"]:
        results = []
        for batch in [1, 32]:
            task = beamform.BeamForm()
            task.read_config(
                {
                    "polarization": "I",
                    "weight": weight,
                    "no_beam_model": True,
                    "timetrack": 1800.0,
                    "source_batch": batch,
                }
            )
            task.setup(tel, cat)
            fb = task.process(ss)
            results.append(
                (np.asarray(fb.beam[:]), np.asarray(fb.weight[:]))
            )
        (b1, w1), (b2, w2) = results
        assert np.allclose(b1, b2, atol=1e-5 * max(np.abs(b1).max(), 1e-30)), weight
        assert np.allclose(w1, w2, rtol=1e-5), weight


def test_beamform_batched_ha_resolved_matches(source_setup):
    """The HA-resolved (collapse_ha=False) batched path equals per-source."""
    tel, bt, ss, (src_ra, src_dec) = source_setup

    cat = containers.SourceCatalog(object_id=np.arange(2))
    pos = np.zeros(2, dtype=[("ra", np.float64), ("dec", np.float64)])
    pos["ra"] = [src_ra, (src_ra + 40.0) % 360]
    pos["dec"] = [src_dec, src_dec - 10.0]
    cat["position"][:] = pos
    cat.attrs["coordinates"] = "CIRS"

    results = []
    for batch in [1, 16]:
        task = beamform.BeamForm()
        task.read_config(
            {
                "polarization": "I",
                "weight": "natural",
                "no_beam_model": True,
                "collapse_ha": False,
                "timetrack": 1800.0,
                "source_batch": batch,
            }
        )
        task.setup(tel, cat)
        fb = task.process(ss)
        assert isinstance(fb, containers.FormedBeamHA)
        results.append(
            (
                np.asarray(fb.beam[:]),
                np.asarray(fb.weight[:]),
                np.asarray(fb.datasets["object_ha"][:]),
            )
        )
    (b1, w1, h1), (b2, w2, h2) = results
    assert np.allclose(b1, b2, atol=1e-5 * max(np.abs(b1).max(), 1e-30))
    assert np.allclose(w1, w2, rtol=1e-5)
    assert np.allclose(h1, h2)


def test_ringmap_beamform(source_setup):
    tel, bt, ss, (src_ra, src_dec) = source_setup
    maker = RingMapMaker()
    maker.read_config({"npix": 64, "weight": "uniform", "include_auto": True})
    maker.setup(tel)
    # RingMapMaker needs 4-pol; this telescope is unpolarised, so instead
    # test RingMapBeamForm with a synthetic ring map.
    rm = containers.RingMap(
        freq=tel.frequencies,
        beam=np.arange(1),
        pol=np.array(["I"]),
        ra=32,
        el=np.linspace(-0.5, 0.5, 21),
    )
    # place a blob at the source location
    ra_axis = rm.ra
    el_axis = np.asarray(rm.index_map["el"])
    ri = np.argmin(np.abs(ra_axis - src_ra))
    ei = np.argmin(np.abs(el_axis - np.sin(np.radians(src_dec - tel.latitude))))
    marr = np.zeros(rm.map.shape)
    marr[0, :, :, ri, ei] = 7.0
    rm.map[:] = marr
    rm.datasets["weight"][:] = np.ones(rm.datasets["weight"].shape)

    cat = containers.SourceCatalog(object_id=np.arange(1))
    pos = np.zeros(1, dtype=[("ra", np.float64), ("dec", np.float64)])
    pos["ra"], pos["dec"] = src_ra, src_dec
    cat["position"][:] = pos

    task = beamform.RingMapBeamForm()
    task.read_config({})
    task.setup(tel, rm)
    fb = task.process(cat)
    assert np.allclose(np.asarray(fb.beam[:])[0], 7.0)


def test_healpix_beamform(source_setup):
    tel, bt, ss, (src_ra, src_dec) = source_setup
    nside = bt.beam_nside
    m = containers.Map(nside=nside, polarisation=False, freq=tel.frequencies)
    from draco_tpu.ops import healpix

    pix = healpix.ang2pix(nside, np.radians(90 - src_dec), np.radians(src_ra))
    marr = np.zeros(m.map.shape)
    marr[:, 0, pix] = 3.0
    m.map[:] = marr

    cat = containers.SourceCatalog(object_id=np.arange(1))
    pos = np.zeros(1, dtype=[("ra", np.float64), ("dec", np.float64)])
    pos["ra"], pos["dec"] = src_ra, src_dec
    cat["position"][:] = pos

    task = beamform.HealpixBeamForm()
    task.read_config({})
    task.setup(m)
    fb = task.process(cat)
    assert np.allclose(np.asarray(fb.beam[:])[0], 3.0)
