"""Deconvolving ring-map maker tests: point source recovery + noise models."""

import numpy as np
import pytest

from draco_tpu.analysis import ringmapmaker as rmm
from draco_tpu.core import containers
from draco_tpu.telescope import PolarisedCylinderTelescope

MMAX = 16
NRA = 2 * MMAX
NEW = 2
NEL = 4
FREQ = np.array([500.0, 510.0])


def _hybrid_mmodes(rng, source_idx=5):
    """(vis, beam) HybridVisMModes pair encoding a point source at an RA bin."""
    hv = containers.HybridVisMModes(
        mmax=MMAX, oddra=False, freq=FREQ, pol=np.array(["XX"]),
        ew=np.array([0.0, 20.0]), el=np.linspace(-0.2, 0.2, NEL),
    )
    hb = containers.HybridVisMModes(
        mmax=MMAX, oddra=False, freq=FREQ, pol=np.array(["XX"]),
        ew=np.array([0.0, 20.0]), el=np.linspace(-0.2, 0.2, NEL),
    )
    m = np.arange(MMAX + 1)

    # Smooth, EW-dependent beam transfer function (nonzero at every m)
    bshape = hb.vis.shape  # [m, msign, pol, freq, ew, el]
    bv = np.zeros(bshape, dtype=np.complex64)
    taper = np.exp(-0.5 * (m / (MMAX / 1.5)) ** 2)
    for e in range(NEW):
        bv[:, 0, 0, :, e, :] = (
            (1.0 + 0.5 * e) * taper[:, None, None]
            * np.exp(1.0j * 0.1 * e * m)[:, None, None]
        )
    hb.vis[:] = bv

    # Sky: a single point source at RA bin `source_idx`
    s_m = np.exp(-2.0j * np.pi * m * source_idx / NRA)
    vv = bv * s_m[:, None, None, None, None, None]
    hv.vis[:] = vv

    # Only msign=0 carries data
    w = np.zeros(hv.weight.shape, dtype=np.float32)
    w[:, 0] = 1.0
    hv.weight[:] = w
    hb.weight[:] = np.ones(hb.weight.shape, dtype=np.float32)

    return hv, hb


def test_tikhonov_recovers_point_source(rng):
    hv, hb = _hybrid_mmodes(rng, source_idx=5)

    task = rmm.TikhonovRingMapMaker()
    task.read_config({"inv_SN": 1e-8, "weight_ew": "uniform",
                      "save_dirty_beam": True})
    task.setup()
    rm = task.process(hv, hb)

    assert isinstance(rm, containers.RingMap)
    assert rm.map.shape == (1, 1, 2, NRA, NEL)
    mmap = np.asarray(rm.map[:])[0, 0]

    # The map should peak at the source RA bin for every freq and el
    for fi in range(2):
        for ee in range(NEL):
            prof = mmap[fi, :, ee]
            assert np.argmax(prof) == 5
            # Normalised to the source flux
            assert np.isclose(prof[5], 1.0, rtol=1e-3)

    # Weights and dirty beam power are positive and finite
    assert np.isfinite(np.asarray(rm.weight[:])).all()
    assert (np.asarray(rm.dirty_beam_power[:]) > 0).all()
    assert "dirty_beam" in rm.datasets


def test_wiener_ringmapmaker(rng):
    hv, hb = _hybrid_mmodes(rng)
    task = rmm.WienerRingMapMaker()
    task.read_config({})
    task.setup()
    rm = task.process(hv, hb)
    mmap = np.asarray(rm.map[:])[0, 0]
    assert np.isfinite(mmap).all()
    # Still peaks at the source even with the signal prior
    assert np.argmax(mmap[0, :, 0]) == 5
    assert rm.attrs["weight_ew"] == "inverse_variance"


def test_exclude_cyl(rng):
    hv, hb = _hybrid_mmodes(rng)
    task = rmm.TikhonovRingMapMaker()
    task.read_config({"inv_SN": 1e-8, "weight_ew": "uniform",
                      "exclude_cyl": [0]})
    task.setup()
    rm = task.process(hv, hb)
    # Map still recovers the source using only the second cylinder sep
    mmap = np.asarray(rm.map[:])[0, 0]
    assert np.argmax(mmap[0, :, 0]) == 5
    assert list(rm.attrs["exclude_cyl"]) == [0]


def test_analytical_deconvolution(rng):
    from draco_tpu.telescope import PolarisedCylinderTelescope

    tel = PolarisedCylinderTelescope(
        num_cylinders=2, num_feeds=2, feed_spacing=0.5, cylinder_spacing=20.0,
        latitude=45.0, freq_lower=500.0, freq_upper=520.0, num_freq=2,
        auto_correlations=True,
    )
    hv, _ = _hybrid_mmodes(rng)
    task = rmm.TikhonovRingMapMakerAnalytical()
    task.read_config({"inv_SN": 1e-6, "weight_ew": "uniform"})
    task.setup(tel)
    rm = task.process(hv)
    assert np.isfinite(np.asarray(rm.map[:])).all()


@pytest.fixture()
def ptel():
    return PolarisedCylinderTelescope(
        num_cylinders=2, num_feeds=3, feed_spacing=0.5, cylinder_spacing=20.0,
        latitude=45.0, freq_lower=500.0, freq_upper=520.0, num_freq=2,
        auto_correlations=True,
    )


def _hybrid_stream_with_attrs(ptel, nra=8):
    nsmax = 1.0  # metres
    hv = containers.HybridVisStream(
        freq=ptel.frequencies,
        pol=np.array(["XX", "YY"]),
        ew=np.array([0.0, 20.0]),
        el=np.linspace(-0.3, 0.3, 5),
        ra=nra,
    )
    hv.vis[:] = np.zeros(hv.vis.shape, dtype=np.complex64)
    hv.weight[:] = np.ones(hv.weight.shape, dtype=np.float32)
    hv.attrs["beamform_ns_weight"] = "natural"
    hv.attrs["beamform_ns_include_auto"] = False
    hv.attrs["beamform_ns_scaled"] = False
    hv.attrs["beamform_ns_freqmin"] = float(ptel.frequencies.min())
    hv.attrs["beamform_ns_nsmax"] = nsmax
    return hv


def test_reconstruct_vis_weight(ptel):
    hv = _hybrid_stream_with_attrs(ptel)
    task = rmm.ReconstructVisWeight()
    task.read_config({})
    task.setup(ptel)
    ss = task.process(hv)

    assert isinstance(ss, containers.SiderealStream)
    assert np.all(np.asarray(ss.vis[:]) == 0)
    w = np.asarray(ss.weight[:])
    assert np.isfinite(w).all()
    assert (w >= 0).all()
    assert (w > 0).any()


def test_reconstruct_vis_freq_cov(ptel):
    hv = _hybrid_stream_with_attrs(ptel)
    hv.add_dataset("freq_cov")
    nfreq = len(FREQ)
    cov = np.zeros(hv.freq_cov.shape)
    cov[:] = np.eye(nfreq)[None, :, :, None, None]
    hv.freq_cov[:] = cov

    task = rmm.ReconstructVisFreqCov()
    task.read_config({})
    task.setup(ptel)
    out = task.process(hv)

    assert isinstance(out, containers.FreqNoiseModel)
    L = np.asarray(out.freq_cov[:])
    assert np.isfinite(L).all()
    # Cholesky of a (scaled) diagonal: lower triangular with positive diag
    assert np.allclose(np.triu(L, 1), 0.0)
    w = np.asarray(out.weight[:])
    assert (w >= 0).all() and np.isfinite(w).all()
    # Redundancy grid populated
    assert np.asarray(out.redundancy[:]).sum() > 0


def test_ra_dependent_weights(ptel):
    hv = _hybrid_stream_with_attrs(ptel)
    # Give the weights an RA dependence
    w = np.asarray(hv.weight[:])
    ra_factor = 1.0 + 0.5 * np.arange(w.shape[-1]) / w.shape[-1]
    w *= ra_factor
    hv.weight[:] = w

    rm = containers.RingMap(
        freq=ptel.frequencies, beam=np.arange(1), pol=np.array(["XX", "YY"]),
        ra=w.shape[-1], el=np.linspace(-0.3, 0.3, 5),
    )
    rm.map[:] = np.zeros(rm.map.shape)
    rm.datasets["weight"][:] = np.ones(rm.datasets["weight"].shape)
    rm.attrs["exclude_cyl"] = []
    rm.attrs["weight_ew"] = "natural"

    task = rmm.RADependentWeights()
    task.read_config({})
    out = task.process(hv, rm)
    w_out = np.asarray(out.datasets["weight"][:])
    # RA dependence restored: weights vary with RA following 1/ra_factor... the
    # ringmap weight is scaled by var_avg/var(ra) = ra_factor/mean
    prof = w_out[0, 0, :, 0]
    assert prof.std() > 0
    assert np.argmax(prof) == np.argmax(ra_factor)
