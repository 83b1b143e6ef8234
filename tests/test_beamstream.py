"""CreateBeamStream tests: beam placed on the data grid with fringe phase."""

import numpy as np
import pytest

from draco_tpu.analysis import beam as beam_mod
from draco_tpu.core import containers
from draco_tpu.telescope import PolarisedCylinderTelescope


@pytest.fixture()
def ptel():
    return PolarisedCylinderTelescope(
        num_cylinders=2, num_feeds=2, feed_spacing=6.0, cylinder_spacing=20.0,
        latitude=45.0, freq_lower=400.0, freq_upper=420.0, num_freq=2,
        auto_correlations=True,
    )


def _hybrid_stream(tel, nra=16, nel=5):
    hv = containers.HybridVisStream(
        freq=tel.frequencies,
        pol=np.array(["XX", "YY"]),
        ew=np.array([0.0, 20.0]),
        el=np.linspace(-0.3, 0.3, nel),
        ra=nra,
    )
    hv.vis[:] = np.zeros(hv.vis.shape, dtype=np.complex64)
    hv.weight[:] = np.ones(hv.weight.shape, dtype=np.float32)
    return hv


def test_create_beam_stream_from_telescope(ptel):
    hv = _hybrid_stream(ptel)
    task = beam_mod.CreateBeamStreamFromTelescope()
    task.read_config({})
    task.setup(ptel)
    out = task.process(hv)

    assert isinstance(out, containers.HybridVisStream)
    assert out.vis.shape == hv.vis.shape

    v = np.asarray(out.vis[:])
    w = np.asarray(out.weight[:])
    assert np.isfinite(v).all()
    assert (w > 0).any()

    # At the EW=0 baseline the fringestop phase is unity, so the stream is
    # the (real, non-negative) beam power
    v0 = v[:, :, 0]  # [pol, freq, el, ra]
    assert np.abs(v0.imag).max() < 1e-5 * max(np.abs(v0).max(), 1e-30)
    assert v0.real.min() > -1e-6

    # Beam power peaks at the meridian (RA = 0 <-> HA = 0) at zenith el
    ra_axis = np.asarray(out.ra)
    el_axis = np.asarray(out.index_map["el"])
    iz = np.argmin(np.abs(el_axis))
    ir0 = np.argmin(np.abs(((ra_axis + 180) % 360) - 180))
    prof = v0[0, 0, iz].real
    assert prof[ir0] == prof.max()
    assert prof[ir0] > 0

    # The nonzero EW baseline picks up a fringe: phase varies across RA
    v1 = v[:, :, 1, :, :]
    nz = np.abs(v1) > 1e-8
    assert (np.abs(v1.imag)[nz] > 0).any()


def test_create_beam_stream_el_mismatch(ptel):
    hv = _hybrid_stream(ptel)
    maker = beam_mod.CreateBeamStreamFromTelescope()
    maker.read_config({})
    maker.setup(ptel)
    beam = maker._evaluate_beam(hv)

    hv_bad = containers.HybridVisStream(
        freq=ptel.frequencies, pol=np.array(["XX", "YY"]),
        ew=np.array([0.0, 20.0]), el=np.linspace(-0.5, 0.5, 5), ra=16,
    )
    task = beam_mod.CreateBeamStream()
    task.read_config({})
    task.setup(ptel)
    with pytest.raises(RuntimeError):
        task.process(hv_bad, beam)
