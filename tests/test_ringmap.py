"""Ring-map maker tests on a small polarised cartesian grid."""

import numpy as np
import pytest

from draco_tpu.analysis import ringmapmaker
from draco_tpu.core import containers
from draco_tpu.telescope import PolarisedCylinderTelescope


@pytest.fixture(scope="module")
def cyl_setup():
    tel = PolarisedCylinderTelescope(
        num_cylinders=2,
        num_feeds=4,
        feed_spacing=1.0,
        cylinder_spacing=10.0,
        cylinder_width=10.0,
        latitude=45.0,
        num_freq=2,
        force_lmax=8,
        force_mmax=8,
        auto_correlations=True,
    )
    nra = 16
    ss = containers.SiderealStream(
        freq=tel.frequencies,
        input=tel.nfeed,
        ra=nra,
        prod=np.array([[int(a), int(b)] for a, b in tel.uniquepairs]),
    )
    rng = np.random.Generator(np.random.SFC64(11))
    ss.vis[:] = (
        rng.standard_normal(ss.vis.shape) + 1j * rng.standard_normal(ss.vis.shape)
    ).astype(np.complex64)
    ss.weight[:] = 1.0
    ss.input_flags[:] = np.ones(ss.input_flags.shape, dtype=np.float32)
    return tel, ss


def test_find_grid_indices():
    bl = np.array([[0.0, 0.0], [0.0, 2.0], [10.0, -2.0], [20.0, 4.0]])
    xind, yind, min_x, min_y = ringmapmaker.find_grid_indices(bl)
    assert np.array_equal(xind, [0, 0, 1, 2])
    assert np.array_equal(yind, [0, 1, -1, 2])
    assert min_x == 10.0 and min_y == 2.0


def test_make_vis_grid(cyl_setup):
    tel, ss = cyl_setup
    t = ringmapmaker.MakeVisGrid()
    t.read_config({})
    t.setup(tel)
    grid = t.process(ss)
    assert isinstance(grid, containers.VisGridStream)
    assert len(grid.index_map["pol"]) == 4
    assert len(grid.index_map["ew"]) == 2  # two cylinders
    # NS axis covers -3..3 separations
    assert len(grid.index_map["ns"]) == 7
    assert "redundancy" in grid.datasets
    # Hermitian structure: grid at (x=0, -y) is conj of (x=0, +y)
    gv = np.asarray(grid.vis[:])
    gw = np.asarray(grid.weight[:])
    assert np.isfinite(gv).all()
    assert gw.max() > 0


def test_full_ringmap_chain(cyl_setup):
    tel, ss = cyl_setup
    maker = ringmapmaker.RingMapMaker()
    maker.read_config({"npix": 32, "weight": "natural"})
    maker.setup(tel)
    rm = maker.process(ss)
    assert isinstance(rm, containers.RingMap)
    m = np.asarray(rm.map[:])
    assert np.isfinite(m).all()
    assert np.abs(m).max() > 0
    # beam axis: 2 * new - 1 = 3
    assert m.shape[0] == 3
    # pol axis: XX, reXY, imXY, YY
    assert list(rm.index_map["pol"]) == ["XX", "reXY", "imXY", "YY"]
    w = np.asarray(rm.datasets["weight"][:])
    assert (w >= 0).all() and w.max() > 0


def test_beamform_ns_point_source_recovery(cyl_setup):
    """A pure phase gradient in NS maps to a peak at the matching elevation."""
    tel, ss = cyl_setup
    t = ringmapmaker.MakeVisGrid()
    t.read_config({})
    t.setup(tel)
    grid = t.process(ss)

    # Overwrite the grid vis with a synthetic source at el0
    el0 = 0.25
    nspos = grid.index_map["ns"][:]
    freq = grid.freq
    iwv = freq * 1e6 / 299792458.0
    phase = np.exp(
        2j * np.pi * nspos[None, :] * el0 * iwv[:, None]
    )  # [f, ns]
    gv = np.zeros(grid.vis.shape, dtype=np.complex64)
    gv[:] = phase[None, :, None, :, None]
    grid.vis[:] = gv
    grid.weight[:] = np.ones(grid.weight.shape, dtype=np.float32)

    bf = ringmapmaker.BeamformNS()
    bf.read_config({"npix": 64, "weight": "uniform", "include_auto": True})
    hv = bf.process(grid)
    el = hv.index_map["el"]
    resp = np.abs(np.asarray(hv.vis[:]))[0, 0, 0]  # [el, ra]
    # integer-spaced NS samples produce grating lobes with period
    # 1/(min_sep * iwv); check the response at el0 is a (shared) maximum
    i0 = np.argmin(np.abs(el - el0))
    assert resp[i0, 0] > 0.95 * resp[:, 0].max()
    # and that a nearby off-peak elevation is well below the peak
    ioff = np.argmin(np.abs(el - (el0 + 0.35)))
    assert resp[ioff, 0] < 0.6 * resp[i0, 0]
