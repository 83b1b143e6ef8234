"""Mock catalog pipeline tests: selfunc -> pdf -> catalog draw -> z errors."""

import numpy as np
import pytest

from draco_tpu.core import containers
from draco_tpu.core.task import PipelineStopIteration
from draco_tpu.ops import healpix as hpx
from draco_tpu.synthesis import mockcatalog as mc


def _make_catalog(rng, nsrc=2000, z_range=(0.9, 2.4)):
    cat = containers.SpectroscopicCatalog(object_id=np.arange(nsrc))
    pos = np.zeros(nsrc, dtype=[("ra", np.float64), ("dec", np.float64)])
    # Concentrate sources in one hemisphere so the selfunc is non-trivial
    pos["ra"] = rng.uniform(0, 180.0, nsrc)
    pos["dec"] = rng.uniform(-30.0, 60.0, nsrc)
    red = np.zeros(nsrc, dtype=[("z", np.float64), ("z_error", np.float64)])
    red["z"] = rng.uniform(*z_range, nsrc)
    cat["position"][:] = pos
    cat["redshift"][:] = red
    return cat


def test_cat_to_maps_counts(rng):
    cat = _make_catalog(rng, nsrc=500)
    zlims = np.linspace(0.8, 2.5, 9)
    maps = mc._cat_to_maps(cat, 8, zlims)
    assert maps.shape == (8, hpx.npix_of(8))
    assert maps.sum() == 500  # every source lands in exactly one cell


def test_selection_function_estimator(rng):
    cat = _make_catalog(rng)
    task = mc.SelectionFunctionEstimator()
    task.read_config({"nside": 8, "n_z": 8, "n_modes": 3})
    sf = task.process(cat)
    m = np.asarray(sf.map[:])
    assert m.shape[0] == 8
    assert (m >= 0).all()
    # Selection function concentrated where the sources are (RA < 180)
    theta, phi = hpx.pix2ang(8)
    occupied = m[:, 0, :].sum(axis=0)
    in_ra = np.degrees(phi) < 180
    assert occupied[in_ra].sum() > 5 * occupied[~in_ra].sum()


def test_resize_selection_function(rng):
    cat = _make_catalog(rng)
    est = mc.SelectionFunctionEstimator()
    est.read_config({"nside": 8, "n_z": 8, "n_modes": 3})
    sf = est.process(cat)

    # Source map at different resolution + frequency sampling
    zlims = np.linspace(0.9, 2.4, 17)
    zc = 0.5 * (zlims[:-1] + zlims[1:])
    freq = mc._zlims_to_freq(zc, zlims)
    smap = containers.Map(nside=16, polarisation=False, freq=freq)
    smap.map[:] = np.zeros(smap.map.shape)

    task = mc.ResizeSelectionFunctionMap()
    task.read_config({"smooth": True})
    out = task.process(sf, smap)
    m = np.asarray(out.map[:])
    assert m.shape == (16, 1, hpx.npix_of(16))
    assert (m >= 0).all() and np.isfinite(m).all()
    assert m.sum() > 0


def test_pdf_generators(rng):
    zlims = np.linspace(0.9, 2.4, 9)
    zc = 0.5 * (zlims[:-1] + zlims[1:])
    freq = mc._zlims_to_freq(zc, zlims)
    smap = containers.Map(nside=8, polarisation=False, freq=freq)
    smap.map[:] = np.zeros(smap.map.shape)

    task = mc.PdfGeneratorNoSelectionFunction()
    task.read_config({})
    pdf = task.process(smap)
    p = np.asarray(pdf.map[:])[:, 0, :]
    # Total probability = 1, uniform over z bins
    assert np.isclose(p.sum(), 1.0)
    assert np.allclose(p.sum(axis=1), 1.0 / 8)

    # With a selection function restricted to half the sky
    sf = containers.Map(nside=8, polarisation=False, freq=freq)
    sfm = np.zeros(sf.map.shape)
    theta, phi = hpx.pix2ang(8)
    sfm[:, 0, np.degrees(phi) < 180] = 1.0
    sf.map[:] = sfm

    task2 = mc.PdfGeneratorWithSelectionFunction()
    task2.read_config({"tracer": "QSO"})
    pdf2 = task2.process(smap, sf)
    p2 = np.asarray(pdf2.map[:])[:, 0, :]
    assert np.isclose(p2.sum(), 1.0)
    assert p2[:, np.degrees(phi) >= 180].sum() == 0
    assert pdf2.attrs["tracer"] == "QSO"


def test_mock_catalog_generator(rng):
    zlims = np.linspace(0.9, 2.4, 9)
    zc = 0.5 * (zlims[:-1] + zlims[1:])
    freq = mc._zlims_to_freq(zc, zlims)
    pdf = containers.Map(nside=8, polarisation=False, freq=freq)
    pm = np.zeros(pdf.map.shape)
    theta, phi = hpx.pix2ang(8)
    sel = np.degrees(phi) < 180
    pm[:, 0, sel] = 1.0 / (8 * sel.sum())
    pdf.map[:] = pm

    task = mc.MockCatalogGenerator()
    task.read_config({"nsource": 500, "ncat": 2, "seed": 3})
    task.setup(pdf)

    cat1 = task.process()
    assert len(cat1.index_map["object_id"]) == 500
    ra = np.asarray(cat1["position"][:]["ra"])
    z = np.asarray(cat1["redshift"][:]["z"])
    # All sources in the allowed hemisphere (within pixel dither)
    assert (np.sort(ra)[25:] < 185).all()
    assert (z > 0.85).all() and (z < 2.45).all()

    task.process()
    with pytest.raises(PipelineStopIteration):
        task.process()


def test_z_error_tasks(rng):
    cat = _make_catalog(rng, nsrc=5000)
    z0 = np.asarray(cat["redshift"][:]["z"]).copy()

    g = mc.AddGaussianZErrorsToCatalog()
    g.read_config({"sigma": 0.01, "sigma_type": "sigma_z", "seed": 5})
    out = g.process(cat)
    dz = np.asarray(out["redshift"][:]["z"]) - z0
    assert 0.008 < dz.std() < 0.012
    assert abs(dz.mean()) < 0.001

    # eBOSS QSO errors: dv two-Gaussian, scaled by (1+z)/c
    cat2 = _make_catalog(rng, nsrc=5000)
    z0 = np.asarray(cat2["redshift"][:]["z"]).copy()
    e = mc.AddEBOSSZErrorsToCatalog()
    e.read_config({"tracer": "QSO", "seed": 6})
    out2 = e.process(cat2)
    dv = (np.asarray(out2["redshift"][:]["z"]) - z0) / (1 + z0) * 299792.458
    # Core of the distribution ~150 km/s, tail from the 1000 km/s component
    assert 100 < np.percentile(np.abs(dv), 60) < 300
    assert np.abs(dv).max() > 500

    # Tracer auto-detection from attrs
    cat3 = _make_catalog(rng, nsrc=100)
    cat3.attrs["tracer"] = "LRG"
    e2 = mc.AddEBOSSZErrorsToCatalog()
    e2.read_config({"seed": 7})
    e2.process(cat3)


def test_map_pixel_location_generator():
    zlims = np.linspace(0.9, 2.4, 5)
    zc = 0.5 * (zlims[:-1] + zlims[1:])
    freq = mc._zlims_to_freq(zc, zlims)
    m = containers.Map(nside=4, polarisation=False, freq=freq)

    task = mc.MapPixelLocationGenerator()
    task.read_config({"freq_idx": 1})
    task.setup(m)
    cat = task.process()
    assert len(cat.index_map["object_id"]) == hpx.npix_of(4)
    z = np.asarray(cat["redshift"][:]["z"])
    assert np.allclose(z, z[0])
    with pytest.raises(PipelineStopIteration):
        task.process()


def test_ring_nest_roundtrip():
    for nside in (1, 2, 8, 32):
        npix = hpx.npix_of(nside)
        r2n = np.asarray(hpx.ring2nest(nside, np.arange(npix)))
        n2r = np.asarray(hpx.nest2ring(nside, np.arange(npix)))
        assert np.array_equal(np.sort(r2n), np.arange(npix))
        assert np.array_equal(n2r[r2n], np.arange(npix))
    # Known healpy values, nside=2: ring2nest of first ring
    assert list(hpx.ring2nest(2, np.arange(4))) == [3, 7, 11, 15]


def test_ud_grade():
    rng = np.random.default_rng(0)
    m = rng.standard_normal(hpx.npix_of(8))
    d = hpx.ud_grade(m, 4)
    assert d.shape[-1] == hpx.npix_of(4)
    assert np.isclose(d.mean(), m.mean())  # averaging preserves the mean
    u = hpx.ud_grade(d, 8)
    assert np.allclose(hpx.ud_grade(u, 4), d)  # parent/child consistency
    assert np.allclose(hpx.ud_grade(np.ones(hpx.npix_of(4)), 16), 1.0)
