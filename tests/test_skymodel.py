"""Tests for the Gaussian sky models (the cora-makesky equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np

from draco_tpu.core.containers import Map
from draco_tpu.synthesis import skymodel as sm


def test_realisation_covariance():
    """Recovered alm covariance matches the requested C_l(nu1, nu2)."""
    lmax, nfreq = 47, 4
    cl = np.ones((lmax + 1, nfreq, nfreq)) * 0.5 + 0.5 * np.eye(nfreq)

    acc = np.zeros((nfreq, nfreq))
    nreal = 20
    for s in range(nreal):
        alm = np.asarray(
            sm.gaussian_realisation_alm(jax.random.PRNGKey(s), jnp.asarray(cl))
        )
        ls = np.arange(lmax + 1)[:, None]
        ms = np.arange(lmax + 1)[None, :]
        valid = (ms <= ls) & (ms > 0)
        a = alm[:, valid]
        acc += (a @ a.conj().T).real / a.shape[1]
    cov = acc / nreal

    assert np.allclose(np.diag(cov), 1.0, atol=0.1)
    off = cov[~np.eye(nfreq, dtype=bool)]
    assert np.allclose(off, 0.5, atol=0.1)

    # m = 0 coefficients are real; m > l strictly zero
    alm = np.asarray(
        sm.gaussian_realisation_alm(jax.random.PRNGKey(99), jnp.asarray(cl))
    )
    assert np.abs(alm[:, :, 0].imag).max() == 0.0
    assert np.abs(alm * (ms > ls)).max() == 0.0


def test_sck_spectrum_shape():
    """SCK foreground C_l follows the published power laws."""
    syn = sm.Synchrotron()
    c1 = syn.angular_powerspectrum(100.0, 130.0, 130.0)
    c2 = syn.angular_powerspectrum(200.0, 130.0, 130.0)
    assert np.isclose(c1 / c2, 2.0**syn.alpha)
    c3 = syn.angular_powerspectrum(100.0, 260.0, 260.0)
    assert np.isclose(c1 / c3, 4.0**syn.beta)
    # At the pivot (l_ref, nu_ref) the amplitude is A
    assert np.isclose(syn.angular_powerspectrum(1000.0, 130.0, 130.0), syn.A)
    # Frequency decorrelation < 1 and symmetric
    r = syn.angular_powerspectrum(100.0, 400.0, 500.0) / np.sqrt(
        syn.angular_powerspectrum(100.0, 400.0, 400.0)
        * syn.angular_powerspectrum(100.0, 500.0, 500.0)
    )
    assert 0.0 < r < 1.0

    combined = sm.CombinedForeground()
    tot = combined.angular_powerspectrum(100.0, 130.0, 130.0)
    assert tot > c1  # sum of components exceeds any single one


def test_make_sky_container():
    m = sm.make_sky("synchrotron", nside=16, nfreq=4, seed=1)
    assert isinstance(m, Map)
    assert m.map.shape == (4, 1, 3072)
    mp = np.asarray(m.map[:])
    assert np.isfinite(mp).all() and mp.std() > 0

    # Synchrotron is nearly fully correlated across a narrow band
    c = np.corrcoef(mp[:, 0])
    assert c[0, -1] > 0.99

    # 21cm decorrelates across the band (corr_width << band)
    m21 = sm.make_sky("21cm", nside=16, nfreq=4, seed=1)
    c21 = np.corrcoef(np.asarray(m21.map[:])[:, 0])
    assert abs(c21[0, -1]) < 0.3

    # Polarised: 4 Stokes, Q/U at roughly the polarisation fraction
    mpol = sm.make_sky("synchrotron", nside=16, nfreq=2, seed=2, pol=True)
    arr = np.asarray(mpol.map[:])
    assert arr.shape[1] == 4
    frac = arr[:, 1].std() / arr[:, 0].std()
    assert 0.1 < frac < 0.6
    assert np.all(arr[:, 3] == 0.0)  # V unpolarised


def test_generate_gaussian_sky_task():
    from draco_tpu.core.task import PipelineStopIteration

    task = sm.GenerateGaussianSky()
    task.read_config(
        {"model": "21cm", "nside": 16, "nfreq": 2, "num_realisations": 2,
         "seed": 7}
    )
    task.setup()
    m1 = task.process()
    m2 = task.process()
    assert m1.attrs["tag"] == "21cm_0" and m2.attrs["tag"] == "21cm_1"
    assert not np.allclose(np.asarray(m1.map[:]), np.asarray(m2.map[:]))
    try:
        task.process()
        raise AssertionError("expected PipelineStopIteration")
    except PipelineStopIteration:
        pass


def test_makesky_cli(tmp_path):
    from draco_tpu.core.pipeline import main

    out = str(tmp_path / "sky.h5")
    rc = main(["makesky", "pointsource", out, "--nside", "16", "--nfreq", "2"])
    assert rc == 0
    m = Map.from_file(out)
    assert m.map.shape == (2, 1, 3072)


def test_makeproducts_cli(tmp_path):
    """drift-makeproducts-style config generates and saves products."""
    from draco_tpu.core.pipeline import main
    from draco_tpu.telescope.manager import ProductManager

    cfg = tmp_path / "products.yaml"
    cfg.write_text(
        """
config:
    beamtransfers: Yes
    output_directory: "products/"

telescope:
    type: PolarisedCylinder
    freq_lower: 400.0
    freq_upper: 410.0
    num_freq: 2
    num_cylinders: 1
    num_feeds: 2
    cylinder_width: 5.0
    feed_spacing: 0.6
    auto_correlations: Yes
"""
    )
    rc = main(["makeproducts", str(cfg)])
    assert rc == 0
    assert (tmp_path / "products" / "bt" / "beam_m.npy").exists()

    man = ProductManager.from_config(str(cfg))
    assert man.beamtransfer.ntel > 0
