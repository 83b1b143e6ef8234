"""Gaussian-process resampling tests."""

import numpy as np
import pytest

from draco_tpu.analysis import sidereal
from draco_tpu.core import containers
from draco_tpu.ops import gaussian_process as gp


def test_gp_resample_smooth(rng):
    n_in, n_out = 80, 120
    xi = (np.arange(n_in) + rng.uniform(-0.2, 0.2, n_in)) / n_in
    xo = np.linspace(0.05, 0.95, n_out)

    f = lambda x: np.sin(2 * np.pi * 2 * x) + 0.5 * np.cos(2 * np.pi * 3 * x)
    data = f(xi)[None, :, None] * np.ones((3, 1, 2))
    weight = np.full(data.shape, 1e4)

    spec = {"name": "matern", "width": 5.0, "alpha": 1.0, "nu": 2.5,
            "epsilon": 1e-8}
    xout, wout = gp.resample(
        data, weight, xi=xi, xo=xo, cutoff_dist=2.0, cutoff_partition=1,
        kernel_spec=spec,
    )
    valid = wout[0, :, 0] > 0
    assert valid.sum() > 0.8 * n_out
    err = np.abs(xout[0, valid, 0] - f(xo[valid]))
    assert err.max() < 0.02


def test_gp_resample_masked_gap(rng):
    n_in, n_out = 60, 60
    xi = np.arange(n_in, dtype=float)
    xo = np.arange(n_out, dtype=float)

    data = np.cos(2 * np.pi * xi / 40)[None, :, None].copy()
    weight = np.full(data.shape, 1e4)
    weight[:, 20:35] = 0.0  # a wide gap

    spec = {"name": "matern", "width": 3.0, "alpha": 1.0, "nu": 2.5,
            "epsilon": 1e-8}
    xout, wout = gp.resample(
        data, weight, xi=xi, xo=xo, cutoff_dist=1.7, cutoff_partition=1,
        kernel_spec=spec,
    )
    # Deep inside the gap the output must be masked
    assert (wout[0, 25:30, 0] == 0).all()
    # Well-sampled regions interpolate accurately
    good = wout[0, :, 0] > 0
    err = np.abs(xout[0, good, 0] - np.cos(2 * np.pi * xo[good] / 40))
    assert err.max() < 0.05


def test_sidereal_regridder_gp(rng):
    from draco_tpu.telescope import UnpolarisedDishArray

    tel = UnpolarisedDishArray(
        grid_ew=2, grid_ns=1, spacing_ew=6.0, latitude=45.0,
        freq_lower=400.0, freq_upper=410.0, num_freq=2,
    )

    nra_in, nra_out = 96, 64
    lsd0 = 100
    ts = containers.TimeStream(
        freq=tel.frequencies, stack=2, input=3, prod=2,
        time=tel.lsd_to_unix(lsd0 + np.linspace(0, 1, nra_in, endpoint=False)),
    )
    ra_in = np.linspace(0, 1, nra_in, endpoint=False)
    signal = np.cos(2 * np.pi * 3 * ra_in)
    ts.vis[:] = np.broadcast_to(
        signal, (2, 2, nra_in)
    ).astype(np.complex64)
    ts.weight[:] = np.full(ts.weight.shape, 1e4, dtype=np.float32)
    ts.attrs["lsd"] = lsd0

    task = sidereal.SiderealRegridderGP()
    task.read_config({"samples": nra_out, "kernel_width": 5})
    task.setup(tel)
    out = task.process(ts)

    assert out.vis.shape[-1] == nra_out
    v = np.asarray(out.vis[:]).real
    w = np.asarray(out.weight[:])
    ra_out = np.asarray(out.ra) / 360.0
    expect = np.cos(2 * np.pi * 3 * ra_out)
    good = w[0, 0] > 0
    # Edges can be masked; interior is accurate
    assert good.sum() > 0.7 * nra_out
    assert np.abs(v[0, 0, good] - expect[good]).max() < 0.05
