"""Streaming (factorised) beam-transfer projection == materialised path.

The streaming projections never form the B tensors (reference driftscan
stores them on disk, draco loads per m); production-scale configurations
run through these.  They must match the materialised operators exactly.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from draco_tpu.telescope import BeamTransfer, UnpolarisedDishArray
from draco_tpu.telescope.core import PolarisedCylinderTelescope


def _check(tel, nside, atol):
    bt = BeamTransfer(telescope=tel, nside=nside).generate()
    rng = np.random.Generator(np.random.SFC64(5))
    shape = (tel.nfreq, tel.num_pol_sky, tel.lmax + 1, tel.mmax + 1)
    alm = (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype(np.complex64)
    alm = np.tril(alm.swapaxes(-1, -2)).swapaxes(-1, -2)  # zero l < m

    vis_ref = np.asarray(bt.project_sky_to_telescope(alm))
    vis_str = np.asarray(
        bt.project_sky_to_telescope_streaming(alm, chunk=3)
    )
    a = np.abs(vis_ref - vis_str).max()
    assert a <= atol * max(np.abs(vis_ref).max(), 1e-12), (
        f"forward mismatch {a:.2e}"
    )

    w = rng.uniform(0.5, 1.5, vis_ref.shape).astype(np.float32)
    a_ref = np.asarray(bt.project_telescope_to_sky_dirty(vis_ref, w))
    a_str = np.asarray(
        bt.project_telescope_to_sky_dirty_streaming(vis_ref, w, chunk=3)
    )
    d = np.abs(a_ref - a_str).max()
    assert d <= atol * max(np.abs(a_ref).max(), 1e-12), (
        f"adjoint mismatch {d:.2e}"
    )


def test_streaming_matches_unpolarised():
    tel = UnpolarisedDishArray(
        grid_ew=2, grid_ns=2, spacing_ew=5.0, spacing_ns=5.0, latitude=30.0,
        freq_lower=400.0, freq_upper=450.0, num_freq=2,
        dish_width=5.0, auto_correlations=True,
        force_lmax=23, force_mmax=23,
    )
    _check(tel, nside=8, atol=2e-5)


def test_streaming_matches_polarised():
    tel = PolarisedCylinderTelescope(
        num_cylinders=2, num_feeds=2, cylinder_width=5.0,
        feed_spacing=2.0, latitude=30.0,
        freq_lower=400.0, freq_upper=450.0, num_freq=2,
        force_lmax=23, force_mmax=23,
    )
    _check(tel, nside=8, atol=2e-5)


def test_streaming_tasks_match(tmp_path):
    """SimulateSidereal + DirtyMapMaker with streaming=True == default."""
    from draco_tpu.analysis.mapmaker import DirtyMapMaker
    from draco_tpu.analysis.transform import MModeTransform
    from draco_tpu.core import containers
    from draco_tpu.synthesis.stream import SimulateSidereal

    tel = UnpolarisedDishArray(
        grid_ew=2, grid_ns=2, spacing_ew=5.0, spacing_ns=5.0, latitude=30.0,
        freq_lower=400.0, freq_upper=450.0, num_freq=2,
        dish_width=5.0, auto_correlations=True,
        force_lmax=23, force_mmax=23,
    )
    bt = BeamTransfer(telescope=tel, nside=8)

    rng = np.random.Generator(np.random.SFC64(6))
    m = containers.Map(nside=8, polarisation=False, freq=tel.frequencies)
    m.map[:] = rng.standard_normal(m.map.shape)

    outs = {}
    for streaming in (False, True):
        sim = SimulateSidereal()
        sim.read_config(
            {"streaming": streaming, "baseline_chunk": 4}
        )
        sim.setup(bt)
        ss = sim.process(m)

        mt = MModeTransform()
        mt.read_config({})
        mt.setup(tel)
        mm = mt.process(ss)

        mk = DirtyMapMaker()
        mk.read_config(
            {"nside": 8, "streaming": streaming, "baseline_chunk": 4}
        )
        mk.setup(bt)
        outs[streaming] = np.asarray(mk.process(mm).map[:])

    a, b = outs[False], outs[True]
    assert np.abs(a - b).max() <= 2e-5 * np.abs(a).max()
