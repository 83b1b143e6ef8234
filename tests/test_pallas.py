"""Pallas kernel tests (interpreter mode on CPU)."""

import numpy as np
import pytest

from draco_tpu.ops import banded
from draco_tpu.ops.pallas_kernels import banded_covariance_pallas


def test_banded_covariance_pallas_matches(rng):
    m, n, bw, B = 100, 300, 5, 3
    R = rng.standard_normal((m, n)).astype(np.float32)
    Ni = rng.uniform(0.5, 2.0, (B, n)).astype(np.float32)

    ref = np.stack(
        [np.asarray(banded.banded_covariance(R, Ni[b], bw)) for b in range(B)]
    )
    out = np.asarray(
        banded_covariance_pallas(R, Ni, bw, tile_j=32, tile_t=128, interpret=True)
    )
    assert out.shape == (B, bw + 1, m)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5


def test_banded_covariance_pallas_band_structure(rng):
    # bw larger than a tile-row multiple exercises the halo padding
    m, n, bw = 64, 256, 11
    R = rng.standard_normal((m, n)).astype(np.float32)
    Ni = np.ones((1, n), dtype=np.float32)

    out = np.asarray(
        banded_covariance_pallas(R, Ni, bw, tile_j=32, tile_t=128, interpret=True)
    )[0]
    dense = R @ R.T
    for d in range(bw + 1):
        expect = np.diag(dense, -d)
        assert np.allclose(out[d, : m - d], expect, rtol=1e-4, atol=1e-3)
        # zero padding past the band end
        assert np.all(out[d, m - d :] == 0)


def test_band_wiener_pallas_path(rng):
    from draco_tpu.ops import regrid

    m, n, bw, k = 48, 120, 7, 3
    grid = np.linspace(0, 1, m)
    samples = np.sort(rng.uniform(0, 1, n))
    R = regrid.lanczos_forward_matrix(grid, samples, a=4).T.astype(np.float32)
    # R from lanczos_forward_matrix is [n, m]; band_wiener wants [m, n]
    assert R.shape == (m, n)

    Ni = rng.uniform(0.5, 2.0, (k, n)).astype(np.float32)
    y = rng.standard_normal((k, n)).astype(np.float32)
    Si = np.full(m, 1e-2, dtype=np.float32)

    import draco_tpu.ops.pallas_kernels as pk

    # Monkeypatch interpret mode into the pallas path
    orig = pk.banded_covariance_pallas

    def interp(Rm, Nim, bwm, **kw):
        kw["interpret"] = True
        return orig(Rm, Nim, bwm, **kw)

    pk_backup = regrid.band_wiener
    try:
        import draco_tpu.ops.regrid as regrid_mod

        x_ref, w_ref = regrid.band_wiener(R, Ni, Si, y, bw, use_pallas=False)

        import unittest.mock as mock

        with mock.patch.object(
            pk, "banded_covariance_pallas", side_effect=interp
        ):
            x_pl, w_pl = regrid.band_wiener(R, Ni, Si, y, bw, use_pallas=True)
    finally:
        pass

    assert np.allclose(np.asarray(x_pl), np.asarray(x_ref), rtol=1e-3, atol=1e-4)
    assert np.allclose(np.asarray(w_pl), np.asarray(w_ref), rtol=1e-3, atol=1e-4)
