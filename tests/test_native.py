"""Native host-kernel tests: C/OpenMP weighted medians match numpy."""

import os

import numpy as np
import pytest

from draco_tpu import native
from draco_tpu.ops import median as median_ops


@pytest.fixture()
def _reset_native():
    yield
    os.environ.pop("DRACO_TPU_NO_NATIVE", None)
    native._lib = None


def test_native_builds():
    assert native.available(), "native kernel library failed to build"


def test_native_weighted_median_matches(rng, _reset_native):
    x = rng.standard_normal((10, 200))
    w = (rng.uniform(size=x.shape) > 0.3).astype(float) * rng.uniform(
        0.5, 2.0, x.shape
    )

    native._lib = None
    a = median_ops.weighted_median(x, w)

    os.environ["DRACO_TPU_NO_NATIVE"] = "1"
    native._lib = None
    b = median_ops.weighted_median(x, w)

    assert np.allclose(a, b)


def test_native_moving_weighted_median_matches(rng, _reset_native):
    x = rng.standard_normal((24, 40))
    w = (rng.uniform(size=x.shape) > 0.25).astype(float)

    native._lib = None
    a = median_ops.moving_weighted_median(x, w, (5, 9))

    os.environ["DRACO_TPU_NO_NATIVE"] = "1"
    native._lib = None
    b = median_ops.moving_weighted_median(x, w, (5, 9))

    assert np.allclose(a, b)
