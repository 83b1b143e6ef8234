"""Storage bit-truncation (reference-parity lossy save feature).

The reference marks datasets for mantissa truncation before compression
(reference draco/core/containers.py:510-523); the algorithm lives in
its caput dependency. These tests pin our native implementation's
invariants: error bounds, idempotency, special values, weight-derived
tolerances, spec wiring, and the compression win that is the point of
the feature.
"""

import os

import numpy as np
import pytest

from draco_tpu.core import containers
from draco_tpu.core.task import ContainerTask, PipelineStopIteration
from draco_tpu.core.truncate import (
    DEFAULT_PRECISION,
    bit_truncate,
    bit_truncate_relative,
    bit_truncate_weights,
)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("prec", [1e-2, 1e-5, 1e-7])
def test_relative_error_bound_and_idempotency(rng, dtype, prec):
    x = (rng.standard_normal(20000) * 10 ** rng.uniform(-8, 8, 20000)).astype(dtype)
    y = bit_truncate_relative(x, prec)
    assert y.dtype == x.dtype
    assert np.all(np.abs(y - x) <= prec * np.abs(x))
    # truncation is a projection: applying it twice changes nothing
    assert np.array_equal(bit_truncate_relative(y, prec), y)


def test_weight_tolerance_bound(rng):
    x = rng.standard_normal(5000).astype(np.float32) * 100
    w = rng.uniform(1e-4, 1e4, x.shape)
    w[::13] = 0.0
    vi = 1e-3
    y = bit_truncate_weights(x, w, variance_increase=vi)
    good = w > 0
    assert np.all(np.abs(y - x)[good] <= np.sqrt(vi / w[good]))
    # zero weight falls back to relative truncation, not unbounded error
    assert np.all(
        np.abs(y - x)[~good] <= DEFAULT_PRECISION * np.abs(x)[~good]
    )


def test_values_below_tolerance_flush_to_zero():
    x = np.array([1e-8, -3e-7, 2.0], dtype=np.float32)
    y = bit_truncate(x, 1e-6)
    assert y[0] == 0.0 and y[1] == 0.0 and y[2] != 0.0


def test_special_values_pass_through():
    x = np.array([np.nan, np.inf, -np.inf, 0.0, -0.0, 1e-42], dtype=np.float32)
    y = bit_truncate_relative(x, 1e-3)
    assert np.isnan(y[0])
    assert y[1] == np.inf and y[2] == -np.inf
    assert y[3] == 0.0 and y[4] == 0.0
    # subnormals are left alone (never rounded into garbage)
    assert y[5] == x[5]


def test_max_float_does_not_overflow_to_inf():
    x = np.array([3.4e38, -3.4e38], dtype=np.float32)
    y = bit_truncate_relative(x, 0.5)
    assert np.all(np.isfinite(y))


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_complex_truncates_both_parts(rng, dtype):
    x = (rng.standard_normal(4000) + 1j * rng.standard_normal(4000)).astype(dtype)
    tol = 1e-4
    y = bit_truncate(x, tol)
    assert y.dtype == x.dtype
    assert np.all(np.abs(y.real - x.real) <= tol)
    assert np.all(np.abs(y.imag - x.imag) <= tol)
    assert np.any(y != x)


def test_non_float_dtypes_untouched():
    x = np.arange(10, dtype=np.int32)
    assert np.array_equal(bit_truncate(x, 1e-3), x)


def test_truncation_improves_compression(rng):
    import zlib

    x = rng.standard_normal(1 << 16).astype(np.float32)
    w = np.full(x.shape, 1.0)
    raw = len(zlib.compress(x.tobytes(), 4))
    tr = len(zlib.compress(bit_truncate_weights(x, w).tobytes(), 4))
    # the whole point of the feature: markedly smaller compressed data
    assert tr < 0.7 * raw


def _make_stream(rng, ntime=64, nfreq=4, nstack=6):
    ss = containers.SiderealStream(
        freq=np.linspace(400.0, 500.0, nfreq),
        stack=nstack,
        input=4,
        ra=ntime,
    )
    vis = rng.standard_normal((nfreq, nstack, ntime)) + 1j * rng.standard_normal(
        (nfreq, nstack, ntime)
    )
    ss.vis[:] = vis.astype(np.complex64)
    ss.weight[:] = rng.uniform(10.0, 1000.0, (nfreq, nstack, ntime)).astype(
        np.float32
    )
    return ss


def test_save_truncate_roundtrip(tmp_path, rng):
    ss = _make_stream(rng)
    vis0 = np.asarray(ss.vis[:]).copy()
    w0 = np.asarray(ss.weight[:]).copy()

    lossless = str(tmp_path / "lossless.h5")
    lossy = str(tmp_path / "lossy.h5")
    ss.save(lossless)
    ss.save(lossy, truncate=True)

    back = containers.SiderealStream.from_file(lossy, distributed=False)
    vis1 = np.asarray(back.vis[:])
    w1 = np.asarray(back.weight[:])

    # vis tolerance comes from the weights (inverse variance)
    tol = np.sqrt(1e-3 / w0)
    assert np.all(np.abs(vis1.real - vis0.real) <= tol)
    assert np.all(np.abs(vis1.imag - vis0.imag) <= tol)
    # the weights themselves are truncated relatively
    assert np.all(np.abs(w1 - w0) <= DEFAULT_PRECISION * np.abs(w0))
    # default save stays lossless
    exact = containers.SiderealStream.from_file(lossless, distributed=False)
    assert np.array_equal(np.asarray(exact.vis[:]), vis0)
    # and the in-memory container was not mutated by the lossy save
    assert np.array_equal(np.asarray(ss.vis[:]), vis0)

    assert os.path.getsize(lossy) < os.path.getsize(lossless)


class EmitStream(ContainerTask):
    """One-shot source emitting a SiderealStream (for the config test)."""

    def __init__(self):
        super().__init__()
        self._emitted = False

    def process(self):
        if self._emitted:
            raise PipelineStopIteration()
        self._emitted = True
        ss = _make_stream(np.random.default_rng(7), ntime=32, nfreq=2, nstack=3)
        ss.attrs["tag"] = "t0"
        return ss


def test_task_truncate_config(tmp_path):
    """The base-task `truncate` param threads through to saved files."""
    from draco_tpu.core.pipeline import Manager

    cfg_t = f"""
pipeline:
  tasks:
    - type: tests.test_truncate.EmitStream
      out: data
      params:
        save: true
        truncate: true
        output_name: "{tmp_path}/lossy_{{tag}}.h5"
"""
    cfg_l = cfg_t.replace("truncate: true", "truncate: false").replace(
        "lossy", "lossless"
    )
    Manager.from_yaml_str(cfg_t).run()
    Manager.from_yaml_str(cfg_l).run()
    lossy = tmp_path / "lossy_t0.h5"
    lossless = tmp_path / "lossless_t0.h5"
    assert lossy.exists() and lossless.exists()
    a = containers.SiderealStream.from_file(str(lossy), distributed=False)
    b = containers.SiderealStream.from_file(str(lossless), distributed=False)
    va, vb = np.asarray(a.vis[:]), np.asarray(b.vis[:])
    assert not np.array_equal(va, vb)  # truncation actually happened
    w = np.asarray(b.weight[:])
    tol = np.sqrt(1e-3 / w)
    assert np.all(np.abs(va.real - vb.real) <= tol)
    assert np.all(np.abs(va.imag - vb.imag) <= tol)
