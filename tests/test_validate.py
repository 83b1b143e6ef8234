"""Determinism / sharding-invariance validation subsystem tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from draco_tpu.core import containers
from draco_tpu.parallel import validate
from draco_tpu.parallel.mesh import sharding_for_axis, use_mesh


def _make_container(val=1.0):
    c = containers.FrequencyStack(freq=np.array([400.0, 500.0]))
    c.stack[:] = val
    return c


def test_fingerprint_container_stability():
    a = _make_container(2.0)
    b = _make_container(2.0)
    assert validate.fingerprint(a) == validate.fingerprint(b)
    b.stack[:] = 3.0
    fa, fb = validate.fingerprint(a), validate.fingerprint(b)
    assert set(fa) == set(fb)
    assert fa != fb


def test_compare_products_reports_the_changed_dataset():
    a = _make_container(2.0)
    b = _make_container(2.0)
    b.stack[:] = np.asarray(b.stack[:]) + 1e-3
    problems = validate.compare_products(a, b)
    assert len(problems) == 1
    assert "/stack" in problems[0]
    # a relative tolerance swallows the drift
    assert validate.compare_products(a, b, rtol=1e-2) == []


def test_assert_deterministic_pass_and_fail():
    key = jax.random.PRNGKey(0)
    fn = jax.jit(lambda: jax.random.normal(key, (8,)))
    validate.assert_deterministic(fn)

    state = {"n": 0}

    def impure():
        state["n"] += 1
        return np.full(4, float(state["n"]))

    with pytest.raises(validate.DeterminismError) as err:
        validate.assert_deterministic(impure, label="impure-counter")
    assert "impure-counter" in str(err.value)


def test_assert_sharding_invariant(mesh8):
    @jax.jit
    def fn(x):
        return jnp.sum(x * 2.0, axis=0)

    x = np.arange(64, dtype=np.float32).reshape(8, 8)
    with use_mesh(mesh8):
        sharded = sharding_for_axis(2, 0)
        validate.assert_sharding_invariant(
            fn,
            [x],
            [lambda a: jnp.asarray(a), lambda a: jax.device_put(a, sharded)],
        )

    # a placement-dependent program must be caught
    def leaky(x):
        return np.asarray(x).sum() + (1.0 if hasattr(x, "sharding") and
                                      len(x.sharding.device_set) > 1 else 0.0)

    with use_mesh(mesh8):
        with pytest.raises(validate.DeterminismError):
            validate.assert_sharding_invariant(
                leaky,
                [x],
                [lambda a: jnp.asarray(a), lambda a: jax.device_put(a, sharded)],
                label="leaky",
            )


def test_check_pipeline_determinism_ok():
    cfg = """
pipeline:
  tasks:
    - type: tests.test_pipeline.EmitNumbers
      out: nums
      params:
        n_emit: 3
    - type: tests.test_pipeline.Accumulate
      in: nums
      out: total
"""
    summary = validate.check_pipeline_determinism(cfg, runs=2)
    assert summary["products"] == 2
    assert summary["arrays"] > 0


def test_check_pipeline_determinism_catches_drift():
    cfg = """
pipeline:
  tasks:
    - type: tests.test_validate.DriftingSource
      out: nums
"""
    with pytest.raises(validate.DeterminismError) as err:
        validate.check_pipeline_determinism(cfg, runs=2)
    assert "/stack" in str(err.value)


_DRIFT_STATE = {"n": 0}


from draco_tpu.core.task import ContainerTask, PipelineStopIteration  # noqa: E402


class DriftingSource(ContainerTask):
    """Source whose output depends on global state across pipeline runs."""

    def process(self):
        if self._count >= 1:
            raise PipelineStopIteration()
        _DRIFT_STATE["n"] += 1
        c = containers.FrequencyStack(freq=np.array([400.0, 500.0]))
        c.stack[:] = float(_DRIFT_STATE["n"])
        return c


def test_cli_verify(tmp_path):
    from draco_tpu.core.pipeline import main

    cfg = tmp_path / "pipe.yaml"
    cfg.write_text(
        """
pipeline:
  tasks:
    - type: tests.test_pipeline.EmitNumbers
      out: nums
      params:
        n_emit: 2
"""
    )
    assert main(["verify", str(cfg)]) == 0

    bad = tmp_path / "bad.yaml"
    bad.write_text(
        """
pipeline:
  tasks:
    - type: tests.test_validate.DriftingSource
      out: nums
"""
    )
    assert main(["verify", str(bad)]) == 1
