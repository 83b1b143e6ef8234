"""Failure-detection paths: singular solves and pipeline error surfacing.

The reference's resilience model is fail-stop with two in-algorithm
exceptions (SURVEY.md section 5): the delay Gibbs sampler records
unconverged baselines in ``spectrum_mask`` instead of aborting, and
pipeline errors must carry enough context to identify the failing task.
"""

import numpy as np
import pytest

from draco_tpu.core import pipeline
from draco_tpu.ops import delay as dops


def test_gibbs_dead_baseline_flagged_not_fatal(rng):
    """A fully-masked baseline yields success=False, finite output."""
    nfreq, ntime = 17, 12
    ndelay = 2 * (nfreq - 1)
    data = (
        rng.standard_normal((ntime, nfreq))
        + 1j * rng.standard_normal((ntime, nfreq))
    )
    # masked channels AND a null prior leave nothing to regularise the
    # signal draw: the Cholesky factorisation must fail, and the sampler
    # must report that instead of raising
    weight = np.zeros(nfreq)

    samples, success = dops.delay_power_spectrum_gibbs(
        data,
        ndelay,
        weight,
        np.zeros(ndelay),
        window="nuttall",
        niter=4,
        rng=rng,
    )
    assert not success
    assert np.all(np.isfinite(np.asarray(samples)))


def test_gibbs_good_baseline_converges(rng):
    nfreq, ntime = 17, 12
    ndelay = 2 * (nfreq - 1)
    data = (
        rng.standard_normal((ntime, nfreq))
        + 1j * rng.standard_normal((ntime, nfreq))
    )
    samples, success = dops.delay_power_spectrum_gibbs(
        data,
        ndelay,
        np.ones(nfreq),
        np.ones(ndelay) * 0.1,
        window="nuttall",
        niter=4,
        rng=rng,
    )
    assert success


_FAILING_CFG = """
pipeline:
  tasks:
    - type: draco_tpu.util.testing.DummyTask
      out: thing
      params:
        total_len: 1
        tag: boom
    - type: exploding_tasks.ExplodingTask
      in: thing
"""


def test_pipeline_surfaces_failing_task(monkeypatch):
    """An exception inside process() propagates with its message intact
    (fail-stop), rather than being swallowed by the scheduler."""
    import sys
    import types

    from draco_tpu.core.task import ContainerTask

    class ExplodingTask(ContainerTask):
        def process(self, incoming):
            raise RuntimeError("synthetic task failure")

    mod = types.ModuleType("exploding_tasks")
    mod.ExplodingTask = ExplodingTask
    monkeypatch.setitem(sys.modules, "exploding_tasks", mod)

    man = pipeline.Manager.from_yaml_str(_FAILING_CFG)
    with pytest.raises(Exception, match="synthetic task failure"):
        man.run()


from draco_tpu.core import containers
from draco_tpu.core.task import ContainerTask, PipelineStopIteration


class NaNSource(ContainerTask):
    """Source task emitting a container with a poisoned dataset."""

    def process(self):
        if self._count >= 1:
            raise PipelineStopIteration()
        c = containers.FrequencyStack(freq=np.array([400.0, 500.0]))
        arr = np.ones(c.stack.shape, dtype=np.float32)
        arr[0] = np.nan
        c.stack[:] = arr
        return c


def test_validate_finite_fails_fast():
    import yaml

    from draco_tpu.core.pipeline import Manager, PipelineRuntimeError

    cfg = """
pipeline:
  validate_finite: true
  tasks:
    - type: tests.test_failure_paths.NaNSource
      out: poisoned
"""
    with pytest.raises(PipelineRuntimeError) as err:
        Manager(yaml.safe_load(cfg)).run()
    assert "poisoned" in str(err.value)
    assert "non-finite" in str(err.value)

    # without the flag the pipeline runs through
    cfg_ok = cfg.replace("validate_finite: true", "validate_finite: false")
    products = Manager(yaml.safe_load(cfg_ok)).run()
    assert "poisoned" in products
