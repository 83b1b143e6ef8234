"""Source stacking tests: known injected signal recovered at zero offset."""

import numpy as np
import pytest

from draco_tpu.analysis import sourcestack
from draco_tpu.core import containers
from draco_tpu.core.task import PipelineStopIteration

NU21 = sourcestack.NU21


def _formed_beam(rng, nsrc=20, nfreq=101, npol=1, amp=3.0):
    """FormedBeam with a spike of `amp` at each source's own frequency bin."""
    freq = np.linspace(600.0, 700.0, nfreq)
    df = freq[1] - freq[0]

    pol = np.array(["I"] if npol == 1 else ["XX", "YY"])
    fb = containers.FormedBeam(
        object_id=np.arange(nsrc), freq=freq, pol=pol
    )
    fb.add_dataset("redshift")

    # Sources placed exactly at channel centres (away from band edges)
    src_chan = rng.integers(25, nfreq - 25, nsrc)
    z = NU21 / freq[src_chan] - 1.0
    red = np.zeros(nsrc, dtype=[("z", np.float64), ("z_error", np.float64)])
    red["z"] = z
    fb["redshift"][:] = red

    beam = np.zeros((nsrc, npol, nfreq))
    beam[np.arange(nsrc), :, src_chan] = amp
    fb.beam[:] = beam
    fb.weight[:] = np.ones((nsrc, npol, nfreq))
    return fb, src_chan, df


def test_source_stack_recovers_signal(rng):
    fb, src_chan, df = _formed_beam(rng)

    task = sourcestack.SourceStack()
    task.read_config({"freqside": 10})
    out = task.process(fb)

    assert isinstance(out, containers.FrequencyStack)
    s = np.asarray(out.stack[:])
    w = np.asarray(out.weight[:])
    offsets = np.asarray(out.index_map["freq"]["centre"])
    i0 = np.argmin(np.abs(offsets))
    nsrc = len(src_chan)
    # At zero offset: weighted average = amp * nsrc / nsrc = amp... each
    # source contributes amp at its own bin with weight 1
    assert np.isclose(s[i0], 3.0)
    assert w[i0] == nsrc
    # Away from zero the stack is zero
    off = np.ones(len(s), dtype=bool)
    off[i0] = False
    assert np.allclose(s[off], 0.0)


def test_source_stack_by_pol(rng):
    fb, src_chan, df = _formed_beam(rng, npol=2)
    task = sourcestack.SourceStack()
    task.read_config({"freqside": 5, "uniform_weight": True})
    out = task.process(fb)
    assert isinstance(out, containers.FrequencyStackByPol)
    s = np.asarray(out.stack[:])
    i0 = np.argmin(np.abs(np.asarray(out.index_map["freq"]["centre"])))
    assert np.allclose(s[:, i0], 3.0)


def test_random_subset(rng):
    nsrc = 50
    cat = containers.SourceCatalog(object_id=np.arange(nsrc))
    pos = np.zeros(nsrc, dtype=[("ra", np.float64), ("dec", np.float64)])
    pos["ra"] = np.arange(nsrc, dtype=np.float64)
    cat["position"][:] = pos
    cat.attrs["tag"] = "full"

    task = sourcestack.RandomSubset()
    task.read_config({"number": 2, "size": 10, "seed": 7})
    task.setup(cat)

    c1 = task.process()
    assert len(c1.index_map["object_id"]) == 10
    assert c1.attrs["tag"] == "full_mock_00000"
    # Subset positions come from the parent catalog
    assert set(np.asarray(c1["position"][:]["ra"])).issubset(
        set(pos["ra"])
    )
    c2 = task.process()
    assert c2.attrs["tag"] == "full_mock_00001"
    with pytest.raises(PipelineStopIteration):
        task.process()


def test_group_source_stacks(rng):
    freq = np.zeros(5, dtype=[("centre", np.float64), ("width", np.float64)])
    freq["centre"] = np.arange(5)
    freq["width"] = 1.0

    task = sourcestack.GroupSourceStacks()
    task.read_config({"ngroup": 2})
    task.setup()

    outs = []
    for i in range(3):
        st = containers.FrequencyStack(freq=freq)
        st.stack[:] = np.full(5, float(i))
        st.weight[:] = np.ones(5)
        st.attrs["tag"] = f"mock_{i:05d}"
        outs.append(task.process(st))

    assert outs[0] is None
    grouped = outs[1]
    assert isinstance(grouped, containers.MockFrequencyStack)
    assert grouped.stack.shape == (2, 5)
    assert np.allclose(np.asarray(grouped.stack[:])[0], 0.0)
    assert np.allclose(np.asarray(grouped.stack[:])[1], 1.0)
    assert "group" in grouped.attrs["tag"]

    final = task.process_finish()
    assert final.stack.shape == (1, 5)
    assert np.allclose(np.asarray(final.stack[:])[0], 2.0)
