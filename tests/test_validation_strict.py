"""Strict-validation regressions: typos must fail loudly.

Covers the silent-swallow paths found in review: unknown container
constructor kwargs, unknown YAML task params at *run* time (not just
lint), attr/metadata round-trip fidelity, and stale reverse maps after
on-load axis selections.
"""

import numpy as np
import pytest

from draco_tpu.core import containers, pipeline


def make_stream(nfreq=4, nfeed=4, nra=16):
    freq = np.linspace(800.0, 750.0, nfreq)
    ss = containers.SiderealStream(freq=freq, input=nfeed, ra=nra)
    ss.vis[:] = 1.0
    ss.weight[:] = 1.0
    return ss


def test_unknown_container_kwarg_raises():
    with pytest.raises(TypeError, match="freqq"):
        containers.SiderealStream(freq=4, freqq=99, input=4, ra=16)


def test_typoed_axis_override_raises():
    ss = make_stream()
    with pytest.raises(TypeError, match="stakc"):
        containers.empty_like(ss, stakc=np.arange(3))


def test_explicit_none_axis_still_allowed():
    # explicit None suppresses inheritance so the subclass derives the
    # axis itself — must stay accepted
    ss = make_stream()
    new = containers.SiderealStream(axes_from=ss, stack=None)
    assert len(new.index_map["stack"]) == len(ss.index_map["stack"])


def test_run_rejects_unknown_task_params():
    cfg = """
pipeline:
  tasks:
    - type: draco_tpu.util.testing.RandomFreqData
      out: data
      params:
        num_realisation: 1
        not_a_real_param: 7
"""
    man = pipeline.Manager.from_yaml_str(cfg)
    with pytest.raises(Exception, match="not_a_real_param"):
        man.run()


def test_json_attr_roundtrip(tmp_path):
    ss = make_stream()
    ss.attrs["obs_params"] = {"a": 1, "b": [1, 2, 3]}
    ss.attrs["tag"] = "plain-string"
    path = str(tmp_path / "s.h5")
    ss.save(path)
    loaded = containers.SiderealStream.from_file(path)
    assert loaded.attrs["obs_params"] == {"a": 1, "b": [1, 2, 3]}
    assert loaded.attrs["tag"] == "plain-string"


def test_dataset_attrs_roundtrip(tmp_path):
    ss = make_stream()
    ss.datasets["vis"].attrs["units"] = "Jy"
    path = str(tmp_path / "s.h5")
    ss.save(path)
    loaded = containers.SiderealStream.from_file(path)
    assert loaded.datasets["vis"].attrs["units"] == "Jy"


def test_history_dict_roundtrip(tmp_path):
    ss = make_stream()
    ss.history["versions"] = {"numpy": "2.0"}
    ss.history["config"] = "pipeline: {}"
    path = str(tmp_path / "s.h5")
    ss.save(path)
    loaded = containers.SiderealStream.from_file(path)
    assert loaded.history["versions"] == {"numpy": "2.0"}
    assert loaded.history["config"] == "pipeline: {}"


def test_concatenate_tod_keeps_dataset_attrs():
    a = make_stream(nra=8)
    a.datasets["vis"].attrs["units"] = "Jy"
    b = make_stream(nra=8)
    b.index_map["ra"] = b.index_map["ra"] + 180.0
    out = containers.concatenate_tod([a, b])
    assert out.datasets["vis"].attrs["units"] == "Jy"
    assert out.vis.shape[-1] == 16


def test_selection_drops_stale_reverse_map(tmp_path):
    ss = make_stream()
    path = str(tmp_path / "s.h5")
    ss.save(path)
    assert "stack" in ss.reverse_map
    loaded = containers.SiderealStream.from_file(
        path, sel={"stack": slice(0, 3)}
    )
    # the sliced stack axis invalidates prod->stack indices
    assert "stack" not in loaded.reverse_map
    full = containers.SiderealStream.from_file(path)
    assert "stack" in full.reverse_map


def test_bare_class_name_task_type_is_diagnosed():
    cfg = """
pipeline:
  tasks:
    - type: MModeTransform
      out: x
"""
    man = pipeline.Manager.from_yaml_str(cfg)
    with pytest.raises(pipeline.PipelineRuntimeError, match="MModeTransform"):
        man.run()


def test_get_sht_cache_key_normalised():
    from draco_tpu.ops import sht

    a = sht.get_sht(8)
    b = sht.get_sht(8, 23, 23)
    assert a is b
