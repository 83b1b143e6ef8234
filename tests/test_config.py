"""Tests for the typed config Property system."""

import pytest

from draco_tpu.core import config


class _Task(config.Reader):
    alpha = config.Property(proptype=float, default=1.5)
    count = config.Property(proptype=int, default=3)
    mode = config.enum(["a", "b"], default="a")
    names = config.list_type(str, default=None)
    when = config.utc_time()


def test_defaults():
    t = _Task()
    assert t.alpha == 1.5
    assert t.count == 3
    assert t.mode == "a"
    assert t.names is None


def test_read_config():
    t = _Task.from_config(
        {"alpha": "2.5", "count": 7, "mode": "b", "names": ["x", "y"]}
    )
    assert t.alpha == 2.5
    assert t.count == 7
    assert t.mode == "b"
    assert t.names == ["x", "y"]


def test_enum_rejects_bad_value():
    with pytest.raises(config.ConfigError):
        _Task.from_config({"mode": "c"})


def test_list_type_rejects_scalar():
    with pytest.raises(config.ConfigError):
        _Task.from_config({"names": "notalist"})


def test_utc_time_parsing():
    t = _Task.from_config({"when": "2020-01-01T00:00:00+00:00"})
    assert t.when == 1577836800.0
    t2 = _Task.from_config({"when": 123.5})
    assert t2.when == 123.5


def test_unknown_key_flagged_with_compare_keys():
    t = _Task()
    with pytest.raises(config.ConfigError):
        t.read_config({"bogus": 1}, compare_keys=True)


def test_instances_independent():
    t1, t2 = _Task(), _Task()
    t1.alpha = 9.0
    assert t2.alpha == 1.5
