"""On-disk interop with reference-draco-layout HDF5 files.

The reference stack is not installed here (caput/memh5 are external), so
these fixtures are written with raw h5py following the reference's
serialisation exactly: datasets at the file root carrying an ``axis``
attribute of byte strings, ``index_map/`` and ``reverse_map/`` groups,
and pipeline provenance under ``history`` (reference
draco/core/containers.py:489-570 for the SiderealStream spec; caput
memh5 layout as exercised by reference test/test_io.py:44-189 and
test/test_selections.py:33-60).  No draco_tpu writer code is involved in
building the fixture — it must load purely through the reader.
"""

import h5py
import numpy as np
import pytest

from draco_tpu.core import containers


@pytest.fixture
def reference_file(tmp_path):
    """A SiderealStream file as the reference would write it."""
    path = str(tmp_path / "sstream_lsd_1234.h5")
    nfreq, ninput, nra = 4, 3, 16
    prods = [(i, j) for i in range(ninput) for j in range(i, ninput)]
    nprod = len(prods)

    rng = np.random.Generator(np.random.SFC64(8))
    vis = (
        rng.standard_normal((nfreq, nprod, nra))
        + 1j * rng.standard_normal((nfreq, nprod, nra))
    ).astype(np.complex64)
    weight = rng.random((nfreq, nprod, nra)).astype(np.float32)

    with h5py.File(path, "w") as f:
        f.attrs["tag"] = "lsd_1234"
        f.attrs["lsd"] = 1234

        im = f.create_group("index_map")
        freq = np.zeros(
            nfreq, dtype=[("centre", "<f8"), ("width", "<f8")]
        )
        freq["centre"] = np.linspace(800.0, 750.0, nfreq)
        freq["width"] = 50.0 / nfreq
        im.create_dataset("freq", data=freq)
        im.create_dataset(
            "input",
            data=np.array(
                [(i, f"ch{i:04d}".encode()) for i in range(ninput)],
                dtype=[("chan_id", "<u2"), ("correlator_input", "S32")],
            ),
        )
        prod = np.array(prods, dtype=[("input_a", "<u2"), ("input_b", "<u2")])
        im.create_dataset("prod", data=prod)
        stack = np.zeros(nprod, dtype=[("prod", "<u4"), ("conjugate", "u1")])
        stack["prod"] = np.arange(nprod)
        im.create_dataset("stack", data=stack)
        im.create_dataset(
            "ra", data=np.linspace(0.0, 360.0, nra, endpoint=False)
        )

        rm = f.create_group("reverse_map")
        rstack = np.zeros(nprod, dtype=[("stack", "<u4"), ("conjugate", "u1")])
        rstack["stack"] = np.arange(nprod)
        rm.create_dataset("stack", data=rstack)

        def write(name, arr, axes):
            d = f.create_dataset(name, data=arr)
            d.attrs["axis"] = np.array([a.encode() for a in axes])

        write("vis", vis, ["freq", "stack", "ra"])
        write("vis_weight", weight, ["freq", "stack", "ra"])
        write(
            "input_flags",
            np.ones((ninput, nra), np.float32),
            ["input", "ra"],
        )

        hist = f.create_group("history")
        hist.attrs["config"] = "{}"
        hist.attrs["versions"] = '{"draco": "25.1"}'

    return path, vis, weight


def test_reference_layout_loads(reference_file):
    path, vis, weight = reference_file
    ss = containers.SiderealStream.from_file(path)

    assert np.array_equal(np.asarray(ss.vis[:]), vis)
    assert np.array_equal(np.asarray(ss.weight[:]), weight)
    assert ss.vis.axes == ("freq", "stack", "ra")
    assert len(ss.ra) == 16
    assert np.allclose(ss.freq, np.linspace(800.0, 750.0, 4))
    assert ss.attrs["lsd"] == 1234
    assert "stack" in ss.reverse_map


def test_reference_layout_loads_via_base_dispatch(reference_file):
    """ContainerBase.from_file on an unmarked file keeps the data."""
    path, vis, _ = reference_file
    c = containers.ContainerBase.from_file(path)
    assert np.array_equal(np.asarray(c.datasets["vis"][:]), vis)


def test_reference_layout_partial_read(reference_file):
    """fsel-style axis selections apply to a reference-written file.

    (reference test/test_selections.py:33-60)
    """
    path, vis, weight = reference_file
    ss = containers.SiderealStream.from_file(
        path, sel={"freq": slice(1, 3), "ra": slice(0, 8)}
    )
    assert np.array_equal(np.asarray(ss.vis[:]), vis[1:3, :, :8])
    assert len(ss.freq) == 2
    assert len(ss.ra) == 8


def test_our_output_carries_reference_structures(tmp_path, reference_file):
    """Files we write contain everything a reference reader consumes:
    root datasets with byte-string axis attrs, index_map, reverse_map
    and history."""
    path, _, _ = reference_file
    ss = containers.SiderealStream.from_file(path)
    out = str(tmp_path / "resaved.h5")
    ss.save(out)

    with h5py.File(out, "r") as f:
        assert "vis" in f and "vis_weight" in f
        assert [a.decode() for a in f["vis"].attrs["axis"]] == [
            "freq",
            "stack",
            "ra",
        ]
        assert set(f["index_map"]) >= {"freq", "prod", "stack", "ra"}
        assert "stack" in f["reverse_map"]
        assert "history" in f
        assert f["index_map"]["freq"].dtype.names == ("centre", "width")
