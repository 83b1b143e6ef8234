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


# ---------------------------------------------------------------------------
# GainData + fsel/isel/tsel selections (reference test/test_selections.py)
# ---------------------------------------------------------------------------
#
# Installing the reference stack itself for adversarial fixtures was
# attempted and is blocked in this environment: caput/draco are not on
# any local wheel index and the sandbox has zero network egress
# (`pip download caput` -> "no matching distribution").  These fixtures
# therefore mirror the caput-memh5 on-disk layout with raw h5py, byte
# for byte as the reference tests exercise it.

_LEN = 8
_DSET1 = np.arange(_LEN**3, dtype=np.complex128).reshape(_LEN, _LEN, _LEN)
_DSET2 = np.arange(_LEN**3, dtype=np.float64).reshape(_LEN, _LEN, _LEN)
_FSEL = slice(5)
_ISEL = slice(1, 4)
_TSEL = slice(1, 4)


@pytest.fixture
def gain_reference_file(tmp_path):
    """A GainData file in the reference/caput layout (raw h5py).

    Mirrors the container built at reference test/test_selections.py:33-41
    (gain + weight datasets over [freq, input, time]).
    """
    path = str(tmp_path / "tmp_test_memh5_select.h5")
    freqs = np.arange(_LEN, dtype=np.float64)
    inputs = np.arange(_LEN)
    times = np.arange(_LEN, dtype=np.float64)
    with h5py.File(path, "w") as f:
        im = f.create_group("index_map")
        im.create_dataset("freq", data=freqs)
        im.create_dataset("input", data=inputs)
        im.create_dataset("time", data=times)
        for name, data in (("gain", _DSET1), ("weight", _DSET2)):
            d = f.create_dataset(name, data=data)
            # caput writes vlen unicode axis labels (not our byte strings)
            d.attrs["axis"] = np.array(
                ["freq", "input", "time"], dtype=h5py.special_dtype(vlen=str)
            )
    return path


def test_gain_reference_layout_selections(gain_reference_file):
    """fsel/isel/tsel partial reads of a reference-layout GainData file.

    The reference's H5FileSelect semantics
    (test/test_selections.py:91-101): every dataset is sliced by the
    per-axis selections and the index maps follow.
    """
    m = containers.GainData.from_file(
        gain_reference_file,
        distributed=False,
        sel={"freq": _FSEL, "input": _ISEL, "time": _TSEL},
    )
    np.testing.assert_array_equal(
        np.asarray(m.datasets["gain"][:]), _DSET1[(_FSEL, _ISEL, _TSEL)]
    )
    np.testing.assert_array_equal(
        np.asarray(m.datasets["weight"][:]), _DSET2[(_FSEL, _ISEL, _TSEL)]
    )
    np.testing.assert_array_equal(
        m.index_map["freq"], np.arange(_LEN, dtype=np.float64)[_FSEL]
    )
    np.testing.assert_array_equal(m.index_map["input"], np.arange(_LEN)[_ISEL])
    np.testing.assert_array_equal(
        m.index_map["time"], np.arange(_LEN, dtype=np.float64)[_TSEL]
    )


def test_gain_reference_layout_index_selections(gain_reference_file):
    """Index-array (fancy) selections, the reference's list-sel flavour."""
    fsel = [0, 2, 5]
    m = containers.GainData.from_file(
        gain_reference_file, distributed=False, sel={"freq": fsel}
    )
    np.testing.assert_array_equal(
        np.asarray(m.datasets["gain"][:]), _DSET1[fsel]
    )
    np.testing.assert_array_equal(m.index_map["freq"], np.asarray(fsel, float))


def test_written_files_carry_reference_storage_specs(tmp_path):
    """Our HDF5 output carries the reference's chunking + compression.

    The reference declares per-dataset chunk shapes and gzip compression
    in _dataset_spec (reference draco/core/containers.py:500-513: vis
    chunks (32, 512, 2048), gzip level 4); a written SiderealStream must
    expose those through plain h5py (clamped to the actual shape).
    """
    freq = np.linspace(800.0, 750.0, 4)
    ss = containers.SiderealStream(freq=freq, input=3, ra=16)
    ss.vis[:] = 1.0 + 2.0j
    ss.weight[:] = 1.0
    path = str(tmp_path / "specs.h5")
    ss.save(path)

    with h5py.File(path, "r") as f:
        vis = f["vis"]
        assert vis.compression == "gzip"
        assert vis.compression_opts == 4
        # reference chunk spec (32, 512, 2048) clamped to the shape
        assert vis.chunks == (4, 6, 16)
        w = f["vis_weight"]
        assert w.compression == "gzip"
        assert w.chunks == (4, 6, 16)


def test_truncation_spec_applies_on_save(tmp_path):
    """`truncate=True` saves apply the spec's weight-aware bit truncation
    (reference containers.py:510-523) — the lossy values must round-trip
    close to, but not bit-identical with, the originals."""
    rng = np.random.Generator(np.random.SFC64(5))
    freq = np.linspace(800.0, 750.0, 4)
    ss = containers.SiderealStream(freq=freq, input=3, ra=16)
    vis = (
        rng.standard_normal(ss.vis.shape) + 1j * rng.standard_normal(ss.vis.shape)
    ).astype(np.complex64)
    ss.vis[:] = vis
    ss.weight[:] = 1e6  # tight noise -> little truncation
    lossy = str(tmp_path / "lossy.h5")
    ss.save(lossy, truncate=True)
    back = containers.SiderealStream.from_file(lossy, distributed=False)
    v = np.asarray(back.vis[:])
    assert not np.array_equal(v, vis)  # truncation engaged
    np.testing.assert_allclose(v, vis, atol=5e-3)
