"""Tests for the product-collation / pol / mixing / selection transforms."""

import numpy as np
import pytest

from draco_tpu.analysis import transform
from draco_tpu.core import containers
from draco_tpu.telescope import PolarisedCylinderTelescope, UnpolarisedDishArray


@pytest.fixture()
def tel():
    return UnpolarisedDishArray(
        grid_ew=2, grid_ns=2, spacing_ew=6.0, spacing_ns=6.0, latitude=45.0,
        freq_lower=400.0, freq_upper=420.0, num_freq=2,
        auto_correlations=True,
    )


def _unstacked_stream(tel, nra=4):
    """Unstacked SiderealStream with all upper-triangle products."""
    nfeed = tel.nfeed
    triu = np.triu_indices(nfeed)
    prod = np.zeros(len(triu[0]), dtype=[("input_a", int), ("input_b", int)])
    prod["input_a"], prod["input_b"] = triu
    ss = containers.SiderealStream(
        freq=tel.frequencies, input=tel.input_index, prod=prod,
        stack=None, ra=nra,
    )
    return ss, prod


def test_collate_products_natural(tel):
    ss, prod = _unstacked_stream(tel)
    nra = ss.vis.shape[-1]

    # Visibility of each product = its telescope stack index (+1)
    fm = tel.feedmap
    vals = fm[prod["input_a"], prod["input_b"]].astype(np.complex64) + 1.0
    ss.vis[:] = np.broadcast_to(
        vals[None, :, None], ss.vis.shape
    ).astype(np.complex64)
    ss.weight[:] = np.ones(ss.weight.shape, dtype=np.float32)
    ss.input_flags[:] = np.ones(ss.input_flags.shape, dtype=np.float32)

    task = transform.CollateProducts()
    task.read_config({"weight": "natural"})
    task.setup(tel)
    sp = task.process(ss)

    assert sp.vis.shape[1] == tel.npairs
    v = np.asarray(sp.vis[:])
    # Every stack's value should be its own index + 1 (all redundant
    # copies carried the same value)
    expect = np.arange(tel.npairs) + 1.0
    assert np.allclose(v[0, :, 0].real, expect)
    w = np.asarray(sp.weight[:])
    assert (w > 0).all()
    # Redundancy: stacks with more redundant products have more weight
    red = tel.redundancy
    assert np.allclose(w[0, :, 0], red.astype(float))


def test_collate_products_uniform(tel):
    ss, prod = _unstacked_stream(tel)
    ss.vis[:] = np.ones(ss.vis.shape, dtype=np.complex64)
    ss.weight[:] = np.full(ss.weight.shape, 2.0, dtype=np.float32)
    ss.input_flags[:] = np.ones(ss.input_flags.shape, dtype=np.float32)

    task = transform.CollateProducts()
    task.read_config({"weight": "uniform"})
    task.setup(tel)
    sp = task.process(ss)
    v = np.asarray(sp.vis[:])
    assert np.allclose(v.real, 1.0)


def test_select_pol():
    rm = containers.RingMap(
        freq=np.array([400.0, 410.0]), beam=np.arange(1),
        pol=np.array(["XX", "YY"]), ra=4, el=np.linspace(-0.1, 0.1, 3),
    )
    m = np.zeros(rm.map.shape)
    m[:, 0] = 2.0  # XX
    m[:, 1] = 4.0  # YY
    rm.map[:] = m
    w = np.ones(rm.datasets["weight"].shape)
    rm.datasets["weight"][:] = w

    task = transform.SelectPol()
    task.read_config({"pol": ["I", "Q"]})
    task.setup()
    out = task.process(rm)

    v = np.asarray(out.map[:])
    assert np.allclose(v[:, 0], 3.0)  # I = (XX + YY)/2
    assert np.allclose(v[:, 1], -1.0)  # Q = (XX - YY)/2
    ow = np.asarray(out.datasets["weight"][:])
    # weight_I = nsum^2 / (1/wXX + 1/wYY) = 4 / 2 = 2
    assert np.allclose(ow[0], 2.0)
    assert np.allclose(ow[1], 2.0)


def test_pol_weighted_average():
    rm = containers.RingMap(
        freq=np.array([400.0]), beam=np.arange(1),
        pol=np.array(["XX", "YY"]), ra=4, el=np.linspace(-0.1, 0.1, 3),
    )
    m = np.zeros(rm.map.shape)
    m[:, 0] = 2.0
    m[:, 1] = 4.0
    rm.map[:] = m
    w = np.ones(rm.datasets["weight"].shape)
    w[1] = 3.0  # YY weight
    rm.datasets["weight"][:] = w

    task = transform.PolWeightedAverage()
    task.read_config({})
    out = task.process(rm)
    assert list(out.index_map["pol"]) == ["I"]
    v = np.asarray(out.map[:])
    assert np.allclose(v, (1 * 2.0 + 3 * 4.0) / 4.0)
    assert np.allclose(np.asarray(out.datasets["weight"][:]), 4.0)


def test_stokes_i_vis():
    tel = PolarisedCylinderTelescope(
        num_cylinders=1, num_feeds=2, feed_spacing=6.0, latitude=45.0,
        freq_lower=400.0, freq_upper=420.0, num_freq=2,
        auto_correlations=True,
    )
    nstack = tel.npairs
    ss = containers.SiderealStream(
        freq=tel.frequencies, stack=nstack, input=tel.nfeed, prod=nstack, ra=4
    )
    ss.vis[:] = np.ones(ss.vis.shape, dtype=np.complex64)
    ss.weight[:] = np.ones(ss.weight.shape, dtype=np.float32)

    task = transform.StokesIVis()
    task.read_config({})
    task.setup(tel)
    out = task.process(ss)

    # Output stack axis is the unique baseline set
    nbase_out = out.vis.shape[1]
    assert nbase_out < nstack
    v = np.asarray(out.vis[:])
    w = np.asarray(out.weight[:])
    # Baselines with all four pol products present sum two co-pol vis
    assert set(np.unique(v.real)).issubset({0.0, 2.0})
    assert (v.real == 2.0).any()
    assert np.array_equal(w, v.real.astype(w.dtype))


def test_jansky_to_kelvin_roundtrip(tel):
    nstack = tel.npairs
    prod = np.zeros(nstack, dtype=[("input_a", int), ("input_b", int)])
    prod["input_a"], prod["input_b"] = tel.uniquepairs[:, 0], tel.uniquepairs[:, 1]
    ss = containers.SiderealStream(
        freq=tel.frequencies, stack=nstack, input=tel.nfeed, prod=prod, ra=4
    )
    ss.create_index_map(
        "stack", np.zeros(nstack, dtype=[("prod", int), ("conjugate", bool)])
    )
    ss.index_map["stack"]["prod"] = np.arange(nstack)
    ss.vis[:] = np.full(ss.vis.shape, 7.0, dtype=np.complex64)
    ss.weight[:] = np.ones(ss.weight.shape, dtype=np.float32)

    fwd = transform.TransformJanskyToKelvin()
    fwd.read_config({"convert_Jy_to_K": True, "share": "none", "nside": 32})
    fwd.setup(tel)
    out = fwd.process(ss)
    vK = np.asarray(out.vis[:])
    assert (np.abs(vK) > 0).all()
    assert not np.allclose(vK.real, 7.0)

    bwd = transform.TransformJanskyToKelvin()
    bwd.read_config({"convert_Jy_to_K": False, "share": "none", "nside": 32})
    bwd.setup(tel)
    back = bwd.process(out)
    assert np.allclose(np.asarray(back.vis[:]).real, 7.0, rtol=1e-5)
    assert np.allclose(np.asarray(back.weight[:]), 1.0, rtol=1e-5)


def _small_stream(value, weight, nra=4):
    ss = containers.SiderealStream(
        freq=np.array([400.0, 410.0]), stack=3, input=4, prod=3, ra=nra
    )
    ss.vis[:] = np.full(ss.vis.shape, value, dtype=np.complex64)
    ss.weight[:] = np.full(ss.weight.shape, weight, dtype=np.float32)
    ss.attrs["tag"] = f"v{value}"
    return ss


def test_mix_data_jackknife():
    a = _small_stream(6.0, 2.0)
    b = _small_stream(2.0, 2.0)

    task = transform.Jackknife()
    task.read_config({})
    task.setup()
    task.process(a)
    task.process(b)
    out = task.process_finish()

    assert np.allclose(np.asarray(out.vis[:]).real, 2.0)  # (6-2)/2
    # var = 0.25*(1/2) + 0.25*(1/2) = 0.25 -> weight 4
    assert np.allclose(np.asarray(out.weight[:]), 4.0)
    assert out.attrs["tag"] == "v6.0_v2.0"


def test_mix_data_zero_weight_flag():
    a = _small_stream(1.0, 1.0)
    b = _small_stream(1.0, 1.0)
    wb = np.asarray(b.weight[:])
    wb[0, 0, 0] = 0.0
    b.weight[:] = wb

    task = transform.Jackknife()
    task.read_config({})
    task.setup()
    task.process(a)
    task.process(b)
    out = task.process_finish()
    w = np.asarray(out.weight[:])
    assert w[0, 0, 0] == 0.0
    assert (w.ravel()[1:] > 0).all()


def test_mix_two_datasets():
    a = _small_stream(5.0, 1.0)
    b = _small_stream(3.0, 1.0)
    task = transform.MixTwoDatasets()
    task.read_config(
        {"data_coeff": [1.0, 1.0], "weight_coeff": [0.5, 0.5],
         "tag_coeff": [True, False]}
    )
    task.setup()
    out = task.process(a, b)
    assert np.allclose(np.asarray(out.vis[:]).real, 8.0)
    assert out.attrs["tag"] == "v5.0"


def test_downselect():
    ss = _small_stream(1.0, 1.0, nra=8)
    task = transform.Downselect()
    task.read_config(
        {"selections": {"freq_index": [1], "ra_range": [0, 4]}}
    )
    out = task.process(ss)
    assert out.vis.shape == (1, 3, 4)
    assert np.allclose(np.asarray(out.index_map["freq"]["centre"]), 410.0)


def test_generate_subbands():
    ss = containers.SiderealStream(
        freq=np.linspace(400, 432, 8, endpoint=False), stack=2, input=3,
        prod=2, ra=4,
    )
    ss.vis[:] = np.arange(8)[:, None, None] * np.ones(
        (1, 2, 4), dtype=np.complex64
    )
    ss.weight[:] = np.ones(ss.weight.shape, dtype=np.float32)
    ss.attrs["tag"] = "base"

    task = transform.GenerateSubBands()
    task.read_config(
        {"sub_band_spec": {
            "band_a": {"channel_range": [0, 4]},
            "band_b": {"channel_range": [4, 8]},
        }}
    )
    task.setup(ss)

    out_a = task.process()
    assert out_a.vis.shape[0] == 4
    assert out_a.attrs["tag"] == "base_band_a"
    assert np.allclose(np.asarray(out_a.vis[:])[:, 0, 0].real, [0, 1, 2, 3])

    out_b = task.process()
    assert out_b.attrs["tag"] == "base_band_b"
    assert np.allclose(np.asarray(out_b.vis[:])[:, 0, 0].real, [4, 5, 6, 7])

    from draco_tpu.core.task import PipelineStopIteration

    with pytest.raises(PipelineStopIteration):
        task.process()
