"""Tests for the RFI vis-mask suite, tapers, and mask regridding."""

import numpy as np
import pytest

from draco_tpu.analysis import flagging
from draco_tpu.core import containers
from draco_tpu.ops import median as median_ops
from draco_tpu.ops import tools as ops_tools
from draco_tpu.telescope import PolarisedCylinderTelescope


def test_weighted_median():
    x = np.array([1.0, 2.0, 3.0, 4.0, 100.0])
    w = np.ones(5)
    assert median_ops.weighted_median(x, w) == 3.0
    # Zero-weight outlier is ignored
    w2 = np.array([1, 1, 1, 1, 0.0])
    assert median_ops.weighted_median(x, w2) == 2.5
    # Matches np.median with unit weights on random data
    rng = np.random.default_rng(0)
    y = rng.standard_normal((4, 21))
    assert np.allclose(
        median_ops.weighted_median(y, np.ones_like(y)), np.median(y, axis=-1)
    )
    # All-zero weights -> 0
    assert median_ops.weighted_median(x, np.zeros(5)) == 0.0


def test_moving_weighted_median():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 32))
    w = np.ones_like(x)
    m = median_ops.moving_weighted_median(x, w, (1, 5))
    # Compare interior samples against a direct computation
    for i in range(8):
        for j in range(2, 30):
            assert np.isclose(m[i, j], np.median(x[i, j - 2 : j + 3]))


def test_arpls_baseline():
    x = np.linspace(0, 10, 200)
    base = 2.0 + 0.3 * x
    spikes = np.zeros_like(x)
    spikes[[30, 90, 150]] = 20.0
    y = base + spikes
    z = ops_tools.arPLS_1d(y, lam=1e4)
    # Baseline follows the linear trend, unaffected by spikes
    good = spikes == 0
    assert np.abs(z[good] - base[good]).mean() < 0.3
    z2 = ops_tools.IarPLS_1d(y, lam=1e4)
    assert np.abs(z2[good] - base[good]).mean() < 0.5


def test_apply_hysteresis_threshold():
    img = np.zeros((5, 20))
    img[2, 5:10] = 3.0  # low-level plateau ...
    img[2, 7] = 10.0  # ... containing a strong point -> all kept
    img[4, 15:18] = 3.0  # low-level region with no strong point -> dropped
    m = ops_tools.apply_hysteresis_threshold(img, low=2.0, high=8.0)
    assert m[2, 5:10].all()
    assert not m[4, 15:18].any()


def test_taper_mask():
    mask = np.zeros((1, 50), dtype=bool)
    mask[0, 20:30] = True
    t = ops_tools.taper_mask(mask, nwidth=4)
    assert t.shape == (1, 50)
    assert np.isclose(t[0, 25], 1.0)  # centre of the masked run
    assert np.isclose(t[0, 0], 0.0)
    # Tapered transition exists
    assert ((t > 0.05) & (t < 0.95)).any()


@pytest.fixture()
def ptel():
    return PolarisedCylinderTelescope(
        num_cylinders=2, num_feeds=2, feed_spacing=6.0, cylinder_spacing=20.0,
        latitude=45.0, freq_lower=400.0, freq_upper=420.0, num_freq=4,
        auto_correlations=True,
    )


def _timestream(ptel, ntime=64):
    nstack = ptel.npairs
    ts = containers.TimeStream(
        freq=ptel.frequencies, stack=nstack, input=ptel.nfeed, prod=nstack,
        time=1e9 + 10.0 * np.arange(ntime),
    )
    ts.vis[:] = np.zeros(ts.vis.shape, dtype=np.complex64)
    ts.weight[:] = np.ones(ts.weight.shape, dtype=np.float32)
    return ts


def test_rfi_transient_vis_mask(ptel, rng):
    ts = _timestream(ptel)
    vis = 0.01 * (
        rng.standard_normal(ts.vis.shape) + 1j * rng.standard_normal(ts.vis.shape)
    )
    # A strong transient at one time in one channel
    vis[1, :, 30] += 200.0
    ts.vis[:] = vis.astype(np.complex64)

    task = flagging.RFITransientVisMask()
    task.read_config({"stokes_i": False, "sigma_high": 6.0,
                      "mad_base_size": [1, 31], "mad_dev_size": [1, 15]})
    task.setup(ptel)
    out = task.process(ts)
    m = np.asarray(out.mask[:])
    assert m[1, 30]
    # Most of the clean data stays unmasked
    assert m.mean() < 0.3


def test_rfi_chisq_high_delay(rng):
    nfreq, ntime = 64, 32
    freq = np.linspace(400, 464, nfreq, endpoint=False)
    ts = containers.TimeStream(
        freq=freq, stack=3, input=3, prod=3,
        time=1e9 + 10.0 * np.arange(ntime),
    )
    # Chi-squared like data: ~1 everywhere, large excursion in one channel
    chisq = 1.0 + 0.1 * rng.standard_normal((nfreq, 3, ntime))
    chisq[20] = 30.0
    ts.vis[:] = chisq.astype(np.complex64)
    ts.weight[:] = np.full(ts.weight.shape, 100.0, dtype=np.float32)

    task = flagging.RFIMaskChisqHighDelay()
    task.read_config({"win_t": 11, "win_f": 1, "nsigma_1d": 5.0,
                      "nsigma_2d": 5.0})
    task.setup()
    out = task.process(ts)
    m = np.asarray(out.mask[:])
    assert m[20].all()  # bad channel fully masked by the 1D stage
    assert m.mean() < 0.5


def test_mask_bad_gains():
    ts = containers.TimeStream(
        freq=np.linspace(400, 410, 4), stack=2, input=3, prod=2,
        time=1e9 + np.arange(8),
    )
    ts.add_dataset("gain")
    g = np.full(ts.datasets["gain"].shape, 2.0, dtype=np.complex64)
    g[1, :, :] = 1.0  # bad freq
    ts.datasets["gain"][:] = g

    task = flagging.MaskBadGains()
    task.read_config({})
    out = task.process(ts)
    m = np.asarray(out.mask[:])
    assert m[1].all() and not m[0].any()


def test_mask_beamformed_weights(rng):
    fb = containers.FormedBeam(
        object_id=np.arange(10), freq=np.linspace(400, 410, 8),
        pol=np.array(["XX"]),
    )
    w = np.ones(fb.weight.shape)
    w[3, 0, 2] = 1e6
    fb.weight[:] = w
    fb.beam[:] = np.zeros(fb.beam.shape)

    task = flagging.MaskBeamformedWeights()
    task.read_config({"nmed": 8.0})
    out = task.process(fb)
    wo = np.asarray(out.weight[:])
    assert wo[3, 0, 2] == 0.0
    assert (wo[0, 0] == 1.0).all()


def test_combine_tapers():
    t1 = containers.RingMapTaper(
        freq=np.linspace(400, 410, 2), pol=np.array(["XX"]), ra=8,
        el=np.linspace(-0.1, 0.1, 3),
    )
    t2 = containers.RingMapTaper(axes_from=t1)
    t1.taper[:] = np.full(t1.taper.shape, 0.5)
    t2.taper[:] = np.full(t2.taper.shape, 0.5)

    task = flagging.CombineTapers()
    task.read_config({})
    out = task.process([t1, t2])
    assert np.allclose(np.asarray(out.taper[:]), 0.25)


def test_mask_from_taper():
    t = containers.RingMapTaper(
        freq=np.linspace(400, 410, 2), pol=np.array(["XX"]), ra=8,
        el=np.linspace(-0.1, 0.1, 3),
    )
    arr = np.ones(t.taper.shape)
    arr[:, :, 2, :] = 0.5
    arr[:, :, 4, :] = 0.0
    t.taper[:] = arr

    inner = flagging.MaskFromTaper()
    inner.read_config({"outer": False})
    m_in = np.asarray(inner.process(t).mask[:])
    assert m_in[:, :, 4, :].all() and not m_in[:, :, 2, :].any()

    outer = flagging.MaskFromTaper()
    outer.read_config({"outer": True})
    m_out = np.asarray(outer.process(t).mask[:])
    assert m_out[:, :, 2, :].all() and m_out[:, :, 4, :].all()
    assert not m_out[:, :, 0, :].any()


def test_apply_baseline_mask():
    ts = containers.TimeStream(
        freq=np.linspace(400, 410, 3), stack=4, input=4, prod=4,
        time=1e9 + np.arange(6),
    )
    ts.weight[:] = np.ones(ts.weight.shape, dtype=np.float32)
    bm = containers.BaselineMask(axes_from=ts)
    marr = np.zeros(bm.mask.shape, dtype=bool)
    marr[:, 2, :] = True
    bm.mask[:] = marr

    task = flagging.ApplyBaselineMask()
    task.read_config({})
    out = task.process(ts, bm)
    w = np.asarray(out.weight[:])
    assert (w[:, 2] == 0).all()
    assert (w[:, 0] == 1).all()


def test_mask_regrid_and_reduce(ptel):
    # Build a LocalizedRFIMask over two CSDs worth of time
    nfreq, nel = 4, 3
    sid_day = 86164.0905
    t0 = ptel.lsd_to_unix(1000.0)
    times = t0 + np.linspace(-0.1, 1.15, 128) * sid_day
    m = containers.LocalizedRFIMask(
        freq=ptel.frequencies, el=np.linspace(-0.1, 0.1, nel), time=times
    )
    arr = np.zeros(m.mask.shape, dtype=bool)
    arr[2, :, 50:60] = True
    m.mask[:] = arr

    task = flagging.RFIMaskSiderealRegridderNearest()
    task.read_config({"npix": 256, "spread_factor": 1.0})
    task.setup(ptel)
    out = task.process(m)
    assert isinstance(out, containers.LocalizedSiderealRFIMask)
    mo = np.asarray(out.mask[:])
    assert mo.shape == (nfreq, 256, nel)
    assert mo[2].any() and not mo[0].any()

    # Reduce over el
    red = flagging.ReduceMaskEl()
    red.read_config({"el_threshold": 1})
    rout = red.process(out)
    assert isinstance(rout, containers.SiderealRFIMask)
    assert np.asarray(rout.mask[:])[2].any()


def test_apply_localized_rfi_mask(ptel):
    nel, nra = 3, 16
    rm = containers.RingMap(
        freq=ptel.frequencies, beam=np.arange(1), pol=np.array(["XX"]),
        ra=nra, el=np.linspace(-0.1, 0.1, nel),
    )
    rm.map[:] = np.zeros(rm.map.shape)
    rm.datasets["weight"][:] = np.ones(rm.datasets["weight"].shape)

    lm = containers.LocalizedSiderealRFIMask(
        freq=ptel.frequencies, ra=np.asarray(rm.ra),
        el=np.asarray(rm.index_map["el"]),
    )
    arr = np.zeros(lm.mask.shape, dtype=bool)
    arr[1, 4, 1] = True
    lm.mask[:] = arr

    task = flagging.ApplyLocalizedRFIMask()
    task.read_config({})
    out = task.process(rm, lm)
    w = np.asarray(out.datasets["weight"][:])
    assert w[0, 1, 4, 1] == 0.0
    assert w[0, 0, 4, 1] == 1.0


def test_weighted_quantile():
    from draco_tpu.ops import median as med

    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 101))
    w = np.ones_like(x)
    # Unit weights: agrees with np.median at q=0.5
    assert np.allclose(med.quantile(x, w, 0.5), np.median(x, axis=-1))
    assert np.allclose(med.quantile(x, w, 0.5), med.weighted_median(x, w))
    # Zero-weight samples are ignored
    x2 = x.copy()
    x2[:, ::2] = 1e6
    w2 = np.ones_like(x)
    w2[:, ::2] = 0.0
    assert np.allclose(med.quantile(x2, w2, 0.5), np.median(x[:, 1::2], axis=-1))
    # Quantiles are ordered
    q1 = med.quantile(x, w, 0.15)
    q2 = med.quantile(x, w, 0.85)
    assert (q1 < q2).all()
    # All-zero weights give 0
    assert med.quantile(x, np.zeros_like(x), 0.15).tolist() == [0.0] * 5


def test_moving_weighted_median_1d():
    from draco_tpu.ops import median as med

    rng = np.random.default_rng(4)
    x = rng.standard_normal(64)
    w = np.ones_like(x)
    out = med.moving_weighted_median(x, w, 9)
    assert out.shape == x.shape
    # Interior windows match a plain moving median
    from scipy.ndimage import median_filter

    expect = median_filter(x, size=9, mode="constant")
    assert np.allclose(out[4:-4], expect[4:-4])


def test_rfi_sensitivity_mask():
    """Full iterative RFISensitivityMask (reference flagging.py:1808)."""
    rng = np.random.default_rng(5)
    nfreq, ntime = 64, 96
    freq = np.linspace(500.0, 564.0, nfreq, endpoint=False)
    sens = containers.SystemSensitivity(
        freq=freq, pol=np.array(["XX", "YY"]), time=1e9 + 10.0 * np.arange(ntime)
    )
    radiometer = np.ones((nfreq, 2, ntime), dtype=np.float32)
    measured = radiometer * (1.0 + 0.01 * rng.standard_normal((nfreq, 2, ntime))).astype(
        np.float32
    )
    # Strong transient RFI block
    measured[20:24, :, 40:60] *= 10.0
    # Persistent bad channel: caught by the 1-D quantile mask
    measured[50] *= 4.0
    sens.radiometer[:] = radiometer
    sens.measured[:] = measured
    sens.weight[:] = np.ones((nfreq, 2, ntime), dtype=np.float32)
    sens.weight[:, :, :2] = 0.0  # pre-flagged samples propagate

    task = flagging.RFISensitivityMask()
    task.read_config(
        {
            "niter": 3,
            "base_size": [9, 17],
            "mad_size": [13, 7],
            "win_f_1d": 15,
            "max_m": 8,
        }
    )
    task.setup()
    out = task.process(sens)
    mask = np.asarray(out.mask[:])
    assert mask.shape == (nfreq, ntime)

    assert mask[20:24, 40:60].all()  # RFI block flagged
    assert mask[50].all()  # bad channel flagged
    assert mask[:, :2].all()  # zero-weight samples stay flagged
    clean = mask[30:48, 10:30]
    assert clean.mean() < 0.1  # clean region mostly unflagged

    # mad and sumthreshold-only modes run and also catch the block
    for mt in ("mad", "sumthreshold"):
        t2 = flagging.RFISensitivityMask()
        t2.read_config(
            {"mask_type": mt, "niter": 2, "base_size": [9, 17],
             "mad_size": [13, 7], "win_f_1d": 15, "max_m": 8}
        )
        t2.setup()
        m2 = np.asarray(t2.process(sens).mask[:])
        assert m2[21:23, 45:55].all()

    # SIR post-pass only widens the mask
    t3 = flagging.RFISensitivityMask()
    t3.read_config(
        {"sir": True, "niter": 2, "base_size": [9, 17], "mad_size": [13, 7],
         "win_f_1d": 15, "max_m": 8}
    )
    t3.setup()
    m3 = np.asarray(t3.process(sens).mask[:])
    t4 = flagging.RFISensitivityMask()
    t4.read_config(
        {"sir": False, "niter": 2, "base_size": [9, 17], "mad_size": [13, 7],
         "win_f_1d": 15, "max_m": 8}
    )
    t4.setup()
    m4 = np.asarray(t4.process(sens).mask[:])
    assert (m3 | m4 == m3).all()  # SIR only adds flags


def test_wavelet_zoo():
    from draco_tpu.ops import wavelet as wv

    n = 512
    t = np.arange(n)
    f_true = 0.07
    x = np.cos(2 * np.pi * f_true * t)
    freqs = np.linspace(0.02, 0.2, 40)

    for name in ("morl", "cmor1.5-1.0", "mexh", "gaus2"):
        scales = wv.frequency2scale(freqs, wavelet=name)
        W = np.asarray(wv.cwt(x, scales, wavelet=name))
        power = np.mean(np.abs(W[:, n // 4 : -n // 4]) ** 2, axis=-1)
        f_peak = freqs[np.argmax(power)]
        # Every wavelet's scale-frequency relation localises the tone
        assert abs(f_peak - f_true) < 0.02, (name, f_peak)
