"""Tests for the flagging/RFI task zoo."""

import numpy as np
import pytest

from draco_tpu.analysis import flagging
from draco_tpu.core import containers
from draco_tpu.ops import rfi


def make_stream(nfreq=8, nfeed=3, nra=32, weight=1.0):
    freq = np.linspace(700.0, 700.0 - nfreq + 1, nfreq)
    ss = containers.SiderealStream(freq=freq, input=nfeed, ra=nra)
    ss.vis[:] = np.ones(ss.vis.shape, dtype=np.complex64)
    ss.weight[:] = weight
    return ss


def test_sumthreshold_flags_outliers(rng):
    data = rng.standard_normal((64, 64))
    data[20, :] += 20.0  # a bad frequency
    data[:, 33] += 20.0  # a bad time
    mask = rfi.sumthreshold(data, max_m=8)
    assert mask[20].mean() > 0.9
    assert mask[:, 33].mean() > 0.9
    # unflagged background stays mostly unflagged
    clean = np.ones_like(mask, dtype=bool)
    clean[20] = False
    clean[:, 33] = False
    assert mask[clean].mean() < 0.2


def test_sir_widens_mask():
    base = np.zeros((1, 50), dtype=bool)
    base[0, 20:25] = True
    out = rfi.scale_invariant_rank(base, eta=0.5, axis=-1)
    assert out.sum() > base.sum()
    assert out[0, 20:25].all()
    out0 = rfi.scale_invariant_rank(base, eta=0.0, axis=-1)
    assert np.array_equal(out0, base)


def test_day_mask():
    ss = make_stream()
    t = flagging.DayMask()
    t.read_config({"start": 90.0, "end": 270.0, "width": 30.0,
                   "remove_average": False})
    out = t.process(ss)
    w = np.asarray(out.weight[:])
    ra = out.ra
    inside = (ra > 130) & (ra < 230)
    outside = (ra < 60) | (ra > 300)
    assert np.allclose(w[..., inside], 0.0)
    assert np.allclose(w[..., outside], 1.0)


def test_mask_mmode_data():
    mm = containers.MModes(mmax=4, freq=np.array([400.0]), input=2)
    mm.weight[:] = np.ones(mm.weight.shape)
    t = flagging.MaskMModeData()
    t.read_config({"m_zero": False, "auto_correlations": False})
    out = t.process(mm)
    w = np.asarray(out.weight[:])
    assert np.allclose(w[0], 0.0)  # m=0 masked
    # autos masked: prods (0,0),(1,1) are autos in a 2-feed triangle
    assert np.allclose(w[1:, :, :, 0], 0.0)
    assert np.allclose(w[1:, :, :, 2], 0.0)
    assert not np.allclose(w[1:, :, :, 1], 0.0)


def test_mask_baselines():
    from draco_tpu.telescope import UnpolarisedDishArray

    tel = UnpolarisedDishArray(
        grid_ew=2, grid_ns=2, spacing_ew=10.0, spacing_ns=10.0,
        num_freq=2, force_lmax=8, force_mmax=8, auto_correlations=True,
    )
    ss = containers.SiderealStream(
        freq=np.array([400.0, 500.0]),
        input=tel.nfeed,
        ra=8,
        prod=np.array([[int(a), int(b)] for a, b in tel.uniquepairs]),
    )
    ss.weight[:] = 1.0
    t = flagging.MaskBaselines()
    t.read_config({"mask_short": 5.0})
    t.setup(tel)
    out = t.process(ss)
    w = np.asarray(out.weight[:])
    bl_len = np.hypot(*tel.baselines.T)
    assert np.allclose(w[:, bl_len < 5.0], 0.0)
    assert np.allclose(w[:, bl_len >= 5.0], 1.0)


def test_radiometer_weight():
    ss = make_stream(nfreq=2, nfeed=2, nra=8)
    vis = np.asarray(ss.vis[:]).copy()
    # autos (0,0)=prod0, (1,1)=prod2 set to 4 and 9
    vis[:, 0] = 4.0
    vis[:, 2] = 9.0
    ss.vis[:] = vis
    t = flagging.RadiometerWeight()
    t.read_config({})
    out = t.process(ss)
    w = np.asarray(out.weight[:])
    freq_width = np.median(ss.index_map["freq"]["width"])
    int_time = np.median(np.abs(np.diff(ss.ra))) * 240 * flagging.STELLAR_S
    nsamp = 1e6 * freq_width * int_time
    # weight for cross (0,1): nsamp / (4 * 9)
    assert np.allclose(w[:, 1], nsamp / 36.0, rtol=1e-5)


def test_threshold_vis_weight_frequency():
    ss = make_stream(nfreq=6)
    w = np.asarray(ss.weight[:]).copy()
    w[2] = 1e-9  # low weight frequency
    ss.weight[:] = w
    t = flagging.ThresholdVisWeightFrequency()
    t.read_config({})
    mask = t.process(ss)
    assert isinstance(mask, containers.SiderealRFIMask)
    m = np.asarray(mask.mask[:])
    assert m[2].all()
    assert not m[0].any()


def test_apply_time_freq_mask():
    ss = make_stream(nfreq=4)
    mask = containers.SiderealRFIMask(axes_from=ss)
    marr = np.zeros(mask.mask.shape, dtype=bool)
    marr[1, :] = True
    mask.mask[:] = marr
    t = flagging.ApplyTimeFreqMask()
    t.read_config({})
    out = t.process(ss, mask)
    w = np.asarray(out.weight[:])
    assert np.allclose(w[1], 0.0)
    assert np.allclose(w[0], 1.0)


def test_combine_masks():
    ss = make_stream(nfreq=4)
    m1 = containers.SiderealRFIMask(axes_from=ss)
    m2 = containers.SiderealRFIMask(axes_from=ss)
    a1 = np.zeros(m1.mask.shape, dtype=bool)
    a2 = np.zeros_like(a1)
    a1[0] = True
    a2[2] = True
    m1.mask[:] = a1
    m2.mask[:] = a2
    t = flagging.CombineMasks()
    t.read_config({})
    out = t.process([m1, m2])
    m = np.asarray(out.mask[:])
    assert m[0].all() and m[2].all() and not m[1].any()

    t2 = flagging.GeneralCombineMasks()
    t2.read_config({"expression": "A & ~B"})
    out2 = t2.process([m1, m2])
    m2_ = np.asarray(out2.mask[:])
    assert m2_[0].all() and not m2_[2].any()


def test_mask_freq():
    ss = make_stream(nfreq=6)
    w = np.asarray(ss.weight[:]).copy()
    w[3] = 0.0
    ss.weight[:] = w
    t = flagging.MaskFreq()
    t.read_config({"bad_freq_ind": [0, [4, 6]]})
    mask = t.process(ss)
    m = np.asarray(mask.mask[:])
    assert m[0].all() and m[3].all() and m[4].all() and m[5].all()
    assert not m[1].any()


def test_rfimask_task():
    ss = make_stream(nfreq=32, nra=64)
    vis = np.asarray(ss.vis[:]).copy()
    rng = np.random.Generator(np.random.SFC64(0))
    vis += 0.01 * rng.standard_normal(vis.shape)
    vis[:, 0, 10] += 100.0  # single bad time on the chosen stack
    ss.vis[:] = vis
    t = flagging.RFIMask()
    t.read_config({"stack_ind": 0})
    mask = t.process(ss)
    m = np.asarray(mask.mask[:])
    assert m[:, 10].mean() > 0.5


def test_blend_stack():
    stack = make_stream(nfreq=2)
    day = make_stream(nfreq=2)
    w = np.asarray(day.weight[:]).copy()
    w[..., 4:8] = 0.0  # an RFI gap
    day.weight[:] = w
    vis = np.asarray(day.vis[:]).copy()
    vis[..., 4:8] = 0.0
    day.vis[:] = vis
    t = flagging.BlendStack()
    t.read_config({"frac": 1e-2, "match_median": False})
    t.setup(stack)
    out = t.process(day)
    v = np.asarray(out.vis[:])
    # the gap is filled from the stack
    assert np.allclose(v[..., 4:8], 1.0, atol=1e-5)
    assert np.allclose(v[..., 0], 1.0, atol=1e-3)


def test_destripe_and_mad(rng):
    x = rng.standard_normal((16, 32)) + 5.0
    w = np.ones_like(x, dtype=bool)
    y = flagging.destripe(x, w, axis=1)
    assert np.abs(np.median(y, axis=1)).max() < 1e-10

    data = rng.standard_normal((32, 32))
    data[5, 5] = 100.0
    r = flagging.mad(data, np.zeros_like(data, dtype=bool))
    assert r[5, 5] > 10


def test_sir_matches_bruteforce_definition():
    """SIR equals the definitional operator, including right-edge runs.

    A sample is flagged iff some window [a, b) containing it has flagged
    fraction >= 1 - eta (arXiv:1201.3364).  The reference's scan skips
    windows ending at the array end for all but the last sample; ours
    must not (mask=[F]*8+[T,T] at eta=0.5 must flag sample 6).
    """
    from draco_tpu.ops.rfi import sir1d

    def brute(mask, eta, slack=0.0):
        n = len(mask)
        w = mask.astype(float) + (eta - 1.0)
        out = mask.copy()
        for a in range(n):
            for b in range(a + 1, n + 1):
                if w[a:b].sum() >= -slack:
                    out[a:b] = True
        return out

    rng = np.random.default_rng(7)
    for eta in (0.2, 0.5):
        edge = np.zeros(10, bool)
        edge[8:] = True
        assert (np.asarray(sir1d(edge, eta=eta)) == brute(edge, eta)).all()
        for _ in range(60):
            m = rng.random(rng.integers(1, 24)) < 0.3
            got = np.asarray(sir1d(m, eta=eta))
            # windows whose flagged fraction is EXACTLY 1 - eta sit on a
            # float tie whose direction depends on summation order, so
            # bracket: got must contain the strict brute force and be
            # contained in the epsilon-slackened one
            assert (got | brute(m, eta) == got).all()
            assert (got | brute(m, eta, slack=1e-6) == brute(m, eta, 1e-6)).all()
