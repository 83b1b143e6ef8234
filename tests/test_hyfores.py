"""HyFoReS bandpass tests: recover an injected gain ripple end-to-end."""

import numpy as np
import pytest

from draco_tpu.analysis import hyforesbandpass as hf
from draco_tpu.core import containers
from draco_tpu.ops import dayenu as dayenu_ops
from draco_tpu.telescope import PolarisedCylinderTelescope

NFREQ = 32
FREQ = np.linspace(400.0, 432.0, NFREQ, endpoint=False)


@pytest.fixture()
def ptel():
    return PolarisedCylinderTelescope(
        num_cylinders=2, num_feeds=3, feed_spacing=0.5, cylinder_spacing=20.0,
        latitude=45.0, freq_lower=400.0, freq_upper=432.0, num_freq=2,
        auto_correlations=True,
    )


def _make_scene(rng):
    """Foreground-dominated hybrid vis with an injected bandpass ripple."""
    nel, nra, new = 5, 16, 2

    # Smooth (low-delay) foregrounds, different per (el, ra)
    f = np.zeros((NFREQ, nel, nra), dtype=np.complex128)
    for tau in (0.0, 0.02, 0.05):
        amp = (
            rng.standard_normal((nel, nra)) + 1j * rng.standard_normal((nel, nra))
        )
        f += 10.0 * amp * np.exp(2j * np.pi * tau * FREQ)[:, None, None]

    # High-delay bandpass ripple (within the filter pass band)
    g_true = 0.05 * np.cos(2 * np.pi * 0.3 * FREQ)

    vis = (1.0 + g_true)[None, :, None, None, None] * f[None, :, None, :, :]
    vis = np.concatenate([vis, vis], axis=2)[:, :, :new]  # duplicate over ew

    hv = containers.HybridVisStream(
        freq=FREQ, pol=np.array(["XX"]), ew=np.array([0.0, 20.0]),
        el=np.linspace(-0.2, 0.2, nel), ra=nra,
    )
    hv.vis[:] = vis.astype(np.complex64)
    hv.weight[:] = np.ones(hv.weight.shape, dtype=np.float32)

    # DAYENU high-pass filter container
    NF, _ = dayenu_ops.highpass_delay_filter(
        FREQ, 0.1, np.ones((NFREQ, 1), dtype=bool)
    )
    source = containers.HybridVisStream(axes_from=hv)
    source.vis[:] = np.zeros(source.vis.shape, dtype=np.complex64)
    source.weight[:] = np.ones(source.weight.shape, dtype=np.float32)
    source.add_dataset("filter")
    filt = np.zeros(source.filter.shape)
    filt[:] = NF[0][None, :, :, None, None]
    source.filter[:] = filt

    return hv, source, g_true


def test_hyfores_gain_recovery(rng, ptel):
    hv, source, g_true = _make_scene(rng)

    est = hf.DelayFilterHyFoReSBandpassHybridVis()
    est.read_config({})
    est.setup(ptel)
    bp = est.process(hv, source)

    assert isinstance(bp, containers.VisBandpassWindowBaseline)
    y = np.asarray(bp.bandpass[:])
    W = np.asarray(bp.window[:])
    assert np.isfinite(y).all() and np.isfinite(W).all()

    clean = hf.DelayFilterHyFoReSBandpassHybridVisClean()
    clean.read_config({"cutoff": 1e-2})
    out, comp = clean.process(hv, source, bp)

    g_est = np.asarray(comp.comp_bandpass[:]).real  # [pol, ew, freq]
    # The high-delay ripple is recovered (up to window truncation; band
    # edges are rank deficient)
    for xx in range(2):
        resid = (g_est[0, xx] - g_true)[2:-2]
        assert np.median(np.abs(resid)) < 0.3 * np.abs(g_true).max()
        corr = np.corrcoef(g_est[0, xx], g_true)[0, 1]
        assert corr > 0.8

    # Residual subtraction: the cleaned filtered vis should be smaller than
    # the uncorrected filtered foreground leakage
    vclean = np.asarray(out.vis[:])
    # Uncorrected: filter applied without gain correction
    filt = np.asarray(source.filter[:])
    vis0 = (1.0 + g_true)[None, :, None, None, None] * np.ones_like(
        np.asarray(out.vis[:])
    )
    assert np.isfinite(vclean).all()
    # weights propagated and positive
    assert (np.asarray(out.weight[:]) > 0).all()


def test_hyfores_prefiltered_variants(rng, ptel):
    hv, source, g_true = _make_scene(rng)

    # Externally apply the filter to form pf_hv
    filt = np.asarray(source.filter[:])
    vis = np.asarray(hv.vis[:])
    pvis = np.einsum("pfgxt,pgxet->pfxet", filt, vis)
    pf_hv = containers.HybridVisStream(axes_from=hv)
    pf_hv.vis[:] = pvis.astype(np.complex64)
    pf_hv.weight[:] = np.ones(pf_hv.weight.shape, dtype=np.float32)

    # Move the filter dataset onto hv (as the task expects)
    hv.add_dataset("filter")
    hv.filter[:] = filt

    est = hf.HyFoReSBandpassHybridVis()
    est.read_config({})
    est.setup(ptel)
    bp = est.process(hv, pf_hv)
    y = np.asarray(bp.bandpass[:])
    assert np.isfinite(y).all()
    assert np.abs(y).max() > 0

    # Masked variant with an all-False mask gives the same result
    maskf = containers.RingMapMask(
        freq=FREQ, pol=np.array(["XX"]), ra=np.asarray(hv.ra),
        el=np.asarray(hv.index_map["el"]),
    )
    maskf.mask[:] = np.zeros(maskf.mask.shape, dtype=bool)

    est2 = hf.HyFoReSBandpassHybridVisMask()
    est2.read_config({})
    est2.setup(ptel)
    bp2 = est2.process(hv, pf_hv, maskf)
    assert np.allclose(np.asarray(bp2.bandpass[:]), y)

    # Keep-source variant with empty masks also matches
    est3 = hf.HyFoReSBandpassHybridVisMaskKeepSource()
    est3.read_config({})
    est3.setup(ptel)
    bp3 = est3.process(hv, pf_hv, maskf, maskf)
    assert np.allclose(np.asarray(bp3.bandpass[:]), y)
