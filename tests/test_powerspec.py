"""Power spectrum chain tests: Wiener delay transform -> uv -> 3D/2D/1D."""

import numpy as np
import pytest

from draco_tpu.analysis import powerspec
from draco_tpu.core import containers
from draco_tpu.telescope import UnpolarisedDishArray

NFREQ = 32
FREQ = np.linspace(500.0, 532.0, NFREQ, endpoint=False)  # df = 1 MHz
TAU0 = 5.0 / 32.0  # microseconds: exactly bin 5 of a 32-point FFT


@pytest.fixture()
def tel():
    return UnpolarisedDishArray(
        grid_ew=2, grid_ns=2, spacing_ew=20.0, spacing_ns=6.0, latitude=45.0,
        freq_lower=500.0, freq_upper=532.0, num_freq=2, auto_correlations=True,
    )


@pytest.fixture()
def ringmap_with_tone():
    nra, nel = 8, 5
    rm = containers.RingMap(
        freq=FREQ, beam=np.arange(1), pol=np.array(["XX"]), ra=nra,
        el=np.linspace(-0.05, 0.05, nel),
    )
    tone = np.cos(2 * np.pi * TAU0 * FREQ)  # delay +-TAU0
    m = np.zeros(rm.map.shape)
    m[0, 0] = tone[:, None, None]
    rm.map[:] = m
    rm.datasets["weight"][:] = np.ones(rm.datasets["weight"].shape)

    # Identity spectral filter, diagonal noise covariance, unit beam power
    rm.add_dataset("filter")
    filt = np.zeros(rm.datasets["filter"].shape)
    filt[:] = np.eye(NFREQ)[None, :, :, None]
    rm.datasets["filter"][:] = filt

    rm.add_dataset("freq_cov")
    rm.datasets["freq_cov"][:] = filt.copy()

    rm.add_dataset("dirty_beam_power")
    rm.datasets["dirty_beam_power"][:] = np.ones(
        rm.datasets["dirty_beam_power"].shape
    )
    return rm


def test_jy_per_beam_to_kelvin_roundtrip(tel):
    f = jy = powerspec.jy_per_beam_to_kelvin(FREQ, 60.0)
    assert (f > 0).all()
    # Scales as lambda^2 / omega ~ const... check monotonic behaviour sane
    rm = containers.RingMap(
        freq=FREQ, beam=np.arange(1), pol=np.array(["XX"]), ra=4,
        el=np.linspace(-0.1, 0.1, 3),
    )
    rm.map[:] = np.ones(rm.map.shape)
    rm.datasets["weight"][:] = np.ones(rm.datasets["weight"].shape)

    task = powerspec.TransformJyPerBeamToKelvin()
    task.read_config({"in_place": False, "ncyl": 3})
    task.setup(tel)
    out = task.process(rm)
    v = np.asarray(out.map[:])
    assert np.allclose(v[0, 0, :, 0, 0], np.asarray(task.bl_max and jy) * 0 + v[0, 0, :, 0, 0])
    # map scaled per-frequency by the factor
    factor = powerspec.jy_per_beam_to_kelvin(FREQ, task.bl_max)
    assert np.allclose(v[0, 0, :, 0, 0], factor)


def test_wiener_delay_chain(ringmap_with_tone, tel):
    rm = ringmap_with_tone

    con = powerspec.ConstructWienerDelayTransform()
    con.read_config({"prior_amp": 100.0, "window": "uniform"})
    op = con.process(rm)
    assert op.filter.shape[3] == len(op.index_map["delay"])

    app = powerspec.ApplyWienerDelayTransform()
    app.read_config({})
    ds = app.process(rm, op)
    spec = np.asarray(ds.spectrum[:])  # [pol*el, ra, delay]
    delay = np.asarray(ds.index_map["delay"])

    # Power should peak at the tone's (positive) delay
    power = np.abs(spec).mean(axis=(0, 1))
    ipeak = np.argmax(power)
    assert np.isclose(delay[ipeak], TAU0, atol=1.0 / 32)
    # And dominate delays away from the tone
    far = np.abs(delay - TAU0) > 3.0 / 32
    assert power[ipeak] > 10 * power[far].max()

    # Spatial transform
    st = powerspec.SpatialTransformDelayMap()
    st.read_config(
        {"apply_spatial_window": False, "ew_min": 0.0, "ew_max": 10.0,
         "ns_bl": 10.0}
    )
    st.setup(tel)
    cube = st.process(ds)
    assert isinstance(cube, containers.SpatialDelayCube)
    v = np.asarray(cube.vis[:])
    assert np.isfinite(v).all()
    # Uniform in (ra, el): all power at the central (u, v) = (0, 0) mode
    pk = np.abs(v[0, ipeak])
    ctr = np.unravel_index(np.argmax(pk), pk.shape)
    u = np.asarray(cube.index_map["u"])
    vv = np.asarray(cube.index_map["v"])
    assert abs(u[ctr[0]]) < 1e-8 and abs(vv[ctr[1]]) < 1e-8

    # 3D auto power spectrum
    ps3 = powerspec.AutoPowerSpectrum3D()
    ps3.read_config({})
    ps_cube = ps3.process(cube)
    s3 = np.asarray(ps_cube.spectrum[:])
    assert np.isfinite(s3).all()
    assert (s3.real >= -1e-20).all()  # auto power is non-negative

    # 2D cylindrical average
    cyl = powerspec.CylindricalPowerSpectrum2D()
    cyl.read_config(
        {"bl_min": 0.001, "bl_max": 10.0, "Nbins_2D": 6, "delay_cut": 0.0}
    )
    cyl.setup()
    ps2 = cyl.process(ps_cube)
    assert isinstance(ps2, containers.PowerSpectrum2D)
    s2 = np.asarray(ps2.spectrum[:])
    assert np.isfinite(np.nan_to_num(s2)).all()

    # 1D spherical averages from both 2D and 3D
    sp1 = powerspec.SphericalPowerSpectrum2Dto1D()
    sp1.read_config({"Nbins_3D": 5, "logbins_3D": False})
    ps1 = sp1.process(ps2)
    assert isinstance(ps1, containers.PowerSpectrum1D)

    sp2 = powerspec.SphericalPowerSpectrum3Dto1D()
    sp2.read_config(
        {"bl_min": 0.001, "bl_max": 10.0, "Nbins_3D": 5, "logbins_3D": False,
         "delay_cut": 0.0}
    )
    sp2.setup()
    ps1b = sp2.process(ps_cube)
    s1b = np.asarray(ps1b.spectrum[:])
    assert np.isfinite(np.nan_to_num(s1b)).all()


def test_wiener_operator_with_masked_channel(ringmap_with_tone):
    rm = ringmap_with_tone
    # Kill two channels everywhere
    w = np.asarray(rm.datasets["weight"][:])
    w[:, 10:12] = 0.0
    rm.datasets["weight"][:] = w

    con = powerspec.ConstructWienerDelayTransform()
    con.read_config({"prior_amp": 100.0})
    op = con.process(rm)
    f = np.asarray(op.filter[:])
    # Filter must not use the masked channels
    assert np.all(f[..., 10:12] == 0)

    app = powerspec.ApplyWienerDelayTransform()
    app.read_config({})
    ds = app.process(rm, op)
    spec = np.asarray(ds.spectrum[:])
    delay = np.asarray(ds.index_map["delay"])
    power = np.abs(spec).mean(axis=(0, 1))
    assert np.isclose(delay[np.argmax(power)], TAU0, atol=1.5 / 32)


def test_cosmo_conversions():
    z = 1.0
    # Roundtrips
    tau = 1e-6
    k = powerspec.delays_to_kpara(tau, z)
    assert np.isclose(powerspec.kpara_to_delay(k, z), tau)
    u = 50.0
    kp = powerspec.u_to_kperp(u, z)
    assert np.isclose(powerspec.kperp_to_u(kp, z), u)
    # f <-> z
    assert np.isclose(powerspec.z2f(powerspec.f2z(600.0)), 600.0)
    # NEB of uniform window is 1
    assert np.isclose(powerspec.noise_equivalent_bandwidth(64, "uniform"), 1.0)
    # Sensible magnitudes (CHIME-like z~1): kpara(1us) ~ 2pi/ (dR/df * 1e6Hz)
    assert 0.1 < k < 10
    assert 0.001 < kp < 1


def test_get_1d_ps_uniform():
    # Uniform spectrum bins to the same value everywhere
    kperp = np.linspace(0.01, 0.1, 10)
    kpara = np.linspace(0.01, 1.0, 20)
    ps = np.full((20, 10), 7.0)
    w = np.ones_like(ps)
    k1, p1, perr, var, neff = powerspec.get_1d_ps(
        ps, kperp, kpara, w, Nbins_3D=5, logbins_3D=False
    )
    valid = np.isfinite(p1)
    assert np.allclose(p1[valid], 7.0)
    assert (neff[valid] >= 1).all()


def test_wiener_apply_baseline_layout(ringmap_with_tone):
    """spectrum[b, r] must map to (pol, el=b%nel, ra=r) exactly.

    An amplitude pattern separable in (ra, el) pins the layout: a
    moveaxis/reshape mix-up that folds ra into the baseline axis
    (caught by review) passes any ra/el-uniform test.
    """
    rm = ringmap_with_tone
    nra = len(rm.index_map["ra"])
    el = np.asarray(rm.index_map["el"])
    nel = len(el)
    amp_ra = 1.0 + np.arange(nra)  # distinct per ra
    amp_el = 1.0 + 10 * np.arange(nel)  # distinct per el
    tone = np.cos(2 * np.pi * TAU0 * FREQ)
    m = np.zeros(rm.map.shape)
    m[0, 0] = tone[:, None, None] * amp_ra[None, :, None] * amp_el[None, None, :]
    rm.map[:] = m

    con = powerspec.ConstructWienerDelayTransform()
    con.read_config({"prior_amp": 100.0, "window": "uniform"})
    op = con.process(rm)
    app = powerspec.ApplyWienerDelayTransform()
    app.read_config({})
    ds = app.process(rm, op)
    spec = np.asarray(ds.spectrum[:])  # [pol*el, ra, delay]
    delay = np.asarray(ds.index_map["delay"])
    ipeak = int(np.argmin(np.abs(delay - TAU0)))

    peak = np.abs(spec[:, :, ipeak])  # [nel, nra] for the single pol
    expect = amp_el[:, None] * amp_ra[None, :]
    ratio = peak / expect
    assert np.allclose(ratio, ratio[0, 0], rtol=1e-3)
