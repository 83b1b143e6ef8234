"""Continuous wavelet transform via batched device FFTs.

Replaces the reference's pywt-based CWT (reference
draco/analysis/wavelet.py:127 uses ``pywt.cwt(..., method="fft")``), which
is unavailable here and host-bound anyway.  The analytic Morlet transform
is computed directly in the Fourier domain — one batched FFT, a broadcast
multiply against the scale bank, and one batched inverse FFT, all on
device.

Convention (Torrence & Compo 1998): for data x(t) sampled at dt,

    W(s, t) = ifft( fft(x) * sqrt(2 pi s / dt) * psihat(s w)* )
    psihat(w) = pi^-1/4 exp(-(w - w0)^2 / 2) * (w > 0)   [analytic Morlet]

and the scale corresponding to Fourier frequency f is
``s = (w0 + sqrt(2 + w0^2)) / (4 pi f)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["morlet_fourier", "frequency2scale", "cwt_morlet", "cwt_var"]

W0_DEFAULT = 5.0


def morlet_fourier(w, w0: float = W0_DEFAULT):
    """Fourier transform of the analytic Morlet wavelet (positive side)."""
    w = jnp.asarray(w)
    return (np.pi**-0.25) * jnp.exp(-0.5 * (w - w0) ** 2) * (w > 0)


def frequency2scale(freq, w0: float = W0_DEFAULT, dt: float = 1.0):
    """Scale whose Fourier-equivalent frequency is ``freq``.

    Equivalent role to ``pywt.frequency2scale`` (reference wavelet.py:69):
    uses the Morlet scale-frequency relation
    ``lambda = 4 pi s / (w0 + sqrt(2 + w0^2))``.
    """
    freq = np.asarray(freq, dtype=np.float64)
    return (w0 + np.sqrt(2.0 + w0**2)) / (4 * np.pi * freq * dt)


@functools.partial(jax.jit, static_argnames=("axis",))
def cwt_morlet(x, scales, w0: float = W0_DEFAULT, axis: int = -1):
    """Continuous Morlet wavelet transform along ``axis``.

    Parameters
    ----------
    x : [..., n] real or complex data
    scales : [nscale] wavelet scales in samples
    w0 : Morlet centre frequency

    Returns
    -------
    W : complex array [nscale, ...x.shape] — the transform; the scale axis
        is prepended.
    """
    x = jnp.asarray(x)
    scales = jnp.asarray(scales, dtype=jnp.float64)
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]

    xf = jnp.fft.fft(x, axis=-1)
    w = 2.0 * np.pi * jnp.fft.fftfreq(n, d=1.0)  # angular freq per sample

    # [nscale, n] wavelet bank (conjugate of an analytic wavelet is itself
    # on the positive frequencies)
    norm = jnp.sqrt(2.0 * np.pi * scales)
    bank = norm[:, None] * morlet_fourier(scales[:, None] * w[None, :], w0)

    Wf = xf[None, ...] * bank.reshape(
        (scales.shape[0],) + (1,) * (x.ndim - 1) + (n,)
    ).astype(xf.dtype)
    W = jnp.fft.ifft(Wf, axis=-1)
    return jnp.moveaxis(W, -1, axis if axis >= 0 else W.ndim + axis)


@functools.partial(jax.jit, static_argnames=("axis",))
def cwt_var(W, axis: int = 1):
    """Variance of the transform over ``axis`` (device replacement for the
    reference's Cython ``_fast_var``, _fast_tools.pyx:307)."""
    W = jnp.asarray(W)
    mu = jnp.mean(W, axis=axis, keepdims=True)
    return jnp.mean(jnp.abs(W - mu) ** 2, axis=axis)
