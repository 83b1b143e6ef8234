"""Interferometry helpers: fringestop phases.

Re-provides reference ``draco/util/interferometry.py`` (fringestop_phase:15)
plus the projected-distance geometry it pulls from caput.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def projected_distance(ha, lat, dec, u, v, w=0.0):
    """Baseline distance projected towards a source, in wavelengths.

    All angles in radians; (u, v, w) = (EW, NS, up) baseline components of
    (d_i - d_j) / lambda.  Arguments broadcast together.
    """
    xp = jnp if any(isinstance(a, jnp.ndarray) for a in (ha, u, v)) else np
    sinh, cosh_ = xp.sin(ha), xp.cos(ha)
    sind, cosd = xp.sin(dec), xp.cos(dec)
    sinl, cosl = xp.sin(lat), xp.cos(lat)
    return (
        u * cosd * sinh
        + v * (cosl * sind - sinl * cosd * cosh_)
        + w * (sinl * sind + cosl * cosd * cosh_)
    )


def fringestop_phase(ha, lat, dec, u, v, w=0.0):
    """Phase that *corrects* the fringing for a source at (ha, dec).

    (reference interferometry.py:15-44)
    """
    xp = jnp if any(isinstance(a, jnp.ndarray) for a in (ha, u, v)) else np
    return xp.exp(-2.0j * np.pi * projected_distance(ha, lat, dec, u, v, w))


def beamform_kernel(vis, sumweight, dec, lat, cosha, sinha, u, v):
    """Fringestop + weighted product sum: the beamforming hot loop.

    Batched device replacement for the Cython ``beamform``
    (reference draco/util/_fast_tools.pyx:211): for each (freq, ha),
    sum over products of weight * Re(vis * fringestop_phase).

    Parameters
    ----------
    vis : [nfreq, nha, nprod] complex
    sumweight : [nfreq, nha, nprod] real
    dec, lat : float (radians)
    cosha, sinha : [nha]
    u, v : [nfreq, nprod] baseline components in wavelengths

    Returns
    -------
    formed : [nfreq, nha] real (unnormalised weighted sum)
    """
    vis = jnp.asarray(vis)
    sumweight = jnp.asarray(sumweight)
    cosha = jnp.asarray(cosha)
    sinha = jnp.asarray(sinha)
    u = jnp.asarray(u)
    v = jnp.asarray(v)

    sind, cosd = np.sin(dec), np.cos(dec)
    sinl, cosl = np.sin(lat), np.cos(lat)
    # distance[f, h, p] = u c_d sH + v (cL sd - sL cd cH)
    dist = (
        u[:, None, :] * (cosd * sinha)[None, :, None]
        + v[:, None, :]
        * (cosl * sind - sinl * cosd * cosha)[None, :, None]
    )
    phase = jnp.exp(-2.0j * np.pi * dist)
    return jnp.sum(sumweight * (vis * phase).real, axis=-1)
