"""Fringestopping (down/up-mixing) of visibilities.

Re-provides reference ``draco/analysis/fringestop.py`` (Mix:10, DownMix:130,
UpMix:136).  The reference's per-frequency / per-RA Python loop over phase
multiplications (fringestop.py:115-122) is one broadcast device multiply.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import io
from ..core.task import ContainerTask

C_LIGHT = 299792458.0


class Mix(ContainerTask):
    r"""Multiply visibilities by a fringe-rate phasor in earth-rotation angle.

    ``V -> V * exp(+/- i * omega * phi)`` with ``omega = 2 pi b_ew
    cos(dec) / lambda`` — removes the fringing of a source at the field
    centre, enabling further time downsampling (reference fringestop.py:10).
    """

    def setup(self, manager):
        """Set the telescope / observer used for baselines and LSA."""
        self.telescope = io.get_telescope(manager)

    def process(self, stream):
        """Mix the visibilities in place."""
        sign = -1.0 if self.conjugate else 1.0

        freq = np.asarray(stream.freq)
        vis = np.asarray(stream.vis[:])
        weight = np.asarray(stream.weight[:])

        hybrid = "ew" in stream.index_map

        if hybrid:
            x = np.asarray(stream.index_map["ew"])[:, np.newaxis]  # [new, 1]
        else:
            prod = stream.prodstack
            aa, bb = prod["input_a"], prod["input_b"]
            x = (
                self.telescope.feedpositions[aa, 0]
                - self.telescope.feedpositions[bb, 0]
            )
            mask = self.telescope.feedmask[(aa, bb)][
                np.newaxis, :, np.newaxis
            ].astype(float)
            vis = vis * mask
            weight = weight * mask

        if "ra" in stream.index_map:
            dphi = np.radians(np.asarray(stream.ra))
        else:
            dphi = np.radians(self.telescope.unix_to_lsa(np.asarray(stream.time)))

        if "el" in stream.index_map:
            cos_dec = np.cos(
                np.arcsin(np.asarray(stream.index_map["el"])[np.newaxis, :])
                + np.radians(self.telescope.latitude)
            )  # [1, nel]
        else:
            pointing = getattr(self.telescope, "elevation_pointing_offset", 0.0)
            cos_dec = np.cos(np.radians(self.telescope.latitude + pointing))

        lmbda = C_LIGHT / (freq * 1e6)
        # omega broadcast: standard [nfreq, nstack]; hybrid [nfreq, new, nel]
        omega = 2.0 * np.pi * x * cos_dec / lmbda.reshape(
            (-1,) + (1,) * np.ndim(x * cos_dec)
        )

        # One broadcast phasor multiply on device
        phase = jnp.exp(1.0j * sign * jnp.asarray(omega)[..., None] * jnp.asarray(dphi))
        if hybrid:
            # vis axes [pol, freq, ew, el, ra]; phase [freq, ew, el, ra]
            out = jnp.asarray(vis) * phase[None]
        else:
            # vis axes [freq, stack, time]; phase [freq, stack, time]
            out = jnp.asarray(vis) * phase

        stream.vis[:] = np.asarray(out).astype(stream.vis.dtype)
        stream.weight[:] = weight.astype(stream.weight.dtype)
        stream.attrs["fringestopped"] = not self.conjugate

        return stream


class DownMix(Mix):
    """Down-mix the visibilities (reference fringestop.py:130)."""

    conjugate = False


class UpMix(Mix):
    """Up-mix the visibilities (reference fringestop.py:136)."""

    conjugate = True
