"""Beam model tasks: beam streams for ring-map deconvolution.

Re-provides reference ``draco/analysis/beam.py`` (CreateBeamStream:25,
CreateBeamStreamFromTelescope:159).  The fringestop phase and the beam
placement onto the RA grid are broadcast device ops; the telescope beam
evaluation is batched over the full (dec, ha) grid per frequency instead
of point-by-point.
"""

from __future__ import annotations

import numpy as np

from ..core import containers, io
from ..core.task import ContainerTask
from ..ops.interferometry import fringestop_phase
from ..ops.tools import invert_no_zero

C_LIGHT = 299792458.0


class CreateBeamStream(ContainerTask):
    """Convert a GridBeam into a HybridVisStream beam transfer function.

    (reference beam.py:25-156)
    """

    telescope = None

    def setup(self, telescope):
        """Set the telescope object."""
        self.telescope = io.get_telescope(telescope)
        self.log.info(
            f"Using telescope at latitude {self.telescope.latitude:.4f} "
            f"deg with rotation angle {self.telescope.rotation_angle:.4f} deg."
        )

    def process(self, data, beam):
        """Build the effective beam transfer function on the data's grid.

        Parameters
        ----------
        data : containers.HybridVisStream
            Data to be deconvolved.
        beam : containers.GridBeam
            Beam model in celestial coordinates.

        Returns
        -------
        out : containers.HybridVisStream
        """
        freq = np.asarray(beam.freq)

        if beam.coords != "celestial":
            raise RuntimeError(
                "Beam must be converted to celestial coordinates prior to "
                "generating a HybridVisStream."
            )

        dec = np.asarray(beam.theta)
        el_beam = np.sin(np.radians(dec - self.telescope.latitude))
        el_data = np.asarray(data.index_map["el"])
        if not np.allclose(el_beam, el_data):
            raise RuntimeError("The el axis for the beam and data do not match.")

        # Map beam hour angles onto an RA grid covering [0, 360)
        ha = np.asarray(beam.phi)
        ra_beam = (ha + 360.0) % 360.0
        nra = round(360.0 / np.abs(ha[1] - ha[0]))
        delta_ra = 360.0 / nra
        map_ra = np.rint(ra_beam / delta_ra).astype(int)
        if not np.allclose(ra_beam / delta_ra, map_ra, atol=1e-4):
            raise ValueError(
                "Input beam cannot be placed on an grid between 0 and 360 degrees."
            )

        x = np.asarray(data.index_map["ew"])

        arr_ha = np.radians(ha[np.newaxis, np.newaxis, np.newaxis, :])
        arr_dec = np.radians(dec[np.newaxis, np.newaxis, :, np.newaxis])

        lmbda = C_LIGHT * 1e-6 / freq
        u = (x[np.newaxis, :] / lmbda[:, np.newaxis])[:, :, np.newaxis, np.newaxis]

        # Rotate baselines by the telescope rotation angle; corrects the
        # phase from the (unrotated) NS beamforming (reference beam.py:112)
        rot = np.radians(self.telescope.rotation_angle)
        v = np.sin(rot) * u
        u = np.cos(rot) * u

        phi = np.asarray(
            fringestop_phase(
                arr_ha, np.radians(self.telescope.latitude), arr_dec, u, v
            )
        ).conj()

        # Average the weight over el (output weight has no el axis)
        bweight = np.asarray(beam.weight[:])
        bweight = np.sum(bweight, axis=-2) * np.asarray(
            invert_no_zero(np.sum(bweight > 0, axis=-2).astype(np.float32))
        )

        # (freq, pol, ...) -> (pol, freq, ...)
        bweight = bweight.swapaxes(0, 1)
        bvis = np.asarray(beam.beam[:]).swapaxes(0, 1)

        out = containers.HybridVisStream(
            ra=nra, axes_from=data, attrs_from=data
        )
        for dset in out.datasets.values():
            dset[:] = np.zeros(dset.shape, dtype=dset.dtype)

        w = np.asarray(out.weight[:])
        v_out = np.asarray(out.vis[:])
        w[..., map_ra] = bweight
        v_out[..., map_ra] = bvis * phi[np.newaxis, ...]
        out.weight[:] = w
        out.vis[:] = v_out

        return out


class CreateBeamStreamFromTelescope(CreateBeamStream):
    """Create a beam stream from a telescope instance (reference beam.py:159)."""

    def process(self, data):
        """Evaluate the telescope beam and convert to a HybridVisStream."""
        beam = self._evaluate_beam(data)
        return super().process(data, beam)

    def _evaluate_beam(self, data):
        """Evaluate the beam at the data's (el, RA) coordinates.

        (reference beam.py:179-257).  The beam is evaluated on the full
        grid in one batched call per (freq, pol) instead of per-pixel.
        """
        inputs = np.array(["common-mode"])
        ha = (np.asarray(data.ra) + 180.0) % 360.0 - 180.0
        dec = (
            np.degrees(np.arcsin(np.asarray(data.index_map["el"])))
            + self.telescope.latitude
        )

        out = containers.GridBeam(
            theta=dec, phi=ha, input=inputs, axes_from=data, attrs_from=data
        )
        out.beam[:] = np.zeros(out.beam.shape, dtype=out.beam.dtype)
        out.weight[:] = np.ones(out.weight.shape, dtype=out.weight.dtype)

        beam = np.asarray(out.beam[:])
        weight = np.asarray(out.weight[:])

        pol_pairs = [
            p.decode() if isinstance(p, bytes) else str(p)
            for p in out.index_map["pol"]
        ]
        unique_pol = list({p for pp in pol_pairs for p in pp})
        tel_pol = list(self.telescope.polarisation)
        map_pol_to_feed = {pol: tel_pol.index(pol) for pol in unique_pol}

        fmap = data.index_map["freq"]
        centres = fmap["centre"] if fmap.dtype.names else fmap
        widths = (
            fmap["width"]
            if fmap.dtype.names
            else np.full(len(centres), np.abs(np.diff(centres)).mean())
        )
        local_freq_index = np.array(
            [
                int(np.argmin(np.abs(nu - self.telescope.frequencies)))
                for nu in centres
            ]
        )
        local_freq_flag = np.abs(
            centres - self.telescope.frequencies[local_freq_index]
        ) <= (0.5 * widths)

        angpos = np.meshgrid(
            0.5 * np.pi - np.radians(dec), np.radians(ha), indexing="ij"
        )
        angpos = np.hstack([ap.reshape(ap.size, 1) for ap in angpos])
        shp = (dec.size, ha.size)

        for ff, freq in enumerate(local_freq_index):
            if not local_freq_flag[ff]:
                weight[ff] = 0.0
                continue
            for pp, pol in enumerate(pol_pairs):
                bii = self.telescope.beam_at(map_pol_to_feed[pol[0]], freq, angpos)
                if pol[0] != pol[1]:
                    bjj = self.telescope.beam_at(
                        map_pol_to_feed[pol[1]], freq, angpos
                    )
                else:
                    bjj = bii
                power = np.asarray(bii) * np.asarray(bjj).conj()
                if power.ndim == 2:
                    # polarised beams: sum over the (E_theta, E_phi) axis
                    power = power.sum(axis=-1)
                beam[ff, pp, 0] = power.reshape(shp)

        out.beam[:] = beam
        out.weight[:] = weight
        return out
