"""FFT ring-map making for cartesian arrays.

Re-provides reference ``draco/analysis/ringmapmaker.py`` (MakeVisGrid:38,
BeamformNS:186, BeamformEW:356, RingMapMaker:534, RADependentWeights:1202,
find_grid_indices:1745).  The deconvolving makers
(DeconvolveHybridMBase:538, TikhonovRingMapMaker:1075,
WienerRingMapMaker:1123) are provided in simplified m-space form.

TPU design: the per-frequency NS phase matmul loop (reference
ringmapmaker.py:300-351) becomes one batched einsum over (pol, freq, ew),
and the EW stage one batched irfft.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import config, containers, io
from ..core.task import ContainerTask, group_tasks
from ..ops.tools import calculate_redundancy, invert_no_zero, window_generalised

C_LIGHT = 299792458.0


def find_grid_indices(baselines):
    """Integer grid indices and minimum separations of a cartesian layout.

    (reference ringmapmaker.py:1745)
    """
    baselines = np.asarray(baselines)

    def _indices(sep):
        nonzero = np.abs(sep[np.abs(sep) > 1e-6])
        minsep = nonzero.min() if nonzero.size else 1.0
        return np.rint(sep / minsep).astype(int), minsep

    xind, min_xsep = _indices(baselines[:, 0])
    yind, min_ysep = _indices(baselines[:, 1])
    return xind, yind, min_xsep, min_ysep


class MakeVisGrid(ContainerTask):
    """Scatter stacked visibilities onto a pol x EW x NS grid.

    (reference ringmapmaker.py:38-183)
    """

    centered = config.Property(proptype=bool, default=False)
    save_redundancy = config.Property(proptype=bool, default=True)

    def setup(self, tel):
        self.telescope = io.get_telescope(tel)

    def process(self, sstream):
        tel = self.telescope
        ps_s = sstream.prodstack
        ps_t = tel.uniquepairs
        if not np.array_equal(
            np.stack([ps_s["input_a"], ps_s["input_b"]], axis=-1), ps_t
        ):
            raise ValueError(
                "Products in sstream do not match those in the beam transfers."
            )

        polprod = np.asarray(tel.polarisation)[tel.uniquepairs]
        polpair = np.char.add(polprod[:, 0], polprod[:, 1])
        pol, pind = np.unique(polpair, return_inverse=True)
        if len(pol) != 4:
            raise RuntimeError(f"Expected to find four polarisations. Got {pol}")
        pconjmap = np.unique([pj + pi for pi, pj in pol], return_inverse=True)[1]

        xind, yind, min_xsep, min_ysep = find_grid_indices(tel.baselines)
        nx = np.abs(xind).max() + 1
        max_yind = np.abs(yind).max()
        ny = 2 * max_yind + 1
        vis_pos_x = np.arange(nx) * min_xsep
        if self.centered:
            vis_pos_y = np.arange(-max_yind, max_yind + 1) * min_ysep
            ns_offset = max_yind
        else:
            vis_pos_y = np.fft.fftfreq(ny, d=(1.0 / (ny * min_ysep)))
            ns_offset = 0

        if "ra" in sstream.index_map:
            ra = sstream.ra
        elif "lsd" in sstream.attrs:
            ra = 360 * (tel.unix_to_lsd(sstream.time) - sstream.attrs["lsd"])
        else:
            ra = tel.lsa(sstream.time)

        grid = containers.VisGridStream(
            pol=pol, ew=vis_pos_x, ns=vis_pos_y, ra=ra,
            axes_from=sstream, attrs_from=sstream,
        )

        if self.save_redundancy:
            redundancy = np.asarray(
                calculate_redundancy(
                    np.asarray(sstream.input_flags[:]),
                    sstream.index_map["prod"][:],
                    sstream.reverse_map["stack"]["stack"][:],
                    sstream.vis.shape[1],
                )
            )
            grid.add_dataset("redundancy")

        ssv = np.asarray(sstream.vis[:])
        ssw = np.asarray(sstream.weight[:])
        gsv = np.zeros(grid.vis.shape, dtype=grid.vis.dtype)
        gsw = np.zeros(grid.weight.shape, dtype=grid.weight.dtype)
        gsr = (
            np.zeros(grid.datasets["redundancy"].shape, dtype=np.int32)
            if self.save_redundancy
            else None
        )

        # Scatter; vis index maps to (pol, x, y) grid coordinates
        for vis_ind, (p_ind, x_ind, y_ind) in enumerate(zip(pind, xind, yind)):
            gsv[p_ind, :, x_ind, ns_offset + y_ind, :] = ssv[:, vis_ind]
            gsw[p_ind, :, x_ind, ns_offset + y_ind, :] = ssw[:, vis_ind]
            if gsr is not None:
                gsr[p_ind, x_ind, ns_offset + y_ind, :] = redundancy[vis_ind]
            if x_ind == 0:
                pc_ind = pconjmap[p_ind]
                gsv[pc_ind, :, x_ind, ns_offset - y_ind, :] = ssv[:, vis_ind].conj()
                gsw[pc_ind, :, x_ind, ns_offset - y_ind, :] = ssw[:, vis_ind]
                if gsr is not None:
                    gsr[pc_ind, x_ind, ns_offset - y_ind, :] = redundancy[vis_ind]

        grid.vis[:] = gsv
        grid.weight[:] = gsw
        if gsr is not None:
            grid.datasets["redundancy"][:] = gsr
        return grid


class BeamformNS(ContainerTask):
    """Beamform in the NS direction onto an elevation grid.

    (reference ringmapmaker.py:186-353): per-frequency phase matmuls over
    the NS axis, here a single batched device einsum over (pol, freq, ew).
    """

    npix = config.Property(proptype=int, default=512)
    span = config.Property(proptype=float, default=1.0)
    weight = config.Property(proptype=str, default="natural")
    scaled = config.Property(proptype=bool, default=False)
    include_auto = config.Property(proptype=bool, default=False)
    save_dirty_beam = config.Property(proptype=bool, default=False)
    precision = config.enum([32, 64], default=64)

    def process(self, gstream):
        gstream.redistribute("freq")
        gsv = jnp.asarray(np.asarray(gstream.vis[:]))  # [pol, f, ew, ns, ra]
        gsw = jnp.asarray(np.asarray(gstream.weight[:]))

        el = self.span * np.linspace(-1.0, 1.0, self.npix)
        hv = containers.HybridVisStream(el=el, axes_from=gstream, attrs_from=gstream)
        if self.save_dirty_beam:
            hv.add_dataset("dirty_beam")

        nspos = gstream.index_map["ns"][:]
        freq = gstream.freq
        iwv = (freq * 1e6) / C_LIGHT  # [f]

        baselines_present = np.any(np.asarray(gsw) > 0, axis=(0, 1, 2, 4))
        nsmax = (
            np.abs(nspos[baselines_present]).max()
            if baselines_present.sum() > 0
            else 0.0
        )
        self.log.info(f"Maximum NS baseline is {nsmax:.2f}m")

        hv.attrs["beamform_ns_weight"] = self.weight
        hv.attrs["beamform_ns_scaled"] = self.scaled
        hv.attrs["beamform_ns_include_auto"] = self.include_auto
        hv.attrs["beamform_ns_freqmin"] = freq.min()
        hv.attrs["beamform_ns_nsmax"] = nsmax

        cdtype = jnp.complex64 if self.precision == 32 else jnp.complex128
        rdtype = jnp.float32 if self.precision == 32 else jnp.float64

        # Weights per (pol, f, ew, ns, ra)
        if self.weight == "inverse_variance":
            gw = gsw.astype(rdtype)
        elif self.weight == "natural":
            if "redundancy" not in gstream.datasets:
                raise RuntimeError(
                    "Must set save_redundancy = True for task MakeVisGrid in "
                    "order to use a natural weight scheme."
                )
            gsr = jnp.asarray(
                np.asarray(gstream.datasets["redundancy"][:]), dtype=rdtype
            )
            gw = jnp.broadcast_to(gsr[:, None], gsv.shape).astype(rdtype)
        else:
            vpos = nspos[np.newaxis, :] * iwv[:, np.newaxis]  # [f, ns]
            if self.scaled:
                vmax = nsmax * iwv.min()
            else:
                vmax = nsmax * iwv[:, np.newaxis]
            x = 0.5 * (vpos / vmax + 1)
            ns_weight = np.asarray(window_generalised(x, window=self.weight))
            gw = (gsw > 0) * jnp.asarray(ns_weight, dtype=rdtype)[
                None, :, None, :, None
            ]

        gw = gw * (gsw > 0)
        if not self.include_auto:
            gw = gw.at[..., 0, 0, :].set(0.0)

        norm = jnp.sum(gw, axis=-2)
        gw = gw * invert_no_zero(norm)[..., None, :]

        # Phase tensor F[f, el, ns] and batched contraction over ns
        phase = 2.0 * np.pi * nspos[np.newaxis, :] * el[:, np.newaxis]  # [el, ns]
        F = jnp.exp(
            -1.0j
            * jnp.asarray(phase, dtype=rdtype)[None]
            * jnp.asarray(iwv, dtype=rdtype)[:, None, None]
        ).astype(cdtype)  # [f, el, ns]

        gvw = (gsv.astype(cdtype) * gw)
        hvv = jnp.einsum("fen,pfxnr->pfxer", F, gvw)
        hv.vis[:] = np.asarray(hvv).astype(hv.vis.dtype)

        if self.save_dirty_beam:
            hvb = jnp.einsum("fen,pfxnr->pfxer", F, gw.astype(cdtype)).real
            hv.dirty_beam[:] = np.asarray(hvb).astype(np.float32)

        t = jnp.sum(invert_no_zero(gsw) * gw**2, axis=-2)
        hv.weight[:] = np.asarray(invert_no_zero(t)).astype(hv.weight.dtype)
        return hv


class BeamformEW(ContainerTask):
    """Final EW beamforming: pol rotation + irfft over EW.

    (reference ringmapmaker.py:356-531)
    """

    exclude_intracyl = config.Property(proptype=bool, default=False)
    single_beam = config.Property(proptype=bool, default=False)
    weight_ew = config.enum(["natural", "uniform"], default="natural")
    flag_ew = config.Property(proptype=list, default=None)

    def process(self, hstream):
        hstream.redistribute("freq")
        n_ew = len(hstream.index_map["ew"])
        nbeam = 1 if self.single_beam else 2 * n_ew - 1

        if self.weight_ew == "uniform":
            weight_ew = np.ones(n_ew)
        else:
            weight_ew = n_ew - np.arange(n_ew, dtype=np.float64)
        if self.exclude_intracyl:
            weight_ew[0] = 0.0
        if self.flag_ew is not None and len(self.flag_ew) == n_ew:
            weight_ew *= np.asarray(self.flag_ew, dtype=bool)
        if self.single_beam:
            weight_ew[1:] *= 2
        weight_ew = weight_ew / weight_ew.sum()

        pol, P = self._get_pol(
            [
                p.decode() if isinstance(p, bytes) else str(p)
                for p in hstream.index_map["pol"]
            ]
        )
        P2 = np.abs(P) ** 2

        save_dirty_beam = "dirty_beam" in hstream.datasets

        rm = containers.RingMap(
            beam=np.arange(nbeam), pol=pol, axes_from=hstream, attrs_from=hstream
        )
        rm.add_dataset("rms")
        if save_dirty_beam:
            rm.add_dataset("dirty_beam")

        hvv = jnp.asarray(np.asarray(hstream.vis[:]))  # [pol, f, ew, el, ra]
        hvw = jnp.asarray(np.asarray(hstream.weight[:]))  # [pol, f, ew, ra]
        Pj = jnp.asarray(P)
        wew = jnp.asarray(weight_ew)[None, None, :, None, None]

        v = jnp.tensordot(Pj, hvv.astype(Pj.dtype), axes=(1, 0)) * wew
        if self.single_beam:
            bf = jnp.sum(v.real, axis=2)[:, :, None]  # [pol, f, 1, el, ra]
        else:
            bf = jnp.fft.irfft(v, nbeam, axis=2) * nbeam
        # [pol, f, beam, el, ra] -> map axes [beam, pol, freq, ra, el]
        rm.map[:] = np.asarray(
            jnp.transpose(bf, (2, 0, 1, 4, 3))
        ).astype(rm.map.dtype)

        var = jnp.tensordot(jnp.asarray(P2), invert_no_zero(hvw), axes=(1, 0))
        rm_var = 0.5 * jnp.sum(
            jnp.asarray(weight_ew**2)[None, None, :, None] * var, axis=2
        )  # [pol, f, ra]
        rm.datasets["weight"][:] = np.asarray(
            invert_no_zero(rm_var)[..., None] * jnp.ones((1, 1, 1, len(hstream.index_map["el"])))
        ).astype(np.float64)
        rm.datasets["rms"][:] = np.asarray(rm_var**0.5).astype(np.float64)

        if save_dirty_beam:
            hvb = jnp.asarray(np.asarray(hstream.dirty_beam[:]))
            b = jnp.tensordot(Pj, hvb.astype(Pj.dtype), axes=(1, 0)) * wew
            if self.single_beam:
                db = jnp.sum(b.real, axis=2)[:, :, None]
            else:
                db = jnp.fft.irfft(b, nbeam, axis=2) * nbeam
            rm.dirty_beam[:] = np.asarray(
                jnp.transpose(db, (2, 0, 1, 4, 3))
            ).astype(np.float64)

        return rm

    @staticmethod
    def _get_pol(pols):
        """Output polarisations + rotation matrix (reference :500-531)."""
        if ("XY" in pols) or ("YX" in pols):
            if ("XY" in pols) ^ ("YX" in pols):
                raise ValueError(
                    f"If cross-pols exist, both XY and YX must be present. Got {pols}."
                )
            dpol = ["reXY", "imXY"]
        else:
            dpol = []
        if "XX" in pols:
            dpol = ["XX", *dpol]
        if "YY" in pols:
            dpol.append("YY")

        P = np.eye(len(dpol), dtype=np.complex64)
        if "reXY" in dpol:
            i = dpol.index("reXY")
            P[i, i : i + 2] = [0.5, 0.5]
            P[i + 1, i : i + 2] = [-0.5j, 0.5j]
        return np.array(dpol, dtype="U4"), P


class RingMapMaker(group_tasks(MakeVisGrid, BeamformNS, BeamformEW)):
    """Make a ringmap from a sidereal stream (reference ringmapmaker.py:534)."""


class RADependentWeights(ContainerTask):
    """Scale ring-map weights by the RA-dependent redundancy.

    (reference ringmapmaker.py:1202, simplified): the weights of the ring
    map are modulated by the fraction of live inputs as a function of RA
    derived from the grid redundancy.
    """

    def setup(self, gstream):
        self.gstream = gstream

    def process(self, rmap):
        if "redundancy" not in self.gstream.datasets:
            self.log.info("No redundancy dataset found; passing through.")
            return rmap
        red = np.asarray(self.gstream.datasets["redundancy"][:])  # [p,ew,ns,ra]
        frac = red.sum(axis=(1, 2)) / np.maximum(
            red.sum(axis=(1, 2)).max(axis=-1, keepdims=True), 1
        )  # [pol, ra]
        w = np.asarray(rmap.datasets["weight"][:])
        npol_rm = w.shape[0]
        frac_use = frac[:npol_rm]
        w = w * frac_use[:, np.newaxis, :, np.newaxis]
        rmap.datasets["weight"][:] = w.astype(np.float64)
        return rmap
