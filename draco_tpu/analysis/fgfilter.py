"""Foreground filtering via SVD/KL mode projection.

Re-provides reference ``draco/analysis/fgfilter.py`` (_ProjectFilterBase:10,
SVDModeProject:53, KLModeProject:145): forward/backward/filter projections
between m-modes, the telescope SVD basis, and the KL basis.
"""

from __future__ import annotations

import numpy as np

from ..core import config, containers, io
from ..core.task import ContainerTask
from ..ops.tools import device_to_numpy


class _ProjectFilterBase(ContainerTask):
    """Project data to/from a basis (reference fgfilter.py:10).

    Attributes
    ----------
    mode : 'forward' | 'backward' | 'filter'
    """

    mode = config.enum(["forward", "backward", "filter"], default="forward")

    def process(self, inp):
        if self.mode == "forward":
            return self._forward(inp)
        if self.mode == "backward":
            return self._backward(inp)
        if self.mode == "filter":
            return self._backward(self._forward(inp))
        return None

    def _forward(self, inp):
        pass

    def _backward(self, inp):
        pass


class SVDModeProject(_ProjectFilterBase):
    """Project between raw m-modes and the telescope SVD basis.

    (reference fgfilter.py:53-142): packed SVD modes concatenate each
    frequency's modes.
    """

    def setup(self, bt):
        self.beamtransfer = io.get_beamtransfer(bt)

    def _forward(self, mmodes):
        bt = self.beamtransfer
        bt._ensure_svd()
        tel = bt.telescope
        k = bt.svd_len()

        svdmodes = containers.SVDModes(
            mode=np.arange(tel.nfreq * k), axes_from=mmodes, attrs_from=mmodes
        )
        vis = np.asarray(mmodes.vis[:])
        svis = np.zeros(svdmodes.vis.shape, dtype=np.complex128)
        nmode = np.zeros(len(svdmodes.index_map["m"]), dtype=np.int32)
        # all m at once: one batched device einsum instead of the
        # reference's per-m host loop (reference fgfilter.py:85-97)
        svdm = device_to_numpy(bt.project_telescope_to_svd(vis))  # [M, f, k]
        nfk = svdm.shape[1] * svdm.shape[2]
        svis[:, :nfk] = svdm.reshape(svdm.shape[0], -1)
        nmode[:] = nfk
        svdmodes.vis[:] = svis
        svdmodes.nmode[:] = nmode
        w = np.asarray(mmodes.weight[:])
        svdmodes.weight[:] = np.median(
            w.reshape(w.shape[0], -1), axis=1
        )[:, np.newaxis] * np.ones_like(svis.real)
        return svdmodes

    def _backward(self, svdmodes):
        bt = self.beamtransfer
        bt._ensure_svd()
        tel = bt.telescope
        k = bt.svd_len()

        feed_index = tel.input_index
        freqmap = containers.make_freq_map(tel.frequencies)

        mmodes = containers.MModes(
            freq=freqmap,
            prod=tel.uniquepairs,
            input=feed_index,
            attrs_from=svdmodes,
            axes_from=svdmodes,
        )
        svis = np.asarray(svdmodes.vis[:])
        # batched inverse: [M, f, k] -> [M, f, ntel] in one device einsum
        svdm = svis[:, : tel.nfreq * k].reshape(-1, tel.nfreq, k)
        tm = device_to_numpy(bt.project_svd_to_telescope(svdm))
        vis = tm.reshape(-1, tel.nfreq, 2, tel.npairs).transpose(0, 2, 1, 3)
        mmodes.vis[:] = vis.astype(np.complex128)
        w = np.asarray(svdmodes.weight[:])
        mmodes.weight[:] = np.median(w.reshape(w.shape[0], -1), axis=1)[
            :, np.newaxis, np.newaxis, np.newaxis
        ] * np.ones(mmodes.weight.shape)
        return mmodes


class KLModeProject(_ProjectFilterBase):
    """Project between the SVD and KL bases (reference fgfilter.py:145).

    Attributes
    ----------
    threshold : float
        KL eigenvalue threshold.
    klname : str
        Name of the KL transform in the product manager.
    """

    threshold = config.float_prop(None)
    klname = config.str_prop("kl")

    def setup(self, manager):
        self.product_manager = manager

    def _get_kl(self):
        if self.klname not in self.product_manager.kltransforms:
            raise RuntimeError(
                f"KL basis {self.klname!r} is not defined here (choices "
                f"are {list(self.product_manager.kltransforms.keys())!r})"
            )
        return self.product_manager.kltransforms[self.klname]

    def _forward(self, svdmodes):
        kl = self._get_kl()

        nmode_in = np.asarray(svdmodes.nmode[:])
        klmodes = containers.KLModes(
            mode=np.arange(svdmodes.vis.shape[1]),
            axes_from=svdmodes,
            attrs_from=svdmodes,
        )
        svis = np.asarray(svdmodes.vis[:])
        kvis = np.zeros(klmodes.vis.shape, dtype=np.complex128)
        # all m at once (reference fgfilter.py:190-203 loops on the host);
        # input rows past each m's mode count are already zero
        mask = np.arange(svis.shape[1])[None, :] < nmode_in[:, None]
        out, nmode = kl.project_svd_to_kl(
            svis * mask, threshold=self.threshold
        )
        kvis[:, : out.shape[1]] = out
        klmodes.vis[:] = kvis
        klmodes.nmode[:] = nmode
        w = np.asarray(svdmodes.weight[:])
        klmodes.weight[:] = np.median(w.reshape(w.shape[0], -1), axis=1)[
            :, np.newaxis
        ] * np.ones_like(kvis.real)
        return klmodes

    def _backward(self, klmodes):
        kl = self._get_kl()
        nmode_in = np.asarray(klmodes.nmode[:])
        svdmodes = containers.SVDModes(
            mode=np.arange(klmodes.vis.shape[1]),
            axes_from=klmodes,
            attrs_from=klmodes,
        )
        kvis = np.asarray(klmodes.vis[:])
        svis = np.zeros(svdmodes.vis.shape, dtype=np.complex128)
        mask = np.arange(kvis.shape[1])[None, :] < nmode_in[:, None]
        out = kl.project_kl_to_svd(kvis * mask, threshold=self.threshold)
        nmode = np.full(len(svdmodes.index_map["m"]), out.shape[1], np.int32)
        svis[:, : out.shape[1]] = out
        svdmodes.vis[:] = svis
        svdmodes.nmode[:] = nmode
        w = np.asarray(klmodes.weight[:])
        svdmodes.weight[:] = np.median(w.reshape(w.shape[0], -1), axis=1)[
            :, np.newaxis
        ] * np.ones_like(svis.real)
        return svdmodes
