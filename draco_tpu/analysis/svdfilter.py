"""Per-m SVD filtering of m-modes.

Re-provides reference ``draco/analysis/svdfilter.py`` (SVDSpectrumEstimator:11,
SVDFilter:60, svd_em:148): global per-m SVD across (freq x msign*baseline)
to find and remove bright correlated modes, with EM infilling of masked
entries.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as la

from ..core import config, containers
from ..core.task import ContainerTask


class SVDSpectrumEstimator(ContainerTask):
    """Calculate the per-m SVD spectrum of m-modes (reference svdfilter.py:11)."""

    niter = config.Property(proptype=int, default=5)

    def process(self, mmodes):
        mmodes.redistribute("m")
        vis = np.asarray(mmodes.vis[:])
        weight = np.asarray(mmodes.weight[:])
        nmode = min(vis.shape[1] * vis.shape[3], vis.shape[2])

        spec = containers.SVDSpectrum(
            singularvalue=np.arange(nmode), axes_from=mmodes
        )
        out = np.zeros(spec.spectrum.shape)
        for m in range(vis.shape[0]):
            vis_m = vis[m].transpose(1, 0, 2).reshape(vis.shape[2], -1)
            weight_m = weight[m].transpose(1, 0, 2).reshape(vis.shape[2], -1)
            mask_m = weight_m == 0.0
            _, sig, _ = svd_em(vis_m, mask_m, niter=self.niter)
            out[m] = sig[:nmode]
        spec.spectrum[:] = out
        return spec


class SVDFilter(ContainerTask):
    """Remove the most correlated SVD modes per m (reference svdfilter.py:60).

    Attributes
    ----------
    niter : int
        EM iterations for masked values.
    local_threshold, global_threshold : float
        Cut modes above these fractions of the per-m / global maximum
        singular value.
    """

    niter = config.Property(proptype=int, default=5)
    global_threshold = config.Property(proptype=float, default=1e-3)
    local_threshold = config.Property(proptype=float, default=1e-2)

    def process(self, mmodes):
        mmodes.redistribute("m")
        vis = np.asarray(mmodes.vis[:]).copy()
        weight = np.asarray(mmodes.weight[:])

        # First pass for the global maximum singular value
        sv_max = 0.0
        svds = []
        for m in range(vis.shape[0]):
            vis_m = vis[m].transpose(1, 0, 2).reshape(vis.shape[2], -1)
            weight_m = weight[m].transpose(1, 0, 2).reshape(vis.shape[2], -1)
            mask_m = weight_m == 0.0
            u, sig, vh = svd_em(vis_m, mask_m, niter=self.niter)
            svds.append((u, sig, vh))
            if len(sig):
                sv_max = max(float(sig[0]), sv_max)
        self.log.debug("Largest singular value across all m: %.2g", sv_max)

        # Second pass: cut modes above the thresholds
        for m, (u, sig, vh) in enumerate(svds):
            global_cut = (sig > self.global_threshold * sv_max).sum()
            local_cut = (sig > self.local_threshold * sig[0]).sum() if len(sig) else 0
            cut = max(global_cut, local_cut)
            sig = sig.copy()
            sig[:cut] = 0.0
            vis_m = u @ (sig[:, np.newaxis] * vh)
            vis[m] = vis_m.reshape(vis.shape[2], 2, -1).transpose(1, 0, 2)

        mmodes.vis[:] = vis.astype(mmodes.vis.dtype)
        return mmodes


def svd_em(A, mask, niter: int = 5, rank: int = 5, full_matrices: bool = False):
    """SVD with missing entries via EM infilling (reference svdfilter.py:148)."""
    A = np.asarray(A).copy()
    if (~mask).any():
        A[mask] = np.median(A[~mask].real) + (
            1j * np.median(A[~mask].imag) if np.iscomplexobj(A) else 0.0
        )
    else:
        A[mask] = 0.0
    for _ in range(niter):
        u, sig, vh = la.svd(A, full_matrices=full_matrices, overwrite_a=False)
        low_rank_A = (u[:, :rank] * sig[:rank]) @ vh[:rank]
        A[mask] = low_rank_A[mask]
    return u, sig, vh
