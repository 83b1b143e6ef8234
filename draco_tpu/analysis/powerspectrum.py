"""Quadratic power spectrum estimation from KL modes.

Re-provides reference ``draco/analysis/powerspectrum.py``
(QuadraticPSEstimation:10): per-m q estimators summed over m, then a
Fisher unmixing into band powers.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as la

from ..core import config, containers
from ..core.task import ContainerTask


class QuadraticPSEstimation(ContainerTask):
    """Estimate a 2D band power spectrum from KLModes.

    (reference powerspectrum.py:10-95)

    Attributes
    ----------
    psname : str
        Name of the power spectrum estimator in the product manager.
    pstype : 'unwindowed' | 'minimum_variance' | 'uncorrelated'
    """

    psname = config.str_prop("ps")
    pstype = config.enum(
        ["unwindowed", "minimum_variance", "uncorrelated"], default="unwindowed"
    )

    def setup(self, manager):
        self.manager = manager

    def process(self, klmodes):
        if not isinstance(klmodes, containers.KLModes):
            raise ValueError(
                f"A KLModes container is required here, "
                f"not {klmodes.__class__!s}"
            )
        pse = self.manager.psestimators[self.psname]
        pse.genbands()

        vis = np.asarray(klmodes.vis[:])
        nmode = np.asarray(klmodes.nmode[:])
        # one batched device contraction over every m at once
        q = pse.q_estimator_all(vis, nmode)

        fisher, bias = pse.fisher_bias()

        ps = containers.Powerspectrum2D(
            kperp_edges=pse.kperp_bands, kpar_edges=pse.kpar_bands
        )
        npar = len(ps.index_map["kpar"])
        nperp = len(ps.index_map["kperp"])

        if self.pstype == "unwindowed":
            M = la.pinv(fisher, rtol=1e-8)
        elif self.pstype == "uncorrelated":
            Fh = la.cholesky(fisher)
            M = la.inv(Fh) / Fh.sum(axis=1)[:, np.newaxis]
        else:  # minimum_variance
            # a zero Fisher row means the band is unconstrained: its
            # normalisation is ZERO (passing 1.0 would write the raw
            # q - bias through as a plausible-looking band power)
            rs = fisher.sum(axis=1)
            M = np.diag(np.where(rs == 0, 0.0, 1.0 / np.where(rs == 0, 1, rs)))

        # q is indexed [kpar-band, kperp-band] flattened; reshape to
        # (nperp, npar) for the container layout
        power = (M @ (q - bias)).reshape(npar, nperp).T
        ps.powerspectrum[:] = power
        ps.C_inv[:] = fisher.reshape(npar, nperp, npar, nperp).transpose(
            1, 0, 3, 2
        )
        return ps
