"""Sensitivity analysis tasks.

Re-provides reference ``draco/analysis/sensitivity.py``
(ComputeSystemSensitivity:11).  The per-polarisation / per-frequency
accumulation loops become vectorised gathers + sums; the radiometric
auto-pair double loop is built from an outer product over the (small) set
of stacked autocorrelations.
"""

from __future__ import annotations

import numpy as np

from ..core import config, containers, io
from ..core.task import ContainerTask
from ..ops import tools


class ComputeSystemSensitivity(ContainerTask):
    """Compute the sensitivity of stacked visibilities.

    (reference sensitivity.py:11-261)

    Attributes
    ----------
    exclude_intracyl : bool
        Exclude intracylinder baselines from the estimate.  Raises if the
        data have already been stacked over cylinders.
    """

    exclude_intracyl = config.Property(proptype=bool, default=False)

    def setup(self, telescope):
        """Save the telescope model."""
        self.telescope = io.get_telescope(telescope)

    def process(self, data):
        """Estimate measured and radiometric noise of the input data."""
        nfreq, _, ntime = data.vis.shape

        inpflg = np.asarray(data.input_flags[:]).astype(bool)
        niff = 1

        if "gain" in data.datasets:
            gainflg = np.asarray(data.datasets["gain"][:]) != (1.0 + 0.0j)
            inpflg = np.swapaxes(inpflg[np.newaxis, :, :] & gainflg, 0, 1)
            inpflg = inpflg.reshape(inpflg.shape[0], -1)
            niff = nfreq

        uniq_inpflg, index_cnt = np.unique(inpflg, return_inverse=True, axis=1)

        cnt = tools.calculate_redundancy(
            uniq_inpflg.astype(np.float32),
            np.asarray(data.prod),
            np.asarray(data.reverse_map["stack"]["stack"]),
            len(data.stack),
        )

        stack_new, stack_flag = tools.redefine_stack_index_map(
            self.telescope,
            data.input,
            data.prod,
            data.stack,
            data.reverse_map["stack"],
        )
        if not np.all(stack_flag):
            self.log.warning(
                f"There are {np.sum(~stack_flag):0.0f} stacked baselines "
                "that are masked in the telescope instance."
            )

        ps = data.prod[stack_new["prod"]]
        conj = stack_new["conjugate"].astype(bool)

        prodstack = ps.copy()
        prodstack["input_a"] = np.where(conj, ps["input_b"], ps["input_a"])
        prodstack["input_b"] = np.where(conj, ps["input_a"], ps["input_b"])

        tel_index = tools.find_inputs(
            self.telescope.input_index, data.input, require_match=False
        )

        input_pol = np.array(
            [
                self.telescope.polarisation[ti] if ti is not None else "N"
                for ti in tel_index
            ]
        )
        ew_position = np.array(
            [
                self.telescope.feedpositions[ti, 0] if ti is not None else 0.0
                for ti in tel_index
            ]
        )

        pa = input_pol[prodstack["input_a"]]
        pb = input_pol[prodstack["input_b"]]
        pol_a = np.where(pa <= pb, pa, pb)
        pol_b = np.where(pa <= pb, pb, pa)
        baseline_pol = np.char.add(pol_a, pol_b)

        ew_intra = 0.5 * getattr(self.telescope, "cylinder_width", 0.0)
        if self.exclude_intracyl:
            baseline_flag = (
                np.abs(
                    ew_position[prodstack["input_a"]]
                    - ew_position[prodstack["input_b"]]
                )
                > ew_intra
            )
        else:
            baseline_flag = np.ones(prodstack.size, dtype=bool)

        pol_uniq = [bp for bp in np.unique(baseline_pol) if "N" not in bp]
        pol_index = [
            np.flatnonzero((baseline_pol == up) & baseline_flag)
            for up in pol_uniq
        ]
        npol = len(pol_uniq)

        auto_flag = (
            prodstack["input_a"] == prodstack["input_b"]
        ).astype(np.float32)

        if self.exclude_intracyl and (np.sum(auto_flag) == npol):
            raise ValueError(
                "You have requested the exclusion of intracylinder "
                "baselines, however it appears that the visibilities have "
                "already been stacked over cylinder, preventing "
                "calculation of the radiometric estimate."
            )

        bweight = np.asarray(data.weight[:])
        bflag = bweight > 0.0

        # cnt mapped to the (freq-replicated) time axis: [nstack, niff*ntime]
        cnt_ft = cnt[:, index_cnt].reshape(cnt.shape[0], niff, ntime)

        var = np.zeros((nfreq, npol, ntime), dtype=np.float32)
        counter = np.zeros((nfreq, npol, ntime), dtype=np.float32)

        for pp, ipol in enumerate(pol_index):
            # [nstack_p, niff, ntime] -> broadcast over frequency blocks
            pcnt = cnt_ft[ipol]
            pscale = (2.0 - auto_flag[ipol])[np.newaxis, :, np.newaxis]

            pvar = np.asarray(tools.invert_no_zero(bweight[:, ipol, :]))
            pflag = bflag[:, ipol, :].astype(np.float32)

            # Expand the per-unique-flag counts onto the frequency axis
            fidx = np.arange(nfreq) % niff
            pfcnt = np.moveaxis(pcnt[:, fidx], 1, 0)  # [nfreq, nstack_p, ntime]

            var[:, pp, :] = np.sum(pfcnt**2 * pscale * pflag * pvar, axis=1)
            counter[:, pp, :] = np.sum(pfcnt * pscale * pflag, axis=1)

        var *= np.asarray(tools.invert_no_zero(counter**2))

        # Radiometric estimate from products of stacked autocorrelations
        auto_stack_id = np.flatnonzero(auto_flag)
        auto_input = prodstack["input_a"][auto_stack_id]
        auto_pol = input_pol[auto_input]

        fidx = np.arange(nfreq) % niff
        auto_cnt = np.moveaxis(
            cnt_ft[auto_stack_id][:, fidx], 1, 0
        )  # [nfreq, nauto, ntime]
        num_feed = auto_cnt * bflag[:, auto_stack_id, :].astype(np.float32)

        auto = np.asarray(data.vis[:])[:, auto_stack_id, :].real

        radiometer = np.zeros((nfreq, npol, ntime), dtype=np.float32)
        radiometer_counter = np.zeros((nfreq, npol, ntime), dtype=np.float32)

        nauto = len(auto_input)
        for ii in range(nauto):
            for jj in range(nauto):
                ai, pi = auto_input[ii], auto_pol[ii]
                aj, pj = auto_input[jj], auto_pol[jj]
                if self.exclude_intracyl and (
                    np.abs(ew_position[ai] - ew_position[aj]) < ew_intra
                ):
                    continue
                pp = (
                    pol_uniq.index(pi + pj)
                    if pi <= pj
                    else pol_uniq.index(pj + pi)
                )
                nsq = num_feed[:, ii, :] * num_feed[:, jj, :]
                radiometer[:, pp, :] += nsq * auto[:, ii, :] * auto[:, jj, :]
                radiometer_counter[:, pp, :] += nsq

        tint = np.median(np.abs(np.diff(np.asarray(data.time))))
        fmap = data.index_map["freq"]
        dnu = (
            np.median(fmap["width"]) if fmap.dtype.names else np.median(np.abs(np.diff(fmap)))
        ) * 1e6

        if "flags" in data.datasets and "frac_lost" in data.datasets:
            frac_lost = np.asarray(data.datasets["frac_lost"][:])
        else:
            frac_lost = np.zeros((nfreq, ntime), dtype=np.float32)

        nint = dnu * tint * (1.0 - frac_lost[:, np.newaxis, :])
        radiometer *= np.asarray(
            tools.invert_no_zero(nint * radiometer_counter**2)
        )

        metrics = containers.SystemSensitivity(
            pol=np.array(pol_uniq, dtype="<U2"),
            axes_from=data,
            attrs_from=data,
        )

        # sqrt(2): sensitivity of the real component (we summed both
        # triangles of the visibility matrix)
        metrics.radiometer[:] = np.sqrt(2.0 * radiometer)
        metrics.measured[:] = np.sqrt(2.0 * var)
        metrics.weight[:] = counter
        metrics.frac_lost[:] = frac_lost.astype(np.float32)

        return metrics
