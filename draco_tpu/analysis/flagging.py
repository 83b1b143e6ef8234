"""Flagging of bad or unwanted data: day masks, baseline masks, RFI excision.

Re-provides reference ``draco/analysis/flagging.py`` (3846 LoC — DayMask:33,
MaskMModeData:113, MaskBaselines:176, FindBeamformedOutliers:345,
RadiometerWeight:552, SanitizeWeights:614, NegativeAutosMask:666,
SmoothVisWeight:702, ThresholdVisWeightFrequency:763 /Baseline:835,
CollapseBaselineMask:985, RFISensitivityMask:1808, RFIMask:2120,
ApplyTimeFreqMask:2222, ApplyGenericMask:2380, GeneralCombineMasks:2442,
CombineMasks:2521, ApplyTaper:2542, MaskFreq:2894, BlendStack:3046, and the
mad:3231 / tv_channels_flag:3316 / destripe:3404 helpers).

Masking convention: True marks contaminated samples.
"""

from __future__ import annotations

import re
import warnings
from typing import ClassVar

import numpy as np

from ..core import config, containers, io
from ..core.task import ContainerTask
from ..ops import filters, median, rfi
from ..ops.tools import extract_diagonal, invert_no_zero
from ..ops import tools as ops_tools

STELLAR_S = 86164.0905 / 86400.0


class DayMask(ContainerTask):
    """Mask out a daytime RA band with smooth transitions.

    (reference flagging.py:33-110)
    """

    start = config.Property(proptype=float, default=90.0)
    end = config.Property(proptype=float, default=270.0)
    width = config.Property(proptype=float, default=60.0)
    zero_data = config.Property(proptype=bool, default=True)
    remove_average = config.Property(proptype=bool, default=True)

    def process(self, sstream):
        sstream.redistribute("freq")
        ra_shift = (sstream.ra[:] - self.start) % 360.0
        end_shift = (self.end - self.start) % 360.0

        mask_bool = ra_shift > end_shift
        mask = np.where(
            ra_shift < self.width,
            0.5 * (1 + np.cos(np.pi * (ra_shift / self.width))),
            mask_bool,
        )
        mask = np.where(
            np.logical_and(ra_shift > end_shift - self.width, ra_shift <= end_shift),
            0.5 * (1 + np.cos(np.pi * ((ra_shift - end_shift) / self.width))),
            mask,
        )

        vis = np.asarray(sstream.vis[:])
        if self.remove_average:
            nanvis = vis * np.where(mask_bool, 1.0, np.nan)[np.newaxis, np.newaxis, :]
            average = complex_med(nanvis, axis=-1)[:, :, np.newaxis]
            vis = vis - average
        if self.zero_data:
            vis = vis * mask
        sstream.vis[:] = vis.astype(sstream.vis.dtype)
        sstream.weight[:] = (np.asarray(sstream.weight[:]) * mask**2).astype(
            sstream.weight.dtype
        )
        return sstream


class MaskMModeData(ContainerTask):
    """Mask m-mode data ahead of map making (reference flagging.py:113-173)."""

    auto_correlations = config.Property(proptype=bool, default=False)
    m_zero = config.Property(proptype=bool, default=False)
    positive_m = config.Property(proptype=bool, default=True)
    negative_m = config.Property(proptype=bool, default=True)
    mask_low_m = config.Property(proptype=int, default=None)

    def process(self, mmodes):
        mmodes.redistribute("freq")
        mw = np.asarray(mmodes.weight[:]).copy()

        if not self.auto_correlations:
            ps = mmodes.prodstack
            autos = np.array([p[0] == p[1] for p in ps])
            mw[..., autos] = 0.0
        if not self.m_zero:
            mw[0] = 0.0
        if not self.positive_m:
            mw[1:, 0] = 0.0
        if not self.negative_m:
            mw[1:, 1] = 0.0
        if self.mask_low_m:
            mw[: self.mask_low_m] = 0.0

        mmodes.weight[:] = mw.astype(mmodes.weight.dtype)
        return mmodes


# Alias (reference flagging.py:3228)
MaskData = MaskMModeData


class MaskBaselines(ContainerTask):
    """Mask out baselines by length/polarisation/weight (reference flagging.py:176).

    Criteria combine with logical OR (or AND); see the reference docstring
    for the parameter list.
    """

    mask_long_ns = config.Property(proptype=float, default=None)
    mask_short = config.Property(proptype=float, default=None)
    mask_short_ew = config.Property(proptype=float, default=None)
    mask_short_ns = config.Property(proptype=float, default=None)
    mask_pol = config.Property(proptype=list, default=None)
    weight_threshold = config.Property(proptype=float, default=None)
    missing_threshold = config.Property(proptype=float, default=None)
    zero_data = config.Property(proptype=bool, default=False)
    share = config.enum(["none", "vis", "all"], default="all")
    combine_method = config.enum(["and", "or"], default="or")

    def setup(self, telescope):
        self.telescope = io.get_telescope(telescope)
        if self.zero_data and self.share == "vis":
            raise RuntimeError("Refusing to zero a shared visibility dataset.")

    def process(self, ss):
        ss.redistribute("freq")
        baselines = self.telescope.baselines
        weight = np.asarray(ss.weight[:])

        if self.combine_method == "or":
            combine = np.logical_or
            mask = np.zeros_like(weight, dtype=bool)
        else:
            combine = np.logical_and
            mask = np.ones_like(weight, dtype=bool)

        def bl_mask(sel):
            return sel[np.newaxis, :, np.newaxis]

        if self.mask_long_ns is not None:
            mask = combine(mask, bl_mask(np.abs(baselines[:, 1]) > self.mask_long_ns))
        if self.mask_short is not None:
            mask = combine(
                mask, bl_mask(np.hypot(*baselines.T) < self.mask_short)
            )
        if self.mask_short_ew is not None:
            mask = combine(
                mask, bl_mask(np.abs(baselines[:, 0]) < self.mask_short_ew)
            )
        if self.mask_short_ns is not None:
            mask = combine(
                mask, bl_mask(np.abs(baselines[:, 1]) < self.mask_short_ns)
            )
        if self.weight_threshold is not None:
            weight_sum = weight.sum(axis=0)
            mask = combine(
                mask,
                (weight_sum < self.weight_threshold * len(ss.freq))[np.newaxis],
            )
        if self.missing_threshold is not None:
            nsamp = (weight > 0).sum(axis=-1).sum(axis=0)
            ratio = 1 - nsamp / nsamp.max()
            mask = combine(
                mask, bl_mask(ratio > self.missing_threshold)
            )
        if self.mask_pol is not None:
            pols = np.char.array(self.telescope.polarisation)[
                self.telescope.uniquepairs
            ]
            pols = pols[:, 0] + pols[:, 1]
            for p in self.mask_pol:
                mask = combine(mask, bl_mask(pols == p))

        if self.share == "all":
            ssc = ss
        elif self.share == "vis":
            ssc = ss.copy(shared=("vis",))
        else:
            ssc = ss.copy()

        w = np.asarray(ssc.weight[:]).copy()
        w[mask] = 0.0
        ssc.weight[:] = w
        if self.zero_data:
            v = np.asarray(ssc.vis[:]).copy()
            v[mask] = 0.0
            ssc.vis[:] = v
        return ssc


class FindBeamformedOutliers(ContainerTask):
    """Flag beamformed visibilities deviating from the noise expectation.

    (reference flagging.py:345): flag |data| * sqrt(weight) > nsigma, with
    an optional window to widen the mask along given axes.
    """

    nsigma = config.Property(proptype=float, default=3.0)
    window = config.Property(proptype=list, default=None)

    def process(self, data):
        axes = list(data.data.axes)
        z = np.abs(np.asarray(data.data[:])) * np.sqrt(
            np.abs(np.asarray(data.weight[:]))
        )
        mask = z > self.nsigma

        if self.window is not None:
            from scipy.ndimage import maximum_filter

            # reference semantics (flagging.py:411-440): the list gives
            # the mask-extension width of the TRAILING len(window) axes
            # (e.g. [nha] for FormedBeamHA), leading axes untouched
            size = [1] * (mask.ndim - len(self.window)) + [
                int(w) for w in self.window
            ]
            mask = maximum_filter(mask.astype(np.uint8), size=size).astype(bool)

        if isinstance(data, containers.FormedBeamHA):
            out = containers.FormedBeamHAMask(axes_from=data, attrs_from=data)
        elif isinstance(data, containers.FormedBeam):
            out = containers.FormedBeamMask(axes_from=data, attrs_from=data)
        else:
            raise TypeError(f"No mask container known for {type(data)}")
        out.mask[:] = mask
        return out


class RadiometerWeight(ContainerTask):
    r"""Set weights from the radiometer equation.

    weight_ij = nsamp / (V_ii V_jj)  (reference flagging.py:552-611)
    """

    replace = config.Property(proptype=bool, default=True)

    def process(self, stream):
        stream.redistribute("freq")
        ninput = len(stream.index_map["input"])
        nprod = len(stream.index_map["prod"])
        if nprod != (ninput * (ninput + 1) // 2):
            raise RuntimeError(
                "This task needs the full (unstacked) correlation triangle."
            )
        freq_width = np.median(stream.index_map["freq"]["width"])
        if isinstance(stream, containers.SiderealStream):
            RA_S = 240 * STELLAR_S
            int_time = np.median(np.abs(np.diff(stream.ra))) * RA_S
        else:
            int_time = np.median(np.abs(np.diff(stream.time)))

        if self.replace:
            stream.weight[:] = np.ones(stream.weight.shape, dtype=np.float32)

        nsamp = 1e6 * freq_width * int_time
        autos = np.asarray(extract_diagonal(np.asarray(stream.vis[:]))).real
        weight_fac = nsamp**0.5 * invert_no_zero(autos)
        w = ops_tools.apply_gain(
            np.asarray(stream.weight[:]), np.asarray(weight_fac), axis=1
        )
        stream.weight[:] = np.asarray(w).real.astype(stream.weight.dtype)
        return stream


class SanitizeWeights(ContainerTask):
    """Zero weights outside a valid range (reference flagging.py:614-663)."""

    max_thresh = config.Property(proptype=float, default=1e30)
    min_thresh = config.Property(proptype=float, default=1e-30)

    def _finalise_config(self):
        if self.min_thresh >= self.max_thresh:
            raise ValueError("threshold_min exceeds threshold_max.")

    def process(self, data):
        data.redistribute("freq")
        weight = np.asarray(data.weight[:]).copy()
        weight[weight > self.max_thresh] = 0.0
        weight[weight < self.min_thresh] = 0.0
        data.weight[:] = weight
        return data


class NegativeAutosMask(ContainerTask):
    """Flag (freq, time) samples with any negative autocorrelation.

    (reference flagging.py:666-699)
    """

    def process(self, data):
        data.redistribute("freq")
        ps = data.prodstack
        autos_sel = ps["input_a"] == ps["input_b"]
        autos = np.asarray(data.vis[:])[:, autos_sel].real
        mask = np.any(autos < 0.0, axis=1)
        self.log.debug(
            f"Negative autocorrelations flagged {100.0 * mask.mean():.2f}% of the data."
        )
        mask_cont = (
            containers.SiderealRFIMask(axes_from=data, attrs_from=data)
            if "ra" in data.index_map
            else containers.RFIMask(axes_from=data, attrs_from=data)
        )
        mask_cont.mask[:] = mask
        return mask_cont


class SmoothVisWeight(ContainerTask):
    """Median-smooth the visibility weights in time (reference flagging.py:702)."""

    kernel_size = config.Property(proptype=int, default=31)
    mask_zeros = config.Property(proptype=bool, default=False)

    def process(self, data):
        data.redistribute("freq")
        weight = np.asarray(data.weight[:]).copy()
        for i in range(weight.shape[0]):
            zeromask = weight[i] == 0.0
            mask = zeromask if self.mask_zeros else np.zeros_like(zeromask)
            weight[i] = filters.medfilt(weight[i], mask, size=(1, self.kernel_size))
            weight[i][zeromask] = 0.0
        data.weight[:] = weight.astype(data.weight.dtype)
        return data


class ThresholdVisWeightFrequency(ContainerTask):
    """Mask frequencies with weights below a per-frequency threshold.

    (reference flagging.py:763-832)
    """

    absolute_threshold = config.Property(proptype=float, default=1e-7)
    relative_threshold = config.Property(proptype=float, default=0.9)

    def process(self, stream):
        stream.redistribute("freq")
        if "ra" in stream.index_map:
            mask_cont = containers.SiderealRFIMask(axes_from=stream, attrs_from=stream)
        elif "time" in stream.index_map:
            mask_cont = containers.RFIMask(axes_from=stream, attrs_from=stream)
        else:
            raise TypeError(f"Need a TimeStream or SiderealStream here, not {type(stream)}")

        weight = np.asarray(stream.weight[:])
        mean_baseline = np.mean(weight, axis=1, keepdims=True)
        threshold = np.where(
            mean_baseline > self.absolute_threshold, mean_baseline, np.nan
        )
        with warnings.catch_warnings():
            warnings.filterwarnings(action="ignore", message="Mean of empty slice")
            threshold = np.nanmean(threshold, axis=2, keepdims=True)
        mask = ~(
            mean_baseline
            > np.fmax(threshold * self.relative_threshold, self.absolute_threshold)
        )[:, 0, :]
        drop_frac = np.sum(mask) / np.prod(mask.shape)
        self.log.info(
            "weight cut drops %0.5f%% of the data" % (100.0 * drop_frac)
        )
        mask_cont.mask[:] = mask
        return mask_cont


class ThresholdVisWeightBaseline(ContainerTask):
    """Baseline-dependent low-weight mask (reference flagging.py:835-982)."""

    average_type = config.enum(["median", "mean"], default="median")
    absolute_threshold = config.Property(proptype=float, default=1e-7)
    relative_threshold = config.Property(proptype=float, default=1e-6)
    ignore_absolute_threshold = config.Property(proptype=float, default=0.0)
    pols_to_flag = config.enum(["all", "copol"], default="all")

    def setup(self, telescope):
        self.telescope = io.get_telescope(telescope)

    def process(self, stream):
        if "ra" in stream.index_map:
            mask_cont = containers.SiderealBaselineMask(
                axes_from=stream, attrs_from=stream
            )
        elif "time" in stream.index_map:
            mask_cont = containers.BaselineMask(axes_from=stream, attrs_from=stream)
        else:
            raise TypeError(
                f"Task requires TimeStream or SiderealStream. Got {type(stream)}"
            )

        weight = np.asarray(stream.weight[:])
        avg = np.moveaxis(weight, 1, 0).reshape(weight.shape[1], -1)
        sel = avg > self.ignore_absolute_threshold
        if self.average_type == "mean":
            average_weight = np.sum(avg * sel, axis=-1) * invert_no_zero(
                np.sum(sel, axis=-1)
            )
        else:
            average_weight = np.array(
                [
                    np.median(row[s]) if s.any() else 0.0
                    for row, s in zip(avg, sel)
                ]
            )
        threshold = np.maximum(
            self.absolute_threshold, self.relative_threshold * average_weight
        )
        mask = weight < threshold[np.newaxis, :, np.newaxis]
        mask &= weight > self.ignore_absolute_threshold

        if self.pols_to_flag == "copol":
            prod = stream.prod
            stack = stream.stack
            pol_a = self.telescope.polarisation[
                prod[stack["prod"]]["input_a"].astype(int)
            ]
            pol_b = self.telescope.polarisation[
                prod[stack["prod"]]["input_b"].astype(int)
            ]
            mask &= (pol_a == pol_b)[np.newaxis, :, np.newaxis]

        mask_frac = mask.sum() / float(np.prod(weight.shape))
        self.log.info(f"weight cut drops {100.0 * mask_frac:.5f} of the data")
        mask_cont.mask[:] = mask
        return mask_cont


class CollapseBaselineMask(ContainerTask):
    """Collapse a baseline mask over the baseline axis (reference flagging.py:985)."""

    def process(self, baseline_mask):
        if isinstance(baseline_mask, containers.SiderealBaselineMask):
            mask_cont = containers.SiderealRFIMask(
                axes_from=baseline_mask, attrs_from=baseline_mask
            )
        else:
            mask_cont = containers.RFIMask(
                axes_from=baseline_mask, attrs_from=baseline_mask
            )
        full_mask = np.any(np.asarray(baseline_mask.mask[:]), axis=1)
        drop_frac = np.sum(full_mask) / np.prod(full_mask.shape)
        self.log.info(
            f"weight cut after collapsing baselines drops "
            f"{100.0 * drop_frac:.1f}%% of the data"
        )
        mask_cont.mask[:] = full_mask
        return mask_cont


class RFISensitivityMask(ContainerTask):
    """RFI mask from deviations of system sensitivity from radiometer noise.

    Full algorithm of reference flagging.py:1808-2118: an optional 1-D
    static mask from per-channel time quantiles (``_mask_1d``), then
    ``niter`` rounds of threshold reduction in which the background is
    re-estimated with a 2-D rolling weighted median (``base_size``), the
    noise with a rolling median absolute deviation (``mad_size``), and
    samples are flagged by MAD / TV-channel / SumThreshold tests; the
    MAD and SumThreshold masks are blended by the ``_combine_st_mad_hook``
    (MAD around bright transits, SumThreshold elsewhere), and the final
    OR over polarisations may be widened with the scale-invariant rank
    operator.
    """

    mask_type = config.enum(["mad", "sumthreshold", "combine"], default="combine")
    include_pol = config.list_type(str, default=None)

    nsigma_1d = config.Property(proptype=float, default=5.0)
    quantile_1d = config.Property(proptype=float, default=0.15)
    win_f_1d = config.Property(proptype=int, default=191)

    nsigma = config.Property(proptype=float, default=5.0)
    niter = config.Property(proptype=int, default=5)
    rho = config.Property(proptype=float, default=1.5)

    base_size = config.list_type(int, length=2, default=(37, 181))
    mad_size = config.list_type(int, length=2, default=(101, 31))
    tv_fraction = config.Property(proptype=float, default=0.5)
    max_m = config.Property(proptype=int, default=64)

    sir = config.Property(proptype=bool, default=False)
    eta = config.Property(proptype=float, default=0.2)
    only_time = config.Property(proptype=bool, default=False)

    # Convert MAD to RMS (reference flagging.py:1885)
    MAD_TO_RMS = 1.4826

    def setup(self):
        """Threshold schedule: nsigma * rho**(niter-1) ... nsigma."""
        self.threshold = self.nsigma * self.rho ** np.arange(self.niter)[::-1]

    def process(self, sensitivity):
        """Derive an RFI mask from a SystemSensitivity container."""
        pol = [
            p.decode() if isinstance(p, bytes) else str(p)
            for p in sensitivity.index_map["pol"]
        ]
        npol = len(pol)

        measured = np.asarray(sensitivity.measured[:])
        radio = np.asarray(sensitivity.radiometer[:])
        sens_weight = np.asarray(sensitivity.weight[:])

        # Radiometer test metric [freq, pol, time]
        metric = measured * np.asarray(invert_no_zero(radio))
        flag = sens_weight == 0.0

        freq = sensitivity.freq
        times = np.asarray(sensitivity.time)
        static_flag = ~self._static_rfi_mask_hook(freq, times[0])

        if self.mask_type == "combine":
            madtimes = self._combine_st_mad_hook(times, freq)

        nfreq, _, ntime = metric.shape
        finalmask = np.zeros((npol, nfreq, ntime), dtype=bool)

        for pi in range(npol):
            if self.include_pol and pol[pi] not in self.include_pol:
                continue

            y = metric[:, pi, :]
            current_flag = flag[:, pi, :] | static_flag[:, None]

            # Static per-channel mask from the time quantile
            if self.nsigma_1d is not None:
                flag_1d, y_static = self._mask_1d(y, current_flag)
                current_flag = current_flag | flag_1d[:, None]
                y = y - y_static[:, None]

            # Slowly reduce the threshold, re-estimating background and
            # deviation with the current mask each round
            for nsig in self.threshold:
                med_y = filters.medfilt(y, current_flag, tuple(self.base_size))
                dy = y - med_y

                ady = np.abs(dy)
                med_ady = self.MAD_TO_RMS * filters.medfilt(
                    ady, current_flag, tuple(self.mad_size)
                )
                ady_nsigma = ady * np.asarray(invert_no_zero(med_ady))

                madmask = ady_nsigma > nsig
                tvmask = tv_channels_flag(
                    ady_nsigma, freq, sigma=nsig, f=self.tv_fraction
                )
                madmask |= tvmask

                if self.mask_type == "mad":
                    current_flag = current_flag | madmask
                    continue

                stmask = rfi.sumthreshold(
                    dy,
                    self.max_m,
                    start_flag=current_flag | tvmask,
                    threshold1=nsig,
                    remove_median=False,
                    correct_for_missing=True,
                    rho=1.0,
                    variance=med_ady**2,
                )

                if self.mask_type == "sumthreshold":
                    current_flag = current_flag | stmask
                else:  # combine: MAD around transits, SumThreshold elsewhere
                    tempmask = np.where(madtimes, madmask, stmask)
                    if not self.sir:
                        # Extend the sumthreshold mask in time across the
                        # transits if SIR will not run on the final mask
                        expanded = rfi.scale_invariant_rank(
                            tempmask, eta=0.2, axis=-1
                        )
                        tempmask = np.where(madtimes, expanded, tempmask)
                    current_flag = current_flag | tempmask

            finalmask[pi] = current_flag

        finalmask = finalmask.any(axis=0)

        percent_masked = 100.0 * np.sum(finalmask) / float(finalmask.size)
        self.log.info(
            f"RFISensitivityMask masks {percent_masked:0.2f} percent "
            "of the data."
        )

        if self.sir:
            finalmask = self._apply_sir(finalmask, static_flag[:, None])
            percent_masked = 100.0 * np.sum(finalmask) / float(finalmask.size)
            self.log.info(
                f"After SIR dilation {percent_masked:0.2f} percent "
                "of the data is masked."
            )

        out = containers.RFIMask(axes_from=sensitivity, attrs_from=sensitivity)
        out.mask[:] = finalmask
        return out

    def _combine_st_mad_hook(self, times, freq):
        """Blending mask between SumThreshold and MAD flagged data.

        Override to use MAD around bright source transits (where
        SumThreshold removes real signal).  True selects the MAD mask.
        (reference flagging.py:2045)
        """
        return np.ones((freq.size, times.size), dtype=bool)

    def _static_rfi_mask_hook(self, freq, timestamp=None):
        """Static RFI mask; True keeps a channel (reference flagging.py:2066)."""
        return np.ones_like(freq, dtype=bool)

    def _mask_1d(self, rad, mask):
        """Mask channels whose time quantile deviates from the rolling
        frequency median by more than ``nsigma_1d`` MADs
        (reference flagging.py:2084)."""
        y = np.ascontiguousarray(rad.astype(np.float64))
        w = np.ascontiguousarray((~mask).astype(np.float64))

        medt_y = median.quantile(y, w, self.quantile_1d)
        medt_w = np.any(w > 0, axis=-1).astype(np.float64)

        if self.win_f_1d is None:
            medf_medt_y = median.weighted_median(medt_y, medt_w)
        else:
            medf_medt_y = median.moving_weighted_median(
                medt_y, medt_w, self.win_f_1d
            )

        absd_medt_y = np.abs(medt_y - medf_medt_y)

        if self.win_f_1d is None:
            mad_1d = self.MAD_TO_RMS * median.weighted_median(absd_medt_y, medt_w)
        else:
            mad_1d = self.MAD_TO_RMS * median.moving_weighted_median(
                absd_medt_y, medt_w, self.win_f_1d
            )

        return absd_medt_y > (self.nsigma_1d * mad_1d), medt_y

    def _apply_sir(self, mask, baseflag, eta=None):
        """Expand the mask with SIR, excluding the static flag
        (reference flagging.py:2105).  ``eta`` defaults to the task's
        configured value."""
        eta = self.eta if eta is None else eta
        nobaseflag = np.copy(mask)
        nobaseflag[np.broadcast_to(baseflag, mask.shape)] = False

        axes = (-1,) if self.only_time else (0, -1)
        nobaseflagsir = rfi.scale_invariant_rank(nobaseflag, eta=eta, axis=axes)
        return nobaseflagsir | mask


class RFIMask(ContainerTask):
    """MAD + TV-channel RFI masking on a single stack (reference flagging.py:2120)."""

    sigma = config.Property(proptype=float, default=5.0)
    tv_fraction = config.Property(proptype=float, default=0.5)
    stack_ind = config.Property(proptype=int, default=0)

    def process(self, sstream):
        output_type = (
            containers.SiderealRFIMask
            if "ra" in sstream.index_map
            else containers.RFIMask
        )
        ssv = np.asarray(sstream.vis[:])
        ssw = np.asarray(sstream.weight[:])

        wf = ssv[:, self.stack_ind]
        ww = ssw[:, self.stack_ind]

        weight_cut = 1e-4 * ww.mean()
        wm = ww < weight_cut
        maddev = mad(wf, wm)
        maddev = np.where(np.isnan(maddev), 2 * self.sigma, maddev)
        tvmask = tv_channels_flag(
            maddev, sstream.freq, sigma=self.sigma, f=self.tv_fraction
        )
        mask = tvmask | (maddev > self.sigma)
        self.log.info(
            "RFI cut removes %0.2f%% of the data."
            % (100.0 * np.sum(mask) / float(mask.size))
        )
        mask_cont = output_type(axes_from=sstream, attrs_from=sstream)
        mask_cont.mask[:] = mask
        return mask_cont


class ApplyTimeFreqMask(ContainerTask):
    """Zero weights at masked (freq, time) samples (reference flagging.py:2222)."""

    share = config.enum(["none", "vis", "map", "all"], default="all")
    collapse_pol = config.Property(proptype=bool, default=False)
    match_axes = config.Property(proptype=bool, default=True)

    def process(self, tstream, rfimask):
        if isinstance(rfimask, (containers.RFIMask, containers.RFIMaskByPol)):
            if "time" not in tstream.index_map:
                raise TypeError(f"A time-like container is needed; received {type(tstream)}.")
            timelike_ax = "time"
            timelike_data = tstream.time
            timelike_mask = rfimask.time
        elif isinstance(
            rfimask, (containers.SiderealRFIMask, containers.SiderealRFIMaskByPol)
        ):
            if "ra" not in tstream.index_map:
                raise TypeError(
                    f"A sidereal-like container is needed; received {type(tstream)}."
                )
            timelike_ax = "ra"
            timelike_data = tstream.ra
            timelike_mask = rfimask.ra
        else:
            raise TypeError(f"The mask must be an RFIMask or SiderealRFIMask, not {type(rfimask)}.")

        if not np.array_equal(tstream.freq, rfimask.freq):
            raise ValueError("Stream and mask disagree on the freq axis.")

        if self.match_axes:
            if not np.array_equal(timelike_data, timelike_mask):
                raise ValueError(
                    "Stream and mask disagree on the time-like axis."
                )
            data_sel = slice(None)
            mask_sel = slice(None)
        else:
            data_sel = np.isin(timelike_data, timelike_mask)
            mask_sel = np.isin(timelike_mask, timelike_data)
            if not np.any(data_sel):
                raise ValueError("The stream and mask time axes do not overlap.")

        tstream.redistribute("freq")
        t_axes = list(tstream.weight.axes)
        m_axes = list(rfimask.mask.axes)
        mask = np.asarray(rfimask.mask[:])

        if isinstance(
            rfimask, (containers.RFIMaskByPol, containers.SiderealRFIMaskByPol)
        ):
            if self.collapse_pol or "pol" not in t_axes:
                mask = np.any(mask, axis=m_axes.index("pol"))
                m_axes.remove("pol")
            elif "pol" in t_axes:
                if not np.array_equal(
                    tstream.index_map["pol"], rfimask.index_map["pol"]
                ):
                    raise ValueError(
                        "Stream and mask disagree on the pol axis."
                    )

        bcast_slice = [slice(None) if ax in m_axes else np.newaxis for ax in t_axes]
        inp_slice = [slice(None) for _ in t_axes]
        inp_slice[t_axes.index(timelike_ax)] = data_sel
        bcast_slice[t_axes.index(timelike_ax)] = mask_sel
        inp_slice = tuple(inp_slice)
        bcast_slice = tuple(bcast_slice)

        if self.share == "all":
            tsc = tstream
        elif self.share == "vis":
            tsc = tstream.copy(shared=("vis",))
        elif self.share == "map":
            tsc = tstream.copy(shared=("map",))
        else:
            tsc = tstream.copy()

        w = np.asarray(tsc.weight[:]).copy()
        w[inp_slice] *= ~mask[bcast_slice]
        tsc.weight[:] = w
        return tsc


# Compatibility alias (reference flagging.py:3227)
ApplyRFIMask = ApplyTimeFreqMask


class ApplyGenericMask(ContainerTask):
    """Apply a mask container to any dataset sharing its axes.

    (reference flagging.py:2380)
    """

    def process(self, data, mask):
        daxes = list(data.weight.axes)
        maxes = list(mask.mask.axes)
        if any(ax not in daxes for ax in maxes):
            missing = [ax for ax in maxes if ax not in daxes]
            raise NameError(
                f"Mask has axes {missing} which are not found in data."
                f"\naxes of the data: {daxes}\naxes of the mask: {maxes}"
            )
        tinds = tuple(maxes.index(ax) for ax in daxes if ax in maxes)
        marr = np.asarray(mask.mask[:]).transpose(tinds)
        bcast = tuple(slice(None) if ax in maxes else np.newaxis for ax in daxes)
        w = np.asarray(data.weight[:]) * (~marr[bcast]).astype(data.weight.dtype)
        data.weight[:] = w
        return data


MaskBeamformedOutliers = ApplyGenericMask


class GeneralCombineMasks(ContainerTask):
    """Combine masks with a logical expression over A..Z (reference flagging.py:2442)."""

    expression = config.Property(proptype=str, default="A")

    _dataset_name = "mask"
    _operators: ClassVar[set] = set("&|~^()")

    def process(self, masks):
        if not isinstance(masks, (list, tuple)):
            masks = [masks]
        if len(masks) > 26:
            raise ValueError("At most 26 masks (letters A-Z) can be combined.")
        if any(type(m) is not type(masks[0]) for m in masks[1:]):
            raise TypeError("Every mask in the combination must share one container type.")
        pattern = self._build_allowed_pattern()
        if not re.match(pattern, self.expression):
            raise ValueError(
                f"Cannot parse '{self.expression}': only the letters A-Z, digits, "
                f"spaces and {''.join(sorted(self._operators))} are allowed."
            )
        namespace = {
            chr(ord("A") + i): np.asarray(m.datasets[self._dataset_name][:])
            for i, m in enumerate(masks)
        }
        self.log.info(f"Combining masks via '{self.expression}'")
        result = eval(self.expression, {}, namespace)  # noqa: S307 - validated above
        combined = masks[0].copy()
        combined.datasets[self._dataset_name][:] = result
        return combined

    def _build_allowed_pattern(self):
        escaped = [re.escape(op) for op in self._operators]
        return rf"^[A-Z0-9\s{''.join(escaped)}]+$"


class CombineMasks(GeneralCombineMasks):
    """Logical OR of a list of masks (reference flagging.py:2521)."""

    def process(self, masks):
        if not isinstance(masks, (list, tuple)):
            masks = [masks]
        self.expression = " | ".join([chr(ord("A") + i) for i in range(len(masks))])
        return super().process(masks)


class ApplyTaper(ContainerTask):
    """Multiply a taper container into a dataset (reference flagging.py:2542)."""

    update_weight = config.Property(proptype=bool, default=False)

    def process(self, data, taper):
        daxes = list(data.data.axes)
        taxes = list(taper.taper.axes)
        if any(ax not in daxes for ax in taxes):
            missing = [ax for ax in taxes if ax not in daxes]
            raise NameError(f"Taper has axes {missing} not found in data.")
        tinds = tuple(taxes.index(ax) for ax in daxes if ax in taxes)
        tarr = np.asarray(taper.taper[:]).transpose(tinds)
        bcast = tuple(slice(None) if ax in taxes else np.newaxis for ax in daxes)
        data.data[:] = (np.asarray(data.data[:]) * tarr[bcast]).astype(
            data.data.dtype
        )
        if self.update_weight:
            waxes = list(data.weight.axes)
            tindsw = tuple(taxes.index(ax) for ax in waxes if ax in taxes)
            tw = np.asarray(taper.taper[:]).transpose(tindsw)
            bcw = tuple(slice(None) if ax in taxes else np.newaxis for ax in waxes)
            data.weight[:] = (
                np.asarray(data.weight[:]) * invert_no_zero(tw[bcw] ** 2)
            ).astype(data.weight.dtype)
        return data


class MaskFreq(ContainerTask):
    """Make a frequency(-time) mask (reference flagging.py:2894-3043)."""

    bad_freq_ind = config.Property(proptype=list, default=None)
    factorize = config.Property(proptype=bool, default=False)
    all_time = config.Property(proptype=bool, default=False)
    mask_missing_data = config.Property(proptype=bool, default=False)
    freq_frac = config.Property(proptype=float, default=None)

    def process(self, data):
        data.redistribute("freq")
        maskcls = (
            containers.SiderealRFIMask
            if isinstance(data, containers.SiderealContainer)
            else containers.RFIMask
        )
        maskcont = maskcls(axes_from=data, attrs_from=data)

        waxes = list(data.weight.axes)
        axis_sum = tuple(
            ii for ii, ax in enumerate(waxes) if ax not in ["freq", "time", "ra"]
        )
        present = (np.asarray(data.weight[:]) > 0).sum(axis=axis_sum)
        mask = present == 0
        self.log.info(f"Starting mask covers {100.0 * mask.mean():.2f}%.")

        if self.mask_missing_data:
            mask = present < present.max()
            self.log.info(
                f"All-baseline requirement brings the mask to {100.0 * mask.mean():.2f}%."
            )
        if self.bad_freq_ind is not None:
            nfreq = len(data.freq)
            mask |= self._bad_freq_mask(nfreq)[:, np.newaxis]
            self.log.info(f"Channel cut brings the mask to {100.0 * mask.mean():.2f}%.")
        if self.freq_frac is not None:
            mask |= mask.mean(axis=1)[:, np.newaxis] > (1.0 - self.freq_frac)
            self.log.info(f"Fraction cut brings the mask to {100.0 * mask.mean():.2f}%.")
        if self.all_time:
            mask |= mask.any(axis=1)[:, np.newaxis]
            self.log.info(f"Fully-masked-channel cut brings the mask to {100.0 * mask.mean():.2f}%.")
        elif self.factorize:
            mask = self._optimal_mask(mask)
            self.log.info(f"Factorisation brings the mask to {100.0 * mask.mean():.2f}%.")

        maskcont.mask[:] = mask
        return maskcont

    def _bad_freq_mask(self, nfreq):
        mask = np.zeros(nfreq, dtype=bool)
        for s in self.bad_freq_ind:
            if isinstance(s, int):
                if s < nfreq:
                    mask[s] = True
            elif isinstance(s, (tuple, list)) and len(s) == 2:
                mask[s[0] : s[1]] = True
            else:
                raise ValueError(
                    "Each `bad_freq_ind` entry must be an int or a 2-tuple. "
                    f"Got {type(s)}."
                )
        return mask

    def _optimal_mask(self, mask):
        from scipy.optimize import minimize_scalar

        def genmask(f):
            time_mask = mask.mean(axis=0) > f
            freq_mask = mask[:, ~time_mask].any(axis=1)
            return time_mask[np.newaxis, :] | freq_mask[:, np.newaxis]

        res = minimize_scalar(
            fun=lambda f: genmask(f).mean(),
            bounds=(0, 1),
            method="bounded",
            options={"maxiter": 20, "xatol": 1e-4},
        )
        if not res.success:
            self.log.debug("Fit did not formally converge (common here; continuing).")
        return genmask(res.x)


class BlendStack(ContainerTask):
    """Blend a stack into daily data to regularise RFI gaps.

    (reference flagging.py:3046-3223)
    """

    frac = config.Property(proptype=float, default=1e-4)
    match_median = config.Property(proptype=bool, default=True)
    subtract = config.Property(proptype=bool, default=False)
    mask_freq = config.Property(proptype=bool, default=False)

    def setup(self, data_stack):
        self.data_stack = data_stack

    def process(self, data):
        if "effective_ra" in data.datasets:
            raise TypeError(
                "Blending uncorrected rebinned data not supported. Apply "
                "sidereal.RebinGradientCorrection first."
            )
        if not isinstance(data, type(self.data_stack)):
            raise TypeError(
                f"type(data) (={type(data)}) must match "
                f"type(data_stack) (={type(self.data_stack)})"
            )
        _supported = (
            containers.SiderealStream,
            containers.RingMap,
            containers.HybridVisStream,
        )
        if not isinstance(data, _supported):
            raise TypeError(f"Only {_supported} supported. Got {type(data)}.")

        dset_stack = np.asarray(self.data_stack.data[:])
        dset = np.asarray(data.data[:]).copy()
        if dset_stack.shape != dset.shape:
            raise ValueError(
                f"Shape mismatch between the input ({dset.shape}) and the "
                f"stack being blended ({dset_stack.shape})"
            )

        dax = list(data.data.axes)
        wax = list(data.weight.axes)
        slobj = tuple(slice(None) if ax in wax else np.newaxis for ax in dax)
        weight_stack = np.asarray(self.data_stack.weight[:])[slobj].astype(
            np.float64
        )
        weight = np.asarray(data.weight[:])[slobj].astype(np.float64).copy()

        if self.match_median:
            common = (weight > 0) & (weight_stack > 0)
            ind = dax.index("ra")
            dss = np.moveaxis(dset_stack, ind, -1)
            ds = np.moveaxis(dset, ind, -1)
            cm = np.broadcast_to(np.moveaxis(common, ind, -1), dss.shape)

            def wmed(arr):
                return complex_med(np.where(cm, arr, np.nan), axis=-1)

            stack_offset = np.nan_to_num(wmed(ds) - wmed(dss))
            stack_offset = np.moveaxis(
                stack_offset[..., np.newaxis], -1, ind
            )
        else:
            stack_offset = 0

        if self.mask_freq:
            axes = tuple(ii for ii, ax in enumerate(dax) if ax != "freq")
            fsel = np.any(weight, axis=axes, keepdims=True)
            weight_stack = weight_stack * fsel.astype(np.float64)

        if self.subtract:
            dset -= dset_stack + stack_offset
            dset *= (weight > 0).astype(np.float32)
            weight = np.asarray(invert_no_zero(weight + weight_stack)) * weight
            weight += (weight == 0) * self.frac
            weight *= weight_stack
        else:
            dset *= weight
            dset += weight_stack * self.frac * (dset_stack + stack_offset)
            weight += weight_stack * self.frac
            dset *= np.asarray(invert_no_zero(weight))

        data.data[:] = dset.astype(data.data.dtype)
        # reduce the weight back to its own axes
        wout = weight[tuple(0 if s is np.newaxis else slice(None) for s in slobj)]
        data.weight[:] = wout.astype(data.weight.dtype)
        return data


# ---------------------------------------------------------------------------
# Helper functions (reference flagging.py:3231-3430)
# ---------------------------------------------------------------------------


def mad(x, mask, base_size=(11, 3), mad_size=(21, 21), debug=False, sigma=True):
    """MAD deviation of freq-time data (reference flagging.py:3231)."""
    xs = filters.medfilt(x, mask, size=base_size)
    dev = np.abs(x - xs)
    m = filters.medfilt(dev, mask, size=mad_size)
    if sigma:
        m = m * 1.4826
    with np.errstate(divide="ignore", invalid="ignore"):
        r = dev / m
    if debug:
        return r, dev, m
    return r


def inverse_binom_cdf_prob(k, N, F):
    """Trial probability with binomial CDF F at (k, N) (reference flagging.py:3274)."""
    import scipy.special as sp

    return sp.betaincinv(k + 1, N - k, 1 - F)


def sigma_to_p(sigma):
    """Two-tailed Gaussian excursion probability (reference flagging.py:3302)."""
    import scipy.stats as ss

    return 2 * ss.norm.sf(sigma)


def p_to_sigma(p):
    """Sigma exceeded with two-tailed probability p (reference flagging.py:3309)."""
    import scipy.stats as ss

    return ss.norm.isf(p / 2)


#: North-American TV broadcast bands: 67 stations of 6 MHz from 398 MHz
_TV_BAND_EDGES = 398.0 + 6.0 * np.arange(68)


def tv_channels_flag(x, freq, sigma=5, f=0.5, debug=False):
    """Flag whole TV-station bands whose bad-sample fraction exceeds ``f``.

    Within each 6 MHz broadcast band the per-band significance threshold
    is set so a fraction ``f`` of the band's channels exceeding it is a
    ``sigma``-level event under the binomial null; any band where the
    observed fraction tops ``f`` is masked in full.  Semantics of
    reference flagging.py:3316-3381.
    """
    x = np.asarray(x)
    null_p = sigma_to_p(sigma)
    half_ch = 0.5 * np.median(np.abs(np.diff(freq)))
    # ones init: channels outside every TV band keep frac = 1 and are
    # masked — reference-parity behaviour (reference flagging.py:3344;
    # benign for bands fully inside [398, 800] MHz, surprising outside)
    bad_frac = np.ones_like(x, dtype=np.float32)

    for band_lo, band_hi in zip(_TV_BAND_EDGES[:-1], _TV_BAND_EDGES[1:]):
        members = np.flatnonzero(
            (freq + half_ch >= band_lo) & (freq - half_ch <= band_hi)
        )
        if members.size == 0:
            continue
        n = members.size
        level = p_to_sigma(
            inverse_binom_cdf_prob(int(f * n), n, 1 - null_p)
        )
        bad_frac[members] = np.mean(x[members] > level, axis=0)

    mask = bad_frac > f
    return (mask, bad_frac) if debug else mask


def complex_med(x, *args, **kwargs):
    """Complex median via the real/imag parts (reference flagging.py:3384)."""
    return np.nanmedian(x.real, *args, **kwargs) + 1j * np.nanmedian(
        x.imag, *args, **kwargs
    )


def destripe(x, w, axis=1):
    """Subtract the unmasked median along an axis (reference flagging.py:3404)."""
    stripe = complex_med(np.where(w, x, np.nan), axis=axis)
    stripe = np.nan_to_num(stripe)
    bsel = [slice(None)] * x.ndim
    bsel[axis] = None
    return x - stripe[tuple(bsel)]


# ---------------------------------------------------------------------------
# Gain / beamformed-weight masks (reference flagging.py:457-550)
# ---------------------------------------------------------------------------


class MaskBadGains(ContainerTask):
    """Mask regions with bad gain (reference flagging.py:457).

    Assumes bad gains are set to 1.

    Attributes
    ----------
    threshold, threshold_tol : float
        Gains <= threshold (+tol) across all inputs are flagged.
    """

    threshold = config.Property(proptype=float, default=1.0)
    threshold_tol = config.Property(proptype=float, default=1e-5)

    def process(self, data):
        """Generate a time-frequency mask from the gain dataset."""
        mask = np.all(
            np.asarray(data.datasets["gain"][:]).real
            <= self.threshold + self.threshold_tol,
            axis=1,
        )
        mask_cont = containers.RFIMask(axes_from=data)
        mask_cont.mask[:] = mask
        return mask_cont


class MaskBeamformedWeights(ContainerTask):
    """Zero anomalously large beamformed weights (reference flagging.py:493).

    Attributes
    ----------
    nmed : float
        Weights above ``nmed`` times the per-pol median are zeroed.
    """

    nmed = config.Property(proptype=float, default=8.0)

    def process(self, data):
        """Mask large weights in a FormedBeam container."""
        w = np.asarray(data.weight[:])
        npol = len(data.pol)
        med_weight = np.zeros(npol, dtype=np.float32)
        for pp in range(npol):
            wp = w[:, pp]
            med_weight[pp] = np.median(wp[wp > 0]) if (wp > 0).any() else 0.0
            self.log.info(
                f"Pol {data.pol[pp]} median weight {med_weight[pp]:0.2e}"
            )

        flag = w < (self.nmed * med_weight[np.newaxis, :, np.newaxis])
        data.weight[:] = (w * flag).astype(data.weight.dtype)
        return data


# ---------------------------------------------------------------------------
# Visibility-space RFI masks (reference flagging.py:1042-1423)
# ---------------------------------------------------------------------------


class RFIVisMask(ContainerTask):
    """Base class for RFI flagging on visibilities (reference flagging.py:1042).

    Attributes
    ----------
    stokes_i : bool
        Flag on Stokes-I-combined visibilities (factor ~4 fewer baselines).
    """

    stokes_i = config.Property(proptype=bool, default=True)

    def setup(self, telescope):
        """Set the telescope object."""
        self.telescope = io.get_telescope(telescope)

    def process(self, stream):
        """Build a time-frequency mask from the data."""
        from . import transform

        if "time" in stream.index_map:
            times = np.asarray(stream.time)
            out = containers.RFIMask(axes_from=stream, attrs_from=stream)
        elif "ra" in stream.index_map:
            csd = stream.attrs.get("lsd", stream.attrs.get("csd"))
            if csd is None:
                raise ValueError(
                    "Cannot find a day number (`lsd`/`csd` attribute) on the dataset."
                )
            times = self.telescope.lsd_to_unix(
                csd + np.asarray(stream.ra) / 360.0
            )
            out = containers.SiderealRFIMask(axes_from=stream, attrs_from=stream)
        else:
            raise TypeError(
                f"A `time` or `ra` axis is required; {type(stream)} has neither."
            )

        freq = np.asarray(stream.freq)

        if self.stokes_i:
            vis, weight, baselines = transform.stokes_I(stream, self.telescope)
            vis = np.asarray(vis)
            weight = np.asarray(weight)
        else:
            vis = np.asarray(stream.vis[:])
            weight = np.asarray(stream.weight[:])
            baselines = self.telescope.baselines

        mask = (weight == 0).all(axis=1)
        mask |= self._static_rfi_mask_hook(freq, times[0])[:, np.newaxis]

        self.log.debug(f"{100.0 * mask.mean():.2f}% of data initially flagged.")

        out.mask[:] = self.generate_mask(vis, weight, mask, freq, baselines, times)

        self.log.debug(
            f"{100.0 * np.asarray(out.mask[:]).mean():.2f}% of data flagged."
        )
        return out

    def generate_mask(self, vis, weight, mask, freq, baselines, times):
        """Generate a (freq, time) mask; subclass responsibility."""
        raise NotImplementedError

    def _static_rfi_mask_hook(self, freq, timestamp=None):
        """Override to mask entire frequency channels."""
        return np.zeros_like(freq, dtype=bool)


class RFITransientVisMask(RFIVisMask):
    """Flag transient RFI via high-pass + beamform + MAD filter.

    (reference flagging.py:1191-1277)

    Attributes
    ----------
    mad_base_size, mad_dev_size : [int, int]
        MAD filter window sizes.
    sigma_high, sigma_low : float
        Hysteresis thresholds in MAD units.
    frac_samples : float
        Fraction of flagged beams above which the time sample is masked.
    """

    mad_base_size = config.list_type(int, length=2, default=[1, 101])
    mad_dev_size = config.list_type(int, length=2, default=[1, 51])
    sigma_high = config.Property(proptype=float, default=8.0)
    sigma_low = config.Property(proptype=float, default=2.0)
    frac_samples = config.Property(proptype=float, default=0.01)

    def generate_mask(self, vis, weight, mask, freq, baselines, times):
        """Flag isolated transient RFI events."""
        ra = (
            np.unwrap(self.telescope.unix_to_lsa(times), period=360.0)
            * np.pi
            / 180.0
        )

        dec = np.deg2rad(self.telescope.latitude)
        lambda_inv = freq.min() * 1e6 / 299792458.0
        hpf_cut = lambda_inv * np.abs(baselines[:, 0]).max() / np.cos(dec)

        finalmask = mask[:, np.newaxis] | np.zeros(vis.shape, dtype=bool)

        for ii in range(vis.shape[0]):
            if np.all(mask[ii]):
                continue
            vhpf = np.asarray(
                filters.highpass_weighted_convolution_filter(
                    vis[ii], weight[ii], ra, hpf_cut, axis=-1
                )
            )
            vfft = np.abs(np.fft.fft(vhpf, axis=0))
            mad_ = mad(vfft, finalmask[ii], self.mad_base_size, self.mad_dev_size)
            finalmask[ii] |= ops_tools.apply_hysteresis_threshold(
                mad_, self.sigma_low, self.sigma_high
            )

        # Scale-invariant rank operator over (freq, time); don't extend
        # anything that was originally masked
        finalmask |= rfi.scale_invariant_rank(
            finalmask & ~mask[:, np.newaxis], eta=(0.1, 0.2), axis=(0, -1)
        )

        return finalmask.mean(axis=1) > self.frac_samples


class RFIInverseRedundancyChisqFreqMask(RFIVisMask):
    """Flag time-constant narrowband RFI from a chi-squared metric.

    (reference flagging.py:1280-1391): a MAD filter on the time-median of
    the chi-squared, then a high-sensitivity MAD filter on the ratio to a
    smoothed background.

    Attributes
    ----------
    nsigma : float
        Starting MAD threshold.
    winsize : tuple
        Median filter window for the smooth background.
    """

    nsigma = config.Property(proptype=float, default=15.0)
    winsize = config.Property(proptype=tuple, default=(15, 11))

    def generate_mask(self, vis, weight, mask, freq, baselines, times):
        """Mask narrowband RFI."""
        from ..ops import median as median_ops

        vis = np.asarray(vis).real[:, 0]
        weight = np.asarray(weight)[:, 0]
        mask = np.asarray(mask)

        def _masked_median(x, m, axis=-1, keepdims=True, winsize=None):
            x = np.abs(x).astype(np.float64)
            w = (~m).astype(np.float64)
            if winsize is not None:
                med = median_ops.moving_weighted_median(x, w, size=winsize)
            else:
                med = median_ops.weighted_median(x, w, axis=axis)
                if keepdims:
                    med = np.expand_dims(med, axis)
            return med

        def _mad1d(spectrum, m, axis=-1):
            baseline = ops_tools.IarPLS_1d(
                np.squeeze(spectrum, axis=-1), np.squeeze(m, axis=-1), lam=5e1
            )
            dev = np.abs(spectrum - baseline[..., np.newaxis])
            med = 1.4826 * _masked_median(dev, m, axis=0)
            return dev * np.asarray(invert_no_zero(med))

        def _mask1d(x, m, thresh_low, thresh_high):
            spectrum = _masked_median(x, m, axis=-1)
            mi = np.all(m, axis=-1, keepdims=True)
            m1d = _mad1d(spectrum, mi, axis=0)
            return ops_tools.apply_hysteresis_threshold(
                m1d, thresh_low, thresh_high
            )

        tslc = self._day_flag_hook(times)

        vi = vis[..., tslc]
        mi = mask[..., tslc].copy()

        mi |= _mask1d(vi, mi, self.nsigma / 2, self.nsigma)

        bg = np.asarray(filters.medfilt(vi, mi, size=self.winsize)) * ~mi
        ratio = vi * np.asarray(invert_no_zero(bg))

        mi |= _mask1d(ratio, mi, self.nsigma / 4, self.nsigma / 2)

        mask = mask | (mi & ~mask[..., tslc]).any(axis=-1, keepdims=True)
        return mask

    def _day_flag_hook(self, times):
        """Override to restrict to nighttime; default uses all times."""
        return np.ones(times.size, dtype=bool)


from ..core.task import group_tasks as _group_tasks  # noqa: E402
from .transform import ReduceChisqInverseRedundancy as _RCIR  # noqa: E402


class RFIStaticVisMask(
    _group_tasks(MaskBaselines, _RCIR, RFIInverseRedundancyChisqFreqMask)
):
    """Grouped narrowband RFI flagging pipeline (reference flagging.py:1394)."""


class RFIMaskChisqHighDelay(ContainerTask):
    """Mask anomalous chi-squared test statistics (reference flagging.py:1425).

    Attributes
    ----------
    flag_ew : array
        Optional per-EW-baseline flag applied before collapsing.
    reg_arpls, nsigma_1d : float
        Baseline regularisation and 1D threshold.
    win_t, win_f : int
        Moving-median window sizes (time, freq).
    nsigma_2d : float
        2D deviation threshold in expected standard deviations.
    estimate_var, only_positive, separate_pol : bool
        Variance estimation / one-sided masking / per-pol masks.
    mask_type : "mad" | "sumthreshold"
    niter, rho, max_m
        SumThreshold iteration controls.
    """

    flag_ew = config.Property(proptype=np.array, default=None)

    reg_arpls = config.Property(proptype=float, default=1e5)
    nsigma_1d = config.Property(proptype=float, default=5.0)

    win_t = config.Property(proptype=int, default=601)
    win_f = config.Property(proptype=int, default=1)
    nsigma_2d = config.Property(proptype=float, default=5.0)
    estimate_var = config.Property(proptype=bool, default=False)
    only_positive = config.Property(proptype=bool, default=False)
    separate_pol = config.Property(proptype=bool, default=False)

    mask_type = config.enum(["mad", "sumthreshold"], default="mad")
    niter = config.Property(proptype=int, default=5)
    rho = config.Property(proptype=float, default=1.5)
    max_m = config.Property(proptype=int, default=32)

    def setup(self, telescope=None):
        """Optionally save the telescope (needed for sidereal streams)."""
        self.telescope = None if telescope is None else io.get_telescope(telescope)
        if self.mask_type == "sumthreshold":
            self.threshold = self.nsigma_2d * self.rho ** np.arange(self.niter)[::-1]

    def process(self, stream):
        """Generate a time/freq mask from a chi-squared-like dataset."""
        freq = np.asarray(stream.freq)

        multiple_days = False
        if "ra" in stream.index_map:
            if self.telescope is None:
                raise RuntimeError(
                    "For sidereal streams, must provide telescope object "
                    "during setup."
                )
            csd = stream.attrs.get("lsd", stream.attrs.get("csd"))
            if csd is None:
                raise ValueError(
                    "Cannot find a day number (`lsd`/`csd` attribute) on the data."
                )
            if not np.isscalar(csd):
                csd = np.floor(np.mean(csd))
                multiple_days = True
            timestamp = self.telescope.lsd_to_unix(
                csd + np.asarray(stream.ra) / 360.0
            )
        else:
            timestamp = np.asarray(stream.time)

        dax = list(stream.data.attrs["axis"])
        wax = list(stream.weight.attrs["axis"])
        wshp = [
            stream.weight.shape[wax.index(ax)] if ax in wax else 1 for ax in dax
        ]

        keep_axis = ["freq", "time", "ra"]
        separate_pol = self.separate_pol and "pol" in dax
        if separate_pol:
            keep_axis.append("pol")

        axsum = tuple(ii for ii, ax in enumerate(dax) if ax not in keep_axis)

        chisq = np.asarray(stream.data[:]).real
        weight = np.asarray(stream.weight[:]).reshape(*wshp)

        if self.flag_ew is not None and "ew" in dax:
            ew_slc = tuple(
                slice(None) if ax == "ew" else None for ax in dax
            )
            weight = weight * np.asarray(self.flag_ew)[ew_slc]

        # summing the BROADCAST weight already counts each missing-axis
        # element once (the reference reaches the same total as
        # wfactor * sum(unbroadcast weight), flagging.py:1578);
        # multiplying by wfactor on top would double-count and shrink
        # the reported chisq deviations by sqrt(wfactor)
        wsum = np.sum(np.broadcast_to(weight, chisq.shape), axis=axsum)
        chisq = np.sum(
            np.broadcast_to(weight, chisq.shape) * chisq, axis=axsum
        ) * np.asarray(invert_no_zero(wsum))

        mask_input = wsum == 0.0

        if multiple_days:
            mask_daytime = np.zeros(timestamp.size, dtype=bool)
        else:
            mask_daytime = self._day_flag_hook(timestamp)

        mask_sources = self._source_flag_hook(timestamp, freq)

        if separate_pol:
            OutputContainer = (
                containers.SiderealRFIMaskByPol
                if "ra" in stream.index_map
                else containers.RFIMaskByPol
            )
        elif "ra" in stream.index_map:
            OutputContainer = containers.SiderealRFIMask
        else:
            OutputContainer = containers.RFIMask

        output = OutputContainer(axes_from=stream, attrs_from=stream)
        omask = np.zeros(output.mask.shape, dtype=bool)

        pol_slice = (
            np.arange(len(stream.index_map["pol"]))
            if separate_pol
            else [slice(None)]
        )
        for pslc in pol_slice:
            mask = mask_input[pslc] | mask_sources

            if self.nsigma_1d > 0.0:
                mask_1d = self.mask_1d(chisq[pslc], mask | mask_daytime)[
                    :, np.newaxis
                ]
                mask = mask | mask_1d
                omask[pslc] |= mask_1d

            if self.nsigma_2d > 0.0:
                w = ~mask * wsum[pslc] / 2.0
                if self.mask_type == "mad":
                    mask_2d = self.mask_2d(chisq[pslc], w)
                else:
                    mask_2d = self.mask_2d_sumthreshold(chisq[pslc], w)
                omask[pslc] |= mask_2d & ~mask_daytime

        output.mask[:] = omask
        return output

    def mask_1d(self, y, m):
        """Flag channels whose time-median deviates from the baseline."""
        from ..ops import median as median_ops

        y = y.astype(np.float64)
        w = (~m).astype(np.float64)

        med_y = median_ops.weighted_median(y, w)
        med_m = np.all(m, axis=-1)
        med_w = (~med_m).astype(np.float64)

        baseline = ops_tools.arPLS_1d(med_y, mask=med_m, lam=self.reg_arpls)
        abs_dev = np.where(med_m, 0.0, np.abs(med_y - baseline))
        # 1.48625 (not the usual 1.4826): deliberate reference parity
        # (reference flagging.py:1665,1702,1754 uses this constant here)
        mad_v = 1.48625 * median_ops.weighted_median(abs_dev, med_w)

        return abs_dev > (self.nsigma_1d * mad_v)

    def mask_2d(self, y, w):
        """Flag samples deviating from a local moving median."""
        from ..ops import median as median_ops

        y = y.astype(np.float64)
        w = w.astype(np.float64)
        win_size = (self.win_f, self.win_t)

        med_y = median_ops.moving_weighted_median(y, w, win_size)
        dy = (y - med_y) * np.sqrt(w)

        if self.estimate_var:
            f = (w > 0.0).astype(np.float64)
            mad_y = 1.48625 * median_ops.moving_weighted_median(
                np.abs(dy), f, win_size
            )
            dy *= np.asarray(invert_no_zero(mad_y))

        if not self.only_positive:
            dy = np.abs(dy)

        return dy > self.nsigma_2d

    def mask_2d_sumthreshold(self, y, w):
        """Iterative SumThreshold masking of the chi-squared."""
        from ..ops import median as median_ops

        y = np.ascontiguousarray(y, dtype=np.float64)
        win_size = (self.win_f, self.win_t)

        if not self.estimate_var:
            mad_y = np.ones_like(y)

        mask = w == 0.0
        for nsigma in self.threshold:
            f = (~mask * w).astype(np.float64)
            med_y = median_ops.moving_weighted_median(y, f, win_size)
            dy = (y - med_y) * np.sqrt(w)
            if self.estimate_var:
                f = (f > 0.0).astype(np.float64)
                mad_y = 1.48625 * median_ops.moving_weighted_median(
                    np.abs(dy), f, win_size
                )

            stmask = rfi.sumthreshold(
                dy,
                self.max_m,
                start_flag=mask,
                threshold1=nsigma,
                remove_median=False,
                correct_for_missing=True,
                rho=1.0,
                variance=mad_y**2,
                only_positive=self.only_positive,
            )
            mask |= stmask

        return mask

    def _source_flag_hook(self, times, freq):
        """Override to mask bright sources."""
        return np.zeros((freq.size, times.size), dtype=bool)

    def _day_flag_hook(self, times):
        """Override to mask daytime."""
        return np.zeros(times.size, dtype=bool)


# ---------------------------------------------------------------------------
# Taper combination / conversion (reference flagging.py:2617-2808)
# ---------------------------------------------------------------------------


class GeneralCombineTapers(GeneralCombineMasks):
    """Combine tapers with an arithmetic expression (reference flagging.py:2617)."""

    _dataset_name = "taper"
    _operators: ClassVar[set] = set("+-*/()")


class CombineTapers(GeneralCombineTapers):
    """Product of an arbitrary number of tapers (reference flagging.py:2640)."""

    def process(self, tapers):
        """Multiply all input tapers together."""
        if not isinstance(tapers, (list, tuple)):
            tapers = [tapers]
        self.expression = " * ".join(
            [chr(ord("A") + i) for i in range(len(tapers))]
        )
        return super().process(tapers)


class MaskFromTaper(ContainerTask):
    """Threshold a RingMapTaper into a RingMapMask (reference flagging.py:2661).

    Attributes
    ----------
    outer : bool
        Mask where taper < 1 (True) or taper == 0 (False).
    """

    outer = config.Property(proptype=bool, default=False)

    def process(self, taper):
        """Generate the boolean mask from the taper."""
        out = containers.RingMapMask(axes_from=taper, attrs_from=taper)
        t = np.asarray(taper.taper[:])
        out.mask[:] = (t < 1.0) if self.outer else (t == 0.0)
        return out


class TaperDelayTransform(ContainerTask):
    """Apply a freq-collapsed taper/mask to a DelayTransform.

    (reference flagging.py:2711-2799)

    Attributes
    ----------
    update_weight : bool
        Scale the weights by 1/taper^2 in unmasked regions.
    """

    update_weight = config.Property(proptype=bool, default=False)

    def process(self, data, apply):
        """Apply the taper or mask in place."""
        if isinstance(apply, containers.RingMapTaper):
            taper = np.mean(np.asarray(apply.taper[:]), axis=1).transpose(0, 2, 1)
        else:
            taper = np.all(~np.asarray(apply.mask[:]), axis=1).transpose(0, 2, 1)

        _, _, nra = taper.shape

        for dax, tax in [("sample", "ra"), ("el", "el")]:
            if not np.array_equal(
                np.asarray(data.index_map[dax]), np.asarray(apply.index_map[tax])
            ):
                raise ValueError(
                    f"Mismatch between {dax} axis of delay transform and "
                    f"{tax} axis of taper/mask."
                )

        bax = list(data.attrs["baseline_axes"])
        shp = (*[len(data.index_map[ax]) for ax in bax], nra)
        bcast = tuple(
            slice(None) if ax in ["pol", "el"] else None for ax in bax
        )

        taper_expanded = np.ones(shp, dtype=float)
        taper_expanded *= taper[bcast].astype(float)
        taper_collapsed = taper_expanded.reshape(-1, nra, 1)

        data.spectrum[:] = (
            np.asarray(data.spectrum[:]) * taper_collapsed
        ).astype(data.spectrum.dtype)

        if self.update_weight:
            if "weight" in data.datasets:
                data.weight[:] = (
                    np.asarray(data.weight[:])
                    * np.asarray(invert_no_zero(taper_collapsed)) ** 2
                ).astype(data.weight.dtype)
            else:
                self.log.warning(
                    "Delay transform does not contain a weight dataset.  "
                    "Skipping application of mask/taper."
                )

        return data


class ApplyBaselineMask(ContainerTask):
    """Apply a baseline-dependent mask (reference flagging.py:2802).

    No broadcasting: the data and mask must share axes.

    Attributes
    ----------
    share : "all" | "none" | "vis" | "map"
        Dataset sharing with the input container.
    """

    share = config.enum(["none", "vis", "map", "all"], default="all")

    def process(self, data, mask):
        """Zero the weights where the mask is True."""
        if isinstance(mask, containers.BaselineMask):
            if not hasattr(data, "time"):
                raise TypeError(
                    f"A time-like container is needed; received {type(data)}."
                )
        elif isinstance(mask, containers.SiderealBaselineMask):
            if not hasattr(data, "ra"):
                raise TypeError(
                    f"A sidereal-like container is needed; received {type(data)}."
                )
        else:
            raise TypeError(
                f"Require a BaselineMask or SiderealBaselineMask. "
                f"Got {type(mask)}."
            )

        if not np.array_equal(np.asarray(data.stack), np.asarray(mask.stack)):
            raise ValueError("Data and mask disagree on the baseline axis.")

        if self.share == "all":
            tsc = data
        elif self.share == "vis":
            tsc = data.copy(shared=("vis",))
        elif self.share == "map":
            tsc = data.copy(shared=("map",))
        else:
            tsc = data.copy()

        tsc.weight[:] = (
            np.asarray(tsc.weight[:])
            * (~np.asarray(mask.mask[:])).astype(np.float32)
        ).astype(tsc.weight.dtype)

        return tsc


# ---------------------------------------------------------------------------
# Mask axis conversion / reduction (reference flagging.py:3433-3846)
# ---------------------------------------------------------------------------


class RFIMaskSiderealRegridderNearest(ContainerTask):
    """Convert an RFI mask's time axis to RA (reference flagging.py:3433).

    Attributes
    ----------
    spread_factor : float
        Conservative spreading width in RA bins.
    npix : int
        RA bins covering [0, 360).
    single_CSD : bool
        Keep only the main CSD of the input.
    """

    spread_factor = config.Property(proptype=float, default=1)
    npix = config.Property(proptype=int, default=4096)
    single_CSD = config.Property(proptype=bool, default=True)

    def setup(self, manager):
        """Set the observer used for the time -> LSA mapping."""
        self.observer = io.get_telescope(manager)

    def process(self, rfimask):
        """Regrid the mask onto the RA axis."""
        if isinstance(rfimask, containers.LocalizedRFIMask):
            to_type = containers.LocalizedSiderealRFIMask
        elif isinstance(rfimask, containers.RFIMask):
            to_type = containers.SiderealRFIMask
        else:
            raise TypeError(
                f"Expected LocalizedRFIMask or RFIMask input. "
                f"Got {type(rfimask)}."
            )

        from_ax = self.observer.unix_to_lsa(np.asarray(rfimask.time))

        if self.single_CSD:
            diff = np.diff(from_ax)
            indices = np.where(diff < 0)[0]
            if len(indices) < 2:
                raise ValueError("The input does not span one whole sidereal day.")
            if len(indices) > 2:
                raise ValueError("The input spans multiple sidereal days; expected one.")
            start, end = indices[0], indices[1] + 1
            from_ax = from_ax.copy()
            from_ax[:start] = -1
            from_ax[end:] = -1

        return _convert_axis_nearest_interpolation(
            stream=rfimask,
            to_type=to_type,
            from_ax_name="time",
            to_ax_name="ra",
            from_ax=from_ax,
            to_ax=np.linspace(0, 360, self.npix, endpoint=False),
            spread_factor=self.spread_factor,
        )


class RFIMaskTimeRegridderNearest(ContainerTask):
    """Align an RFI mask's time axis to a target stream's.

    (reference flagging.py:3518)

    Attributes
    ----------
    spread_factor : float
        Conservative spreading width in time-resolution units.
    """

    spread_factor = config.Property(proptype=float, default=1.0)

    def setup(self, tstream):
        """Save the target time axis."""
        try:
            self.target_time = np.asarray(tstream.time)
        except AttributeError as exc:
            raise TypeError(
                f"Expected a time-like stream for reference time. "
                f"Got {type(tstream)}."
            ) from exc

    def process(self, rfimask):
        """Regrid the mask onto the target time axis."""
        return _convert_axis_nearest_interpolation(
            stream=rfimask,
            to_type=type(rfimask),
            from_ax_name="time",
            to_ax_name="time",
            from_ax=np.asarray(rfimask.time),
            to_ax=self.target_time,
            spread_factor=self.spread_factor,
        )


class ReduceMaskEl(ContainerTask):
    """Collapse the el axis of a localized RFI mask (reference flagging.py:3573).

    Attributes
    ----------
    el_threshold : int
        Minimum number of flagged el samples to flag the output.
    """

    el_threshold = config.Property(proptype=int, default=1)

    def process(self, rfimask):
        """Produce the el-collapsed RFI mask."""
        if not isinstance(
            rfimask,
            (containers.LocalizedRFIMask, containers.LocalizedSiderealRFIMask),
        ):
            raise ValueError(
                "Input class must be LocalizedRFIMask or "
                f"LocalizedSiderealRFIMask. Got {type(rfimask)}."
            )

        mask = np.asarray(rfimask.mask[:])
        el_axis = list(rfimask.mask.attrs["axis"]).index("el")
        freq_map = rfimask.index_map["freq"]

        reduced_mask = np.sum(mask, axis=el_axis) >= self.el_threshold

        if isinstance(rfimask, containers.LocalizedRFIMask):
            output = containers.RFIMask(
                freq=freq_map, time=np.asarray(rfimask.time)
            )
        else:
            output = containers.SiderealRFIMask(
                freq=freq_map, ra=np.asarray(rfimask.ra)
            )

        output.mask[:] = reduced_mask
        return output


class ApplyLocalizedRFIMask(ContainerTask):
    """Apply an el-sensitive RFI mask to a RingMap (reference flagging.py:3640).

    Attributes
    ----------
    share : "all" | "none" | "map"
        Dataset sharing with the input container.
    """

    share = config.enum(["none", "map", "all"], default="all")

    def process(self, tstream, rfimask):
        """Zero the weights in overlapping (freq, ra, el) regions."""
        if not isinstance(tstream, containers.RingMap):
            raise TypeError(f"A RingMap is needed here, not {type(tstream)}.")
        if not isinstance(rfimask, containers.LocalizedSiderealRFIMask):
            raise TypeError(
                f"The mask must be a LocalizedSiderealRFIMask, not {type(rfimask)}."
            )

        if not np.array_equal(np.asarray(tstream.freq), np.asarray(rfimask.freq)):
            raise ValueError("Stream and mask disagree on the freq axis.")

        if self.share == "all":
            tsc = tstream
        elif self.share == "map":
            tsc = tstream.copy(shared=("map",))
        else:
            tsc = tstream.copy()

        mask = np.asarray(rfimask.mask[:])
        nfreq, nra, nel = mask.shape
        npol = tstream.weight.shape[0]

        ra_overlap = np.intersect1d(
            np.asarray(tstream.ra), np.asarray(rfimask.ra), return_indices=True
        )
        el_overlap = np.intersect1d(
            np.asarray(tstream.index_map["el"]),
            np.asarray(rfimask.index_map["el"]),
            return_indices=True,
        )

        if len(ra_overlap[0]) == 0:
            raise ValueError("The stream and mask RA ranges do not overlap.")
        if len(el_overlap[0]) == 0:
            raise ValueError("The stream and mask el ranges do not overlap.")

        _, t_ra_index, m_ra_index = ra_overlap
        _, t_el_index, m_el_index = el_overlap

        t_pol_index = np.arange(npol)
        tm_freq_index = np.arange(nfreq)

        mask = mask.reshape(1, nfreq, nra, nel)

        w = np.asarray(tsc.weight[:])
        w[np.ix_(t_pol_index, tm_freq_index, t_ra_index, t_el_index)] *= (
            ~mask[np.ix_([0], tm_freq_index, m_ra_index, m_el_index)]
        ).astype(np.float32)
        tsc.weight[:] = w

        return tsc


def _convert_axis_nearest_interpolation(
    stream, to_type, from_ax_name, to_ax_name, from_ax, to_ax, spread_factor
):
    """Generic axis conversion by nearest-neighbour interpolation.

    (reference flagging.py:3731-3846).  Boolean datasets spread
    conservatively (OR over the window); numeric datasets average.
    """
    from .sidereal import _search_nearest

    new_resolution = np.median(np.abs(np.diff(to_ax)))
    from_resolution = np.median(np.abs(np.diff(from_ax)))

    if new_resolution < from_resolution:
        nearest_indices = _search_nearest(from_ax, to_ax)
    else:
        nearest_indices = np.arange(len(from_ax))

    dist = np.abs(to_ax[:, np.newaxis] - from_ax[nearest_indices][np.newaxis, :])

    if np.all(np.diag(dist) == 0):
        spread_factor = 0

    resolution = np.median(np.abs(np.diff(from_ax)))
    # Inclusive: with exactly-aligned axes (spread_factor forced to 0
    # above) the window must keep the zero-distance diagonal — the
    # documented nearest-neighbour pass-through.  A strict < (as in the
    # reference implementation, contradicting its own docstring) makes
    # the window all-False and silently erases every dataset.
    window = dist <= spread_factor * resolution

    axes = {}
    for ax in to_type.axes_spec():
        name = ax
        if ax == to_ax_name:
            axes[name] = to_ax
        elif ax in stream.index_map:
            axes[name] = np.asarray(stream.index_map[ax])
    out = to_type(attrs_from=stream, **axes)

    for dname in list(stream.datasets):
        ds = stream.datasets[dname]
        data = np.array(ds[:])
        ax_idx = list(ds.attrs["axis"]).index(from_ax_name)
        data = np.moveaxis(data, ax_idx, 0)

        if data.dtype == np.bool_:
            converted = (
                np.tensordot(window, data[nearest_indices], axes=([1], [0])) > 0
            )
        else:
            fwin = window.astype(np.float32)
            numerator = np.tensordot(
                fwin, data[nearest_indices], axes=([1], [0])
            )
            denominator = np.sum(fwin, axis=-1).reshape(
                (-1,) + (1,) * (numerator.ndim - 1)
            )
            converted = numerator * np.asarray(invert_no_zero(denominator))

        if dname not in out.datasets:
            out.add_dataset(dname)

        ax_idx = list(out.datasets[dname].attrs["axis"]).index(to_ax_name)
        converted = np.moveaxis(converted, 0, ax_idx)
        out[dname][:] = converted.astype(out.datasets[dname].dtype)

    return out
