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
from ..ops import filters, rfi
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
            raise RuntimeError("Can't zero the visibilities if they are shared.")

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

            size = [
                self.window[self.window.index(ax)] if ax in self.window else 1
                for ax in axes
            ]
            size = [w if isinstance(w, int) else 1 for w in size]
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
                "Must have a input stream with the full correlation triangle."
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
            raise ValueError("Minimum threshold is larger than maximum threshold.")

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
            f"{100.0 * mask.mean():.2f}% of data flagged due to negative autos."
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
            raise TypeError(f"Require Timestream or SiderealStream. Got {type(stream)}")

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
            "%0.5f%% of data is below the weight threshold" % (100.0 * drop_frac)
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
        self.log.info(f"{100.0 * mask_frac:.5f} of data is below the weight threshold")
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
            f"After baseline collapse: {100.0 * drop_frac:.1f}%% of data"
            " is below the weight threshold"
        )
        mask_cont.mask[:] = full_mask
        return mask_cont


class RFISensitivityMask(ContainerTask):
    """RFI mask from a system-sensitivity metric via SumThreshold + SIR.

    (reference flagging.py:1808): per-frequency deviations of the measured
    sensitivity from a radiometer baseline are flagged with SumThreshold,
    TV-channel re-flagging, and widened with the scale-invariant rank
    operator.
    """

    mask_type = config.enum(["mad", "sumthreshold", "combine"], default="combine")
    include_pol = config.Property(proptype=list, default=None)
    remove_median = config.Property(proptype=bool, default=True)
    sir = config.Property(proptype=bool, default=True)
    eta = config.Property(proptype=float, default=0.2)
    max_m = config.Property(proptype=int, default=64)
    start_threshold_sigma = config.Property(proptype=float, default=5.0)
    tv_fraction = config.Property(proptype=float, default=0.5)

    def process(self, sensitivity):
        pol = [
            p.decode() if isinstance(p, bytes) else str(p)
            for p in sensitivity.index_map["pol"]
        ]
        include = self.include_pol or pol
        psel = [i for i, p in enumerate(pol) if p in include]

        measured = np.asarray(sensitivity.measured[:])[:, psel]
        radiometer = np.asarray(sensitivity.radiometer[:])[:, psel]
        sens_weight = np.asarray(sensitivity.weight[:])[:, psel]

        finalmask = np.zeros(
            (measured.shape[0], measured.shape[-1]), dtype=bool
        )
        for pi in range(measured.shape[1]):
            metric = measured[:, pi] * invert_no_zero(radiometer[:, pi])
            start_flag = sens_weight[:, pi] == 0
            madmask = mad(metric, start_flag) > self.start_threshold_sigma
            madmask |= start_flag
            stmask = rfi.sumthreshold(
                metric,
                max_m=self.max_m,
                start_flag=start_flag,
                remove_median=self.remove_median,
            )
            if self.mask_type == "mad":
                m = madmask
            elif self.mask_type == "sumthreshold":
                m = stmask
            else:
                m = madmask | stmask
            # TV station re-flagging
            dev = mad(metric, start_flag)
            dev = np.where(np.isnan(dev), 2 * self.start_threshold_sigma, dev)
            m |= tv_channels_flag(
                dev, sensitivity.freq, sigma=self.start_threshold_sigma,
                f=self.tv_fraction,
            )
            if self.sir:
                m = rfi.scale_invariant_rank(m, eta=self.eta, axis=(0, -1))
            finalmask |= m

        self.log.info(
            "Flagging %0.2f%% of data due to RFI."
            % (100.0 * np.sum(finalmask) / float(finalmask.size))
        )
        out = containers.RFIMask(axes_from=sensitivity, attrs_from=sensitivity)
        out.mask[:] = finalmask
        return out


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
            "Flagging %0.2f%% of data due to RFI."
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
                raise TypeError(f"Expected a timestream like type. Got {type(tstream)}.")
            timelike_ax = "time"
            timelike_data = tstream.time
            timelike_mask = rfimask.time
        elif isinstance(
            rfimask, (containers.SiderealRFIMask, containers.SiderealRFIMaskByPol)
        ):
            if "ra" not in tstream.index_map:
                raise TypeError(
                    f"Expected a sidereal stream like type. Got {type(tstream)}."
                )
            timelike_ax = "ra"
            timelike_data = tstream.ra
            timelike_mask = rfimask.ra
        else:
            raise TypeError(f"Require a RFIMask or SiderealRFIMask. Got {type(rfimask)}.")

        if not np.array_equal(tstream.freq, rfimask.freq):
            raise ValueError("timestream and mask data have different freq axes.")

        if self.match_axes:
            if not np.array_equal(timelike_data, timelike_mask):
                raise ValueError(
                    "timestream and mask data have different time-like axes."
                )
            data_sel = slice(None)
            mask_sel = slice(None)
        else:
            data_sel = np.isin(timelike_data, timelike_mask)
            mask_sel = np.isin(timelike_mask, timelike_data)
            if not np.any(data_sel):
                raise ValueError("No overlapping samples found in timelike axis.")

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
                        "timestream and mask data have different pol axes."
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
                f"\nData axes: {daxes}\nMask axes: {maxes}"
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
            raise ValueError("Too many masks: only A-Z are supported (max 26).")
        if any(type(m) is not type(masks[0]) for m in masks[1:]):
            raise TypeError("All input masks must be of the same container type.")
        pattern = self._build_allowed_pattern()
        if not re.match(pattern, self.expression):
            raise ValueError(
                f"Invalid expression: '{self.expression}'. Allowed characters: "
                f"A-Z, digits, whitespace, and {''.join(sorted(self._operators))}"
            )
        namespace = {
            chr(ord("A") + i): np.asarray(m.datasets[self._dataset_name][:])
            for i, m in enumerate(masks)
        }
        self.log.info(f"Evaluating mask combination expression: '{self.expression}'")
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
        self.log.info(f"Input data: {100.0 * mask.mean():.2f}% flagged.")

        if self.mask_missing_data:
            mask = present < present.max()
            self.log.info(
                f"Requiring all baselines: {100.0 * mask.mean():.2f}% flagged."
            )
        if self.bad_freq_ind is not None:
            nfreq = len(data.freq)
            mask |= self._bad_freq_mask(nfreq)[:, np.newaxis]
            self.log.info(f"Frequency mask: {100.0 * mask.mean():.2f}% flagged.")
        if self.freq_frac is not None:
            mask |= mask.mean(axis=1)[:, np.newaxis] > (1.0 - self.freq_frac)
            self.log.info(f"Fractional mask: {100.0 * mask.mean():.2f}% flagged.")
        if self.all_time:
            mask |= mask.any(axis=1)[:, np.newaxis]
            self.log.info(f"All time mask: {100.0 * mask.mean():.2f}% flagged.")
        elif self.factorize:
            mask = self._optimal_mask(mask)
            self.log.info(f"Factorizable mask: {100.0 * mask.mean():.2f}% flagged.")

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
                    "Elements of `bad_freq_ind` must be integers or 2-tuples. "
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
            self.log.debug("Optimisation did not converge, but this isn't unexpected.")
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
                f"Size of data ({dset.shape}) must match "
                f"data_stack ({dset_stack.shape})"
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


def tv_channels_flag(x, freq, sigma=5, f=0.5, debug=False):
    """Flag whole TV-station bands with excess bad samples.

    (reference flagging.py:3316-3381)
    """
    p_false = sigma_to_p(sigma)
    frac = np.ones_like(x, dtype=np.float32)

    tvstart_freq = 398
    tvwidth_freq = 6
    df = np.median(np.abs(np.diff(freq)))
    freq_start = freq - 0.5 * df
    freq_end = freq + 0.5 * df

    for i in range(67):
        fs = tvstart_freq + i * tvwidth_freq
        fe = fs + tvwidth_freq
        sel = (freq_end >= fs) & (freq_start <= fe)
        if not sel.any():
            continue
        N = sel.sum()
        k = int(f * N)
        t = p_to_sigma(inverse_binom_cdf_prob(k, N, 1 - p_false))
        frac[sel] = (x[sel] > t).mean(axis=0)[np.newaxis, :]

    mask = frac > f
    if debug:
        return mask, frac
    return mask


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
