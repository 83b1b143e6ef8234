"""Delay-space spectrum estimation and filtering tasks.

Re-provides reference ``draco/analysis/delay.py`` (DelayFilter:29,
DelayFilterBase:156, DelayTransformBase:347, container mixins :675-873,
DelaySpectrumBase:874, DelaySpectrumFFT:960, DelaySpectrumWienerFilter:982,
DelaySpectrumToPowerSpectrum:1061, DelayPowerSpectrumBase:1114,
DelayPowerSpectrumGibbs:1218, DelayPowerSpectrumNRML:1270,
DelayCrossPowerSpectrumEstimator:1304).

TPU design: when the retained frequency mask is uniform across baselines
(the common case after MaskFreq-style flagging) the Gibbs chains of every
baseline advance together in a single batched device kernel
(:func:`draco_tpu.ops.delay.delay_power_spectrum_gibbs_batched`); ragged
masks fall back to the per-baseline path.
"""

from __future__ import annotations

import numpy as np

from ..core import config, containers, io
from ..core.task import ContainerTask, RandomTask
from ..ops import filters
from ..ops import tools
from ..ops.delay import (
    _inv_move_front,
    _move_front,
    _take_view,
    delay_power_spectrum_gibbs,
    delay_power_spectrum_gibbs_batched,
    delay_spectrum_fft,
    delay_spectrum_gibbs_cross,
    delay_spectrum_gibbs_cross_batched,
    delay_spectrum_wiener_filter,
    flatten_axes,
    match_axes,
)
from .delayopt import delay_power_spectrum_maxpost

C_US = 299.792458  # m / us (c such that baseline[m] / C_US is in us)


# ---------------------
# Delay filter classes
# ---------------------


class DelayFilter(ContainerTask):
    """Project out delays below a cut (reference delay.py:29-153).

    Attributes
    ----------
    delay_cut : float
        Delay cut in microseconds.
    za_cut : float
        Sine of max zenith angle for the baseline-dependent cut.
    extra_cut : float
        Additional delay threshold beyond the baseline term.
    weight_tol : float
        (Kept for API parity.)
    telescope_orientation : 'NS' | 'EW' | 'none'
        Baseline component used for the baseline-dependent cut.
    window : bool
        Apply the window function while filtering.
    """

    delay_cut = config.float_prop(0.1)
    za_cut = config.float_prop(1.0)
    extra_cut = config.float_prop(0.0)
    weight_tol = config.float_prop(1e-4)
    telescope_orientation = config.enum(["NS", "EW", "none"], default="NS")
    window = config.bool_prop(False)

    def setup(self, telescope):
        self.telescope = io.get_telescope(telescope)

    def process(self, ss):
        tel = self.telescope
        freq = ss.freq[:]
        bandwidth = np.ptp(freq)

        ssv = np.asarray(ss.vis[:]).copy()
        ssw = np.asarray(ss.weight[:]).copy()

        ps = ss.prodstack
        ia, ib = ps["input_a"].astype(int), ps["input_b"].astype(int)
        baselines = tel.feedpositions[ia] - tel.feedpositions[ib]

        if self.telescope_orientation == "NS":
            bl = np.abs(baselines[:, 1])
        elif self.telescope_orientation == "EW":
            bl = np.abs(baselines[:, 0])
        else:
            bl = np.linalg.norm(baselines, axis=1)

        # baseline / c in microseconds
        delay_cuts = np.maximum(
            self.za_cut * bl / C_US + self.extra_cut, self.delay_cut
        )
        number_cuts = (4.0 * bandwidth * delay_cuts + 0.5).astype(int)

        wpos = ssw > 0.0
        f_samp = wpos.sum(axis=2)  # [freq, stack]
        f_mask = (f_samp == f_samp.max(axis=0, keepdims=True)).astype(
            np.float64
        )
        t_samp = wpos.sum(axis=0)  # [stack, ra]
        t_mask = (t_samp == t_samp.max(axis=1, keepdims=True)).astype(
            np.float64
        )

        # Redundant arrays share baseline lengths and flag patterns:
        # build ONE null-space projector per unique (cut, channel-mask)
        # group and apply it as a batched matmul, instead of the
        # reference's per-baseline SVD loop (reference delay.py:100-140)
        groups: dict = {}
        for bi in range(ssv.shape[1]):
            key = (
                float(delay_cuts[bi]),
                int(number_cuts[bi]),
                f_mask[:, bi].tobytes(),
            )
            groups.setdefault(key, []).append(bi)
        self.log.debug(
            "DelayFilter: %d baselines in %d filter groups",
            ssv.shape[1], len(groups),
        )
        for (dcut, ncut, _), idx in groups.items():
            NF = filters.null_filter(
                freq, dcut, f_mask[:, idx[0]], num_modes=max(ncut, 1),
                window=self.window,
            )
            sel = np.asarray(idx)
            ssv[:, sel] = np.einsum("fg,gbt->fbt", NF, ssv[:, sel])
        ssw *= f_mask[:, :, np.newaxis] * t_mask[np.newaxis, :, :]

        ss.vis[:] = ssv.astype(ss.vis.dtype)
        ss.weight[:] = ssw.astype(ss.weight.dtype)
        return ss


class DelayFilterBase(ContainerTask):
    """Delay filter over a configurable axis/dataset (reference delay.py:156).

    Attributes
    ----------
    delay_cut : float
        Delay cut in microseconds.
    window : bool
        Apply the window function while filtering.
    axis, dataset : str
        Axis to iterate over and dataset to filter (container defaults).
    """

    delay_cut = config.float_prop(0.1)
    window = config.bool_prop(False)
    axis = config.str_prop(None)
    dataset = config.str_prop(None)

    def setup(self, telescope):
        self.telescope = io.get_telescope(telescope)

    def _delay_cut(self, ss, axis: str, ind: int) -> float:
        """Delay cut in microseconds for one element of the loop axis."""
        return self.delay_cut

    def process(self, ss):
        if not isinstance(ss, containers.FreqContainer):
            raise TypeError(
                f"A FreqContainer subclass is required here, not {type(ss)}."
            )
        _default_axis = {
            containers.SiderealStream: "stack",
            containers.HybridVisMModes: "m",
            containers.RingMap: "el",
            containers.GridBeam: "theta",
        }
        _default_dataset = {
            containers.SiderealStream: "vis",
            containers.HybridVisMModes: "vis",
            containers.RingMap: "map",
            containers.GridBeam: "beam",
        }
        axis = self.axis
        if axis is None:
            for cls, ax in _default_axis.items():
                if isinstance(ss, cls):
                    axis = ax
                    break
            else:
                raise ValueError(f"No default axis known for {type(ss)}.")
        dset = self.dataset
        if dset is None:
            for cls, dataset in _default_dataset.items():
                if isinstance(ss, cls):
                    dset = dataset
                    break
            else:
                raise ValueError(f"No default dataset known for {type(ss)}.")

        freq = ss.freq[:]
        bandwidth = np.ptp(freq)

        ssv = np.asarray(ss.datasets[dset][:]).copy()
        ssw = np.broadcast_to(
            match_axes(ss.datasets[dset], ss.weight), ssv.shape
        )
        mask_full = np.ones(ssv.shape, dtype=np.float64)

        dset_axes = list(ss.datasets[dset].axes)
        dist_axis_pos = dset_axes.index(axis)
        freq_axis_pos = dset_axes.index("freq")
        sel_freq_axis_pos = (
            freq_axis_pos if freq_axis_pos < dist_axis_pos else freq_axis_pos - 1
        )

        for bi in range(ssv.shape[dist_axis_pos]):
            vis_local = _take_view(ssv, bi, dist_axis_pos)
            vis_2D = _move_front(vis_local, sel_freq_axis_pos, vis_local.shape)
            weight_local = _take_view(ssw, bi, dist_axis_pos)
            weight_2D = _move_front(
                np.ascontiguousarray(weight_local), sel_freq_axis_pos,
                weight_local.shape,
            )

            delay_cut = self._delay_cut(ss, axis, bi)
            number_cut = int(4.0 * bandwidth * delay_cut + 0.5)
            f_samp = (weight_2D > 0.0).sum(axis=1)
            f_mask = (f_samp == f_samp.max()).astype(np.float64)
            t_samp = (weight_2D > 0.0).sum(axis=0)
            t_mask = (t_samp == t_samp.max()).astype(np.float64)

            NF = filters.null_filter(
                freq, delay_cut, f_mask, num_modes=max(number_cut, 1),
                window=self.window,
            )
            vis_local[:] = _inv_move_front(
                NF @ vis_2D, sel_freq_axis_pos, vis_local.shape
            )
            mask_local = _take_view(mask_full, bi, dist_axis_pos)
            mask_local[:] = _inv_move_front(
                (f_mask[:, np.newaxis] * t_mask[np.newaxis, :])
                * np.ones((len(f_mask), weight_2D.shape[1])),
                sel_freq_axis_pos,
                mask_local.shape,
            )

        ss.datasets[dset][:] = ssv.astype(ss.datasets[dset].dtype)
        # Reduce the combined mask onto the weight axes and apply it
        waxes = tuple(ss.weight.axes)
        reduce_ax = tuple(
            i for i, ax in enumerate(dset_axes) if ax not in waxes
        )
        mask_w = mask_full.min(axis=reduce_ax) if reduce_ax else mask_full
        ss.weight[:] = (np.asarray(ss.weight[:]) * mask_w).astype(
            ss.weight.dtype
        )
        return ss


# -----------------------------
# Delay transform base classes
# -----------------------------


class DelayTransformBase(ContainerTask):
    """Base class for frequency -> delay transforms (reference delay.py:347).

    See the reference docstring for the full attribute list; semantics are
    preserved (freq_zero/freq_spacing/nfreq channel-grid inference, window
    choice, complex_timedomain, weight_boost, freq/time pruning fractions,
    mean removal, frequency scaling).
    """

    freq_zero = config.float_prop(None)
    freq_spacing = config.float_prop(None)
    nfreq = config.int_prop(None)
    skip_nyquist = config.bool_prop(True)
    apply_window = config.bool_prop(True)
    window = config.enum(
        [
            "uniform",
            "hann",
            "hanning",
            "hamming",
            "blackman",
            "nuttall",
            "blackman_nuttall",
            "blackman_harris",
        ],
        default="nuttall",
    )
    complex_timedomain = config.bool_prop(False)
    use_average_weights = config.bool_prop(True)
    weight_boost = config.float_prop(1.0)
    freq_frac = config.float_prop(0.0)
    time_frac = config.float_prop(0.0)
    remove_mean = config.bool_prop(True)
    scale_freq = config.bool_prop(False)

    def process(self, ss):
        """Estimate the delay spectrum or power spectrum of the input."""
        delays, channel_ind = self._calculate_delays(ss)
        data_view, weight_view, coord_axes = self._prepare_inputs(ss)
        out_cont = self._create_output(ss, delays, coord_axes)
        out_cont.attrs["window_los"] = self.window if self.apply_window else "None"
        return self._evaluate(data_view, weight_view, out_cont, delays, channel_ind)

    def _calculate_delays(self, ss):
        """Delay grid + effective channel indices (reference delay.py:461)."""
        if isinstance(ss, containers.FreqContainer):
            freq = ss.freq
        elif len(ss) > 0:
            freq = ss[0].freq
        else:
            raise TypeError("The input carries no freq axis to transform.")

        freq_zero = freq[0] if self.freq_zero is None else self.freq_zero
        freq_spacing = self.freq_spacing
        if freq_spacing is None:
            freq_spacing = np.abs(np.diff(freq)).min()

        nfreq = self.nfreq
        if self.complex_timedomain:
            nfreq = len(freq)
            channel_ind = np.arange(nfreq)
            ndelay = nfreq
        else:
            channel_ind = (np.abs(freq - freq_zero) / freq_spacing).astype(np.int64)
            if nfreq is None:
                nfreq = channel_ind[-1] + 1
                if self.skip_nyquist:
                    nfreq += 1
            ndelay = 2 * (nfreq - 1)

        delays = np.fft.fftshift(np.fft.fftfreq(ndelay, d=freq_spacing))
        return delays, channel_ind

    def _cut_data(self, data, weight):
        """Prune all-zero channels/times + clean data (reference delay.py:516)."""
        ntime, nfreq = data.shape[-2:]
        weight_mask = weight > 0
        if not weight_mask.any():
            return None
        non_zero_time = (
            weight_mask.mean(axis=-1).reshape(-1, ntime).mean(axis=0) > self.time_frac
        )
        weight_mask = weight_mask[..., non_zero_time, :]
        non_zero_freq = (
            weight_mask.mean(axis=-2).reshape(-1, nfreq).mean(axis=0) > self.freq_frac
        )
        if not non_zero_freq.any():
            return None
        data = data[..., non_zero_time, :][..., non_zero_freq]
        weight = weight[..., non_zero_time, :][..., non_zero_freq]
        if self.remove_mean:
            data = data - data.mean(axis=-2, keepdims=True)
        if (data == 0.0).all():
            return None
        if self.scale_freq:
            dscl = (
                data.std(axis=-2)[..., np.newaxis, :]
                / data.std(axis=(-1, -2))[..., np.newaxis, np.newaxis]
            )
            data = data * np.asarray(tools.invert_no_zero(dscl))
        if self.use_average_weights:
            weight = np.mean(weight, axis=-2)
        weight = weight * self.weight_boost
        return data, weight, non_zero_freq, non_zero_time

    def _prepare_inputs(self, ss):
        raise NotImplementedError()

    def _evaluate(self, data_view, weight_view, out_cont, delays, channel_ind):
        raise NotImplementedError()

    def _create_output(self, ss, delays, coord_axes):
        raise NotImplementedError()


class GeneralInputContainerMixin:
    """Flatten all non-(sample, freq) axes into a baseline axis.

    (reference delay.py:675)
    """

    dataset = config.str_prop(None)
    sample_axis = config.str_prop("ra")

    def _prepare_inputs(self, ss):
        ss.redistribute("freq")
        if self.dataset is not None:
            if self.dataset not in ss.datasets:
                raise ValueError(
                    f"Specified dataset to delay transform ({self.dataset}) "
                    f"missing from container type {type(ss)}."
                )
            data_dset = ss[self.dataset]
        else:
            data_dset = ss.data
        if (
            self.sample_axis not in ss.axes_spec()
            or self.sample_axis not in data_dset.axes
        ):
            raise ValueError(
                f"{type(ss)} has no axis named {self.sample_axis!r} "
                f"to average over."
            )
        data_view, bl_axes = flatten_axes(data_dset, [self.sample_axis, "freq"])
        weight_view, _ = flatten_axes(
            ss.weight, [self.sample_axis, "freq"], match_dset=data_dset
        )
        return data_view, weight_view, bl_axes


class DelayPowerSpectrumContainerMixin(GeneralInputContainerMixin):
    """Create DelaySpectrum outputs (reference delay.py:744)."""

    nsamp = config.int_prop(1)
    save_samples = config.bool_prop(False)
    save_spectrum_mask = config.bool_prop(False)

    def _create_output(self, ss, delays, coord_axes):
        if isinstance(coord_axes, np.ndarray):
            bl = coord_axes
        elif len(coord_axes) == 1:
            bl = ss.index_map[coord_axes[0]]
        else:
            bl = np.arange(
                int(np.prod([len(ss.index_map[ax]) for ax in coord_axes]))
            )
        delay_spec = containers.DelaySpectrum(
            baseline=bl, delay=delays, sample=self.nsamp, attrs_from=ss
        )
        delay_spec.spectrum[:] = 0.0
        if isinstance(coord_axes, list):
            for ax in coord_axes:
                delay_spec.create_index_map(ax, ss.index_map[ax])
            delay_spec.attrs["baseline_axes"] = coord_axes
        if self.save_samples:
            delay_spec.add_dataset("spectrum_samples")
        if self.save_spectrum_mask:
            delay_spec.add_dataset("spectrum_mask")
        delay_spec.attrs["freq"] = ss.freq
        return delay_spec


class DelaySpectrumContainerMixin(GeneralInputContainerMixin):
    """Create DelayTransform outputs (reference delay.py:821)."""

    save_spectrum_mask = config.bool_prop(False)

    def _create_output(self, ss, delays, coord_axes):
        nbase = int(np.prod([len(ss.index_map[ax]) for ax in coord_axes]))
        delay_spec = containers.DelayTransform(
            baseline=np.arange(nbase),
            sample=ss.index_map[self.sample_axis],
            delay=delays,
            attrs_from=ss,
            weight_boost=self.weight_boost,
        )
        delay_spec.spectrum[:] = 0.0
        for ax in coord_axes:
            delay_spec.create_index_map(ax, ss.index_map[ax])
        delay_spec.attrs["baseline_axes"] = coord_axes
        if self.save_spectrum_mask:
            delay_spec.add_dataset("spectrum_mask")
        delay_spec.attrs["freq"] = ss.freq
        return delay_spec


# -------------------------------------
# Delay spectrum (transform) tasks
# -------------------------------------


class DelaySpectrumBase(DelaySpectrumContainerMixin, DelayTransformBase):
    """Base for per-baseline delay transforms (reference delay.py:874)."""

    def _evaluate(self, data_view, weight_view, out_cont, delays, channel_ind):
        nbase = out_cont.spectrum.shape[0]
        ndelay = len(delays)
        prior = self._get_prior(nbase)

        spectrum = np.asarray(out_cont.spectrum[:])
        mask_ds = (
            np.asarray(out_cont.datasets["spectrum_mask"][:])
            if self.save_spectrum_mask
            else None
        )
        for bi in range(nbase):
            data = data_view[bi]
            weight = weight_view[bi]
            t = self._cut_data(data, weight)
            if t is None:
                if mask_ds is not None:
                    mask_ds[bi] = True
                continue
            data, weight, nzf, nzt = t
            y_spec = self._estimator(data, weight, prior[bi], ndelay, channel_ind[nzf])
            spectrum[bi, nzt] = y_spec
            if mask_ds is not None:
                mask_ds[bi][~nzt] = True

        out_cont.spectrum[:] = spectrum
        if mask_ds is not None:
            out_cont.datasets["spectrum_mask"][:] = mask_ds
        return out_cont

    def _get_prior(self, nbase):
        raise NotImplementedError()

    def _estimator(self, data, weight, S, ndelay, channel_ind):
        raise NotImplementedError()


class DelaySpectrumFFT(DelaySpectrumBase):
    """Delay spectrum via inverse FFT (reference delay.py:960)."""

    def _get_prior(self, nbase):
        return [None] * nbase

    def _estimator(self, data, weight, S, ndelay, channel_ind):
        y_spec = delay_spectrum_fft(
            data, ndelay, self.window if self.apply_window else None
        )
        return np.fft.fftshift(y_spec, axes=-1)


class DelaySpectrumWienerFilter(DelaySpectrumBase):
    """Delay spectrum via Wiener filtering (reference delay.py:982).

    See arXiv:2202.01242 Eq. A6.
    """

    def setup(self, dps=None):
        self.dps = dps

    def _get_prior(self, nbase):
        return np.asarray(self.dps.spectrum[:])

    def _estimator(self, data, weight, S, ndelay, channel_ind):
        y_spec = delay_spectrum_wiener_filter(
            np.fft.fftshift(S),
            data,
            ndelay,
            weight,
            window=self.window if self.apply_window else None,
            fsel=channel_ind,
            complex_timedomain=self.complex_timedomain,
        )
        return np.fft.fftshift(y_spec, axes=-1)


class DelaySpectrumWienerFilterIteratePS(DelaySpectrumWienerFilter):
    """Wiener filter with a per-cycle power spectrum (reference delay.py:1027)."""

    def process(self, ss, dps):
        self.dps = dps
        return super().process(ss)


class DelaySpectrumToPowerSpectrum(ContainerTask):
    """Delay power spectrum = variance of a delay spectrum over samples.

    (reference delay.py:1061)
    """

    def process(self, dspec: containers.DelayTransform) -> containers.DelaySpectrum:
        pspec = containers.DelaySpectrum(attrs_from=dspec, axes_from=dspec)
        ds = np.asarray(dspec.spectrum[:])
        if "spectrum_mask" in dspec.datasets:
            w = ~np.asarray(dspec.datasets["spectrum_mask"][:])[..., np.newaxis]
            pspec.add_dataset("spectrum_mask")
        else:
            w = None
        ps = np.var(ds, axis=1, where=w) if w is not None else np.var(ds, axis=1)
        if w is not None:
            nans = np.isnan(ps)
            ps[nans] = 0.0
            pspec.datasets["spectrum_mask"][:] = np.any(nans, axis=-1)
        pspec.spectrum[:] = ps.real
        return pspec


# ---------------------------------------------------
# Direct delay power spectrum tasks
# ---------------------------------------------------


class DelayPowerSpectrumBase(DelayPowerSpectrumContainerMixin, DelayTransformBase):
    """Base for direct power spectrum estimation (reference delay.py:1114)."""

    def _evaluate(self, data_view, weight_view, out_cont, delays, channel_ind,
                  indices=None):
        nbase = out_cont.spectrum.shape[0]
        ndelay = len(delays)
        prior = self._get_prior(nbase, ndelay, delays.dtype)

        spectrum = np.asarray(out_cont.spectrum[:])
        mask_ds = (
            np.asarray(out_cont.datasets["spectrum_mask"][:])
            if self.save_spectrum_mask
            else None
        )
        samples_ds = (
            np.asarray(out_cont.datasets["spectrum_samples"][:])
            if self.save_samples
            else None
        )

        for bi in range(nbase) if indices is None else indices:
            data = data_view[bi]
            weight = weight_view[bi]
            t = self._cut_data(data, weight)
            if t is None:
                if mask_ds is not None:
                    mask_ds[bi] = True
                continue
            data, weight, nzf, _ = t
            spec, samples, success = self._estimator(
                data, weight, prior[bi], ndelay, channel_ind[nzf]
            )
            spectrum[bi] = spec
            if mask_ds is not None and not success:
                mask_ds[bi] = True
            if samples_ds is not None and samples:
                nsamp = len(samples)
                samples_ds[:, bi] = 0.0
                samples_ds[-nsamp:, bi] = np.array(
                    [np.fft.fftshift(s) for s in samples]
                )

        out_cont.spectrum[:] = spectrum
        if mask_ds is not None:
            out_cont.datasets["spectrum_mask"][:] = mask_ds
            n_conv = nbase - mask_ds.sum()
            self.log.debug(f"Gibbs converged on {n_conv} of {nbase} valid baselines.")
        if samples_ds is not None:
            out_cont.datasets["spectrum_samples"][:] = samples_ds
        return out_cont

    def _get_prior(self, nbase, ndelay, dtype):
        raise NotImplementedError()

    def _estimator(self, data, weight, S, ndelay, channel_ind):
        raise NotImplementedError()


class DelayPowerSpectrumGibbs(DelayPowerSpectrumBase, RandomTask):
    """Gibbs-sampled delay power spectrum (reference delay.py:1218).

    Attributes
    ----------
    initial_amplitude : float
        Flat initial power spectrum amplitude.
    median_frac : float
        Return the median over this final fraction of samples.
    """

    initial_amplitude = config.float_prop(10.0)
    median_frac = config.float_prop(0.5)

    def _get_prior(self, nbase, ndelay, dtype):
        return np.ones((nbase, ndelay), dtype=dtype) * self.initial_amplitude

    def _estimator(self, data, weight, S, ndelay, channel_ind):
        samples, success = delay_power_spectrum_gibbs(
            data,
            ndelay,
            weight,
            S,
            window=self.window if self.apply_window else None,
            fsel=channel_ind,
            niter=self.nsamp,
            rng=self.rng,
            complex_timedomain=self.complex_timedomain,
        )
        nsamp_spec = int(self.nsamp * self.median_frac)
        if samples:
            spec = np.fft.fftshift(np.median(samples[-nsamp_spec:], axis=0))
        else:
            success = False
            spec = S
        return spec, samples, success


def _batch_cut_masks(wmask, time_frac, freq_frac):
    """Batch analogue of ``_cut_data``'s pruning, shared by the batched
    Gibbs estimators: common dead-time pruning, then the per-baseline
    retained-channel criterion against the batch union.

    wmask : bool [nbase, ..., ntime, nfreq] (any number of middle axes).
    Returns (non_zero_time, freq_ok, uniform) or None when nothing
    survives (callers fall back to the per-baseline sampler).
    """
    ntime = wmask.shape[-2]
    non_zero_time = (
        wmask.mean(axis=-1).reshape(-1, ntime).mean(axis=0) > time_frac
    )
    if not non_zero_time.any():
        return None
    wmask_t = wmask[..., non_zero_time, :]
    axes = tuple(range(1, wmask_t.ndim - 1))
    fmask = wmask_t.mean(axis=axes) > freq_frac  # [nbase, nfreq]
    freq_ok = fmask.any(axis=0)
    uniform = (fmask == freq_ok).all(axis=-1) & wmask_t.reshape(
        wmask_t.shape[0], -1
    ).any(axis=-1)
    if not freq_ok.any() or not uniform.any():
        return None
    return non_zero_time, freq_ok, uniform


class DelayPowerSpectrumGibbsBatched(DelayPowerSpectrumGibbs):
    """Batched-Gibbs power spectrum: all chains advance on device together.

    The TPU-native fast path: requires the retained frequency mask to be
    identical across baselines (which `_cut_data` per baseline would
    otherwise vary); baselines failing that fall back to the per-baseline
    sampler of the parent class.
    """

    def _evaluate(self, data_view, weight_view, out_cont, delays, channel_ind):
        if self.scale_freq or not self.use_average_weights:
            # per-baseline semantics that do not batch
            self.log.info(
                "scale_freq / use_average_weights=False configured: "
                "taking the per-baseline sampler."
            )
            return super()._evaluate(
                data_view, weight_view, out_cont, delays, channel_ind
            )

        ndelay = len(delays)

        # Mirror _cut_data across the batch: common dead-time pruning,
        # then the per-baseline retained-channel criterion — the batch
        # takes the rows whose channel mask equals the union
        masks = _batch_cut_masks(
            weight_view > 0, self.time_frac, self.freq_frac
        )
        if masks is None:
            return super()._evaluate(
                data_view, weight_view, out_cont, delays, channel_ind
            )
        non_zero_time, freq_ok, uniform = masks

        # Baselines with their own frequency mask go through the
        # per-baseline sampler (previously they were silently left at
        # zero whenever at least one baseline was batchable)
        rest = np.flatnonzero(~uniform)
        if len(rest):
            self.log.info(
                f"{len(rest)} baselines have non-uniform frequency masks; "
                "sampling them per baseline."
            )
            super()._evaluate(
                data_view,
                weight_view,
                out_cont,
                delays,
                channel_ind,
                indices=rest,
            )

        sel = np.flatnonzero(uniform)
        data = data_view[sel][..., non_zero_time, :][..., freq_ok]
        weight = weight_view[sel][..., non_zero_time, :][..., freq_ok]
        if self.remove_mean:
            data = data - data.mean(axis=-2, keepdims=True)
        w = weight.mean(axis=-2) * self.weight_boost

        prior = self._get_prior(len(sel), ndelay, delays.dtype)
        samples = delay_power_spectrum_gibbs_batched(
            data,
            ndelay,
            w,
            prior,
            window=self.window if self.apply_window else None,
            fsel=channel_ind[freq_ok],
            niter=self.nsamp,
            key=self.next_key(),
            complex_timedomain=self.complex_timedomain,
        )  # [niter, nbase_sel, ndelay]
        nsamp_spec = int(self.nsamp * self.median_frac)
        spec = np.fft.fftshift(
            np.median(samples[-nsamp_spec:], axis=0), axes=-1
        )

        # jnp.linalg.cholesky does NOT raise on a non-PD system (unlike
        # the scipy path) — it returns NaN.  Detect poisoned chains and
        # mask them instead of writing garbage spectra.
        bad = ~np.isfinite(spec).all(axis=-1)
        bad |= (data.reshape(len(sel), -1) == 0).all(axis=-1)
        if bad.any():
            self.log.warning(
                f"{int(bad.sum())} batched Gibbs chains produced "
                "non-finite spectra; masking them."
            )
            spec = np.where(bad[:, None], 0.0, spec)

        spectrum = np.asarray(out_cont.spectrum[:])
        spectrum[sel] = spec
        out_cont.spectrum[:] = spectrum

        if self.save_samples:
            sd = np.asarray(out_cont.datasets["spectrum_samples"][:])
            sd[-len(samples):, sel] = np.fft.fftshift(samples, axes=-1)
            out_cont.datasets["spectrum_samples"][:] = sd
        if self.save_spectrum_mask:
            md = np.asarray(out_cont.datasets["spectrum_mask"][:])
            md[sel] = bad
            out_cont.datasets["spectrum_mask"][:] = md
        return out_cont


class DelayPowerSpectrumNRML(DelayPowerSpectrumBase):
    """Maximum-likelihood (NRML) power spectrum (reference delay.py:1270)."""

    maxpost_tol = config.float_prop(1e-3)
    nsamp = config.int_prop(100)

    def _get_prior(self, nbase, ndelay, dtype):
        return [None] * nbase

    def _estimator(self, data, weight, S, ndelay, channel_ind):
        samples, success = delay_power_spectrum_maxpost(
            data,
            ndelay,
            weight,
            S,
            window=self.window if self.apply_window else None,
            fsel=channel_ind,
            maxiter=self.nsamp,
            tol=self.maxpost_tol,
        )
        spec = np.fft.fftshift(samples[-1])
        return spec, samples, success


class DelayCrossPowerSpectrumEstimator(DelayPowerSpectrumGibbs):
    """Pairwise delay cross-power spectra (reference delay.py:1304)."""

    def _prepare_inputs(self, sslist):
        if not isinstance(sslist, (list, tuple)):
            sslist = [sslist]
        if len(sslist) == 0:
            raise ValueError("No datasets passed.")
        freq_ref = sslist[0].freq
        data_views, weight_views = [], []
        coord_axes = None
        for ss in sslist:
            # ANY mismatched channel invalidates the cross-correlation
            # (a .all() here would pass partially-overlapping axes)
            if len(ss.freq) != len(freq_ref) or (ss.freq != freq_ref).any():
                raise ValueError("Cross-spectrum inputs disagree on the frequency axis.")
            dv, wv, ca = GeneralInputContainerMixin._prepare_inputs(self, ss)
            if coord_axes is not None and coord_axes != ca:
                raise ValueError("Cross-spectrum inputs disagree on their axis layout.")
            data_views.append(dv)
            weight_views.append(wv)
            coord_axes = ca
        return data_views, weight_views, coord_axes

    def _calculate_delays(self, ss):
        if isinstance(ss, (list, tuple)):
            ss = ss[0]
        return super()._calculate_delays(ss)

    def _create_output(self, ss, delays, coord_axes):
        ssref = ss[0] if isinstance(ss, (list, tuple)) else ss
        ndata = len(ss) if isinstance(ss, (list, tuple)) else 1
        if len(coord_axes) == 1:
            bl = ssref.index_map[coord_axes[0]]
        else:
            bl = np.arange(
                int(np.prod([len(ssref.index_map[ax]) for ax in coord_axes]))
            )
        delay_spec = containers.DelayCrossSpectrum(
            baseline=bl,
            dataset=np.arange(ndata),
            delay=delays,
            sample=self.nsamp,
            attrs_from=ssref,
        )
        delay_spec.spectrum[:] = 0.0
        for ax in coord_axes:
            delay_spec.create_index_map(ax, ssref.index_map[ax])
        delay_spec.attrs["baseline_axes"] = coord_axes
        if self.save_samples:
            delay_spec.add_dataset("spectrum_samples")
        delay_spec.attrs["freq"] = ssref.freq
        return delay_spec

    def _evaluate(
        self, data_view, weight_view, out_cont, delays, channel_ind,
        indices=None,
    ):
        ndata = len(data_view)
        ndelay = len(delays)
        nbase = out_cont.spectrum.shape[-2]
        initial_S = self._get_prior(nbase, ndelay, delays.dtype)
        initial_S = (
            np.identity(ndata)[np.newaxis, ..., np.newaxis]
            * initial_S[:, np.newaxis, np.newaxis]
        )
        rng = self.rng

        spectrum = np.asarray(out_cont.spectrum[:])
        samples_ds = (
            np.asarray(out_cont.datasets["spectrum_samples"][:])
            if self.save_samples
            else None
        )

        for bi in range(nbase) if indices is None else indices:
            data = np.array([d[bi] for d in data_view])
            weight = np.array([w[bi] for w in weight_view])
            t = self._cut_data(data, weight)
            if t is None:
                continue
            data, weight, nzf, _ = t
            spec = delay_spectrum_gibbs_cross(
                data,
                ndelay,
                weight,
                initial_S[bi],
                window=self.window if self.apply_window else None,
                fsel=channel_ind[nzf],
                niter=self.nsamp,
                rng=rng,
            )
            spec_av = np.median(spec[-(self.nsamp // 2):], axis=0)
            spectrum[..., bi, :] = np.fft.fftshift(spec_av.real, axes=-1)
            if samples_ds is not None:
                samples_ds[..., bi, :] = np.fft.fftshift(
                    np.array(spec).real, axes=-1
                )

        out_cont.spectrum[:] = spectrum
        if samples_ds is not None:
            out_cont.datasets["spectrum_samples"][:] = samples_ds
        return out_cont

    def process(self, *sslist):
        """Estimate the cross power spectra of several containers."""
        sslist = list(sslist)
        delays, channel_ind = self._calculate_delays(sslist)
        data_view, weight_view, coord_axes = self._prepare_inputs(sslist)
        out_cont = self._create_output(sslist, delays, coord_axes)
        out_cont.attrs["window_los"] = self.window if self.apply_window else "None"
        return self._evaluate(data_view, weight_view, out_cont, delays, channel_ind)


class DelayCrossPowerSpectrumEstimatorBatched(DelayCrossPowerSpectrumEstimator):
    """Batched cross-PS Gibbs: all baselines' chains advance on device.

    The TPU-native fast path for the cross estimator, mirroring
    :class:`DelayPowerSpectrumGibbsBatched`: baselines whose retained
    frequency mask equals the batch union run as one batched device
    chain (chunked complex Cholesky over the coupled ``nd*N`` system);
    the rest fall back to the per-baseline host sampler.

    Attributes
    ----------
    bchunk : int
        Baselines per device batch (bounds the Cholesky workspace).
    """

    bchunk = config.int_prop(32)

    def _evaluate(self, data_view, weight_view, out_cont, delays, channel_ind):
        if self.scale_freq or not self.use_average_weights:
            self.log.info(
                "scale_freq / use_average_weights=False configured: "
                "taking the per-baseline sampler."
            )
            return super()._evaluate(
                data_view, weight_view, out_cont, delays, channel_ind
            )

        ndelay = len(delays)
        dv = np.stack(data_view, axis=1)  # [nbase, nd, nsample, nfreq]
        wv = np.stack(weight_view, axis=1)
        nd = dv.shape[1]

        # Mirror _cut_data across the batch (common dead-time pruning,
        # union frequency mask), shared with the auto batched estimator
        masks = _batch_cut_masks(wv > 0, self.time_frac, self.freq_frac)
        if masks is None:
            return super()._evaluate(
                data_view, weight_view, out_cont, delays, channel_ind
            )
        non_zero_time, freq_ok, uniform = masks

        rest = np.flatnonzero(~uniform)
        if len(rest):
            self.log.info(
                f"{len(rest)} baselines have non-uniform frequency masks; "
                "sampling them per baseline."
            )
            super()._evaluate(
                data_view,
                weight_view,
                out_cont,
                delays,
                channel_ind,
                indices=rest,
            )

        sel = np.flatnonzero(uniform)
        data = dv[sel][..., non_zero_time, :][..., freq_ok]
        weight = wv[sel][..., non_zero_time, :][..., freq_ok]
        if self.remove_mean:
            data = data - data.mean(axis=-2, keepdims=True)
        w = weight.mean(axis=-2) * self.weight_boost  # [bsel, nd, nfreq']

        prior = self._get_prior(len(sel), ndelay, delays.dtype)
        initial_S = (
            np.identity(nd)[np.newaxis, ..., np.newaxis]
            * prior[:, np.newaxis, np.newaxis]
        )
        samples = delay_spectrum_gibbs_cross_batched(
            data,
            ndelay,
            w,
            initial_S,
            window=self.window if self.apply_window else None,
            fsel=channel_ind[freq_ok],
            niter=self.nsamp,
            key=self.next_key(),
            bchunk=self.bchunk,
        )  # [niter, bsel, nd, nd, ndelay]

        nsamp_spec = int(self.nsamp * self.median_frac)
        spec = np.fft.fftshift(
            np.median(samples[-nsamp_spec:], axis=0).real, axes=-1
        )  # [bsel, nd, nd, ndelay]

        # The coupled system's condition number is ~1 + S_prior x nfreq
        # x Ni; past ~1e7 it exceeds what an f32 Cholesky can factor
        # (breakdown, surfacing as NaNs — device linalg does not raise).
        # Send those chains through the f64 host sampler instead.
        bad = ~np.isfinite(spec).all(axis=(-3, -2, -1))
        if bad.any():
            self.log.info(
                f"{int(bad.sum())} chains exceed f32 conditioning; "
                "sampling them per baseline in f64."
            )
            spec = np.where(bad[:, None, None, None], 0.0, spec)

        spectrum = np.asarray(out_cont.spectrum[:])
        spectrum[..., sel, :] = np.moveaxis(spec, 0, -2)
        out_cont.spectrum[:] = spectrum

        if self.save_samples:
            good = sel[~bad]
            sd = np.asarray(out_cont.datasets["spectrum_samples"][:])
            sd[-len(samples):][..., good, :] = np.fft.fftshift(
                np.moveaxis(samples.real, 1, -2), axes=-1
            )[..., ~bad, :]
            out_cont.datasets["spectrum_samples"][:] = sd

        if bad.any():
            # the fallback overwrites the zeroed spectra (and samples)
            # of the chains the f32 factorisation could not handle
            super()._evaluate(
                data_view,
                weight_view,
                out_cont,
                delays,
                channel_ind,
                indices=sel[bad],
            )
        return out_cont


class DelayPowerSpectrumStokesIEstimator(DelayPowerSpectrumGibbs):
    """Deprecated (reference delay.py:1451)."""

    def setup(self, requires=None):
        """Raise a deprecation warning."""
        raise DeprecationWarning(
            "DelayPowerSpectrumStokesIEstimator is retained only for "
            "compatibility: form Stokes I explicitly "
            "Use `transform.StokesIVis` to generate Stokes I visibilities, "
            "and run DelayPowerSpectrumGibbs or DelayPowerSpectrumNRML."
        )


class DelayPowerSpectrumGeneralEstimator(DelayPowerSpectrumGibbs):
    """Deprecated (reference delay.py:1464)."""

    def setup(self, requires=None):
        """Raise a deprecation warning."""
        raise DeprecationWarning(
            "DelayPowerSpectrumGeneralEstimator is retained only for "
            "compatibility; prefer DelayPowerSpectrumGibbs or "
            "DelayPowerSpectrumNRML."
        )
