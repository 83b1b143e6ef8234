"""Miscellaneous transformations: the m-mode transform hub + reshaping.

Re-provides reference ``draco/analysis/transform.py`` (2253 LoC;
FrequencyRebin:20, CollateProducts:142, SelectFreq:333, MModeTransform:535,
MModeInverseTransform:708, SiderealMModeResample:795, ShiftRA:993,
SelectPol:1068, StokesIVis:1333, MixData:1606, Downselect:1848, ...).

The m-mode transform (the hot FFT stage, reference transform.py:644-705)
runs as one batched device FFT via :mod:`draco_tpu.ops.mmode`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import config, containers, io
from ..core.task import ContainerTask, group_tasks
from ..ops import mmode
from ..ops.tools import invert_no_zero


class FrequencyRebin(ContainerTask):
    """Rebin neighbouring frequency channels (reference transform.py:20).

    Attributes
    ----------
    channel_bin : int
        Number of channels to merge.
    """

    channel_bin = config.Property(proptype=int, default=1)

    def process(self, ss):
        if "freq" not in ss.index_map:
            raise RuntimeError("Data does not have a frequency axis.")
        cb = self.channel_bin
        if len(ss.freq) % cb != 0:
            raise RuntimeError("Binning must exactly divide the number of channels.")

        freq_map = ss.index_map["freq"]
        centre = freq_map["centre"].reshape(-1, cb).mean(axis=-1)
        width = freq_map["width"].reshape(-1, cb).sum(axis=-1)
        new_freq = np.zeros(len(centre), dtype=freq_map.dtype)
        new_freq["centre"] = centre
        new_freq["width"] = width

        sb = ss.__class__(freq=new_freq, axes_from=ss, attrs_from=ss)

        for name, ds in ss.datasets.items():
            if name not in sb.dataset_spec():
                continue
            if "freq" not in ds.axes:
                if name not in sb.datasets:
                    sb.add_dataset(name)
                sb.datasets[name][:] = ds[:]
                continue
            fax = list(ds.axes).index("freq")
            arr = jnp.asarray(np.asarray(ds[:]))
            arr = jnp.moveaxis(arr, fax, 0)
            shape = (len(centre), cb) + arr.shape[1:]
            if name.endswith("weight") or name == "weight":
                # inverse-variance weights combine as a sum
                new = arr.reshape(shape).sum(axis=1)
            else:
                # weighted average using the weight dataset when present
                w = ss.weight[:] if "vis" in ss.datasets else None
                if name == "vis" and w is not None:
                    w = jnp.moveaxis(jnp.asarray(np.asarray(w)), fax, 0)
                    num = (arr * w).reshape(shape).sum(axis=1)
                    den = w.reshape(shape).sum(axis=1)
                    new = num * invert_no_zero(den)
                else:
                    new = arr.reshape(shape).mean(axis=1)
            if name not in sb.datasets:
                sb.add_dataset(name)
            sb.datasets[name][:] = np.asarray(jnp.moveaxis(new, 0, fax)).astype(
                ds.dtype
            )
        return sb


class SelectFreq(ContainerTask):
    """Select a subset of frequencies (reference transform.py:333).

    Attributes
    ----------
    freq_physical : list
        Physical frequencies (MHz) to select.
    channel_range : list
        [start, stop, (step)] channel range.
    channel_index : list
        Explicit channel indices.
    freq_physical_range : list
        [low, high] physical frequency bounds.
    """

    freq_physical = config.Property(proptype=list, default=[])
    channel_range = config.Property(proptype=list, default=[])
    channel_index = config.Property(proptype=list, default=[])
    freq_physical_range = config.Property(proptype=list, default=[])

    def process(self, data):
        freq_map = data.index_map["freq"]
        freq = freq_map["centre"] if freq_map.dtype.names else freq_map

        if self.freq_physical:
            newindex = sorted(
                {np.argmin(np.abs(freq - fp)) for fp in self.freq_physical}
            )
        elif self.channel_range and (len(self.channel_range) <= 3):
            newindex = slice(*self.channel_range)
        elif self.channel_index:
            newindex = self.channel_index
        elif self.freq_physical_range:
            low, high = sorted(self.freq_physical_range)
            newindex = np.where((freq >= low) & (freq < high))[0]
        else:
            raise ValueError(
                "Must specify one of freq_physical, channel_range, "
                "channel_index or freq_physical_range."
            )

        fsel = np.arange(len(freq))[newindex]
        newdata = data.__class__(
            freq=freq_map[fsel], axes_from=data, attrs_from=data
        )
        containers.copy_datasets_filter(data, newdata, selection={"freq": fsel})
        # copy freq-independent datasets too
        for name, ds in data.datasets.items():
            if "freq" not in ds.axes and name in newdata.dataset_spec():
                if name not in newdata.datasets:
                    newdata.add_dataset(name)
                newdata.datasets[name][:] = ds[:]
        return newdata


class MModeTransform(ContainerTask):
    """Transform a sidereal stream to m-modes (reference transform.py:535).

    The FFT over RA and the +/-m packing run as one batched device kernel
    (ops.mmode.make_marray).

    Attributes
    ----------
    remove_integration_window : bool
        Deconvolve the finite-width rectangular RA integration window.
    """

    remove_integration_window = config.Property(proptype=bool, default=False)

    def setup(self, manager=None):
        """Optionally set the telescope to define mmax."""
        self.telescope = io.get_telescope(manager) if manager is not None else None

    def process(self, sstream) -> containers.MContainer:
        contmap = {
            containers.SiderealStream: containers.MModes,
            containers.HybridVisStream: containers.HybridVisMModes,
        }
        out_cont = None
        for cls in type(sstream).__mro__:
            if cls in contmap:
                out_cont = contmap[cls]
                break
        if out_cont is None:
            raise TypeError(f"No m-mode container for {type(sstream)}")

        sstream.redistribute("freq")
        svis = jnp.asarray(np.asarray(sstream.vis[:]))
        sweight = jnp.asarray(np.asarray(sstream.weight[:]))

        # Noise variance of the m-modes: sum of per-sample variances
        # (reference transform.py:599-602)
        nra = sweight.shape[-1]
        weight_sum = nra**2 * invert_no_zero(
            invert_no_zero(sweight).sum(axis=-1)
        )

        if self.telescope is not None:
            mmax = self.telescope.mmax
        else:
            mmax = svis.shape[-1] // 2

        ma = out_cont(
            mmax=mmax,
            oddra=bool(nra % 2),
            axes_from=sstream,
            attrs_from=sstream,
        )
        mvis = mmode.make_marray(svis, mmax=mmax)
        # weight shape: vis weight axes minus ra, broadcast over (m, msign)
        mw = jnp.broadcast_to(
            weight_sum[None, None], (mmax + 1, 2) + weight_sum.shape
        )

        if self.remove_integration_window:
            m = jnp.arange(mmax + 1)
            w = jnp.sinc(m / nra)
            inv_w = invert_no_zero(w)
            sl = (slice(None),) + (None,) * (mvis.ndim - 1)
            mvis = mvis * inv_w[sl]
            mw = mw * (w[sl] ** 2)

        ma.vis[:] = np.asarray(mvis).astype(ma.vis.dtype)
        ma.weight[:] = np.asarray(mw).astype(ma.weight.dtype)
        return ma


class MModeInverseTransform(ContainerTask):
    """Transform m-modes back to a sidereal stream (reference transform.py:708).

    Attributes
    ----------
    nra : int
        Number of output RA bins (default: Nyquist for the stored mmax).
    apply_integration_window : bool
        Re-apply the rectangular integration window.
    """

    nra = config.Property(proptype=int, default=None)
    apply_integration_window = config.Property(proptype=bool, default=False)

    def process(self, mmodes: containers.MContainer):
        mmodes.redistribute("freq")
        nra_cont = 2 * mmodes.mmax + (1 if mmodes.oddra else 0)
        nra = self.nra if self.nra is not None else nra_cont

        mvis = jnp.asarray(np.asarray(mmodes.vis[:]))
        mweight = jnp.asarray(np.asarray(mmodes.weight[:]))

        if self.apply_integration_window:
            m = jnp.arange(mmodes.mmax + 1)
            w = jnp.sinc(m / nra)
            inv_w = invert_no_zero(w)
            sl = (slice(None),) + (None,) * (mvis.ndim - 1)
            mvis = mvis * w[sl]
            mweight = mweight * (inv_w[sl] ** 2)

        ssarray = mmode.mmodes_to_sidereal(mvis, n=nra, oddra=mmodes.oddra)
        nra = ssarray.shape[-1]

        sstream = containers.SiderealStream(
            ra=nra, axes_from=mmodes, attrs_from=mmodes, distributed=True
        )
        sstream.vis[:] = np.asarray(ssarray).astype(sstream.vis.dtype)
        # No time information recoverable: spread the m=0 weight over RA
        # (reference transform.py:788-790)
        w0 = np.asarray(mweight[0, 0]) / nra
        sstream.weight[:] = w0[..., np.newaxis] * np.ones(
            (1,) * w0.ndim + (nra,), dtype=sstream.weight.dtype
        )
        return sstream


class SiderealMModeResample(group_tasks(MModeTransform, MModeInverseTransform)):
    """Resample a sidereal stream by forward+inverse m-mode transform.

    (reference transform.py:795)
    """


class ShiftRA(ContainerTask):
    """Add an offset to the RA axis (reference transform.py:993).

    Attributes
    ----------
    delta : float
        Shift in degrees.
    periodic : bool
        Wrap and roll so the axis stays in [0, 360).
    """

    delta = config.Property(proptype=float, default=0.0)
    periodic = config.Property(proptype=bool, default=False)

    def process(self, sscont: containers.SiderealContainer):
        if not isinstance(sscont, containers.SiderealContainer):
            raise TypeError(
                f"Expected SiderealContainer, got {type(sscont)}"
            )
        ra = sscont.index_map["ra"] + self.delta
        if self.periodic:
            shift = int(np.argmin(ra % 360.0))
            ra = np.roll(ra % 360.0, -shift)
            for ds in sscont.datasets.values():
                if "ra" in ds.axes:
                    ax = list(ds.axes).index("ra")
                    ds[:] = np.roll(np.asarray(ds[:]), -shift, axis=ax)
        sscont.create_index_map("ra", ra)
        return sscont


class LanczosRegridder(ContainerTask):
    """Interpolate the time-like axis onto a regular grid.

    Maximum-likelihood inverse of a Lanczos interpolation via the banded
    Wiener filter (reference transform.py:854-986); the banded solve runs
    batched on device (ops.banded).

    Attributes
    ----------
    samples : int
        Number of output samples.
    start, end : float
        Range of the output grid (defaults to the data bounds).
    kernel_width : int
        Lanczos kernel width.
    epsilon : float
        Regulariser (inverse signal variance).
    mask_zero_weight : bool
        Zero output weights where the input weights were all zero.
    """

    samples = config.Property(proptype=int, default=1024)
    start = config.Property(proptype=float, default=None)
    end = config.Property(proptype=float, default=None)
    kernel_width = config.Property(proptype=int, default=5)
    epsilon = config.Property(proptype=float, default=1e-3)
    mask_zero_weight = config.Property(proptype=bool, default=False)

    def setup(self, observer):
        self.observer = io.get_telescope(observer)

    def process(self, data):
        data.redistribute("freq")
        weight = np.asarray(data.weight[:])
        vis_data = np.asarray(data.vis[:])

        timelike_axis = data.vis.attrs["axis"][-1]
        times = data.index_map[timelike_axis][:]
        if times.dtype.names and "ctime" in times.dtype.names:
            times = times["ctime"]

        if self.start is None:
            self.start = float(times[0])
        if self.end is None:
            self.end = float(times[-1])
        if self.start < times[0] or self.end > times[-1]:
            msg = (
                "Start or end points for regridder fall outside bounds of "
                "input data."
            )
            self.log.error(msg)
            raise RuntimeError(msg)

        new_grid, new_vis, ni = self._regrid(vis_data, weight, times)

        cont_type = data.__class__
        new_data = cont_type(axes_from=data, attrs_from=data, **{timelike_axis: new_grid})
        new_data.vis[:] = new_vis.astype(new_data.vis.dtype)
        new_data.weight[:] = ni.astype(new_data.weight.dtype)
        return new_data

    def _regrid(self, vis_data, weight, times):
        from ..ops import regrid as regrid_ops

        pad = 5 * self.kernel_width
        interp_grid = (
            np.arange(-pad, self.samples + pad, dtype=np.float64) / self.samples
        )
        interp_grid = interp_grid * (self.end - self.start) + self.start

        lzf = regrid_ops.lanczos_forward_matrix(
            interp_grid, times, self.kernel_width
        ).T.copy()

        vr = vis_data.reshape(-1, vis_data.shape[-1])
        nr = weight.reshape(-1, vis_data.shape[-1])
        Si = np.ones_like(interp_grid) * self.epsilon

        sts, ni = regrid_ops.band_wiener(
            lzf, nr, Si, vr, 2 * self.kernel_width - 1
        )
        sts = np.asarray(sts)[:, pad:-pad]
        ni = np.asarray(ni)[:, pad:-pad]
        interp_grid = interp_grid[pad:-pad].copy()

        sts = sts.reshape((*vis_data.shape[:-1], self.samples))
        ni = ni.reshape((*vis_data.shape[:-1], self.samples))

        if self.mask_zero_weight:
            w_mask = weight.sum(axis=-1) != 0.0
            ni = ni * w_mask[..., np.newaxis]
        return interp_grid, sts, ni


# Alias for compatibility
Regridder = LanczosRegridder


class ReduceBase(ContainerTask):
    """Weighted reduction across named axes (reference transform.py:1904).

    Non-functional without overriding :meth:`reduction`.  At least one axis
    must be excluded from the reduction.

    Attributes
    ----------
    axes : list
        Axis names to reduce over.
    dataset : str
        Dataset name to reduce.
    weighting : "none" | "masked" | "weighted"
    """

    axes = config.Property(proptype=list)
    dataset = config.Property(proptype=str)
    weighting = config.enum(["none", "masked", "weighted"], default="none")

    _op = None

    def process(self, data):
        """Apply the reduction; reduced axes collapse to length 1."""
        out = self._make_output_container(data)
        out.add_dataset(self.dataset)

        ds = data.datasets[self.dataset]
        ds_axes = list(ds.attrs["axis"])

        weight, w_axes = self._get_weights(data)
        if weight is not None:
            wslc = tuple(slice(None) if ax in w_axes else None for ax in ds_axes)
            weight = np.asarray(weight)[wslc]
        else:
            weight = np.ones(ds.shape, dtype=np.float32)
            wslc = None
        weight = np.broadcast_to(weight, ds.shape)

        apply_over = tuple(ds_axes.index(ax) for ax in self.axes if ax in ds_axes)

        reduced, reduced_weight = self.reduction(
            np.asarray(ds[:]), weight, apply_over
        )

        out[self.dataset][:] = np.asarray(reduced).astype(
            out[self.dataset].dtype
        )

        if hasattr(out, "weight"):
            rw = np.asarray(reduced_weight)
            if wslc is not None:
                owslc = tuple(0 if ws is None else ws for ws in wslc)
                rw = rw[owslc]
            out.weight[:] = rw.astype(out.weight.dtype)

        return out

    def _get_weights(self, data):
        """Weights for the reduction (reference transform.py:2016)."""
        if not hasattr(data, "weight") and self.weighting != "none":
            raise RuntimeError(
                "No weights available. Cannot use weighted or masked weighting."
            )
        if hasattr(data, "weight"):
            return data.weight[:], list(data.weight.attrs["axis"])
        return None, None

    def _make_output_container(self, data):
        """Same container type with the reduced axes collapsed to one entry."""
        output_axes = {
            ax: np.array([data.index_map[ax][0]]) for ax in self.axes
        }
        out = data.__class__(
            axes_from=data, attrs_from=data, skip_datasets=True, **output_axes
        )
        out.attrs["reduced"] = True
        out.attrs["reduction_axes"] = np.array(self.axes)
        out.attrs["reduced_dataset"] = self.dataset
        out.attrs["reduction_op"] = self._op

        if "weight" in data.datasets:
            out.add_dataset("weight")
        elif "vis_weight" in data.datasets:
            out.add_dataset("vis_weight")

        return out

    def reduction(self, arr, weight, axis):
        """Override to implement the reduction operation."""
        raise NotImplementedError

    def _weighted_mean(self, arr, weight, axis):
        """Weighted mean + summed weight, on device."""
        arr = jnp.asarray(arr)
        weight = jnp.asarray(weight)
        ws = jnp.sum(weight, axis=axis, keepdims=True)
        mu = jnp.sum(weight * arr, axis=axis, keepdims=True) * invert_no_zero(ws)
        return arr, weight, ws, mu


class ReduceVar(ReduceBase):
    """Weighted variance over the given axes (reference transform.py:2065)."""

    _op = "variance"

    def reduction(self, arr, weight, axis):
        if self.weighting == "none":
            v = jnp.var(jnp.asarray(arr), axis=axis, keepdims=True)
            return v, jnp.ones_like(v)

        if self.weighting == "masked":
            weight = (np.asarray(weight) > 0).astype(np.float32)

        arr, weight, ws, mu = self._weighted_mean(arr, weight, axis)
        v = jnp.sum(
            weight * jnp.abs(arr - mu) ** 2, axis=axis, keepdims=True
        ) * invert_no_zero(ws)
        return v, ws


class ReduceChisq(ReduceBase):
    """Chi-squared per dof assuming weights are inverse noise variance.

    (reference transform.py:2092)
    """

    _op = "chisq_per_dof"

    def reduction(self, arr, weight, axis):
        arr = jnp.asarray(arr)
        weight = jnp.asarray(weight)
        num = jnp.maximum(
            jnp.sum(weight > 0, axis=axis, keepdims=True) - 1, 0
        ).astype(arr.real.dtype)
        iws = invert_no_zero(jnp.sum(weight, axis=axis, keepdims=True))
        mu = jnp.sum(weight * arr, axis=axis, keepdims=True) * iws
        v = jnp.sum(
            weight * jnp.abs(arr - mu) ** 2, axis=axis, keepdims=True
        ) * invert_no_zero(num)
        return v, num


class _InverseStackRedundancyWeights(ReduceBase):
    """Weights that undo redundancy averaging (reference transform.py:2120)."""

    def _get_weights(self, data):
        if "stack" not in data.index_map:
            raise RuntimeError(
                "No 'stack' axis in index map. Cannot calculate weights."
            )
        from ..ops import tools as _tools

        redundancy = _tools.calculate_redundancy(
            np.asarray(data.input_flags[:]),
            np.asarray(data.index_map["prod"][:]),
            np.asarray(data.reverse_map["stack"]["stack"][:]),
            len(data.index_map["stack"]),
        )
        weight = np.asarray(data.weight[:]) * np.asarray(
            invert_no_zero(redundancy**2)
        )[np.newaxis]
        return weight, list(data.weight.attrs["axis"])


class ReduceChisqInverseRedundancy(ReduceChisq, _InverseStackRedundancyWeights):
    """Chi-squared per dof, undoing redundancy averaging."""


class HPFTimeStream(ContainerTask):
    """High-pass filter a timestream (reference transform.py:2146).

    Solves for a low-pass model in a truncated Fourier basis and subtracts
    it.  The per-row Wiener solves (reference transform.py:2230-2251) run as
    one batched device solve.

    Attributes
    ----------
    tau : float
        Timescale in seconds below which fluctuations are kept (i.e.
        fluctuations slower than tau are removed).
    pad : float
        Implicit zero-padding in multiples of tau (edge-effect mitigation).
    window : bool
        Apply a Blackman window to the basis.
    prior : float
        Expected scale of the slow fluctuations (regulariser).
    """

    tau = config.Property(proptype=float)
    pad = config.Property(proptype=float, default=2)
    window = config.Property(proptype=bool, default=True)
    prior = config.Property(proptype=float, default=1e2)

    def process(self, tstream):
        if "time" != tuple(tstream.data.attrs["axis"])[-1]:
            raise TypeError("'time' is not the last axis of the dataset.")
        if tuple(tstream.data.shape) != tuple(tstream.weight.shape):
            raise ValueError("Data and weights must have the same shape.")

        tau = 2 * self.tau if self.window else self.tau

        times = np.asarray(tstream.time)
        dt = np.diff(times)
        if not np.allclose(dt, dt[0], atol=1e-4):
            self.log.warning(
                "Samples are not regularly spaced. This might not work super well."
            )

        total_T = times[-1] - times[0] + 2 * tau
        nmodes = int(np.ceil(total_T / tau))
        t_freq = np.arange(-nmodes, nmodes) / total_T

        F = np.exp(2.0j * np.pi * times[:, np.newaxis] * t_freq[np.newaxis, :])
        if self.window:
            F *= np.blackman(2 * nmodes)[np.newaxis, :]

        d = np.asarray(tstream.data[:])
        w = np.asarray(tstream.weight[:])
        dflat = d.reshape(-1, len(times))
        wflat = w.reshape(-1, len(times))

        filtered = np.asarray(
            _hpf_rows(
                jnp.asarray(dflat),
                jnp.asarray(wflat.astype(np.float64)),
                jnp.asarray(F),
                self.prior,
            )
        )
        tstream.data[:] = filtered.reshape(d.shape).astype(tstream.data.dtype)
        return tstream


@jax.jit
def _hpf_rows(d, w, F, prior):
    """Batched low-pass solve + subtract for :class:`HPFTimeStream`."""
    Fh = F.conj().T
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    mu = jnp.sum(d * w, axis=-1, keepdims=True) * invert_no_zero(wsum)
    dd = d - mu

    dirty = jnp.einsum("mt,rt->rm", Fh, dd * w)
    Ci = jnp.einsum("mt,rt,tn->rmn", Fh, w.astype(F.dtype), F)
    Ci = Ci + jnp.eye(F.shape[1], dtype=F.dtype) / prior**2

    f_lpf = jnp.linalg.solve(Ci, dirty[..., None])[..., 0]
    t_lpf = jnp.einsum(
        "tm,rm->rt", F.real, f_lpf.real
    ) - jnp.einsum("tm,rm->rt", F.imag, f_lpf.imag)
    out = dd - t_lpf
    # Rows with no valid data are left unchanged (minus nothing)
    return jnp.where(wsum > 0, out, d)
