"""Miscellaneous transformations: the m-mode transform hub + reshaping.

Re-provides reference ``draco/analysis/transform.py`` (2253 LoC;
FrequencyRebin:20, CollateProducts:142, SelectFreq:333, MModeTransform:535,
MModeInverseTransform:708, SiderealMModeResample:795, ShiftRA:993,
SelectPol:1068, StokesIVis:1333, MixData:1606, Downselect:1848, ...).

The m-mode transform (the hot FFT stage, reference transform.py:644-705)
runs as one batched device FFT via :mod:`draco_tpu.ops.mmode`.
"""

from __future__ import annotations

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
