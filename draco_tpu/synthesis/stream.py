"""Simulate sidereal and time stream data.

Re-provides reference ``draco/synthesis/stream.py`` (SimulateSidereal:22,
ExpandProducts:181, MakeTimeStream:249, MakeTimeStreamFixedInput:346,
MakeTimeStreamFixedTime:378, MakeMultipleTimeStreams:410,
MakeSiderealDayStream:495).

TPU design: the simulate spine (reference stream.py:85-140) — map -> alm
(SHT) -> per-m beam transfer projection -> inverse FFT over RA — runs as
three batched device kernels with no per-m Python loop; under a mesh the
alm tensor is resharded freq <-> m between the SHT and projection stages
(the reference's MPI parallel transpose, stream.py:96,119).
"""

from __future__ import annotations

import inspect

import jax
import jax.numpy as jnp
import numpy as np

from ..core import config, containers, io
from ..core.task import ContainerTask, PipelineStopIteration
from ..ops import mmode, regrid, sht, tools
from ..ops.tools import invert_no_zero

# Module-scope jit: re-wrapping per call would give every process() a
# fresh jit cache and recompile the inverse transform for each day.
_mmodes_to_sidereal_jit = jax.jit(
    mmode.mmodes_to_sidereal, static_argnames=("n", "oddra")
)


class SimulateSidereal(ContainerTask):
    """Create a simulated sidereal dataset from an input map.

    (reference stream.py:22-178)

    Attributes
    ----------
    stacked : bool
        Label the output baselines as a stacked set (index_map/stack +
        reverse_map/stack from the telescope) rather than a down-selection.
    """

    stacked = config.Property(proptype=bool, default=True)
    # Round the sidereal axis up to the next 2/3/5-smooth length.  The
    # natural minimal length 2*mmax + 1 often has a large prime factor
    # (e.g. 1535 = 5 x 307) which forces XLA's TPU FFT into a Bluestein
    # fallback; the extra samples carry no extra information (the m-mode
    # content is identical) but keep the iFFT on the radix path.
    fast_ra = config.Property(proptype=bool, default=False)
    # Streaming (factorised) projection: never materialises the beam
    # transfer — required at production scales where the B tensors exceed
    # device memory.
    streaming = config.Property(proptype=bool, default=False)
    baseline_chunk = config.Property(proptype=int, default=256)

    def setup(self, bt):
        """Set the beam transfer manager (BeamTransfer or ProductManager)."""
        self.beamtransfer = io.get_beamtransfer(bt)
        self.telescope = io.get_telescope(bt)

    def process(self, map_: containers.Map) -> containers.SiderealStream:
        """Simulate a SiderealStream from a Map."""
        bt = self.beamtransfer
        tel = self.telescope

        lmax = tel.lmax
        mmax = tel.mmax
        ntime = 2 * mmax + 1
        if self.fast_ra:
            ntime = mmode.fast_fft_size(ntime)

        freqmap = map_.index_map["freq"][:]
        if (tel.frequencies != freqmap["centre"]).any():
            raise ValueError("The sky map and beam-transfer frequency axes disagree.")

        # Sky harmonics for every (freq, pol) map; trim to mmax
        row_map = jnp.asarray(np.asarray(map_.map[:]))
        alm = sht.sphtrans_sky(row_map, lmax=lmax)[..., : mmax + 1]

        # Batched beam-transfer projection over every m (MXU path); under a
        # mesh this reshards freq-parallel alm into m-parallel visibilities.
        if self.streaming:
            vis_m = bt.project_sky_to_telescope_streaming(
                alm, chunk=self.baseline_chunk
            )
        else:
            vis_m = bt.project_sky_to_telescope(alm)  # [m+1, 2, nfreq, nb]

        # Inverse m-mode transform onto the sidereal grid
        # one jitted call: eager dispatch of the inverse m-mode transform
        # is slow (and partly unsupported) over remote-TPU tunnels; the
        # simulated m-modes always fill the largest negative m (oddra).
        vis_stream = _mmodes_to_sidereal_jit(
            vis_m, n=ntime, oddra=True
        )  # [f, b, t]

        # Construct the output container
        try:
            feed_index = tel.input_index
        except AttributeError:
            feed_index = tel.nfeed

        kwargs = {}
        if tel.npairs != (tel.nfeed + 1) * tel.nfeed // 2 and self.stacked:
            kwargs["prod"] = tel.index_map_prod
            kwargs["stack"] = tel.index_map_stack
            kwargs["reverse_map_stack"] = tel.reverse_map_stack
        else:
            prod_map = np.zeros(
                tel.uniquepairs.shape[0], dtype=[("input_a", int), ("input_b", int)]
            )
            prod_map["input_a"] = tel.uniquepairs[:, 0]
            prod_map["input_b"] = tel.uniquepairs[:, 1]
            kwargs["prod"] = prod_map

        sstream = containers.SiderealStream(
            freq=freqmap,
            ra=ntime,
            input=feed_index,
            distributed=True,
            **kwargs,
        )
        sstream.vis[:] = tools.device_to_numpy(vis_stream).astype(np.complex64)
        sstream.weight[:] = np.ones(sstream.weight.shape, dtype=np.float32)
        return sstream


class ExpandProducts(ContainerTask):
    """Un-wrap collated products to the full triangle (reference stream.py:181).

    Vectorised: a gather along the stack axis with a conjugation mask
    replaces the per-product Python loop (reference stream.py:233-244).
    """

    def setup(self, telescope):
        self.telescope = io.get_telescope(telescope)

    def process(
        self, sstream: containers.SiderealStream
    ) -> containers.SiderealStream:
        tel = self.telescope
        ninput = len(sstream.input)
        prod = np.array(
            [(fi, fj) for fi in range(ninput) for fj in range(fi, ninput)],
            dtype=[("input_a", int), ("input_b", int)],
        )
        nprod = len(prod)

        new_stream = containers.SiderealStream(
            prod=prod, stack=None, axes_from=sstream
        )

        fi = prod["input_a"]
        fj = prod["input_b"]
        unique_ind = tel.feedmap[fi, fj]  # [nprod]
        conj = tel.feedconj[fi, fj]
        valid = unique_ind >= 0

        vis = jnp.asarray(np.asarray(sstream.vis[:]))  # [f, stack, ra]
        gathered = jnp.take(vis, jnp.asarray(np.where(valid, unique_ind, 0)), axis=1)
        cmask = jnp.asarray(conj)[None, :, None]
        vmask = jnp.asarray(valid)[None, :, None]
        new_vis = jnp.where(cmask, jnp.conj(gathered), gathered) * vmask

        new_stream.vis[:] = np.asarray(new_vis).astype(np.complex64)
        new_stream.weight[:] = (
            np.ones(new_stream.weight.shape, dtype=np.float32)
            * valid[None, :, None]
        )

        # Identity stack maps to mimic an N^2 file (reference stream.py:221-230)
        fwd, rev = containers.default_stack_maps(nprod)
        new_stream.create_index_map("stack", fwd)
        new_stream.create_reverse_map("stack", rev)
        return new_stream


class MakeTimeStream(ContainerTask):
    """Sample a sidereal stream at the times of a timestream.

    (reference stream.py:249-343) — Lanczos interpolation of the RA axis.
    """

    lanczos_width = config.Property(proptype=int, default=5)

    def setup(self, observer):
        self.observer = io.get_telescope(observer)

    def process(self, sstream, tstream):
        if hasattr(tstream, "time") and "time" in tstream.index_map:
            time = tstream.time[:]
            tra = self.observer.unix_to_lsa(time)
        else:
            tra = tstream.ra[:]
            lsd = tstream.attrs.get("lsd", tstream.attrs.get("csd"))
            time = self.observer.lsd_to_unix(lsd + tra / 360.0)

        container_map = {
            containers.SiderealStream: containers.TimeStream,
            containers.HybridVisStream: containers.HybridVisStream,
        }
        OutputContainer = None
        for cls in inspect.getmro(sstream.__class__):
            if cls in container_map:
                OutputContainer = container_map[cls]
                break
        if OutputContainer is None:
            raise TypeError(
                f"No valid container mapping for {sstream.__class__}."
            )

        out = OutputContainer(
            axes_from=sstream, attrs_from=sstream, time=time, ra=tra
        )

        # Interpolation matrix (periodic Lanczos over RA)
        R = regrid.lanczos_forward_matrix(
            sstream.ra, tra % 360, self.lanczos_width, periodic=True
        ).T.copy()
        Rj = jnp.asarray(R)

        axind = list(sstream.data.axes).index("ra")
        data = jnp.moveaxis(jnp.asarray(np.asarray(sstream.data[:])), axind, -1)
        out.data[:] = np.asarray(
            jnp.moveaxis(data @ Rj.astype(data.dtype), -1, axind)
        ).astype(out.data.dtype)

        waxind = list(sstream.weight.axes).index("ra")
        var = jnp.moveaxis(
            invert_no_zero(jnp.asarray(np.asarray(sstream.weight[:]))), waxind, -1
        )
        wout = invert_no_zero(var @ (Rj.astype(var.dtype) ** 2))
        out.weight[:] = np.asarray(jnp.moveaxis(wout, -1, waxind)).astype(
            out.weight.dtype
        )
        return out


class MakeTimeStreamFixedInput(MakeTimeStream):
    """Make multiple time streams from a single input (reference stream.py:346)."""

    def setup(self, observer, sstream):
        self.sstream = sstream
        super().setup(observer)

    def process(self, tstream):
        return super().process(self.sstream, tstream)


class MakeTimeStreamFixedTime(MakeTimeStream):
    """Make multiple time streams for fixed time samples (reference stream.py:378)."""

    def setup(self, observer, tstream):
        self.tstream = tstream
        super().setup(observer)

    def process(self, sstream):
        return super().process(sstream, self.tstream)


class MakeMultipleTimeStreams(MakeTimeStreamFixedInput):
    """Generate a series of time stream files from a sidereal stream.

    (reference stream.py:410-492)
    """

    start_time = config.utc_time()
    end_time = config.utc_time()
    integration_time = config.Property(proptype=float, default=None)
    integration_frame_exp = config.Property(proptype=int, default=23)
    samples_per_file = config.Property(proptype=int, default=1024)

    _cur_time = None

    def process(self):
        if self._cur_time is None:
            self._cur_time = self.start_time
        if self._cur_time >= self.end_time:
            raise PipelineStopIteration()
        tstream = self._next_time_axis()
        return super().process(tstream)

    def _next_time_axis(self):
        if self.integration_time is not None:
            int_time = self.integration_time
        else:
            int_time = 2.56e-6 * 2**self.integration_frame_exp
        nsamp = min(
            int(np.ceil((self.end_time - self._cur_time) / int_time)),
            self.samples_per_file,
        )
        timestamps = self._cur_time + (np.arange(nsamp) + 1) * int_time
        if self.integration_time is not None:
            time = timestamps
        else:
            time = np.zeros(
                nsamp, dtype=[("fpga_count", np.uint64), ("ctime", np.float64)]
            )
            time["ctime"] = timestamps
            time["fpga_count"] = (
                (timestamps - self.start_time)
                / int_time
                * 2**self.integration_frame_exp
            ).astype(np.uint64)
        self._cur_time += nsamp * int_time
        return containers.TODContainer(time=time, skip_datasets=True)


class MakeSiderealDayStream(ContainerTask):
    """Emit a copy of a base sidereal stream for every LSD in a time range.

    (reference stream.py:495-561)
    """

    start_time = config.utc_time()
    end_time = config.utc_time()

    def setup(self, bt, sstream):
        self.observer = io.get_telescope(bt)
        self.lsd_start = self.observer.unix_to_lsd(self.start_time)
        self.lsd_end = self.observer.unix_to_lsd(self.end_time)
        self.log.info(
            "Simulating the sidereal range LSD %i..%i",
            int(self.lsd_start),
            int(self.lsd_end),
        )
        self._current_lsd = None
        self.sstream = sstream

    def process(self):
        if self._current_lsd is None:
            self._current_lsd = int(self.lsd_start + 1)
        if self._current_lsd >= self.lsd_end:
            raise PipelineStopIteration()
        ss = self.sstream.copy()
        ss.attrs["tag"] = f"lsd_{self._current_lsd}"
        ss.attrs["lsd"] = self._current_lsd
        self._current_lsd += 1
        return ss
