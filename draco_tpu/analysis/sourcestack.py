"""Source stacking analysis tasks.

Re-provides reference ``draco/analysis/sourcestack.py`` (SourceStack:17,
RandomSubset:214, GroupSourceStacks:332).  The reference's per-source
bincount loop (sourcestack.py:159-180) becomes a single flattened
scatter-add over all (source, freq) pairs.
"""

from __future__ import annotations

import numpy as np

from ..core import config, containers
from ..core.task import ContainerTask, PipelineStopIteration, RandomTask
from ..ops.tools import invert_no_zero

NU21 = 1420.405751768  # MHz, HI hyperfine rest frequency
C_LIGHT = 299792458.0


class SourceStack(ContainerTask):
    """Stack BeamForm outputs across sources (reference sourcestack.py:17).

    BeamForm must have been run with ``collapse_ha = True``.

    Attributes
    ----------
    freqside : int
        Frequency bins kept on each side of the source bin.  Default 50.
    single_source_bin_index : int
        Only stack sources within this frequency channel.
    uniform_weight : bool
        Use uniform instead of inverse-variance weighting (the mask is
        preserved either way).
    """

    freqside = config.Property(proptype=int, default=50)
    single_source_bin_index = config.Property(proptype=int, default=None)
    uniform_weight = config.Property(proptype=bool, default=False)

    def process(self, formed_beam):
        """Stack the formed beams across sources.

        Returns a FrequencyStack (or FrequencyStackByPol).
        """
        freq = np.asarray(formed_beam.freq)
        nfreq = len(freq)
        pol = formed_beam.pol
        npol = len(pol)

        source_freq = NU21 / (
            np.asarray(formed_beam["redshift"][:]["z"]) + 1.0
        )

        nstack = 2 * self.freqside + 1

        stack_axis = np.copy(
            formed_beam.frequency[
                nfreq // 2 - self.freqside : nfreq // 2 + self.freqside + 1
            ]
        )
        stack_axis["centre"] = (
            stack_axis["centre"] - stack_axis["centre"][self.freqside]
        )

        freqdiff = freq[np.newaxis, :] - source_freq[:, np.newaxis]

        if stack_axis["centre"][0] > stack_axis["centre"][-1]:
            stackbins = stack_axis["centre"] + 0.5 * stack_axis["width"]
            stackbins = np.append(
                stackbins,
                stack_axis["centre"][-1] - 0.5 * stack_axis["width"][-1],
            )
        else:
            stackbins = stack_axis["centre"] - 0.5 * stack_axis["width"]
            stackbins = np.append(
                stackbins,
                stack_axis["centre"][-1] + 0.5 * stack_axis["width"][-1],
            )

        source_indices = np.digitize(freqdiff, stackbins) - 1
        f_mask = (source_indices >= 0) & (source_indices < nstack)
        source_mask = np.sum(f_mask, axis=1) > 0

        if self.single_source_bin_index is not None:
            fs = formed_beam.index_map["freq"][self.single_source_bin_index]
            source_mask &= np.abs(source_freq - fs["centre"]) < (
                0.5 * fs["width"]
            )

        if npol > 1:
            stack = containers.FrequencyStackByPol(
                freq=stack_axis, pol=pol, attrs_from=formed_beam
            )
        else:
            stack = containers.FrequencyStack(
                freq=stack_axis, attrs_from=formed_beam
            )

        # Vectorised scatter: every valid (source, freq) pair at once
        valid = f_mask & source_mask[:, np.newaxis]
        idx = source_indices[valid]

        for pp, pstr in enumerate(pol):
            fb = np.asarray(formed_beam.beam[:])[:, pp]
            fw = np.asarray(formed_beam.weight[:])[:, pp]

            fw_eff = (fw > 0).astype(np.float64) if self.uniform_weight else fw

            source_stack = np.bincount(
                idx, weights=(fw_eff * fb)[valid], minlength=nstack
            )
            source_weight = np.bincount(
                idx, weights=fw_eff[valid], minlength=nstack
            )

            oslc = (pp, slice(None)) if npol > 1 else slice(None)
            stack.weight[oslc] = source_weight
            stack.stack[oslc] = source_stack * np.asarray(
                invert_no_zero(source_weight)
            )

            self.log.info(
                f"Number of sources stacked for pol {pstr}: "
                f"{int(source_mask.sum())}"
            )

        return stack


class RandomSubset(ContainerTask, RandomTask):
    """Draw random sub-catalogs from a mock catalog.

    (reference sourcestack.py:214-329)

    Attributes
    ----------
    number : int
        Number of catalogs to draw.
    size : int
        Objects per catalog.
    """

    number = config.Property(proptype=int)
    size = config.Property(proptype=int)

    def __init__(self):
        super().__init__()
        self.catalog_ind = 0

    def setup(self, catalog):
        """Set the full catalog to draw from."""
        if "tag" in catalog.attrs:
            self.base_tag = f"{catalog.attrs['tag']}_mock_{{:05d}}"
        else:
            self.base_tag = "mock_{:05d}"
        self.catalog = catalog

    def process(self):
        """Draw the next random catalog."""
        if self.catalog_ind >= self.number:
            raise PipelineStopIteration

        objects = self.catalog.index_map["object_id"]
        num_cat = len(objects)

        ind = np.sort(self.rng.choice(num_cat, self.size, replace=False))

        new_catalog = self.catalog.__class__(
            object_id=objects[ind],
            attrs_from=self.catalog,
            axes_from=self.catalog,
        )
        for name in self.catalog.datasets.keys():
            if name not in new_catalog.datasets:
                new_catalog.add_dataset(name)

        new_catalog.attrs["tag"] = self.base_tag.format(self.catalog_ind)

        for name, dset in self.catalog.datasets.items():
            if tuple(dset.attrs["axis"])[0] == "object_id":
                new_catalog.datasets[name][:] = np.asarray(dset[:])[ind]
            else:
                new_catalog.datasets[name][:] = dset[:]

        self.catalog_ind += 1

        return new_catalog


class GroupSourceStacks(ContainerTask):
    """Accumulate frequency stacks into Mock containers.

    (reference sourcestack.py:332-467)

    Attributes
    ----------
    ngroup : int
        Stacks accumulated per output container.  Default 100.
    """

    ngroup = config.Property(proptype=int, default=100)

    def setup(self):
        """Initialise the accumulator."""
        self.stack = []
        self.nmock = 0
        self.counter = 0

        self._container_lookup = {
            containers.FrequencyStack: containers.MockFrequencyStack,
            containers.FrequencyStackByPol: containers.MockFrequencyStackByPol,
            containers.MockFrequencyStack: containers.MockFrequencyStack,
            containers.MockFrequencyStackByPol: containers.MockFrequencyStackByPol,
        }

    def process(self, stack):
        """Add a stack; emit a grouped container every ``ngroup`` inputs."""
        self.stack.append(stack)
        if "mock" in stack.index_map:
            self.nmock += len(stack.index_map["mock"])
        else:
            self.nmock += 1

        self.log.info(
            f"Collected frequency stack.  Current size is {len(self.stack):d}."
        )

        if (len(self.stack) % self.ngroup) == 0:
            return self._reset()
        return None

    def process_finish(self):
        """Emit whatever stacks remain."""
        if len(self.stack) > 0:
            return self._reset()
        return None

    def _reset(self):
        self.log.info(
            f"We have accumulated {self.nmock:d} mock realizations.  "
            f"Saving to file. [group {self.counter:03d}]"
        )

        mock = np.arange(self.nmock, dtype=np.int64)
        OutputContainer = self._container_lookup[self.stack[0].__class__]
        out = OutputContainer(
            mock=mock, axes_from=self.stack[0], attrs_from=self.stack[0]
        )

        counter_str = f"{self.counter:03d}"
        if "tag" in out.attrs:
            tag = out.attrs["tag"].split("_")
            if "group" in tag:
                ig = max(ii for ii, tt in enumerate(tag) if tt == "group")
                tag[ig] = "supergroup"
                tag[ig + 1] = counter_str
            elif "mock" in tag:
                im = max(ii for ii, tt in enumerate(tag) if tt == "mock")
                tag[im] = "group"
                tag[im + 1] = counter_str
            else:
                tag.append(f"group_{counter_str}")
            out.attrs["tag"] = "_".join(tag)
        else:
            out.attrs["tag"] = f"group_{counter_str}"

        for name in self.stack[0].datasets.keys():
            if name not in out.datasets:
                out.add_dataset(name)

        for name, odset in out.datasets.items():
            arr = np.asarray(odset[:])
            mock_count = 0
            for stack in self.stack:
                dset = stack.datasets[name]
                data = np.asarray(dset[:])
                if tuple(dset.attrs["axis"])[0] != "mock":
                    data = data[np.newaxis, ...]
                for mdata in data:
                    arr[mock_count] = mdata
                    mock_count += 1
            odset[:] = arr

        self.stack = []
        self.nmock = 0
        self.counter += 1

        return out
