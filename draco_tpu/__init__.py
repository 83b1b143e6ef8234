"""draco-tpu: a TPU-native framework for drift-scan radio interferometry.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``radiocosmology/draco`` (plus the slices of its runtime deps caput,
driftscan and cora that draco relies on): typed axis-labelled distributed
containers, a YAML-driven task pipeline, the m-mode formalism
(simulate: sky map -> beam transfer -> visibilities; analyze:
visibilities -> m-modes -> maps), delay spectra, ring maps, flagging and
the full analysis/synthesis task library.

Design stance (see SURVEY.md section 7): arrays are ``jax.Array`` with
``NamedSharding`` over a device mesh instead of MPI-distributed ndarrays;
per-m/per-freq Python loops become vmapped/scanned batched device kernels;
MPI collectives become XLA collectives over ICI.
"""

__version__ = "0.1.0"

from . import parallel  # noqa: F401
