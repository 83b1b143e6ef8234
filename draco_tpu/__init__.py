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

import os as _os

import jax as _jax

# JAX's TPU matmul default is single-pass bfloat16 (~3e-3 relative error
# per GEMM) — measured 6e-2 end-to-end error on the simulate->map spine,
# versus the 1e-5 science requirement.  A radio-cosmology framework must
# not silently compute at bf16, so default every dot to f32-equivalent
# precision unless the user has already chosen one themselves.  (The SHT
# additionally pins Precision.HIGHEST per-contraction; this covers the
# rest of the task library.)  Opt out with DRACO_TPU_KEEP_MATMUL_PRECISION.
if (
    _jax.config.jax_default_matmul_precision is None
    and not _os.environ.get("DRACO_TPU_KEEP_MATMUL_PRECISION")
):
    _jax.config.update("jax_default_matmul_precision", "highest")

from . import parallel  # noqa: F401
