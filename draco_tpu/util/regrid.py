"""Reference-path shim: ``draco.util.regrid`` -> :mod:`draco_tpu.ops.regrid`."""

from ..ops.regrid import *  # noqa: F401,F403
