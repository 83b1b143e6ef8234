"""Reference-path shim: ``draco.util.random`` -> :mod:`draco_tpu.ops.random`."""

from ..ops.random import *  # noqa: F401,F403
