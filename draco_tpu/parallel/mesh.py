"""Global device mesh and named-axis sharding helpers.

The reference framework distributes every container dataset along one named
axis via ``caput.mpiarray.MPIArray`` (reference ``draco/core/containers.py``
``_dataset_spec['distributed_axis']``) and re-distributes with an MPI
all-to-all.  Here the equivalent is a 1-D (or multi-D) ``jax.sharding.Mesh``:
a dataset distributed along axis ``i`` is a global ``jax.Array`` with a
``NamedSharding`` whose :class:`PartitionSpec` shards dim ``i`` over the mesh
axis.  ``redistribute`` becomes a resharding ``device_put`` which XLA lowers
to an ICI all-to-all.

If no mesh has been installed (single-device use, unit tests), everything is
a no-op and arrays are ordinary single-device arrays.
"""

from __future__ import annotations

import contextlib
import threading

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

# Name of the default mesh axis that container distributed axes map onto.
SHARD_AXIS = "shard"

_state = threading.local()


def make_mesh(devices=None, axis_name: str = SHARD_AXIS) -> Mesh:
    """Create a 1-D mesh over ``devices`` (default: all available)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def set_mesh(mesh: Mesh | None) -> None:
    """Install ``mesh`` as the process-global mesh (None to clear)."""
    _state.mesh = mesh


def get_mesh() -> Mesh | None:
    """Return the installed mesh, or None if running unsharded."""
    return getattr(_state, "mesh", None)


@contextlib.contextmanager
def use_mesh(mesh: Mesh | None):
    """Temporarily install ``mesh``."""
    old = get_mesh()
    set_mesh(mesh)
    try:
        yield mesh
    finally:
        set_mesh(old)


def _mesh_axis(mesh: Mesh) -> str:
    """The mesh axis used for container sharding (first axis by default)."""
    if SHARD_AXIS in mesh.axis_names:
        return SHARD_AXIS
    return mesh.axis_names[0]


def sharding_for_axis(
    ndim: int, axis: int | None, mesh: Mesh | None = None
) -> NamedSharding | None:
    """A NamedSharding placing ``axis`` on the mesh shard axis.

    Returns None when no mesh is active.  ``axis=None`` gives full
    replication.
    """
    if mesh is None:
        mesh = get_mesh()
    if mesh is None:
        return None
    spec = [None] * ndim
    if axis is not None:
        spec[axis] = _mesh_axis(mesh)
    return NamedSharding(mesh, PartitionSpec(*spec))


def shard_array(arr, axis: int | None):
    """Reshard ``arr`` so dim ``axis`` is split across the mesh.

    This is the TPU-native ``MPIArray.redistribute``: under a mesh the
    ``device_put`` is an ICI all-to-all; with no mesh it is a no-op.  If the
    axis length does not divide the mesh size the array is replicated
    instead (matching the reference's fallback of keeping data local).
    """
    mesh = get_mesh()
    if mesh is None:
        return arr
    if axis is not None:
        axis = axis % arr.ndim
        nshard = mesh.shape[_mesh_axis(mesh)]
        if arr.shape[axis] % nshard != 0:
            axis = None  # replicate: not evenly divisible
    sharding = sharding_for_axis(arr.ndim, axis, mesh)
    return jax.device_put(arr, sharding)


def unshard(arr):
    """Gather a (possibly sharded) array to a replicated array."""
    mesh = get_mesh()
    if mesh is None:
        return arr
    return jax.device_put(arr, sharding_for_axis(np.ndim(arr), None, mesh))
