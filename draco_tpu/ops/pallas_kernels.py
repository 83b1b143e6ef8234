"""Pallas TPU kernels for HBM-bandwidth-bound hot ops.

The banded-covariance build is the hot loop of the banded Wiener regridder
(reference draco/util/_fast_tools.pyx:59 ``_linear_covariance_banded``,
called per row-block from draco/util/regrid.py:70-86).  The XLA formulation
in :mod:`draco_tpu.ops.banded` reads the transfer matrix ``R`` once per
band diagonal (bw+1 HBM passes); this Pallas kernel keeps an
``(tile_j + halo, tile_t)`` tile of ``R`` in VMEM and produces ALL band
diagonals from a single pass over HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["banded_covariance_pallas"]


def _kernel_factory(bw: int, halo: int, tile_j: int, tile_t: int):
    def kernel(Rp_ref, ni_ref, out_ref, r_s, sem_r):
        j = pl.program_id(1)
        ti = pl.program_id(2)

        @pl.when(ti == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        # Manual halo DMA: the (tile_j + halo)-row slice of R overlaps
        # between neighbouring j programs, which BlockSpec can't express
        cp_r = pltpu.make_async_copy(
            Rp_ref.at[
                pl.ds(j * tile_j, tile_j + halo), pl.ds(ti * tile_t, tile_t)
            ],
            r_s,
            sem_r,
        )
        cp_r.start()
        cp_r.wait()

        base = r_s[:tile_j, :] * ni_ref[0, 0][None, :]
        # bw is small and static: unrolled band-diagonal reductions over
        # the SAME VMEM-resident tile
        for d in range(bw + 1):
            out_ref[0, d, :] += jnp.sum(r_s[d : d + tile_j, :] * base, axis=1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("bw", "tile_j", "tile_t", "interpret")
)
def banded_covariance_pallas(
    R, Ni, bw: int, tile_j: int = 128, tile_t: int = 512, interpret: bool = False
):
    """Batched banded covariance ``C[b, d, j] = sum_t R[j+d,t] Ni[b,t] R[j,t]``.

    Single-HBM-pass Pallas formulation of
    :func:`draco_tpu.ops.banded.banded_covariance` batched over the leading
    axis of ``Ni``.  Lower band form: valid for ``j <= m-1-d``, zero-padded
    beyond.

    Parameters
    ----------
    R : [m, n] float32 transfer matrix (shared across the batch)
    Ni : [B, n] float32 per-batch diagonal weights
    bw : band width (number of sub-diagonals)
    tile_j, tile_t : VMEM tile extents (rows of R / samples)
    interpret : run in the Pallas interpreter (for CPU tests)

    Returns
    -------
    C : [B, bw+1, m] float32
    """
    R = jnp.asarray(R, dtype=jnp.float32)
    Ni = jnp.atleast_2d(jnp.asarray(Ni, dtype=jnp.float32))
    m, n = R.shape
    B = Ni.shape[0]

    mp = ((m + tile_j - 1) // tile_j) * tile_j
    npd = ((n + tile_t - 1) // tile_t) * tile_t

    # Mosaic requires DMA slice rows aligned to the f32 sublane tiling (8)
    halo = ((bw + 7) // 8) * 8
    Rp = jnp.zeros((mp + halo, npd), dtype=jnp.float32)
    Rp = Rp.at[:m, :n].set(R)
    # 3D layout [B, 1, npd] so the Ni block satisfies the (8, 128)
    # minimum-tile rule (middle dim == full array dim)
    Nip = jnp.zeros((B, 1, npd), dtype=jnp.float32)
    Nip = Nip.at[:, 0, :n].set(Ni)

    nt = npd // tile_t
    nj = mp // tile_j

    out = pl.pallas_call(
        _kernel_factory(bw, halo, tile_j, tile_t),
        out_shape=jax.ShapeDtypeStruct((B, bw + 1, mp), jnp.float32),
        grid=(B, nj, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 1, tile_t),
                lambda b, j, t: (b, 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bw + 1, tile_j),
            lambda b, j, t: (b, 0, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_j + halo, tile_t), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(Rp, Nip)

    return out[:, :, :m]
