"""Batched banded Hermitian linear algebra.

Device replacement for the reference's banded hot path — the Cython
``_linear_covariance_banded`` + ``scipy.linalg.solveh_banded`` pair inside
the Wiener regridder (reference draco/util/_fast_tools.pyx:59 and
draco/util/regrid.py:70-86): a banded covariance build as shifted row
products, and a banded Cholesky solve as a ``lax.scan`` over columns
(O(bw^2) work per step, vmappable over large batches of right-hand sides).

Band storage is *lower* form: ``ab[d, j] = A[j+d, j]`` for d = 0..bw.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "banded_covariance",
    "banded_cholesky",
    "banded_cholesky_solve",
    "solveh_banded_lower",
]


def banded_covariance(R, Ni, bw: int):
    """Banded rows-of-R covariance: C[i, j] = sum_n R[i,n] Ni[n] R[j,n].

    Returns the lower band form [bw+1, m].  Equivalent of the Cython
    ``_linear_covariance_banded`` (reference _fast_tools.pyx:59) as bw+1
    shifted row-product reductions (fully vectorised).
    """
    R = jnp.asarray(R)
    Ni = jnp.asarray(Ni)
    m = R.shape[0]
    RN = R * Ni[None, :]
    rows = []
    for d in range(bw + 1):
        prod = (R[d:, :] * RN[: m - d, :]).sum(axis=-1)  # C[j+d, j]
        rows.append(jnp.pad(prod, (0, d)))
    return jnp.stack(rows, axis=0)


@partial(jax.jit, static_argnames=("bw",))
def banded_cholesky(ab, bw: int):
    """Cholesky factor of a banded HPD matrix in lower band form.

    ``ab[d, j] = A[j+d, j]``; returns L in the same layout.  Implemented as
    a scan over columns carrying the previous ``bw`` columns of L.
    """
    ab = jnp.asarray(ab)
    m = ab.shape[-1]
    dtype = ab.dtype

    # gather indices: s[d] = sum_t H[t-1, d+t] * conj(H[t-1, t])
    t_idx = np.arange(1, bw + 1)
    d_idx = np.arange(bw + 1)
    gather = np.minimum(d_idx[None, :] + t_idx[:, None], bw)  # [bw, bw+1]
    valid = (d_idx[None, :] + t_idx[:, None]) <= bw
    gather_j = jnp.asarray(gather)
    valid_j = jnp.asarray(valid, dtype=dtype)

    row_sel = jnp.arange(bw)
    col_sel = jnp.arange(1, bw + 1)

    def step(H, acol):
        # H: [bw, bw+1], H[t-1] = Lcol of column j-t
        picked = jnp.take_along_axis(
            H, jnp.broadcast_to(gather_j, H.shape), axis=-1
        )  # [bw, bw+1] -> picked[t-1, d] = L[j+d, j-t]
        # multiplier: conj(L[j, j-t]) = conj(H[t-1, t])
        mult = jnp.conj(H[row_sel, col_sel])[:, None]
        s = (picked * valid_j * mult).sum(axis=0)
        c = acol - s
        # a non-positive pivot means the band is singular/indefinite:
        # propagate NaN (sqrt of negative / 0-divide) so the failure is
        # DETECTABLE downstream — clamping to tiny returned enormous
        # finite garbage that validate_finite could not catch (the
        # scipy path this replaces raises LinAlgError)
        diag = jnp.sqrt(
            jnp.where(c[0].real > 0, c[0].real, jnp.nan)
        ).astype(dtype)
        lcol = jnp.concatenate([diag[None], c[1:] / diag])
        H_new = jnp.concatenate([lcol[None, :], H[:-1]], axis=0)
        return H_new, lcol

    H0 = jnp.zeros((bw, bw + 1), dtype=dtype)
    _, lcols = jax.lax.scan(step, H0, jnp.moveaxis(ab, -1, 0))
    return jnp.moveaxis(lcols, 0, -1)  # [bw+1, m]


@partial(jax.jit, static_argnames=("bw",))
def _solve_lower(lb, b, bw: int):
    """Solve L y = b with L in lower band form; b [..., m]."""
    m = b.shape[-1]

    # The lag-t coefficient for row j is L[j, j-t] = (column j-t)[t].
    # coeff[t-1, j] = L[j, j-t] = lb[t, j-t]
    coeffs = jnp.stack(
        [jnp.roll(lb[t], t, axis=-1) for t in range(1, bw + 1)], axis=0
    )  # [bw, m] (garbage in first t entries, masked by zero history)

    def step2(y_hist, inp):
        ldiag, coeff_j, bj = inp
        s = (coeff_j * y_hist[..., : bw]).sum(axis=-1)
        yj = (bj - s) / ldiag
        y_hist = jnp.concatenate([yj[..., None], y_hist[..., :-1]], axis=-1)
        return y_hist, yj

    y0 = jnp.zeros(b.shape[:-1] + (bw,), dtype=b.dtype)
    xs = (lb[0], jnp.moveaxis(coeffs, -1, 0), jnp.moveaxis(b, -1, 0))
    _, y = jax.lax.scan(step2, y0, xs)
    return jnp.moveaxis(y, 0, -1)


@partial(jax.jit, static_argnames=("bw",))
def _solve_upper(lb, y, bw: int):
    """Solve L^H x = y (backward substitution)."""
    m = y.shape[-1]
    # Reverse the problem: solving L^H x = y backwards is a forward solve
    # on reversed indices with coefficients conj(L[j+t, j]) = conj(lb[t, j]).
    coeffs = jnp.conj(lb[1:])  # [bw, m]; coeff for x_{j+t} when solving row j

    def step(x_hist, inp):
        ldiag, coeff_j, yj = inp
        s = (coeff_j * x_hist[..., :bw]).sum(axis=-1)
        xj = (yj - s) / jnp.conj(ldiag)
        x_hist = jnp.concatenate([xj[..., None], x_hist[..., :-1]], axis=-1)
        return x_hist, xj

    x0 = jnp.zeros(y.shape[:-1] + (bw,), dtype=y.dtype)
    xs = (
        lb[0][::-1],
        jnp.moveaxis(coeffs, -1, 0)[::-1],
        jnp.moveaxis(y, -1, 0)[::-1],
    )
    _, x = jax.lax.scan(step, x0, xs)
    return jnp.moveaxis(x, 0, -1)[..., ::-1]


def banded_cholesky_solve(lb, b, bw: int):
    """Solve A x = b given the banded Cholesky factor of A."""
    y = _solve_lower(lb, b, bw)
    return _solve_upper(lb, y, bw)


def solveh_banded_lower(ab, b, bw: int | None = None):
    """Solve the banded HPD system A x = b.

    Parameters
    ----------
    ab
        Lower band form [bw+1, m].
    b
        Right-hand side(s) [..., m].
    """
    if bw is None:
        bw = ab.shape[0] - 1
    if bw == 0:
        # purely diagonal system (the scan carries bw previous columns
        # and cannot run with an empty carry)
        ab = jnp.asarray(ab)
        d = ab[0].real
        d = jnp.where(d > 0, d, jnp.nan)
        return jnp.asarray(b) / d.astype(ab.dtype)
    lb = banded_cholesky(ab, bw)
    return banded_cholesky_solve(lb, jnp.asarray(b), bw)
