"""Residual stopping criteria.

Parity with ``residualCheck`` (gravomg/src/multigrid_solver.cpp:1228-1277):
type 0 relative l2, type 1 M^-1-norm, type 2 M-norm (the paper's default),
type 3 absolute; always the max over RHS columns.

The solve path evaluates residuals in split form: the numerator uses the
deflated right-hand side (see ``MultigridSolveContext.solve`` — the
constant near-null component is removed exactly so f32 SpMV cancellation
noise stays below tolerance) while the denominator is precomputed from the
*original* RHS, matching the reference's definition.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..sparse import EllMatrix, spmv


def _as_2d(v):
    return v[:, None] if v.ndim == 1 else v


@partial(jax.jit, static_argnames=("criteria",))
def residual_numerator(A: EllMatrix, M: EllMatrix, Minv_diag, b, x, criteria: int):
    """Per-column residual norms (numerators) for each criterion."""
    r = _as_2d(spmv(A, x) - b)
    if criteria == 0:
        return jnp.linalg.norm(r, axis=0)
    if criteria == 1:
        return jnp.sqrt(jnp.sum(r * (Minv_diag[:, None] * r), axis=0))
    if criteria == 2:
        return jnp.sqrt(jnp.sum(r * spmv(M, r), axis=0))
    if criteria == 3:
        return jnp.linalg.norm(r)[None]
    raise ValueError(f"unknown stopping criteria {criteria}")


@partial(jax.jit, static_argnames=("criteria",))
def residual_denominator(M: EllMatrix, Minv_diag, b, criteria: int):
    """Per-column denominators from the original RHS."""
    b2 = _as_2d(b)
    if criteria == 0:
        return jnp.maximum(jnp.linalg.norm(b2, axis=0), 1e-30)
    if criteria == 1:
        return jnp.maximum(
            jnp.sqrt(jnp.sum(b2 * (Minv_diag[:, None] * b2), axis=0)), 1e-30
        )
    if criteria == 2:
        return jnp.maximum(
            jnp.sqrt(jnp.sum(b2 * spmv(M, b2), axis=0)), 1e-30
        )
    if criteria == 3:
        return jnp.ones((1,), b2.dtype)
    raise ValueError(f"unknown stopping criteria {criteria}")


@partial(jax.jit, static_argnames=("criteria",))
def residual_norm(A: EllMatrix, M: EllMatrix, Minv_diag, b, x, criteria: int = 2):
    """Reference-style residual: max over RHS columns of num/den."""
    num = residual_numerator(A, M, Minv_diag, b, x, criteria)
    den = residual_denominator(M, Minv_diag, b, criteria)
    return jnp.max(num / den)
