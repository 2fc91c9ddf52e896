"""Direct and Krylov comparison solvers.

Capability parity with the reference's solverType 0/1 (Eigen/Pardiso
sparse factorizations, multigrid_solver.cpp:1287-1366) and solverType 4
(Eigen CG, :1453-1477).  The sparse factorization runs on host via
scipy/SuperLU (TPUs have no sparse direct factorization primitive — as the
reference's ran on CPU via Eigen); CG runs on device over the ELL SpMV.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse import EllMatrix, ell_from_scipy, spmv


def direct_solve(lhs_csr, rhs: np.ndarray, timing: Optional[dict] = None):
    """Host sparse Cholesky-like factor+solve (SuperLU)."""
    from scipy.sparse.linalg import splu

    t0 = time.perf_counter()
    lu = splu(lhs_csr.tocsc())
    t_factor = (time.perf_counter() - t0) * 1000
    t0 = time.perf_counter()
    rhs = np.asarray(rhs)
    x = lu.solve(rhs)
    t_solve = (time.perf_counter() - t0) * 1000
    if timing is not None:
        timing["direct_factor"] = t_factor
        timing["direct_solve"] = t_solve
    return x


def cg_solve(
    lhs_csr,
    rhs: np.ndarray,
    tol: float = 1e-4,
    max_iter: int = 10000,
    dtype=jnp.float32,
    jacobi_precond: bool = True,
):
    """Device-side (diagonally preconditioned) conjugate gradients."""
    A = ell_from_scipy(lhs_csr, dtype=dtype)
    b = jnp.asarray(rhs, dtype=dtype)
    dinv = 1.0 / np.maximum(np.asarray(lhs_csr.diagonal()), 1e-30)
    dinv = jnp.asarray(dinv, dtype=dtype)
    if b.ndim == 2:
        dinv_m = dinv[:, None]
    else:
        dinv_m = dinv
    Mop = (lambda v: dinv_m * v) if jacobi_precond else None
    x, _ = jax.scipy.sparse.linalg.cg(
        lambda v: spmv(A, v), b, tol=tol, maxiter=max_iter, M=Mop
    )
    return np.asarray(x)
