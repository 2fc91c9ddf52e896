"""Multigrid solve path: Galerkin reduction, cycles, outer iteration.

Layer L3 of the reference (`MultigridSolver::solve`,
gravomg/src/multigrid_solver.cpp:1279-1485) rebuilt TPU-first:

* the Galerkin chain ``Abar[k+1] = U_k^T Abar[k] U_k`` (reference
  ``:1387-1392``) runs on device through precomputed static
  :class:`~gravo_mg_tpu.sparse.GalerkinPlan` scatter plans;
* V/F/W cycles (reference ``:1059-1192``) are Python-unrolled over the
  <=10 levels inside a single jitted function — no data-dependent control
  flow, so XLA fuses smoother sweeps, transfers and residuals;
* the coarsest level (<= lower_bound rows) is densified and Cholesky-
  factored once per solve (reference ``coarsestSolver``, ``:1401``);
* the outer iterate-to-tolerance loop offers a host-stepped mode that
  records the reference's per-cycle ``(elapsed_ms, residual)`` convergence
  trace (``:1414``) and a fused ``lax.while_loop`` mode for benchmarking.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..enums import CycleType, Smoother
from ..hierarchy.builder import Hierarchy
from ..sparse import (
    EllMatrix,
    GalerkinPlan,
    Prolongation,
    ShufflePlan,
    ShuffleTransfer,
    ell_from_scipy,
    ell_to_dense,
    make_galerkin_plan,
    shuffle_from_scipy,
    shuffle_plan_from_ell,
    spmv,
)
from .residual import residual_denominator, residual_norm, residual_numerator
from .smoothers import chebyshev, estimate_lambda_max, jacobi


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LevelOps:
    """Per-level operator bundle used inside the jitted cycle."""

    A: EllMatrix
    diag_inv: jnp.ndarray
    lam_max: jnp.ndarray
    U: Prolongation

    def tree_flatten(self):
        return (self.A, self.diag_inv, self.lam_max, self.U), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static cycle configuration (hashable; jit static argument)."""

    cycle_type: int = int(CycleType.V)
    pre_iters: int = 2
    post_iters: int = 2
    smoother: int = int(Smoother.CHEBYSHEV)
    jacobi_omega: float = 2.0 / 3.0
    # Smoothing band [lam_max/cheb_ratio, cheb_safety*lam_max].  Ratio 4
    # tuned empirically for degree-2 sweeps with ratio-8 coarsening:
    # 3 cycles to 1e-4 on (M + 1e-3 S), 5 on (1e-6 M + S) — see
    # tests/test_solver.py.  Wider bands (the literature's /30) need
    # higher degrees and lose badly at degree 2.
    cheb_ratio: float = 4.0
    cheb_safety: float = 1.1
    num_levels: int = 0
    # Mixed precision.  The Galerkin chain runs in the compute dtype (f32)
    # by default: the exact constant-mode deflation (solve()) plus the
    # rank-1 nullspace regularization of the coarse factor (below) make
    # f32 rounding of the near-null eigenvalue harmless even for
    # regularized Poisson systems (eta*M + S, eta=1e-6) — verified
    # equivalent to the f64 chain in tests.  The (small) coarse dense
    # factor always runs in f64.  Set precise_galerkin for an all-f64
    # chain when x64 is enabled.
    precise_galerkin: bool = False


def _smooth(cfg: SolverConfig, ops: LevelOps, b, x, iters: int):
    if iters <= 0:
        return x
    if cfg.smoother == int(Smoother.JACOBI):
        return jacobi(ops.A, ops.diag_inv, b, x, iters, cfg.jacobi_omega)
    lam_max = cfg.cheb_safety * ops.lam_max
    lam_min = ops.lam_max / cfg.cheb_ratio
    return chebyshev(ops.A, ops.diag_inv, b, x, iters, lam_min, lam_max)


def _coarse_solve(coarse_cho, rc):
    one_d = rc.ndim == 1
    rhs = rc[:, None] if one_d else rc
    e = jax.scipy.linalg.cho_solve(
        (coarse_cho, True), rhs.astype(coarse_cho.dtype)
    ).astype(rc.dtype)
    return e[:, 0] if one_d else e


def _cycle(cfg: SolverConfig, levels, coarse_cho, b, x, k: int, kind: int):
    """Recursive cycle, unrolled at trace time (kind: 0=V, 1=F, 2=W)."""
    ops = levels[k]
    x = _smooth(cfg, ops, b, x, cfg.pre_iters)
    r = b - spmv(ops.A, x)
    rc = ops.U.restrict(r)
    if k == cfg.num_levels - 1:
        e = _coarse_solve(coarse_cho, rc)
    else:
        e = _cycle(cfg, levels, coarse_cho, rc, jnp.zeros_like(rc), k + 1, kind)
    x = x + ops.U.prolong(e)
    x = _smooth(cfg, ops, b, x, cfg.post_iters)
    if kind != int(CycleType.V):
        # F- and W-cycles run a second correction pass
        # (multigrid_solver.cpp:1091-1192); F recurses into V, W into W.
        r = b - spmv(ops.A, x)
        rc = ops.U.restrict(r)
        if k == cfg.num_levels - 1:
            e = _coarse_solve(coarse_cho, rc)
        else:
            kind2 = int(CycleType.V) if kind == int(CycleType.F) else kind
            e = _cycle(
                cfg, levels, coarse_cho, rc, jnp.zeros_like(rc), k + 1, kind2
            )
        x = x + ops.U.prolong(e)
        x = _smooth(cfg, ops, b, x, cfg.post_iters)
    return x


@partial(jax.jit, static_argnames=("cfg",))
def cycle_step(cfg: SolverConfig, levels, coarse_cho, b, x):
    return _cycle(cfg, levels, coarse_cho, b, x, 0, cfg.cycle_type)


@partial(jax.jit, static_argnames=("cfg", "criteria", "max_iter"))
def fused_solve(
    cfg: SolverConfig, levels, coarse_cho, M, Minv_diag, b, x0, den,
    tol, criteria: int, max_iter: int,
):
    """Entire iterate-to-tolerance loop on device; returns the residual
    trace in a fixed (max_iter,) buffer (inf where unused).

    ``den`` is the per-column residual denominator, precomputed from the
    *original* (pre-deflation) RHS.
    """
    A = levels[0].A

    def cond(carry):
        _, it, res, _ = carry
        return (res > tol) & (it < max_iter)

    def body(carry):
        x, it, _, trace = carry
        x = _cycle(cfg, levels, coarse_cho, b, x, 0, cfg.cycle_type)
        num = residual_numerator(A, M, Minv_diag, b, x, criteria)
        res = jnp.max(num / den)
        trace = trace.at[it].set(res)
        return x, it + 1, res, trace

    trace0 = jnp.full((max_iter,), jnp.inf, dtype=x0.dtype)
    x, iters, res, trace = jax.lax.while_loop(
        cond, body, (x0, jnp.int32(0), jnp.asarray(jnp.inf, x0.dtype), trace0)
    )
    return x, iters, res, trace


def build_galerkin_chain(
    lhs_csr, hierarchy: Hierarchy, dtype=jnp.float32
) -> Tuple[List[GalerkinPlan], EllMatrix, list]:
    """Host-side pattern discovery for the whole reduction chain.

    Returns (plans, A0_ell, host_patterns).  The chain depends only on the
    sparsity of the LHS and the hierarchy, so callers cache it across
    solves with different values (e.g. new tau) or right-hand sides.
    """
    import scipy.sparse as sp

    A = lhs_csr.tocsr()
    A.sum_duplicates()
    A0 = ell_from_scipy(A, dtype=dtype)
    # Host copy of the finest pattern (transposed (K, N) layout).
    idx = np.asarray(A0.indices)
    mask = np.asarray(A0.values) != 0
    # Ensure structural diagonal entries survive value-zero masking: the
    # smoother needs the diagonal slot.
    mask |= idx == np.arange(idx.shape[1])[None, :]
    plans: List[GalerkinPlan] = []
    patterns = [(idx, mask)]
    for lvl in hierarchy.levels:
        nc = lvl.U.ncoarse
        plan = make_galerkin_plan(
            idx, mask, np.asarray(lvl.U.cols), nc,
            U_mask=np.asarray(lvl.U.weights) != 0,
        )
        plans.append(plan)
        idx = np.asarray(plan.out_ell_idx)
        src = np.asarray(plan.out_ell_src)
        mask = src != plan.nnz_out
        patterns.append((idx, mask))
    return plans, A0, patterns


@partial(jax.jit, static_argnames=("cfg",))
def _prepare_level(cfg: SolverConfig, A_chain: EllMatrix, U, plan):
    """One level's setup: smoother operator + next level's Galerkin reduce.

    Jitted per level (not as one monolith) so peak HBM stays at one
    level's contribution buffers and the compile cache hits across levels
    and LHS patterns with matching shapes.
    """
    A_s = EllMatrix(
        A_chain.indices,
        A_chain.values.astype(
            jnp.float32 if cfg.precise_galerkin else A_chain.values.dtype
        ),
        A_chain.ncols,
    )
    diag = A_s.diagonal()
    diag_inv = 1.0 / jnp.where(jnp.abs(diag) > 1e-30, diag, 1.0)
    Uc = dataclasses.replace(U, weights=U.weights.astype(A_chain.values.dtype))
    A_next = plan.reduce(A_chain, Uc)
    return A_s, diag_inv, A_next


@jax.jit
def _gather_shuffle(plan: ShufflePlan, A: EllMatrix):
    """Re-lay a level's ELL values into shuffle-ELL (device gather)."""
    return plan.gather_values(A)


@jax.jit
def _level_lambda(A, diag_inv):
    return estimate_lambda_max(A, diag_inv)


@partial(jax.jit, static_argnames=())
def _coarse_factor(A_chain: EllMatrix, null_fix):
    """Dense f64 Cholesky of the coarsest operator.

    ``null_fix`` (traced 0/1) enables the rank-1 nullspace regularization:
    for near-singular systems (Poisson eta*M + S) the coarse matrix has a
    near-null constant mode (~1e-9 of its norm) whose Cholesky the TPU
    cannot factor stably (cond ~ 1e10 -> NaN).  Since the outer solve
    deflates the constant component from the RHS exactly, the coarse
    correction never needs to produce constants, so adding
    sigma * (1 1^T)/n — which only moves the near-null eigenvalue — leaves
    the effective correction unchanged while making the factorization
    solidly SPD.  A tiny relative diagonal shift plays the role of the
    reference's LDLT robustness (min_quad_with_fixed_mg.cpp:31-36).
    """
    Ad = ell_to_dense(A_chain)
    if jax.config.jax_enable_x64:
        Ad = Ad.astype(jnp.float64)
    nc = Ad.shape[0]
    diag_scale = jnp.mean(jnp.abs(jnp.diag(Ad)))
    rel_shift = 1e-12 if Ad.dtype == jnp.float64 else 1e-6
    Ad = Ad + (rel_shift * diag_scale) * jnp.eye(nc, dtype=Ad.dtype)
    Ad = Ad + (
        jnp.asarray(null_fix, Ad.dtype) * diag_scale / nc
    ) * jnp.ones((nc, nc), dtype=Ad.dtype)
    return jax.scipy.linalg.cholesky(Ad, lower=True)


def prepare_levels(cfg: SolverConfig, A0: EllMatrix, Us, plans, null_fix,
                   shuf_plans=None, transfers=None):
    """Per-solve setup: Galerkin chain, diagonals, lambda_max, coarse
    dense Cholesky factor.  Drives the per-level jits.

    Returns (ell_levels, shuffle_levels, coarse_cho): the ELL bundle
    feeds the GSPMD row-sharded path (parallel/dist.py), the shuffle
    bundle the single-chip roofline path; both share diagonals and
    spectral bounds.  shuffle_levels is None when no plans are given.
    """
    chain_dtype = (
        jnp.float64 if cfg.precise_galerkin else A0.values.dtype
    )
    A_chain = EllMatrix(A0.indices, A0.values.astype(chain_dtype), A0.ncols)
    ell_levels = []
    shuf_levels = []
    for k in range(cfg.num_levels):
        A_s, diag_inv, A_chain = _prepare_level(cfg, A_chain, Us[k], plans[k])
        if shuf_plans is not None:
            A_shuf = _gather_shuffle(shuf_plans[k], A_s)
            lam = _level_lambda(A_shuf, diag_inv)
            shuf_levels.append(LevelOps(A_shuf, diag_inv, lam, transfers[k]))
        else:
            lam = _level_lambda(A_s, diag_inv)
        ell_levels.append(LevelOps(A_s, diag_inv, lam, Us[k]))
    coarse_cho = _coarse_factor(A_chain, null_fix)
    return (
        tuple(ell_levels),
        tuple(shuf_levels) if shuf_plans is not None else None,
        coarse_cho,
    )


class MultigridSolveContext:
    """Caches everything reusable across solves for one (hierarchy, LHS
    pattern): Galerkin plans, device level ops, coarse factor."""

    def __init__(
        self,
        hierarchy: Hierarchy,
        lhs_csr,
        mass_csr,
        cfg: SolverConfig,
        dtype=jnp.float32,
    ):
        self.hierarchy = hierarchy
        self.cfg = dataclasses.replace(
            cfg,
            num_levels=hierarchy.num_levels,
            # f64 chain requires x64 mode (enabled by the package import;
            # honor an explicit opt-out).
            precise_galerkin=cfg.precise_galerkin
            and bool(jax.config.jax_enable_x64),
        )
        self.dtype = dtype
        self.timing: dict = {}

        t0 = time.perf_counter()
        self.plans, self.A0, self.patterns = build_galerkin_chain(
            lhs_csr, hierarchy, dtype=dtype
        )
        self.timing["plan_build"] = (time.perf_counter() - t0) * 1000
        self.lhs_csr = lhs_csr.tocsr()
        self._analyze_lhs()

        self.mass_csr = mass_csr.tocsr()
        self.M_ell = ell_from_scipy(mass_csr, dtype=dtype)
        self.M = shuffle_from_scipy(mass_csr, dtype=dtype)
        minv = 1.0 / np.maximum(np.asarray(mass_csr.diagonal()), 1e-30)
        self.Minv_diag = jnp.asarray(minv, dtype=dtype)

        # Shuffle-ELL plans: per-level operator re-layouts (pattern-only,
        # reused across LHS values) + grid transfers (U / U^T, values
        # fixed per hierarchy).
        t0 = time.perf_counter()
        self.shuf_plans = tuple(
            shuffle_plan_from_ell(idx, mask, idx.shape[1])
            for (idx, mask) in self.patterns[: hierarchy.num_levels]
        )
        self.transfers = tuple(
            self._build_transfer(lvl) for lvl in hierarchy.levels
        )
        self.timing["shuffle_plan"] = (time.perf_counter() - t0) * 1000

        self.Us = tuple(lvl.U for lvl in hierarchy.levels)
        t0 = time.perf_counter()
        self.ell_levels, self.levels, self.coarse_cho = prepare_levels(
            self.cfg, self.A0, self.Us, tuple(self.plans),
            1.0 if self.near_singular else 0.0,
            self.shuf_plans, self.transfers,
        )
        jax.block_until_ready(self.coarse_cho)
        self.timing["reduction"] = (time.perf_counter() - t0) * 1000

    def _build_transfer(self, lvl) -> ShuffleTransfer:
        Ucsr = lvl.U.to_scipy()
        return ShuffleTransfer(
            shuffle_from_scipy(Ucsr, dtype=self.dtype),
            shuffle_from_scipy(Ucsr.T.tocsr(), dtype=self.dtype),
        )

    def _analyze_lhs(self):
        """f64 row sums (= A @ 1) and near-singularity detection, used for
        the exact rank-1 deflation of the constant near-null mode (see
        solve()) and the coarse nullspace fix (see prepare_levels)."""
        self.row_sums = np.asarray(
            self.lhs_csr.sum(axis=1), dtype=np.float64
        ).ravel()
        n = self.lhs_csr.shape[0]
        scale = float(np.abs(self.lhs_csr.diagonal()).mean())
        self.near_singular = (
            abs(float(self.row_sums.sum())) < 1e-6 * scale * n
        )

    def update_lhs(self, lhs_csr):
        """Re-run the value-only reduction for a new LHS with the same
        sparsity pattern (hierarchy reuse across systems)."""
        t0 = time.perf_counter()
        self.lhs_csr = lhs_csr.tocsr()
        self._analyze_lhs()
        self.A0 = ell_from_scipy(lhs_csr, dtype=self.dtype, pad_to=self.A0.indices.shape[0])
        self.ell_levels, self.levels, self.coarse_cho = prepare_levels(
            self.cfg, self.A0, self.Us, tuple(self.plans),
            1.0 if self.near_singular else 0.0,
            self.shuf_plans, self.transfers,
        )
        jax.block_until_ready(self.coarse_cho)
        self.timing["reduction"] = (time.perf_counter() - t0) * 1000

    # ---- solving -----------------------------------------------------------

    def solve(
        self,
        rhs: np.ndarray,
        x0: Optional[np.ndarray] = None,
        *,
        tol: float = 1e-4,
        criteria: int = 2,
        max_iter: int = 100,
        mode: str = "traced",
    ):
        """Iterate cycles until the residual criterion drops below tol.

        mode="traced": host-stepped, records (elapsed_ms, residual) per
        cycle like the reference (multigrid_solver.cpp:1408-1443).
        mode="fused": single device while_loop (fastest; trace has
        residuals only).

        Before iterating, the constant near-null component is removed
        exactly: substituting ``x = y + alpha*1`` with ``alpha = sum(b) /
        sum(A @ 1)`` (computed in f64) makes the transformed RHS
        mean-free, so ``y`` stays small and f32 SpMV cancellation noise
        stays far below the 1e-4 target even for near-singular systems
        (Poisson eta*M + S — whose raw solutions have O(1/eta) constant
        components the f32 residual could not even evaluate).  This is
        exact algebra, not an approximation; residual denominators use the
        original RHS, matching the reference's criteria.
        """
        rhs = np.asarray(rhs, dtype=np.float64)
        squeeze = rhs.ndim == 1
        rhs2 = rhs[:, None] if squeeze else rhs
        denom = float(self.row_sums.sum())
        n = rhs2.shape[0]
        scale = float(np.abs(self.lhs_csr.diagonal()).mean())
        if abs(denom) > 1e-12 * scale * n:
            alpha = rhs2.sum(axis=0) / denom  # (d,) f64
        else:
            alpha = np.zeros(rhs2.shape[1])
        b_eff64 = rhs2 - alpha[None, :] * self.row_sums[:, None]
        b = jnp.asarray(
            b_eff64[:, 0] if squeeze else b_eff64, dtype=self.dtype
        )
        den = residual_denominator(
            self.M, self.Minv_diag, jnp.asarray(
                rhs2[:, 0] if squeeze else rhs2, dtype=self.dtype
            ), criteria,
        )
        if x0 is not None:
            x0 = np.asarray(x0, dtype=np.float64)
            x0_2 = x0[:, None] if x0.ndim == 1 else x0
            y0 = x0_2 - alpha[None, :]
            x = jnp.asarray(y0[:, 0] if squeeze else y0, dtype=self.dtype)
        else:
            x = jnp.zeros_like(b)
        cfg = self.cfg
        A = self.levels[0].A
        convergence: list = []
        if mode == "fused":
            t0 = time.perf_counter()
            x, iters, res, trace = fused_solve(
                cfg, self.levels, self.coarse_cho, self.M, self.Minv_diag,
                b, x, den, jnp.asarray(tol, self.dtype), criteria, max_iter,
            )
            jax.block_until_ready(x)
            elapsed = (time.perf_counter() - t0) * 1000
            iters = int(iters)
            res = float(res)
            trace = np.asarray(trace)[:iters]
            convergence = [
                (elapsed * (i + 1) / max(iters, 1), float(t))
                for i, t in enumerate(trace)
            ]
        else:
            t0 = time.perf_counter()
            iters = 0
            res = float("inf")
            while res > tol and iters < max_iter:
                x = cycle_step(cfg, self.levels, self.coarse_cho, b, x)
                num = residual_numerator(
                    A, self.M, self.Minv_diag, b, x, criteria
                )
                res = float(jnp.max(num / den))
                iters += 1
                convergence.append(
                    ((time.perf_counter() - t0) * 1000, res)
                )
            elapsed = (time.perf_counter() - t0) * 1000
        self.timing["cycles"] = elapsed
        self.timing["iterations"] = float(iters)
        self.timing["residue"] = res
        self.timing["solver_total"] = elapsed + self.timing.get("reduction", 0)
        y = np.asarray(x, dtype=np.float64)
        y2 = y[:, None] if squeeze else y
        out = y2 + alpha[None, :]
        return (out[:, 0] if squeeze else out), iters, res, convergence

    def residual(self, rhs, x, criteria: int = 2) -> float:
        """Exact residual of the *original* system, evaluated host-side in
        f64 (reporting path; solutions of near-singular systems are too
        large for f32 cancellation)."""
        rhs = np.asarray(rhs, dtype=np.float64)
        x = np.asarray(x, dtype=np.float64)
        rhs2 = rhs[:, None] if rhs.ndim == 1 else rhs
        x2 = x[:, None] if x.ndim == 1 else x
        r = self.lhs_csr @ x2 - rhs2
        M = self.mass_csr
        if criteria == 0:
            vals = np.linalg.norm(r, axis=0) / np.maximum(
                np.linalg.norm(rhs2, axis=0), 1e-30
            )
        elif criteria == 1:
            minv = 1.0 / np.maximum(M.diagonal(), 1e-300)
            vals = np.sqrt(
                (r * (minv[:, None] * r)).sum(axis=0)
                / np.maximum((rhs2 * (minv[:, None] * rhs2)).sum(axis=0), 1e-300)
            )
        elif criteria == 2:
            vals = np.sqrt(
                (r * (M @ r)).sum(axis=0)
                / np.maximum((rhs2 * (M @ rhs2)).sum(axis=0), 1e-300)
            )
        elif criteria == 3:
            vals = [np.linalg.norm(r)]
        else:
            raise ValueError(f"unknown stopping criteria {criteria}")
        return float(np.max(vals))
