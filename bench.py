#!/usr/bin/env python
"""Headline benchmark: 1M-vertex Poisson solve to 1e-4 M-norm residual.

Mirrors BASELINE.md's north-star protocol: build the graph-Voronoi
hierarchy on a ~1M-vertex curved mesh, Galerkin-reduce (eta*M + S), run
V-cycles to 1e-4 M-norm relative residual.  Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline is the speedup over a host scipy SuperLU direct solve
(factor+substitute) of the same system — the reference's own primary
comparison column (comparisons.py --direct).

Progress goes to stderr; the JSON line is the only stdout output.
"""

import argparse
import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nu", type=int, default=1024)
    ap.add_argument("--nv", type=int, default=1024)
    ap.add_argument("--quick", action="store_true", help="small mesh smoke run")
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--skip-direct", action="store_true")
    args = ap.parse_args()
    if args.quick:
        args.nu = args.nv = 128

    import jax
    import jax.numpy as jnp

    from gravo_mg_tpu import MultigridSolver
    from gravo_mg_tpu.sparse import spmv
    from gravo_mg_tpu.utils.laplacian import cotan_laplacian, mass_barycentric
    from gravo_mg_tpu.utils.meshgen import torus_mesh
    from gravo_mg_tpu.utils.neighbors import neighbors_from_faces

    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    V, F = torus_mesh(args.nu, args.nv)
    n = V.shape[0]
    log(f"mesh: {n} vertices, {len(F)} faces ({time.perf_counter()-t0:.1f}s)")

    t0 = time.perf_counter()
    S = cotan_laplacian(V, F)
    M = mass_barycentric(V, F)
    neigh = neighbors_from_faces(F)
    lhs = (1e-6 * M + S).tocsr()
    rng = np.random.default_rng(42)
    rhs = (M @ rng.standard_normal((n, 1)))[:, 0]
    log(f"operators: nnz={lhs.nnz} ({time.perf_counter()-t0:.1f}s)")

    # Hierarchy (cold incl. jit, then warm rebuild for steady-state number)
    t0 = time.perf_counter()
    solver = MultigridSolver(V, neigh, M, lower_bound=1000)
    hier_cold = time.perf_counter() - t0
    log(f"hierarchy cold: {hier_cold:.2f}s dof={solver.hierarchy.dof}")
    t0 = time.perf_counter()
    solver_w = MultigridSolver(V, neigh, M, lower_bound=1000)
    hier_warm = time.perf_counter() - t0
    log(f"hierarchy warm: {hier_warm:.2f}s")
    solver = solver_w

    # Setup (plans + reduction) once; timed separately from cycles.
    t0 = time.perf_counter()
    ctx = solver._context(lhs)
    setup_s = time.perf_counter() - t0
    log(f"solve setup (plans+reduction): {setup_s:.2f}s "
        f"(plan {ctx.timing['plan_build']:.0f}ms, "
        f"reduce {ctx.timing['reduction']:.0f}ms)")

    # Solve twice: first includes fused-loop compile, second is warm.
    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        x, iters, res, _ = ctx.solve(
            rhs, tol=args.tol, criteria=2, max_iter=100, mode="fused"
        )
        solve_s = time.perf_counter() - t0
        log(f"solve {label}: {solve_s:.3f}s iters={iters} res={res:.2e}")
    true_res = ctx.residual(rhs, x, criteria=2)
    log(f"host-verified residual: {true_res:.3e}")

    # Smoother SpMV throughput (nnz/s) at the finest level.
    A0 = ctx.levels[0].A
    xv = jnp.asarray(rng.standard_normal(n), jnp.float32)
    spmv_j = jax.jit(lambda a, v: spmv(a, v))
    spmv_j(A0, xv).block_until_ready()
    reps = 50
    t0 = time.perf_counter()
    v = xv
    for _ in range(reps):
        v = spmv_j(A0, v)
    v.block_until_ready()
    spmv_s = (time.perf_counter() - t0) / reps
    nnz = int((np.asarray(A0.v) != 0).sum())
    nnz_per_s = nnz / spmv_s
    log(f"SpMV: {spmv_s*1e3:.3f} ms/apply, {nnz_per_s/1e9:.2f} Gnnz/s")

    # Baseline: host direct solve (SuperLU), the reference's comparison.
    direct_s = None
    if not args.skip_direct:
        try:
            from scipy.sparse.linalg import splu

            t0 = time.perf_counter()
            lu = splu(lhs.tocsc())
            xd = lu.solve(rhs)
            direct_s = time.perf_counter() - t0
            dres = ctx.residual(rhs, xd, criteria=2)
            log(f"direct (SuperLU factor+solve): {direct_s:.2f}s res={dres:.1e}")
        except Exception as e:  # noqa: BLE001
            log(f"direct baseline failed: {e}")

    result = {
        "metric": f"poisson_{n//1000}k_solve_to_{args.tol:g}",
        "value": round(solve_s, 4),
        "unit": "s",
        "vs_baseline": round(direct_s / solve_s, 2) if direct_s else 1.0,
        "extra": {
            "iters": iters,
            "residual": float(true_res),
            "hierarchy_warm_s": round(hier_warm, 3),
            "hierarchy_cold_s": round(hier_cold, 3),
            "setup_s": round(setup_s, 3),
            "spmv_gnnz_per_s": round(nnz_per_s / 1e9, 3),
            "direct_s": round(direct_s, 3) if direct_s else None,
            "n_vertices": n,
            "dof": solver.hierarchy.dof,
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
