#!/usr/bin/env python
"""Cold-start audit: where does first-solve latency go, and does the
persistent XLA cache actually hit across processes?

Round-4 regression under investigation (VERDICT r5 task 1): the 1M bench
cold solve took 1092 s of compile while ~/.cache/gravo_mg_tpu_xla held
jit_fused_solve entries from runs minutes earlier — either the cache key
churns run-to-run, reads are disabled on the axon backend, or the bench
program legitimately differed.  This script measures, in one process:

  1. context setup (host) for an NxN torus Poisson system;
  2. explicit ``jax.jit(fused_solve).lower(...).compile()`` wall time,
     with DEBUG logging from jax's compilation-cache module so every
     persistent-cache get/put (hit, miss, write, error) is visible;
  3. a second compile of the SAME program in-process (tracing-cache hit,
     should be ~0) as a sanity floor.

Run it twice back-to-back (two processes) — the second run's compile
wall time IS the persistent-cache verdict.

Usage: python experiments/cold_audit.py [--nu 128] [--level-audit]
"""

import argparse
import logging
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nu", type=int, default=128)
    ap.add_argument("--level-audit", action="store_true",
                    help="also compile each level's SpMV separately to "
                         "attribute compile time to Mosaic kernel shapes")
    args = ap.parse_args()

    # Surface every persistent-cache decision jax makes.
    for name in ("jax._src.compilation_cache", "jax._src.compiler",
                 "jax._src.cache_key"):
        lg = logging.getLogger(name)
        lg.setLevel(logging.DEBUG)
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter("[cache] %(message)s"))
        lg.addHandler(h)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gravo_mg_tpu import MultigridSolver
    from gravo_mg_tpu.utils.laplacian import cotan_laplacian, mass_barycentric
    from gravo_mg_tpu.utils.meshgen import torus_mesh
    from gravo_mg_tpu.utils.neighbors import neighbors_from_faces

    jax.config.update("jax_log_compiles", True)

    log(f"devices: {jax.devices()}")
    log(f"cache dir: {jax.config.jax_compilation_cache_dir}")

    V, F = torus_mesh(args.nu, args.nu)
    n = V.shape[0]
    S = cotan_laplacian(V, F)
    M = mass_barycentric(V, F)
    neigh = neighbors_from_faces(F)
    lhs = (1e-6 * M + S).tocsr()
    rng = np.random.default_rng(42)
    rhs = (M @ rng.standard_normal((n, 1)))[:, 0]

    t0 = time.perf_counter()
    solver = MultigridSolver(V, neigh, M, lower_bound=1000)
    log(f"hierarchy: {time.perf_counter()-t0:.2f}s dof={solver.hierarchy.dof}")
    t0 = time.perf_counter()
    ctx = solver._context(lhs)
    log(f"setup: {time.perf_counter()-t0:.2f}s")

    from gravo_mg_tpu.solver.multigrid import fused_solve
    from gravo_mg_tpu.solver.residual import residual_denominator
    from gravo_mg_tpu.sparse import spmv

    if args.level_audit:
        # Compile one SpMV per level operator + per transfer, separately,
        # to attribute Mosaic-kernel compile cost per shape.
        for k, lvl in enumerate(ctx.levels):
            x = jnp.zeros((lvl.A.shape[0],), ctx.dtype)
            t0 = time.perf_counter()
            jax.jit(spmv).lower(lvl.A, x).compile()
            log(f"  level {k} A   {type(lvl.A).__name__:<11s} "
                f"compile {time.perf_counter()-t0:6.2f}s")
            t0 = time.perf_counter()
            jax.jit(lambda U, r: U.restrict(r)).lower(lvl.U, x).compile()
            log(f"  level {k} U^T {type(lvl.U).__name__:<11s} "
                f"compile {time.perf_counter()-t0:6.2f}s")
            xc = jnp.zeros((lvl.U.ncoarse,), ctx.dtype)
            t0 = time.perf_counter()
            jax.jit(lambda U, e: U.prolong(e)).lower(lvl.U, xc).compile()
            log(f"  level {k} U   {type(lvl.U).__name__:<11s} "
                f"compile {time.perf_counter()-t0:6.2f}s")

    b = jnp.zeros((n,), ctx.dtype)
    den = residual_denominator(ctx.M, ctx.Minv_diag, b, 2)
    tol = jnp.asarray(1e-4, ctx.dtype)

    t0 = time.perf_counter()
    lowered = fused_solve.lower(
        ctx.cfg, ctx.levels, ctx.coarse_op, ctx.M, ctx.Minv_diag,
        b, b, den, tol, 2, 100,
    )
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    log(f"fused_solve lower {t_lower:.2f}s compile {t_compile:.2f}s")

    t0 = time.perf_counter()
    fused_solve.lower(
        ctx.cfg, ctx.levels, ctx.coarse_op, ctx.M, ctx.Minv_diag,
        b, b, den, tol, 2, 100,
    ).compile()
    log(f"re-lower+compile in-process: {time.perf_counter()-t0:.2f}s")

    # One real solve so the numbers stay honest end-to-end.
    t0 = time.perf_counter()
    x, iters, res, _ = ctx.solve(rhs, tol=1e-4, criteria=2, mode="fused")
    log(f"solve: {time.perf_counter()-t0:.2f}s cycles "
        f"{ctx.timing['cycles']/1e3:.3f}s iters={iters} res={res:.2e}")
    print(f"compile_s={t_compile:.2f}")


if __name__ == "__main__":
    main()
