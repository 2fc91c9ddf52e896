#!/usr/bin/env python
"""Isolate the fused-solve while_loop overhead (VERDICT r3 weakness #1).

profile_cycle.py measured cycle_step at 8.3 ms but fused_solve at
37 ms/cycle on the same operands.  This experiment separates:
  * dispatch+fetch floor: fused solve that stops after 1 cycle;
  * marginal cost per while_loop iteration (tol sweep: 3/8/15 cycles);
  * the same cycles in a fixed-trip lax.fori_loop (no residual check);
  * a Python-unrolled N-cycle jit (no device loop at all).

Usage: python experiments/loop_overhead.py [--nu 1024 --nv 1024]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nu", type=int, default=1024)
    ap.add_argument("--nv", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from gravo_mg_tpu import MultigridSolver
    from gravo_mg_tpu.solver.multigrid import _cycle, fused_solve
    from gravo_mg_tpu.solver.residual import (
        residual_denominator,
        residual_numerator,
    )
    from gravo_mg_tpu.utils.laplacian import cotan_laplacian, mass_barycentric
    from gravo_mg_tpu.utils.meshgen import torus_mesh
    from gravo_mg_tpu.utils.neighbors import neighbors_from_faces

    V, F = torus_mesh(args.nu, args.nv)
    n = V.shape[0]
    S = cotan_laplacian(V, F)
    M = mass_barycentric(V, F)
    neigh = neighbors_from_faces(F)
    lhs = (1e-6 * M + S).tocsr()
    rng = np.random.default_rng(42)
    rhs = (M @ rng.standard_normal((n, 1)))[:, 0]

    solver = MultigridSolver(V, neigh, M, lower_bound=1000)
    ctx = solver._context(lhs)
    cfg = ctx.cfg
    log(f"dof: {solver.hierarchy.dof}")

    b = jnp.asarray(rhs, jnp.float32)
    x0 = jnp.zeros_like(b)
    den = residual_denominator(ctx.M, ctx.Minv_diag, b, 2)

    def run_fused(tol):
        t0 = time.perf_counter()
        _, iters, res, _ = fused_solve(
            cfg, ctx.levels, ctx.coarse_op, ctx.M, ctx.Minv_diag,
            b, x0, den, jnp.asarray(tol, jnp.float32), 2, 100,
        )
        iters, res = jax.device_get((iters, res))
        return time.perf_counter() - t0, int(iters), float(res)

    run_fused(1e-4)  # compile
    pts = []
    for tol in (1e3, 3e-2, 1e-3, 1e-4):
        best = min(run_fused(tol) for _ in range(3))
        log(f"fused tol={tol:8.0e}: {best[0]*1e3:7.1f} ms, "
            f"{best[1]:2d} cycles, res={best[2]:.2e}")
        pts.append((best[1], best[0] * 1e3))
    (i0, t0ms), (i1, t1ms) = pts[0], pts[-1]
    if i1 > i0:
        log(f"marginal while_loop cycle: {(t1ms-t0ms)/(i1-i0):.2f} ms; "
            f"floor (dispatch+fetch+{i0} cycles): {t0ms:.1f} ms")

    # fixed-trip fori_loop, no residual check
    @partial(jax.jit, static_argnames=("trips",))
    def fori_cycles(levels, coarse, b, x, trips: int):
        def body(_, x):
            return _cycle(cfg, levels, coarse, b, x, 0, cfg.cycle_type)
        return jax.lax.fori_loop(0, trips, body, x)

    for trips in (1, 15):
        out = fori_cycles(ctx.levels, ctx.coarse_op, b, x0, trips)
        out.block_until_ready()
        t0 = time.perf_counter()
        out = fori_cycles(ctx.levels, ctx.coarse_op, b, x0, trips)
        jax.device_get(out[:8])
        dt = (time.perf_counter() - t0) * 1e3
        log(f"fori_loop {trips:2d} cycles (no residual): {dt:7.1f} ms "
            f"({dt/trips:.2f} ms/cycle)")

    # Python-unrolled
    @partial(jax.jit, static_argnames=("trips",))
    def unrolled(levels, coarse, b, x, trips: int):
        for _ in range(trips):
            x = _cycle(cfg, levels, coarse, b, x, 0, cfg.cycle_type)
        num = residual_numerator(levels[0].A, ctx.M, ctx.Minv_diag, b, x, 2)
        return x, jnp.max(num / den)

    for trips in (1, 15):
        out = unrolled(ctx.levels, ctx.coarse_op, b, x0, trips)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        x, res = unrolled(ctx.levels, ctx.coarse_op, b, x0, trips)
        res = jax.device_get(res)
        dt = (time.perf_counter() - t0) * 1e3
        log(f"unrolled {trips:2d} cycles (+1 residual): {dt:7.1f} ms "
            f"({dt/trips:.2f} ms/cycle) res={float(res):.2e}")


if __name__ == "__main__":
    main()
