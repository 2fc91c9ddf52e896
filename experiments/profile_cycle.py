#!/usr/bin/env python
"""Per-phase TPU profile of the fused V-cycle and shuffle SpMV.

VERDICT r3 weakness #1 asked for a committed per-phase breakdown of the
warm fused solve.  This script times, on the real TPU:

  * shuffle-SpMV phase 1 (XLA row gather) and phase 2 (pallas lane FMA)
    separately, plus the combined apply, at the finest level;
  * one Chebyshev pre-smooth, one residual+restrict, one prolong+post,
    per level;
  * the coarse inverse-matmul solve;
  * one full cycle_step and the amortized per-cycle cost of fused_solve.

Usage:  python experiments/profile_cycle.py [--nu 1024 --nv 1024]
(One TPU process at a time — see CLAUDE.md.)
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=30, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nu", type=int, default=1024)
    ap.add_argument("--nv", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gravo_mg_tpu import MultigridSolver
    from gravo_mg_tpu.solver.multigrid import _coarse_solve, _smooth, cycle_step
    from gravo_mg_tpu.sparse import spmv
    from gravo_mg_tpu.utils.laplacian import cotan_laplacian, mass_barycentric
    from gravo_mg_tpu.utils.meshgen import torus_mesh
    from gravo_mg_tpu.utils.neighbors import neighbors_from_faces

    log(f"devices: {jax.devices()}")
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
    log(f"dof: {solver.hierarchy.dof}")
    cfg = ctx.cfg

    # --- per-level SpMV ------------------------------------------------
    for k, lvl in enumerate(ctx.levels):
        A = lvl.A
        x = jnp.asarray(rng.standard_normal(A.shape[0]), jnp.float32)
        kp, s = A.v.shape[0], A.v.shape[1]
        full = jax.jit(lambda a, v: spmv(a, v))
        tf = timeit(full, A, x)
        nnzk = int((np.asarray(A.v) != 0).sum())
        log(
            f"L{k}: n={A.shape[0]:>8} kp={kp:>2} S={s:>5} nnz={nnzk:>8} | "
            f"full {tf:7.3f} ms  ({nnzk / tf / 1e6:.2f} Gnnz/s)"
        )

    # --- per-level cycle pieces ----------------------------------------
    bases = []
    for k, lvl in enumerate(ctx.levels):
        b = jnp.asarray(rng.standard_normal(lvl.A.shape[0]), jnp.float32)
        x = jnp.zeros_like(b)
        sm = jax.jit(
            lambda ops, b, x: _smooth(cfg, ops, b, x, cfg.pre_iters)
        )
        rr = jax.jit(
            lambda ops, b, x: ops.U.restrict(b - spmv(ops.A, x))
        )
        pr = jax.jit(
            lambda ops, x, e: x + ops.U.prolong(e)
        )
        e = jnp.zeros((lvl.U.ncoarse,), jnp.float32)
        ts = timeit(sm, lvl, b, x)
        tr = timeit(rr, lvl, b, x)
        tp = timeit(pr, lvl, x, e)
        bases.append(2 * ts + tr + tp)
        log(
            f"L{k}: smooth(pre{cfg.pre_iters}) {ts:7.3f} ms  "
            f"resid+restrict {tr:7.3f} ms  prolong {tp:7.3f} ms"
        )

    rc = jnp.asarray(
        rng.standard_normal(ctx.coarse_op[0].shape[0]), jnp.float32
    )
    cs = jax.jit(
        lambda c, rc: _coarse_solve(c, rc, cfg.coarse_null_project)
    )
    tc = timeit(cs, ctx.coarse_op, rc)
    log(f"coarse inverse-matmul solve: {tc:.3f} ms")
    log(f"sum of parts (cycle): {sum(bases) + tc:.2f} ms")

    # --- one cycle_step and fused per-cycle ----------------------------
    b = jnp.asarray(rhs, jnp.float32)
    x = jnp.zeros_like(b)
    tcy = timeit(
        lambda b, x: cycle_step(cfg, ctx.levels, ctx.coarse_op, b, x), b, x,
        reps=10,
    )
    log(f"cycle_step: {tcy:.2f} ms")

    from gravo_mg_tpu.solver.residual import residual_numerator

    A0 = ctx.levels[0].A
    num = jax.jit(
        lambda b, x: residual_numerator(A0, ctx.M, ctx.Minv_diag, b, x, 2)
    )
    tres = timeit(num, b, x)
    log(f"criteria-2 residual numerator: {tres:.3f} ms")

    ctx.solve(rhs, tol=1e-4, criteria=2, max_iter=100, mode="fused")
    t0 = time.perf_counter()
    _, iters, _, _ = ctx.solve(
        rhs, tol=1e-4, criteria=2, max_iter=100, mode="fused"
    )
    tw = time.perf_counter() - t0
    log(
        f"fused warm: {tw*1e3:.1f} ms / {iters} cycles = "
        f"{tw*1e3/max(iters,1):.2f} ms/cycle+residual "
        f"(vs parts {sum(bases)+tc+tres:.2f} ms)"
    )


if __name__ == "__main__":
    main()
