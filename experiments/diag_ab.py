#!/usr/bin/env python
"""DiagEll in-loop A/B at bench scale (VERDICT r5 task 2).

Round 4 demoted DiagEll (54 vs 21 Gnnz/s standalone) to an opt-in flag
because an in-loop A/B showed a ~5x regression — measured while the
finest transfer was wrongly on the segment-sum fallback (fixed in commit
79a5e92).  This redoes the measurement cleanly, in ONE process (d2h path
init paid once, hierarchy shared):

  A: default layouts (ShuffleEll at every level)   — warm fused solves
  B: GRAVO_MG_DIAG_LEVELS=1 (DiagEll at the finest) — warm fused solves

Reports per-cycle cost for both and the full setup breakdowns.

Usage: python experiments/diag_ab.py [--nu 1024] [--reps 3]
"""

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nu", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tol", type=float, default=1e-4)
    args = ap.parse_args()

    import jax
    import numpy as np

    from gravo_mg_tpu import MultigridSolver

    # Synchronous backend init: otherwise it runs on the d2h-warm thread
    # concurrently with hierarchy/setup and pollutes their host timings
    # (2 host cores).
    t0 = time.perf_counter()
    log(f"devices: {jax.devices()} (init {time.perf_counter()-t0:.1f}s)")
    from gravo_mg_tpu.sparse import DiagEll
    from gravo_mg_tpu.utils.laplacian import cotan_laplacian, mass_barycentric
    from gravo_mg_tpu.utils.meshgen import torus_mesh
    from gravo_mg_tpu.utils.neighbors import neighbors_from_faces

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

    results = {}
    for label, env in (("shuffle", None), ("diag", "1")):
        if env is None:
            os.environ.pop("GRAVO_MG_DIAG_LEVELS", None)
        else:
            os.environ["GRAVO_MG_DIAG_LEVELS"] = env
        solver._contexts.clear()
        t0 = time.perf_counter()
        ctx = solver._context(lhs)
        log(f"[{label}] setup {time.perf_counter()-t0:.2f}s; level layouts: "
            + " ".join(type(l.A).__name__ for l in ctx.levels))
        for key in sorted(k for k in ctx.timing if k.startswith("setup_")):
            log(f"  {key:<22s} {ctx.timing[key]:8.0f} ms")
        if label == "diag" and not any(
            isinstance(l.A, DiagEll) for l in ctx.levels
        ):
            log("[diag] WARNING: no level picked DiagEll (padding gate?)")
        best = float("inf")
        for i in range(args.reps + 1):
            x, iters, res, _ = ctx.solve(
                rhs, tol=args.tol, criteria=2, max_iter=100, mode="fused"
            )
            cyc = ctx.timing["cycles"] / 1e3
            cw = ctx.timing.pop("compile_wait", 0)
            log(f"[{label}] solve {i}: cycles {cyc:.4f}s iters={iters} "
                f"res={res:.2e} compile_wait={cw:.0f}ms")
            if i > 0:
                best = min(best, cyc)
        results[label] = (best, iters)
        log(f"[{label}] best warm: {best:.4f}s "
            f"({best/iters*1e3:.1f} ms/cycle)")

    a, b = results["shuffle"][0], results["diag"][0]
    log(f"A/B: shuffle {a:.4f}s vs diag {b:.4f}s -> "
        f"diag is {a/b:.2f}x {'FASTER' if b < a else 'slower'}")
    print(f'{{"shuffle_s": {a:.4f}, "diag_s": {b:.4f}}}')


if __name__ == "__main__":
    main()
