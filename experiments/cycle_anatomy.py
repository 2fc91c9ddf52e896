#!/usr/bin/env python
"""Decompose the warm per-cycle cost of the 1M fused solve.

HBM-traffic math says a V-cycle at 1M (DiagEll L0, int8 lanes) should
cost ~1.5-3 ms; the measured fused loop runs ~12 ms/cycle.  This
experiment attributes the gap on the real TPU, dispatch-free (all
measurements are marginal costs of K-times-repeated bodies inside ONE
jitted program, differencing two K's to cancel dispatch/sync):

  * cycle-chain marginal: jit(K x cycle_step) for K in {2, 10};
  * smoother-only marginal: K x (L0 Chebyshev pre-smooth);
  * spmv-only marginal: K x (L0 A apply);
  * transfer marginal: K x (restrict then prolong at L0);
  * residual-check marginal: K x (numerator / den);
  * no-smooth cycle variant (pre=post=0) marginal.

Usage: python experiments/cycle_anatomy.py [--nu 1024]

Results (round 5, v5e):
  * hierarchy truncation A/B (--skip-marginals --lb-compare 4000):
    lower_bound=4000 (coarse 2157, MXU inverse) runs 12.2 ms/cycle vs
    11.5 for the default lower_bound=1000 (coarse 282) — truncating the
    deepest levels does NOT pay; the tiny levels are not the per-cycle
    overhead.  Default stays at reference parity (1000).
  * the full marginal decomposition needs ~6 fresh 1M chain compiles
    (minutes each through the relay); run it on directly-attached
    hardware.
"""

import argparse
import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nu", type=int, default=1024)
    ap.add_argument("--lb-compare", type=int, nargs="*", default=None,
                    help="additionally solve with these lower_bound "
                         "values (hierarchy truncation A/B)")
    ap.add_argument("--skip-marginals", action="store_true",
                    help="only run the lb A/B (each 1M chain variant "
                         "costs minutes of relay compile)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gravo_mg_tpu import MultigridSolver
    from gravo_mg_tpu.solver.multigrid import _cycle, _smooth
    from gravo_mg_tpu.solver.residual import residual_numerator
    from gravo_mg_tpu.sparse import spmv
    from gravo_mg_tpu.utils.laplacian import cotan_laplacian, mass_barycentric
    from gravo_mg_tpu.utils.meshgen import torus_mesh
    from gravo_mg_tpu.utils.neighbors import neighbors_from_faces

    t0 = time.perf_counter()
    log(f"devices: {jax.devices()} init {time.perf_counter()-t0:.1f}s")
    V, F = torus_mesh(args.nu, args.nu)
    n = V.shape[0]
    S = cotan_laplacian(V, F)
    M = mass_barycentric(V, F)
    neigh = neighbors_from_faces(F)
    lhs = (1e-6 * M + S).tocsr()
    rng = np.random.default_rng(42)
    rhs = (M @ rng.standard_normal((n, 1)))[:, 0]
    solver = MultigridSolver(V, neigh, M, lower_bound=1000)
    ctx = solver._context(lhs)
    cfg, levels, coarse = ctx.cfg, ctx.levels, ctx.coarse_op
    log(f"setup done {time.perf_counter()-t0:.1f}s; layouts: "
        + " ".join(type(l.A).__name__ for l in levels))

    b = jnp.asarray(rhs, ctx.dtype)
    x0 = jnp.zeros_like(b)

    def marginal(name, body, k_lo=2, k_hi=6, reps=5):
        # k_hi capped at 6: a 10x-unrolled 1M cycle chain exceeded the
        # relay's remote-compile request size (HTTP 413).
        """Marginal ms of one `body` application inside a jitted chain."""
        from functools import partial

        @partial(jax.jit, static_argnames=("k",))
        def chain(b, x, k: int):
            for _ in range(k):
                x = body(b, x)
            return x

        def run(k):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                y = chain(b, x0, k)
                jax.device_get(y[0:1])
                best = min(best, time.perf_counter() - t0)
            return best

        run(k_lo), run(k_hi)  # compile both
        ms = (run(k_hi) - run(k_lo)) / (k_hi - k_lo) * 1e3
        log(f"  {name:<28s} {ms:8.3f} ms")
        return ms

    def warm_solves(tag, c2):
        best, iters = float("inf"), 1
        for i in range(4):
            _, iters, res, _ = c2.solve(
                rhs, tol=1e-4, criteria=2, max_iter=100, mode="fused"
            )
            cyc = c2.timing["cycles"] / 1e3
            cw = c2.timing.pop("compile_wait", 0)
            if i:
                best = min(best, cyc)
            log(f"[{tag}] solve {i}: cycles {cyc:.4f}s iters={iters} "
                f"res={res:.2e} compile_wait={cw:.0f}ms")
        log(f"[{tag}] best warm {best:.4f}s ({best/iters*1e3:.1f} ms/cycle)")

    lvl0 = levels[0]
    if args.skip_marginals:
        warm_solves("lb=default", ctx)
        for lb in args.lb_compare or ():
            s2 = MultigridSolver(V, neigh, M, lower_bound=lb)
            c2 = s2._context(lhs)
            log(f"[lb={lb}] dof={s2.hierarchy.dof}")
            warm_solves(f"lb={lb}", c2)
        print("done")
        return
    marginal("cycle (full)",
             lambda bb, xx: _cycle(cfg, levels, coarse, bb, xx, 0,
                                   cfg.cycle_type))
    cfg_ns = dataclasses.replace(cfg, pre_iters=0, post_iters=0)
    marginal("cycle (no smoothing)",
             lambda bb, xx: _cycle(cfg_ns, levels, coarse, bb, xx, 0,
                                   cfg.cycle_type))
    marginal("L0 pre-smooth (deg4)",
             lambda bb, xx: _smooth(cfg, lvl0, bb, xx, cfg.pre_iters))
    marginal("L0 A apply", lambda bb, xx: spmv(lvl0.A, xx) + bb,
             k_lo=4, k_hi=20)
    marginal("L0 restrict+prolong",
             lambda bb, xx: xx + lvl0.U.prolong(lvl0.U.restrict(xx)),
             k_lo=4, k_hi=20)
    den = jnp.asarray(1.0, ctx.dtype)
    marginal("residual check (crit 2)",
             lambda bb, xx: xx + jnp.max(
                 residual_numerator(lvl0.A, ctx.M, ctx.Minv_diag, bb, xx, 2)
             ) * 0,
             k_lo=4, k_hi=20)
    # Sub-cycle below L0: everything from level 1 down.
    marginal("levels 1.. subcycle",
             lambda bb, xx: xx + lvl0.U.prolong(_cycle(
                 cfg, levels, coarse, lvl0.U.restrict(bb),
                 jnp.zeros((lvl0.U.ncoarse,), ctx.dtype), 1, cfg.cycle_type
             )))

    if args.lb_compare:
        # Hierarchy-truncation hypothesis: the deepest levels contribute
        # little arithmetic but many tiny kernels; replacing them with a
        # larger MXU coarse inverse may cut per-cycle overhead.
        for lb in args.lb_compare:
            s2 = MultigridSolver(V, neigh, M, lower_bound=lb)
            c2 = s2._context(lhs)
            log(f"[lb={lb}] dof={s2.hierarchy.dof}")
            best = float("inf")
            for i in range(4):
                _, iters, res, _ = c2.solve(
                    rhs, tol=1e-4, criteria=2, max_iter=100, mode="fused"
                )
                cyc = c2.timing["cycles"] / 1e3
                c2.timing.pop("compile_wait", None)
                if i:
                    best = min(best, cyc)
                log(f"[lb={lb}] solve {i}: cycles {cyc:.4f}s "
                    f"iters={iters} res={res:.2e}")
            log(f"[lb={lb}] best warm {best:.4f}s "
                f"({best/iters*1e3:.1f} ms/cycle)")
    print("done")


if __name__ == "__main__":
    main()
