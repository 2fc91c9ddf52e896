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
    from gravo_mg_tpu.utils.warmup import wait_d2h, warm_d2h_async

    t_start = time.perf_counter()
    log(f"devices: {jax.devices()} "
        f"(backend init {time.perf_counter()-t_start:.1f}s)")
    # Host-speed calibration: this container's CPU shows 2-7x run-to-run
    # variance on identical work (hypervisor steal bursts; measured
    # 1.22/2.29/0.33 s for the same 2e7 sort back-to-back).  The best-of-3
    # time for a fixed reference op is reported so host-phase numbers
    # (hierarchy, setup) can be read against it across rounds; ~0.33 s
    # is an unloaded host.
    _ca = np.random.default_rng(0).standard_normal(int(2e7))
    host_cal = min(
        (lambda t0: (np.sort(_ca), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    )
    del _ca
    log(f"host calibration (2e7 sort, best of 3): {host_cal:.2f}s")
    # One-time relay d2h path init (60-900 s through the tunnel, measured;
    # sub-second on directly-attached TPUs) — start paying it NOW on a
    # daemon thread so it overlaps the whole host-side pipeline below.
    warm_d2h_async()
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

    # Hierarchy build (cold incl. jit; a warm rebuild runs AFTER the
    # solves for the steady-state number).
    t0 = time.perf_counter()
    solver = MultigridSolver(V, neigh, M, lower_bound=1000)
    hier_cold = time.perf_counter() - t0
    log(f"hierarchy cold: {hier_cold:.2f}s dof={solver.hierarchy.dof}")

    # Setup (plans + reduction) once; timed separately from cycles.  The
    # context kicks off the fused/traced program compiles on background
    # threads (remote XLA compile overlaps the host value fills).
    t0 = time.perf_counter()
    ctx = solver._context(lhs)
    setup_s = time.perf_counter() - t0
    log(f"solve setup (plans+reduction): {setup_s:.2f}s")
    setup_sum = 0.0
    for key in sorted(k for k in ctx.timing if k.startswith("setup_")):
        setup_sum += ctx.timing[key]
        log(f"  {key:<22s} {ctx.timing[key]:8.0f} ms")
    log(f"  [breakdown sum]        {setup_sum:8.0f} ms "
        f"({100 * setup_sum / max(setup_s * 1000, 1e-9):.0f}% of wall)")

    # First solve.  One-time latencies are reported separately from the
    # iteration work, each measured honestly:
    #   compile_wait  — residual wait for the background fused-loop
    #                   compile (started at context creation);
    #   d2h_init      — the relay's one-time d2h path init (started at
    #                   solver construction; sub-ms on attached TPUs);
    #   cycles        — the device iteration loop, stamped on scalar sync
    #                   (what the reference times in its own solve loop,
    #                   multigrid_solver.cpp:1279-1485).
    d2h = wait_d2h()
    log(f"d2h path init: {d2h.get('d2h_init_s', 0):.2f}s "
        f"(waited {d2h.get('d2h_wait_s', 0):.2f}s after setup)")
    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        x, iters, res, _ = ctx.solve(
            rhs, tol=args.tol, criteria=2, max_iter=100, mode="fused"
        )
        wall_s = time.perf_counter() - t0
        solve_s = ctx.timing["cycles"] / 1e3
        log(f"solve {label}: cycles {solve_s:.3f}s (wall {wall_s:.3f}s, "
            f"upload {ctx.timing['solve_upload']:.0f}ms, compile_wait "
            f"{ctx.timing.get('compile_wait', 0):.0f}ms) "
            f"iters={iters} res={res:.2e}")
        if label == "cold":
            first_solution_wall = time.perf_counter() - t_start
            cold_cycles_s = solve_s
            compile_wait_s = ctx.timing.get("compile_wait", 0) / 1e3
            ctx.timing.pop("compile_wait", None)
            log(f"time to first solution (mesh+ops+hierarchy+setup+compile"
                f"+solve): {first_solution_wall:.2f}s")
    true_res = ctx.residual(rhs, x, criteria=2)
    log(f"host-verified residual: {true_res:.3e}")

    # Honest convergence trace artifact: one host-stepped (traced-mode)
    # solve whose per-cycle (elapsed_ms, residual) stamps come from real
    # host clocks (the fused loop's timestamps are synthetic).
    x_t, iters_t, res_t, trace = ctx.solve(
        rhs, tol=args.tol, criteria=2, max_iter=100, mode="traced"
    )
    log(f"solve traced: cycles {ctx.timing['cycles']/1e3:.3f}s "
        f"iters={iters_t} res={res_t:.2e}")
    convergence_trace = [(round(t, 2), float(r)) for t, r in trace]

    # Warm hierarchy rebuild (steady-state build cost), with a per-phase
    # cold-vs-warm delta so any regression names its phase.  The
    # historical "warm slower than cold" anomaly (VERDICT r2-r4) is now
    # LOCALIZED: on a calibrated-quiet host (host_cal 0.26 s) the entire
    # 1.53 s -> 4.65 s gap sits in edge_lengths_np (439 ms -> 3211 ms;
    # every other phase within 1.5x) — its ~170 MB of fresh numpy temps
    # page-fault against a heap fragmented by the preceding solves'
    # host staging buffers.  An allocator effect of this 2-core
    # container, not an algorithmic regression; the phase table below
    # names it in every run.
    t0 = time.perf_counter()
    solver_w = MultigridSolver(V, neigh, M, lower_bound=1000)
    hier_warm = time.perf_counter() - t0
    log(f"hierarchy warm: {hier_warm:.2f}s")
    tc, tw = solver.hierarchy.timing, solver_w.hierarchy.timing
    phases = [k for k, v in tc.items()
              if isinstance(v, float) and k not in
              ("levels", "n_vertices", "hierarchy")]
    sum_c = sum(tc[k] for k in phases)
    sum_w = sum(tw[k] for k in phases)
    for k in phases:
        log(f"  {k:<22s} cold {tc[k]*1e3:7.0f} ms  warm {tw[k]*1e3:7.0f} ms")
    log(f"  {'[untimed remainder]':<22s} cold {hier_cold*1e3-sum_c*1e3:7.0f} ms"
        f"  warm {hier_warm*1e3-sum_w*1e3:7.0f} ms")
    del solver_w

    # Smoother SpMV throughput (nnz/s) at the finest level, measured the
    # way the solver actually runs it: a dependent chain INSIDE one jitted
    # program, synced by a scalar device_get (through the relay tunnel,
    # block_until_ready does not reliably wait and per-dispatch latency is
    # ~0.6-0.9 ms, which capped this metric at a fake ~8.4 Gnnz/s for
    # three rounds).  Two rep counts difference away the dispatch + RTT
    # constant.
    from functools import partial

    A0 = ctx.levels[0].A
    xv = jnp.asarray(rng.standard_normal(n) * 1e-3, jnp.float32)

    @partial(jax.jit, static_argnames=("reps",))
    def _chain(A, v, reps: int):
        for _ in range(reps):
            v = spmv(A, 0.2 * v)
        return v

    # Rep counts scale with problem size: at 16k rows an apply is ~10 us,
    # so the 1M-tuned (16, 176) pair differences ~1.6 ms of compute
    # against ~10 ms of relay RTT jitter and can go negative; small
    # problems need ~10x the reps for a stable difference.
    r_lo, r_hi = (16, 176) if n >= 262144 else (160, 1760)

    def _run(reps):
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            y = _chain(A0, xv, reps)
            jax.device_get(y[0:1])
            best = min(best, time.perf_counter() - t0)
        return best

    def _measure(A):
        def _runa(reps):
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                y = _chain(A, xv, reps)
                jax.device_get(y[0:1])
                best = min(best, time.perf_counter() - t0)
            return best

        _runa(r_lo), _runa(r_hi)  # compile
        s = max((_runa(r_hi) - _runa(r_lo)) / (r_hi - r_lo), 1e-9)
        a_nnz = int((np.asarray(A.v) != 0).sum())
        return s, a_nnz / s

    # Both large-operator formats on the solve matrix: whichever the
    # planner picked for the solve (DiagEll at >=512k rows) plus the
    # alternate, so the JSON always carries a diag AND a shuffle number.
    from gravo_mg_tpu.sparse import DiagEll, diag_from_scipy, shuffle_from_scipy

    if isinstance(A0, DiagEll):
        A_diag, A_shuf = A0, shuffle_from_scipy(lhs)
    else:
        A_diag, A_shuf = diag_from_scipy(lhs), A0
    spmv_s, nnz_per_s = _measure(A0)
    log(f"SpMV (solve operator, {type(A0).__name__}): "
        f"{spmv_s*1e3:.3f} ms/apply, {nnz_per_s/1e9:.2f} Gnnz/s")
    diag_s, diag_nnz_per_s = (
        (spmv_s, nnz_per_s) if A_diag is A0 else _measure(A_diag)
    )
    shuf_s, shuf_nnz_per_s = (
        (spmv_s, nnz_per_s) if A_shuf is A0 else _measure(A_shuf)
    )
    log(f"SpMV (DiagEll): {diag_s*1e3:.3f} ms/apply, "
        f"{diag_nnz_per_s/1e9:.2f} Gnnz/s; (ShuffleEll): "
        f"{shuf_s*1e3:.3f} ms/apply, {shuf_nnz_per_s/1e9:.2f} Gnnz/s")

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

    # Timing bases (ADVICE r4): ``value``/``vs_baseline`` compare the
    # device iteration loop ("cycles", scalar-sync stamped — what the
    # reference times in its own solve loop) against SuperLU's full host
    # wall; ``vs_baseline_wall`` compares the warm solve WALL (incl. rhs
    # upload + relay round trips) against the same — both bases shipped
    # so JSON consumers never mix them unknowingly.
    result = {
        "metric": f"poisson_{n//1000}k_solve_to_{args.tol:g}",
        "value": round(solve_s, 4),
        "unit": "s",
        "vs_baseline": round(direct_s / solve_s, 2) if direct_s else 1.0,
        "extra": {
            "iters": iters,
            "solve_wall_s": round(wall_s, 4),
            "vs_baseline_wall": (
                round(direct_s / wall_s, 2) if direct_s else 1.0
            ),
            "timing_basis": "value=device cycles; see vs_baseline_wall",
            "residual": float(true_res),
            "first_solution_wall_s": round(first_solution_wall, 2),
            "cold_cycles_s": round(cold_cycles_s, 3),
            "compile_wait_s": round(compile_wait_s, 2),
            "d2h_init_s": round(d2h.get("d2h_init_s", 0.0), 2),
            "hierarchy_warm_s": round(hier_warm, 3),
            "hierarchy_cold_s": round(hier_cold, 3),
            "host_cal_s": round(host_cal, 3),
            "setup_s": round(setup_s, 3),
            "spmv_gnnz_per_s": round(nnz_per_s / 1e9, 3),
            "spmv_diag_gnnz_per_s": round(diag_nnz_per_s / 1e9, 3),
            "spmv_shuffle_gnnz_per_s": round(shuf_nnz_per_s / 1e9, 3),
            "direct_s": round(direct_s, 3) if direct_s else None,
            "n_vertices": n,
            "dof": solver.hierarchy.dof,
            "convergence_traced_ms_res": convergence_trace[:20],
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
