#!/usr/bin/env python
"""Investigate the warm-slower-than-cold hierarchy build (VERDICT r3 #6).

Builds the 1M bench hierarchy three times in-process and prints the
builder's per-phase timing dict for each, plus RSS before/after.  Run on
an otherwise idle host: the effect (r2: 16.6 vs 35.5 s, r3: 3.3 vs 4.1 s)
is host-side; phase attribution decides between an algorithmic cause
(one phase inflates) and an allocator/page-cache cause (uniform).
"""

import pathlib
import resource
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from gravo_mg_tpu import MultigridSolver
    from gravo_mg_tpu.utils.laplacian import mass_barycentric
    from gravo_mg_tpu.utils.meshgen import torus_mesh
    from gravo_mg_tpu.utils.neighbors import neighbors_from_faces

    V, F = torus_mesh(1024, 1024)
    M = mass_barycentric(V, F)
    neigh = neighbors_from_faces(F)

    keep = []
    for i in range(3):
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        t0 = time.perf_counter()
        s = MultigridSolver(V, neigh, M, lower_bound=1000)
        dt = time.perf_counter() - t0
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        t = s.hierarchy.timing
        phases = {
            k: round(v, 2) for k, v in t.items()
            if k in ("sampling", "cluster", "next_neighborhood",
                     "next_positions", "triangle_selection")
        }
        builder_s = t.get("hierarchy", 0.0) / 1000.0
        log(f"build {i}: ctor {dt:.2f}s builder {builder_s:.2f}s "
            f"(untracked in builder: {builder_s - sum(phases.values()):.2f}s, "
            f"ctor-minus-builder: {dt - builder_s:.2f}s) "
            f"rss {rss0}->{rss1} MB  {phases}")
        keep.append(s)  # keep alive like bench.py does


if __name__ == "__main__":
    main()
