#!/usr/bin/env python
"""Quantify layout padding / upload volume with vs without Morton
reordering — pure host (no device), CPU-safe.

For the 1M torus Poisson problem, builds the hierarchy + Galerkin chain
in (a) the generator's raster order and (b) Morton order, then reports
per-operator layout stats: kp, padded element count, device bytes
(v + r + q), for every level operator (diag + shuffle) and transfer
(U / U^T shuffle).  This decides VERDICT-r5's upload-volume attack.

Usage: python experiments/morton_probe.py [--nu 512]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def layout_stats(tag, lhs, mass, pos, neigh):
    from gravo_mg_tpu.hierarchy.builder import build_hierarchy
    from gravo_mg_tpu.solver.multigrid import (
        _ell_pattern,
        galerkin_chain_scipy,
    )
    from gravo_mg_tpu.sparse import _diag_layout, _shuffle_layout

    t0 = time.perf_counter()
    hier = build_hierarchy(pos, neigh, lower_bound=1000)
    log(f"[{tag}] hierarchy {time.perf_counter()-t0:.1f}s dof={hier.dof}")
    U_csr = [lvl.U.to_scipy() for lvl in hier.levels]
    chain = galerkin_chain_scipy(lhs, U_csr)
    total = 0

    def shuf_bytes(A, name):
        nonlocal total
        A = A.tocoo()
        A.sum_duplicates()
        kp, s, q, _pos = _shuffle_layout(
            np.asarray(A.row, np.int64), np.asarray(A.col, np.int64),
            A.shape[0], A.shape[1],
        )
        b = kp * s * 128 * (4 + 1) + kp * s * 4
        total += b
        log(f"[{tag}]   {name:<12s} shuffle kp={kp:4d} "
            f"pad={kp*s*128/max(A.nnz,1):5.1f}x  {b/1e6:7.1f} MB")
        return kp

    for k, A in enumerate(chain[:-1]):
        Ac = A.tocoo()
        n = A.shape[0]
        if n >= 4096 * 128:
            kp, s_pad, tg, _st, _p = _diag_layout(
                np.asarray(Ac.row, np.int64), np.asarray(Ac.col, np.int64),
                n, A.shape[1],
            )
            b = kp * s_pad * 128 * 5 + 4 * (s_pad // tg) * kp
            total += b
            log(f"[{tag}]   A{k:<11d} diag    kp={kp:4d} "
                f"pad={kp*s_pad*128/A.nnz:5.1f}x  {b/1e6:7.1f} MB")
        else:
            shuf_bytes(A, f"A{k}")
    for k, U in enumerate(U_csr):
        shuf_bytes(U, f"U{k}")
        shuf_bytes(U.T.tocsr(), f"UT{k}")
    log(f"[{tag}] TOTAL device operand bytes: {total/1e6:.1f} MB")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nu", type=int, default=1024)
    args = ap.parse_args()

    from gravo_mg_tpu.utils.laplacian import cotan_laplacian, mass_barycentric
    from gravo_mg_tpu.utils.meshgen import torus_mesh
    from gravo_mg_tpu.utils.morton import morton_order, relabel_neighbors
    from gravo_mg_tpu.utils.neighbors import neighbors_from_faces

    V, F = torus_mesh(args.nu, args.nu)
    S = cotan_laplacian(V, F)
    M = mass_barycentric(V, F)
    neigh = neighbors_from_faces(F)
    lhs = (1e-6 * M + S).tocsr()

    b0 = layout_stats("raster", lhs, M, V, neigh)

    t0 = time.perf_counter()
    perm = morton_order(V)
    V2 = V[perm]
    neigh2 = relabel_neighbors(neigh, perm)
    lhs2 = lhs[perm][:, perm].tocsr()
    log(f"[morton] permute cost {time.perf_counter()-t0:.2f}s")
    b1 = layout_stats("morton", lhs2, M, V2, neigh2)

    log(f"RATIO raster/morton = {b0/b1:.2f}x")
    print(f'{{"raster_mb": {b0/1e6:.1f}, "morton_mb": {b1/1e6:.1f}}}')


if __name__ == "__main__":
    main()
