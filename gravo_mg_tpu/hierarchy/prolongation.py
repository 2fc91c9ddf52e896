"""Vectorized prolongation-weight assembly.

Reference semantics (`gravomg/src/multigrid_solver.cpp:287-457`): each fine
vertex projects onto the candidate triangles of its Voronoi cell — triangles
(c, a, b) formed by the cell c and pairs of its coarse neighbors that are
themselves adjacent — taking barycentric weights from the best containing
triangle; if no triangle contains the projection it falls back to the best
"inside" edge, then to inverse-distance weights over the 3 closest coarse
points.  The result is a row of <=3 weights summing to 1.

TPU-first reformulation: instead of per-vertex loops over triangle lists,
every fine vertex tests **all** neighbor pairs of its cell at once — a
(B, Kp, 3) batched geometry kernel with masked argmin selection, where
Kp = Kc*(Kc-1)/2 static pairs.  Adjacency (the `checkVoronoi` filter,
multigrid_solver.cpp:266) is a binary search into the sorted coarse edge
key set rather than set lookups.  One deliberate deviation: the reference
accepts the *first* containing triangle in list order (`:359-365`); we take
the argmin-distance containing triangle, which is order-free and at least
as good geometrically.  Parity is defined by convergence, not bitwise U.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..enums import Weighting

_EPS = 1e-8


def _pair_tables(kc: int):
    """Static pair enumeration tables for Kc neighbor slots."""
    pi, pj = np.triu_indices(kc, k=1)
    kp = pi.shape[0]
    pair_of_slot = np.zeros((kc, max(kc - 1, 1)), dtype=np.int32)
    is_a = np.zeros((kc, max(kc - 1, 1)), dtype=bool)
    counts = np.zeros(kc, dtype=np.int64)
    for t in range(kp):
        a, b = pi[t], pj[t]
        pair_of_slot[a, counts[a]] = t
        is_a[a, counts[a]] = True
        counts[a] += 1
        pair_of_slot[b, counts[b]] = t
        is_a[b, counts[b]] = False
        counts[b] += 1
    return (
        jnp.asarray(pi.astype(np.int32)),
        jnp.asarray(pj.astype(np.int32)),
        jnp.asarray(pair_of_slot),
        jnp.asarray(is_a),
    )


def _inv_dist_weights(p, pts, valid=None):
    """Normalized inverse-distance weights (multigrid_solver.cpp:515-526)."""
    d = jnp.linalg.norm(p[:, None, :] - pts, axis=-1)
    w = 1.0 / jnp.maximum(d, _EPS)
    if valid is not None:
        w = jnp.where(valid, w, 0.0)
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), _EPS)


@partial(jax.jit, static_argnames=("check_voronoi", "nested", "weighting", "kc"))
def _weights_block(
    p, c, rowid, Q, coarse_neigh, pair_adj, sample_of_label,
    *, check_voronoi, nested, weighting, kc,
):
    """Prolongation cols/weights for one block of fine vertices."""
    B = p.shape[0]
    nc = Q.shape[0]
    pi, pj, pair_of_slot, is_a = _pair_tables(kc)

    nbr = coarse_neigh[c]                    # (B, Kc)
    valid_n = nbr >= 0
    nvalid = jnp.sum(valid_n, axis=1)
    qc = Q[c]                                # (B, 3)

    # ---- pair (candidate triangle) geometry --------------------------------
    na = nbr[:, pi]                          # (B, Kp)
    nb = nbr[:, pj]
    pair_ok = (na >= 0) & (nb >= 0)
    if check_voronoi:
        # Host-precomputed per-cell pair adjacency (which neighbor pairs of
        # cell c are themselves adjacent) — one gather per fine vertex.
        pair_ok &= pair_adj[c]
    qa = Q[jnp.maximum(na, 0)]               # (B, Kp, 3)
    qb = Q[jnp.maximum(nb, 0)]
    e1 = qa - qc[:, None, :]
    e2 = qb - qc[:, None, :]
    nrm = jnp.cross(e1, e2)
    nn = jnp.linalg.norm(nrm, axis=-1)
    pair_ok &= nn > 1e-12
    nhat = nrm / jnp.maximum(nn, 1e-30)[..., None]
    rel = p[:, None, :] - qc[:, None, :]
    dt = jnp.sum(rel * nhat, axis=-1)                   # signed plane dist
    pp = p[:, None, :] - dt[..., None] * nhat           # projected point
    dA = nn  # (e1 x e2) . nhat
    b0 = jnp.sum(jnp.cross(qb - qa, pp - qa) * nhat, axis=-1) / jnp.maximum(dA, 1e-30)
    b1 = jnp.sum(jnp.cross(qc[:, None, :] - qb, pp - qb) * nhat, axis=-1) / jnp.maximum(dA, 1e-30)
    b2 = 1.0 - b0 - b1

    hit = pair_ok & (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
    tri_dist = jnp.where(hit, jnp.abs(dt), jnp.inf)
    tbest = jnp.argmin(tri_dist, axis=1)
    tri_found = jnp.isfinite(jnp.min(tri_dist, axis=1))

    def _take(arr):
        return jnp.take_along_axis(arr, tbest[:, None], axis=1)[:, 0]

    tri_cols = jnp.stack([c, _take(na), _take(nb)], axis=1)
    tri_bary = jnp.stack([_take(b0), _take(b1), _take(b2)], axis=1)

    # ---- edge fallback ------------------------------------------------------
    # Edge (c, n) is a candidate if some valid pair contains slot n and the
    # barycentric tests of every such pair leave the edge "inside"
    # (reference insideEdge map, multigrid_solver.cpp:489-500).
    oka = (b0 >= 0) & (b1 >= 0)              # wedge test toward first member
    okb = (b0 >= 0) & (b2 >= 0)
    vp = pair_ok[:, pair_of_slot]            # (B, Kc, Kc-1)
    wedge = jnp.where(is_a, oka[:, pair_of_slot], okb[:, pair_of_slot])
    edge_cand = jnp.any(vp, axis=2)
    edge_bad = jnp.any(vp & ~wedge, axis=2)
    edge_valid = edge_cand & ~edge_bad & valid_n

    qn = Q[jnp.maximum(nbr, 0)]              # (B, Kc, 3)
    e = qn - qc[:, None, :]
    elen2 = jnp.sum(e * e, axis=-1)
    rel2 = p[:, None, :] - qc[:, None, :]    # (B, 1->Kc, 3) broadcast
    proj_t = jnp.sum(rel2 * e, axis=-1) / jnp.maximum(elen2, _EPS * _EPS)
    perp = jnp.linalg.norm(rel2 - proj_t[..., None] * e, axis=-1)
    edge_dist = jnp.where(edge_valid, perp, jnp.inf)
    ebest = jnp.argmin(edge_dist, axis=1)
    edge_found = jnp.isfinite(jnp.min(edge_dist, axis=1))
    n_edge = jnp.take_along_axis(nbr, ebest[:, None], axis=1)[:, 0]
    t_edge = jnp.clip(
        jnp.take_along_axis(proj_t, ebest[:, None], axis=1)[:, 0], 0.0, 1.0
    )

    # ---- closest-3 fallback -------------------------------------------------
    dist_s = jnp.linalg.norm(p[:, None, :] - qn, axis=-1)
    dist_s = jnp.where(valid_n, dist_s, jnp.inf)
    neg_top, top_slots = jax.lax.top_k(-dist_s, 2)
    f1 = jnp.take_along_axis(nbr, top_slots[:, 0:1], axis=1)[:, 0]
    f2 = jnp.take_along_axis(nbr, top_slots[:, 1:2], axis=1)[:, 0]
    # If a cell has exactly 2 valid neighbors the 2nd pick duplicates; keep
    # it valid by falling back to the first neighbor (weight merges).
    f1 = jnp.maximum(f1, 0)
    f2 = jnp.where(f2 >= 0, f2, f1)
    fb_cols = jnp.stack([c, f1, f2], axis=1)
    fb_pts = Q[fb_cols]
    fb_w = _inv_dist_weights(p, fb_pts)

    # ---- per-case weighting schemes ----------------------------------------
    third = jnp.full((B,), 1.0 / 3.0, dtype=p.dtype)
    if weighting == int(Weighting.BARYCENTRIC):
        tri_w = tri_bary
    elif weighting == int(Weighting.UNIFORM):
        tri_w = jnp.stack([third, third, third], axis=1)
    else:
        tri_w = _inv_dist_weights(p, Q[tri_cols])

    def two_point_weights(other_col, w2):
        cols = jnp.stack([c, jnp.maximum(other_col, 0), c], axis=1)
        if weighting == int(Weighting.UNIFORM):
            w = jnp.stack(
                [jnp.full((B,), 0.5, p.dtype), jnp.full((B,), 0.5, p.dtype),
                 jnp.zeros((B,), p.dtype)], axis=1,
            )
        elif weighting == int(Weighting.INVDIST):
            pts = Q[cols]
            valid = jnp.stack(
                [jnp.ones((B,), bool), jnp.ones((B,), bool),
                 jnp.zeros((B,), bool)], axis=1,
            )
            w = _inv_dist_weights(p, pts, valid)
        else:
            w = jnp.stack([1.0 - w2, w2, jnp.zeros((B,), p.dtype)], axis=1)
        return cols, w

    # Single-neighbor case: project onto the segment c -> first neighbor
    # (multigrid_solver.cpp:309-338).
    n0 = nbr[:, 0]
    e0 = Q[jnp.maximum(n0, 0)] - qc
    t0 = jnp.clip(
        jnp.sum((p - qc) * e0, axis=-1)
        / jnp.maximum(jnp.sum(e0 * e0, axis=-1), _EPS * _EPS),
        0.0, 1.0,
    )
    single_cols, single_w = two_point_weights(n0, t0)
    edge_cols, edge_w = two_point_weights(n_edge, t_edge)

    one_cols = jnp.stack([c, c, c], axis=1)
    one_w = jnp.stack(
        [jnp.ones((B,), p.dtype), jnp.zeros((B,), p.dtype),
         jnp.zeros((B,), p.dtype)], axis=1,
    )

    # ---- case selection (priority order mirrors the reference) -------------
    def sel(cond, a_cols, a_w, b_cols, b_w):
        cond = cond[:, None]
        return (
            jnp.where(cond, a_cols, b_cols),
            jnp.where(cond, a_w, b_w),
        )

    cols, w = sel(edge_found, edge_cols, edge_w, fb_cols, fb_w)
    cols, w = sel(tri_found, tri_cols, tri_w, cols, w)
    cols, w = sel(nvalid == 1, single_cols, single_w, cols, w)
    cols, w = sel(nvalid == 0, one_cols, one_w, cols, w)
    if nested:
        is_self = sample_of_label[c] == rowid
        cols, w = sel(is_self, one_cols, one_w, cols, w)

    live = (rowid >= 0) & (nvalid > 1)
    stats = jnp.stack(
        [
            jnp.sum(tri_found & live),
            jnp.sum(~tri_found & edge_found & live),
            jnp.sum(~tri_found & ~edge_found & live),
        ]
    )
    return cols.astype(jnp.int32), w, stats


def prolongation_weights(
    fine_pos: np.ndarray,
    labels: np.ndarray,
    coarse_pos: np.ndarray,
    coarse_neigh: np.ndarray,
    *,
    check_voronoi: bool = True,
    nested: bool = False,
    samples: np.ndarray | None = None,
    weighting: int = 0,
    block: int = 65536,
):
    """Compute (cols, weights, stats) for one hierarchy level.

    Returns host arrays: cols (N, 3) int32 into the coarse level, weights
    (N, 3) float32 with rows summing to 1, and branch statistics
    (triangles, edges, fallbacks) for verbose/debug parity.

    Engine: the OpenMP C++ kernel (native/gravomg_native.cpp
    prolongation_weights_native) when the native library is available —
    per-cell hoisted affine barycentric geometry, ~10x the 2-core batched
    jax path below, which remains as the vectorized fallback.
    """
    from ..native import prolongation_weights_cpp

    native = prolongation_weights_cpp(
        fine_pos, labels, coarse_pos, coarse_neigh,
        check_voronoi, nested, samples if nested else None, int(weighting),
    )
    if native is not None:
        return native
    n = fine_pos.shape[0]
    nc, kc = coarse_neigh.shape
    # Host-precomputed Voronoi pair adjacency: pair_adj[c, t] says whether
    # the t-th neighbor pair (slots pi[t], pj[t]) of cell c is an edge of
    # the coarse graph (the reference's `checkVoronoi` set lookup,
    # multigrid_solver.cpp:266).
    pi_np, pj_np = np.triu_indices(kc, k=1)
    kp = pi_np.shape[0]
    pair_adj_np = np.zeros((nc, kp), dtype=bool)
    if check_voronoi and kp:
        cn_np = coarse_neigh
        chunk = max(1, (1 << 26) // max(kc * kc * kc, 1))
        for s in range(0, nc, chunk):
            e = min(s + chunk, nc)
            blk = cn_np[s:e]                                # (B, Kc)
            ring = cn_np[np.maximum(blk, 0)]                # (B, Kc, Kc)
            ring = np.where((blk >= 0)[:, :, None], ring, -2)
            # adj[b, s1, s2] = cn[blk[b,s1]] contains blk[b,s2]
            adj = (ring[:, :, None, :] == blk[:, None, :, None]).any(-1)
            adj &= (blk >= 0)[:, None, :]
            pair_adj_np[s:e] = adj[:, pi_np, pj_np]

    # This is once-per-build host-side plan construction: run it on the
    # host CPU backend even when the default backend is a TPU — the batched
    # geometry is gather-heavy (scalar-unit on TPU) and each level's shapes
    # would recompile through the relay.
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    import contextlib

    dev_ctx = (
        jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    )
    with dev_ctx:
        Q = jnp.asarray(coarse_pos, dtype=jnp.float32)
        cn = jnp.asarray(coarse_neigh, dtype=jnp.int32)
        ek = jnp.asarray(pair_adj_np)
        sol = jnp.asarray(
            samples if samples is not None else np.zeros(nc, dtype=np.int32),
            dtype=jnp.int32,
        )

        out_cols = np.empty((n, 3), dtype=np.int32)
        out_w = np.empty((n, 3), dtype=np.float32)
        stats = np.zeros(3, dtype=np.int64)
        block = min(block, n)
        for start in range(0, n, block):
            end = min(start + block, n)
            bsl = slice(start, end)
            # Pad the tail block to the static block size.
            pad = block - (end - start)
            p_b = np.asarray(fine_pos[bsl], dtype=np.float32)
            c_b = np.asarray(labels[bsl], dtype=np.int32)
            r_b = np.arange(start, end, dtype=np.int32)
            if pad:
                p_b = np.concatenate([p_b, np.zeros((pad, 3), np.float32)])
                c_b = np.concatenate([c_b, np.zeros(pad, np.int32)])
                r_b = np.concatenate([r_b, np.full(pad, -1, np.int32)])
            cols_b, w_b, st_b = _weights_block(
                jnp.asarray(p_b), jnp.asarray(c_b), jnp.asarray(r_b),
                Q, cn, ek, sol,
                check_voronoi=check_voronoi, nested=nested,
                weighting=int(weighting), kc=kc,
            )
            out_cols[bsl] = np.asarray(cols_b)[: end - start]
            out_w[bsl] = np.asarray(w_b)[: end - start]
            stats += np.asarray(st_b)
    return out_cols, out_w, stats
