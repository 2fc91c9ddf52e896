"""Graph-Voronoi clustering: native multi-source Dijkstra + BF fallback.

The reference's ``constructDijkstraWithCluster``
(gravomg/src/multigrid_solver.cpp:1015-1056) labels every fine vertex with
its nearest coarse sample.  Two engines:

* **native Dijkstra** (default): exact priority-queue multi-source Dijkstra
  in C++ (native/gravomg_native.cpp `dijkstra_cluster`).  Clustering is a
  once-per-build host plan step; a heap sweep (~1 s at 1M vertices / 7M
  edges) beats device relaxation rounds dispatched through the TPU relay.
* **Bellman-Ford label propagation** (fallback / opt-in): every vertex
  repeatedly takes the minimum of ``D[j] + d(i, j)`` over its neighbors and
  adopts the label of the argmin; converges to the exact multi-source
  shortest path in O(cluster hop-radius) jittable rounds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_rounds",))
def _bellman_ford(D0, label0, neigh, dist, max_rounds=64):
    def cond(carry):
        _, _, changed, it = carry
        return changed & (it < max_rounds)

    def body(carry):
        D, label, _, it = carry
        safe_nb = jnp.maximum(neigh, 0)
        cand = jnp.where(neigh >= 0, D[safe_nb] + dist, jnp.inf)  # (N, K)
        best = jnp.argmin(cand, axis=1)
        bestD = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
        improved = bestD < D
        nb_label = jnp.take_along_axis(safe_nb, best[:, None], axis=1)[:, 0]
        newD = jnp.where(improved, bestD, D)
        newL = jnp.where(improved, label[nb_label], label)
        return (newD, newL, jnp.any(improved), it + 1)

    D, label, _, rounds = jax.lax.while_loop(
        cond, body, (D0, label0, jnp.bool_(True), jnp.int32(0))
    )
    return D, label, rounds


def cluster_labels(
    pos: np.ndarray,
    samples: np.ndarray,
    neigh: np.ndarray,
    max_rounds: int = 256,
    dist: np.ndarray | None = None,
):
    """Label every vertex with its nearest sample (graph distance).

    Returns ``(labels, D)`` where labels[i] in [0, len(samples)) and D is
    the graph distance to the owning sample.  Matches the contract of the
    reference's ``nearestSource``/``D`` outputs.  Init vectors and edge
    lengths are built host-side (numpy) — eager jnp glue would pay a
    per-level compile cascade through the TPU relay.
    """
    from .sampling import edge_lengths_np

    n = pos.shape[0]
    if dist is None:
        dist = edge_lengths_np(np.asarray(pos, np.float64), neigh)
    from ..native import dijkstra_cluster_native

    native = dijkstra_cluster_native(neigh, dist, samples)
    if native is not None:
        label, D = native
        unreached = label < 0
        if unreached.any():
            from scipy.spatial import KDTree

            tree = KDTree(pos[samples])
            d_euc, owner = tree.query(pos[unreached])
            label[unreached] = owner
            D[unreached] = d_euc
        return label, D
    neigh_d = jnp.asarray(neigh, dtype=jnp.int32)
    dist = jnp.asarray(dist, dtype=jnp.float32)

    D0_np = np.full(n, np.inf, dtype=np.float32)
    D0_np[samples] = 0.0
    label0_np = np.zeros(n, dtype=np.int32)
    label0_np[samples] = np.arange(len(samples), dtype=np.int32)
    D, label, _ = _bellman_ford(
        jnp.asarray(D0_np), jnp.asarray(label0_np), neigh_d, dist,
        max_rounds=max_rounds,
    )
    D = np.asarray(D)
    label = np.asarray(label)
    unreached = ~np.isfinite(D)
    if unreached.any():
        # Disconnected leftovers: assign by Euclidean nearest sample.
        from scipy.spatial import KDTree

        tree = KDTree(pos[samples])
        d_euc, owner = tree.query(pos[unreached])
        label[unreached] = owner
        D[unreached] = d_euc
    return label, D
