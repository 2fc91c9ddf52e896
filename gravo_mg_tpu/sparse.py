"""TPU-native sparse containers and precomputed execution plans.

Design rationale (vs the reference's Eigen CSC matrices,
`gravomg/include/gravomg/utility.h:13`): XLA requires static shapes and
TPU favors wide, regular memory access, so every sparse operator here is an
**ELL (padded-row) matrix**: `indices (N, K) int32`, `values (N, K)`, rows
padded with index 0 / value 0.  Mesh Laplacians have near-uniform row degree
(~7), making ELL ~equal to CSR in footprint while turning SpMV into a
dense gather + row reduction — the form XLA/Pallas compiles well on TPU.

Irregular, data-dependent work (deduplication, pattern discovery) happens
once on the host at setup time and is cached as integer *plans*; the per-
solve device code is pure static-shape gathers and segment-sums.  This is
the TPU-first replacement of the reference's per-solve Eigen SpGEMM
(`gravomg/src/multigrid_solver.cpp:1387-1392`).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EllMatrix:
    """Padded-row sparse matrix. ``indices``/``values`` are (N, K)."""

    indices: jnp.ndarray
    values: jnp.ndarray
    ncols: int  # static

    def tree_flatten(self):
        return (self.indices, self.values), (self.ncols,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @property
    def shape(self):
        return (self.indices.shape[0], self.ncols)

    @property
    def nnz_padded(self):
        return self.indices.shape[0] * self.indices.shape[1]

    def diagonal(self):
        """Extract the diagonal (each row's entry with col == row)."""
        n, k = self.indices.shape
        rows = jnp.arange(n, dtype=self.indices.dtype)[:, None]
        mask = self.indices == rows
        return jnp.sum(jnp.where(mask, self.values, 0), axis=1)

    def to_scipy(self) -> sp.csr_matrix:
        n, k = self.indices.shape
        rows = np.repeat(np.arange(n), k)
        cols = np.asarray(self.indices).reshape(-1)
        vals = np.asarray(self.values).reshape(-1)
        keep = vals != 0
        m = sp.coo_matrix(
            (vals[keep], (rows[keep], cols[keep])), shape=(n, self.ncols)
        )
        return m.tocsr()


def ell_from_scipy(A, dtype=jnp.float32, pad_to: int | None = None) -> EllMatrix:
    """Convert any scipy sparse matrix to ELL. Host-side, setup-time."""
    A = A.tocsr()
    A.sum_duplicates()
    n, m = A.shape
    degree = np.diff(A.indptr)
    k = int(degree.max()) if n else 1
    if pad_to is not None:
        k = max(k, pad_to)
    k = max(k, 1)
    indices = np.zeros((n, k), dtype=np.int32)
    values = np.zeros((n, k), dtype=np.float64)
    slot = np.arange(A.indices.shape[0]) - np.repeat(A.indptr[:-1], degree)
    row_ids = np.repeat(np.arange(n), degree)
    indices[row_ids, slot] = A.indices
    values[row_ids, slot] = A.data
    return EllMatrix(jnp.asarray(indices), jnp.asarray(values, dtype=dtype), m)


def spmv(A: EllMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x for x of shape (N,) or (N, d). XLA gather formulation."""
    g = jnp.take(x, A.indices, axis=0)  # (N, K) or (N, K, d)
    if x.ndim == 1:
        return jnp.sum(A.values * g, axis=1)
    return jnp.sum(A.values[..., None] * g, axis=1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Prolongation:
    """Sparse prolongation U with a fixed small row width W, rows sum to 1.

    W = 3 for the main Gravo-MG hierarchy (triangle barycentric weights);
    alternative hierarchies (SIG06 1-ring inverse-distance, ablation
    closest-n) use wider rows.

    The fixed 3-wide layout mirrors the reference's structural guarantee
    (triangle barycentric weights; `multigrid_solver.cpp:287-457`) and gives
    prolongation/restriction a fully static shape:

      prolong(e):  x += w * e[cols]           (gather)
      restrict(r): segment-sum of w * r into coarse rows (pre-sorted plan)

    ``perm``/``seg_ids`` are a host-precomputed sorted scatter plan so the
    restriction lowers to `segment_sum(..., indices_are_sorted=True)`.
    """

    cols: jnp.ndarray      # (Nf, W) int32
    weights: jnp.ndarray   # (Nf, W)
    perm: jnp.ndarray      # (Nf*W,) int32 — argsort of cols.flatten()
    seg_ids: jnp.ndarray   # (Nf*W,) int32 — cols.flatten()[perm]
    ncoarse: int           # static

    def tree_flatten(self):
        return (self.cols, self.weights, self.perm, self.seg_ids), (self.ncoarse,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0])

    @property
    def shape(self):
        return (self.cols.shape[0], self.ncoarse)

    def prolong(self, e: jnp.ndarray) -> jnp.ndarray:
        """U @ e: coarse -> fine."""
        g = jnp.take(e, self.cols, axis=0)
        if e.ndim == 1:
            return jnp.sum(self.weights * g, axis=1)
        return jnp.sum(self.weights[..., None] * g, axis=1)

    def restrict(self, r: jnp.ndarray) -> jnp.ndarray:
        """U.T @ r: fine -> coarse, via sorted segment-sum."""
        if r.ndim == 1:
            contrib = (self.weights * r[:, None]).reshape(-1)
            contrib = jnp.take(contrib, self.perm)
            return jax.ops.segment_sum(
                contrib, self.seg_ids, num_segments=self.ncoarse,
                indices_are_sorted=True,
            )
        contrib = (self.weights[..., None] * r[:, None, :]).reshape(-1, r.shape[1])
        contrib = jnp.take(contrib, self.perm, axis=0)
        return jax.ops.segment_sum(
            contrib, self.seg_ids, num_segments=self.ncoarse,
            indices_are_sorted=True,
        )

    def to_scipy(self) -> sp.csr_matrix:
        nf, w = self.cols.shape
        rows = np.repeat(np.arange(nf), w)
        m = sp.coo_matrix(
            (
                np.asarray(self.weights).reshape(-1),
                (rows, np.asarray(self.cols).reshape(-1)),
            ),
            shape=(nf, self.ncoarse),
        )
        m.sum_duplicates()
        return m.tocsr()


def make_prolongation(cols: np.ndarray, weights: np.ndarray, ncoarse: int,
                      dtype=jnp.float32) -> Prolongation:
    """Build a Prolongation + its restriction plan on the host."""
    cols = np.asarray(cols, dtype=np.int32)
    flat = cols.reshape(-1)
    perm = np.argsort(flat, kind="stable").astype(np.int32)
    seg = flat[perm].astype(np.int32)
    return Prolongation(
        jnp.asarray(cols),
        jnp.asarray(np.asarray(weights), dtype=dtype),
        jnp.asarray(perm),
        jnp.asarray(seg),
        int(ncoarse),
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class GalerkinPlan:
    """Static plan for the triple product ``Abar = U^T A U`` on device.

    Pattern discovery (which coarse (ci, cj) pairs exist) runs once on the
    host per (A-pattern, U) pair; per-solve the device only evaluates

        contrib[i,k,a,b] = w[i,a] * A[i,k] * w[j,b],  j = A.indices[i,k]

    and segment-sums the flattened contributions into the precomputed output
    slots.  ``out_ell_src`` then scatters the deduplicated nnz into the
    coarse ELL layout by gather.  Replaces the reference's per-solve Eigen
    SpGEMM chain (`multigrid_solver.cpp:1387-1392`) with static-shape TPU ops.
    """

    out_slot: jnp.ndarray     # (Nf*K*9,) int32: contribution -> output nnz id
    out_ell_src: jnp.ndarray  # (Nc, Kout) int32: nnz id or nnz_out (zero pad)
    out_ell_idx: jnp.ndarray  # (Nc, Kout) int32: coarse column indices
    nnz_out: int              # static
    ncoarse: int              # static

    def tree_flatten(self):
        return (self.out_slot, self.out_ell_src, self.out_ell_idx), (
            self.nnz_out,
            self.ncoarse,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1])

    def reduce(self, A: EllMatrix, U: Prolongation) -> EllMatrix:
        """Compute Abar = U^T A U with this plan (device-side)."""
        w = U.weights                      # (Nf, W)
        wj = jnp.take(w, A.indices, axis=0)  # (Nf, K, W)
        contrib = (
            w[:, None, :, None] * A.values[:, :, None, None] * wj[:, :, None, :]
        )  # (Nf, K, 3, 3)
        sums = jax.ops.segment_sum(
            contrib.reshape(-1),
            self.out_slot,
            num_segments=self.nnz_out + 1,
        )  # last segment collects padding
        ell_vals = jnp.take(sums, self.out_ell_src)
        return EllMatrix(self.out_ell_idx, ell_vals, self.ncoarse)


def _ell_layout_from_unique(uniq: np.ndarray, ncoarse: int, nnz_out: int):
    """Small host step: lay the deduplicated (row, col) keys out as ELL."""
    rows = (uniq // ncoarse).astype(np.int64)
    cols = (uniq % ncoarse).astype(np.int32)
    degree = np.bincount(rows, minlength=ncoarse)
    kout = max(int(degree.max()) if nnz_out else 1, 1)
    row_start = np.zeros(ncoarse + 1, dtype=np.int64)
    np.cumsum(degree, out=row_start[1:])
    slot_in_row = np.arange(nnz_out) - row_start[rows]
    out_ell_src = np.full((ncoarse, kout), nnz_out, dtype=np.int32)
    out_ell_idx = np.zeros((ncoarse, kout), dtype=np.int32)
    out_ell_src[rows, slot_in_row] = np.arange(nnz_out, dtype=np.int32)
    out_ell_idx[rows, slot_in_row] = cols
    return out_ell_src, out_ell_idx


@partial(jax.jit, static_argnames=("ncoarse",))
def _plan_keys_device(A_indices, mask, U_cols, U_mask, *, ncoarse: int):
    """Device-side key generation + sort for pattern discovery.

    The O(nnz * W^2) sort/dedup runs on the accelerator; only the
    deduplicated key list (coarse-level sized) returns to the host.
    Requires x64 (keys are int64 = ci * ncoarse + cj).
    """
    nf, k = A_indices.shape
    w = U_cols.shape[1]
    uc = U_cols.astype(jnp.int64)
    ci = jnp.broadcast_to(uc[:, None, :, None], (nf, k, w, w))
    cj = jnp.broadcast_to(uc[A_indices][:, :, None, :], (nf, k, w, w))
    keys = (ci * ncoarse + cj).reshape(-1)
    valid = (
        mask[:, :, None, None]
        & U_mask[:, None, :, None]
        & U_mask[A_indices][:, :, None, :]
    ).reshape(-1)
    big = jnp.int64(ncoarse) * jnp.int64(ncoarse) + 1
    keys = jnp.where(valid, keys, big)
    perm = jnp.argsort(keys)
    skeys = keys[perm]
    svalid = skeys != big
    is_new = svalid & jnp.concatenate(
        [jnp.ones(1, bool), skeys[1:] != skeys[:-1]]
    )
    nnz_out = jnp.sum(is_new)
    inv_sorted = jnp.cumsum(is_new) - 1
    slot_sorted = jnp.where(svalid, inv_sorted, nnz_out).astype(jnp.int32)
    out_slot = jnp.zeros_like(slot_sorted).at[perm].set(slot_sorted)
    return skeys, is_new, nnz_out, out_slot


def make_galerkin_plan(A_indices: np.ndarray, A_values_mask: np.ndarray,
                       U_cols: np.ndarray, ncoarse: int,
                       U_mask: np.ndarray | None = None) -> GalerkinPlan:
    """Pattern discovery for the Galerkin triple product.

    ``A_values_mask`` marks which ELL slots of A are real nnz (True) vs
    padding, and ``U_mask`` does the same for U's padded row slots —
    without it, U's index-0 weight-0 pads would register a structurally
    dense row/column 0 in the output.  Masked contributions are routed to
    a dump slot so they never pollute the output.  The heavy dedup sort
    runs on device when x64 is available (TPU path); a numpy fallback
    covers x64-less setups.
    """
    A_indices = np.asarray(A_indices)
    mask = np.asarray(A_values_mask, dtype=bool)
    U_cols = np.asarray(U_cols, dtype=np.int64)
    nf, k = A_indices.shape
    w = U_cols.shape[1]
    if U_mask is None:
        U_mask = np.ones((nf, w), dtype=bool)
    U_mask = np.asarray(U_mask, dtype=bool)
    # Device dedup is opt-in: the axon remote compiler currently rejects
    # the large int64 sort (HTTP 500), and the tuned numpy path below is
    # ~12s at the 1M-vertex scale.  Set GRAVO_MG_DEVICE_PLAN=1 to use it.
    import os

    if (
        os.environ.get("GRAVO_MG_DEVICE_PLAN") == "1"
        and jax.config.jax_enable_x64
        and nf * k * w * w >= 8_000_000
        and jax.default_backend() != "cpu"
    ):
        skeys, is_new, nnz_out_d, out_slot_d = _plan_keys_device(
            jnp.asarray(A_indices, jnp.int32),
            jnp.asarray(mask),
            jnp.asarray(U_cols, jnp.int32),
            jnp.asarray(U_mask),
            ncoarse=ncoarse,
        )
        nnz_out = int(nnz_out_d)
        uniq = np.asarray(skeys[jnp.nonzero(is_new, size=nnz_out)[0]])
        out_slot = out_slot_d
    else:
        ci = np.broadcast_to(U_cols[:, None, :, None], (nf, k, w, w))
        cj = np.broadcast_to(U_cols[A_indices][:, :, None, :], (nf, k, w, w))
        keys = np.ascontiguousarray((ci * ncoarse + cj).reshape(-1))
        valid = (
            mask[:, :, None, None]
            & U_mask[:, None, :, None]
            & U_mask[A_indices][:, :, None, :]
        ).reshape(-1)
        big = np.int64(ncoarse) * np.int64(ncoarse) + 1
        keys[~valid] = big
        from .native import galerkin_dedup

        native = galerkin_dedup(keys, int(big))
        if native is not None:
            # OpenMP bucket-sort dedup (native/gravomg_native.cpp).
            out_slot_np, uniq, nnz_out = native
        else:
            # Manual sort-based dedup: ~5x faster than np.unique(...,
            # return_inverse=True) at the 66M-key scale (introsort argsort
            # + cumsum instead of a stable mergesort).
            order = np.argsort(keys)
            skeys = keys[order]
            svalid = skeys != big
            is_new = svalid.copy()
            is_new[1:] &= skeys[1:] != skeys[:-1]
            nnz_out = int(is_new.sum())
            inv_sorted = np.cumsum(is_new) - 1
            slot_sorted = np.where(svalid, inv_sorted, nnz_out).astype(np.int32)
            out_slot_np = np.empty_like(slot_sorted)
            out_slot_np[order] = slot_sorted
            uniq = skeys[is_new]
        out_slot = jnp.asarray(out_slot_np)
    out_ell_src, out_ell_idx = _ell_layout_from_unique(uniq, ncoarse, nnz_out)
    return GalerkinPlan(
        out_slot,
        jnp.asarray(out_ell_src),
        jnp.asarray(out_ell_idx),
        nnz_out,
        int(ncoarse),
    )


def ell_to_dense(A: EllMatrix) -> jnp.ndarray:
    """Densify a (small) ELL matrix on device — used for the coarsest level."""
    n, k = A.indices.shape
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
    dense = jnp.zeros((n, A.ncols), dtype=A.values.dtype)
    return dense.at[rows.reshape(-1), A.indices.reshape(-1)].add(
        A.values.reshape(-1)
    )
