"""DiagEll (diagonal-run layout) correctness vs scipy.

The TPU kernel path (in-kernel slice DMA) is exercised on hardware by
bench.py / the verify drive; here the XLA reference path and the host
layout itself are validated exhaustively: random banded matrices (the
design target), fully random matrices (stress the per-tile diagonal
allocation), rectangularly-shaped S, duplicate entries, and the
pattern-plan value-regather used by update_lhs.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from gravo_mg_tpu.sparse import (
    DiagEll,
    diag_from_scipy,
    diag_plan_arrays,
    diag_spmv_1d,
    spmv,
)


def _rand_banded(n, m, bw, density, seed):
    rng = np.random.default_rng(seed)
    nnz = int(n * density)
    rows = rng.integers(0, n, nnz)
    cols = np.clip(
        rows * m // n + rng.integers(-bw, bw + 1, nnz), 0, m - 1
    )
    vals = rng.standard_normal(nnz)
    return sp.coo_matrix((vals, (rows, cols)), shape=(n, m)).tocsr()


@pytest.mark.parametrize(
    "n,m,bw,density,seed",
    [
        (1000, 1000, 30, 7, 0),
        (5000, 5000, 400, 9, 1),
        (257, 257, 256, 5, 2),       # fully dense band = any structure
        (4096, 4096, 5, 4, 3),
        (130, 130, 129, 3, 4),       # tiny, S < tg
    ],
)
def test_diag_spmv_matches_scipy(n, m, bw, density, seed):
    A = _rand_banded(n, m, bw, density, seed)
    D = diag_from_scipy(A, dtype=jnp.float64)
    x = np.random.default_rng(seed + 10).standard_normal(m)
    y = np.asarray(diag_spmv_1d(D, jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=1e-10, atol=1e-10)


def test_diag_fully_random():
    rng = np.random.default_rng(7)
    A = sp.random(3000, 3000, density=0.002, random_state=7, format="csr")
    D = diag_from_scipy(A, dtype=jnp.float64)
    x = rng.standard_normal(3000)
    np.testing.assert_allclose(
        np.asarray(diag_spmv_1d(D, jnp.asarray(x))), A @ x,
        rtol=1e-10, atol=1e-10,
    )


def test_diag_duplicates_sum():
    rows = np.array([0, 0, 0, 5, 5, 200])
    cols = np.array([3, 3, 3, 7, 7, 199])
    vals = np.array([1.0, 2.0, 4.0, 1.5, 2.5, -3.0])
    A = sp.coo_matrix((vals, (rows, cols)), shape=(256, 256))
    D = diag_from_scipy(A, dtype=jnp.float64)
    x = np.random.default_rng(0).standard_normal(256)
    np.testing.assert_allclose(
        np.asarray(diag_spmv_1d(D, jnp.asarray(x))),
        A.tocsr() @ x, rtol=1e-12, atol=1e-12,
    )


def test_diag_to_scipy_roundtrip():
    A = _rand_banded(2000, 2000, 100, 6, 11)
    D = diag_from_scipy(A, dtype=jnp.float64)
    B = D.to_scipy()
    assert (abs(A - B) > 1e-12).nnz == 0


def test_diag_plan_value_regather():
    """diag_plan_arrays + src must reproduce values laid out by
    diag_from_scipy (the update_lhs path fills values through src)."""
    A = _rand_banded(1500, 1500, 50, 6, 21).tocsr()
    A.sum_duplicates()
    A.sort_indices()
    degree = np.diff(A.indptr)
    k = int(degree.max())
    n = A.shape[0]
    idx = np.zeros((k, n), np.int32)
    vals = np.zeros((k, n))
    slot = np.arange(A.indices.shape[0]) - np.repeat(A.indptr[:-1], degree)
    rid = np.repeat(np.arange(n), degree)
    idx[slot, rid] = A.indices
    vals[slot, rid] = A.data
    mask = np.arange(k)[:, None] < degree[None, :]
    start, tg, r, src = diag_plan_arrays(idx, mask, n)
    v = np.append(vals.ravel(), 0.0)[src]
    D = DiagEll(
        jnp.asarray(start), jnp.asarray(r), jnp.asarray(v),
        tg, n, n,
    )
    x = np.random.default_rng(5).standard_normal(n)
    np.testing.assert_allclose(
        np.asarray(diag_spmv_1d(D, jnp.asarray(x))), A @ x,
        rtol=1e-10, atol=1e-10,
    )


def test_diag_multirhs_dispatch():
    A = _rand_banded(1024, 1024, 40, 5, 31)
    D = diag_from_scipy(A, dtype=jnp.float64)
    X = np.random.default_rng(6).standard_normal((1024, 3))
    np.testing.assert_allclose(
        np.asarray(spmv(D, jnp.asarray(X))), A @ X, rtol=1e-10, atol=1e-10
    )


def test_diag_pallas_kernel_interpret():
    """The actual Pallas slice-DMA kernel (double-buffered make_async_copy
    + semaphores), run in TPU interpret mode on CPU and compared against
    the XLA reference path at the kernel's production shape family
    (f32, tg=512, KP multiple of 4).  Before this test the kernel's
    correctness rested entirely on TPU bench runs (ADVICE r4)."""
    from jax.experimental.pallas import tpu as pltpu

    from gravo_mg_tpu.ops.diag_spmv import _diag_spmv_pallas, _diag_spmv_xla
    from gravo_mg_tpu.sparse import _diag_layout

    tg = 512
    n = tg * 128              # one full tile of 512 groups
    A = _rand_banded(n, n, 200, 3, 7).tocoo()
    A.sum_duplicates()
    kp, s_pad, tg2, start, pos = _diag_layout(
        np.asarray(A.row, np.int64), np.asarray(A.col, np.int64), n, n,
        tg=tg,
    )
    assert tg2 == tg and s_pad == tg and start.shape[0] == 1
    assert kp % 4 == 0
    r = np.zeros((kp * s_pad * 128,), np.int8)
    v = np.zeros((kp * s_pad * 128,), np.float64)
    r[pos] = (np.asarray(A.col, np.int64) & 127).astype(np.int8)
    v[pos] = A.data
    D = DiagEll(
        jnp.asarray(start), jnp.asarray(r.reshape(kp, s_pad, 128)),
        jnp.asarray(v.reshape(kp, s_pad, 128), dtype=jnp.float32),
        tg, n, n,
    )
    A = A.tocsr()
    x = np.random.default_rng(8).standard_normal(n).astype(np.float32)
    nb = -(-D.ncols // 128)
    xp = np.zeros(((nb + 2 * tg) * 128,), np.float32)
    xp[tg * 128: tg * 128 + n] = x
    xb_pad = jnp.asarray(xp.reshape(-1, 128))
    ref = _diag_spmv_xla(
        D.start, xb_pad[tg:-tg], D.r, D.v, tg
    )
    with pltpu.force_tpu_interpret_mode():
        out = _diag_spmv_pallas(D.start, xb_pad, D.r, D.v, tg)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
