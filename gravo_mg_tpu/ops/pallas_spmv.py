"""Pallas TPU SpMV kernels for ELL matrices.

The solve path's hot op is ``y = A @ x`` with A in padded-row ELL form
(SURVEY.md §3.2: smoother sweeps dominate).  The baseline implementation
(`sparse.spmv`) lets XLA lower the gather; these kernels instead keep the
full ``x`` vector resident in VMEM (1M f32 = 4 MB << 16 MB) and gather
row-tile operands explicitly, which removes HBM re-reads of ``x`` and the
generic-gather lowering overhead.

Variants (selected by benchmarking, see ``bench.py --spmv-probe``):
  * ``spmv_ell_pallas``: grid over row tiles; indices/values tiles are
    streamed HBM->VMEM by the pipeline; the gather `x[idx]` runs on the
    VPU inside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse import EllMatrix


def _spmv_kernel(x_ref, idx_ref, val_ref, out_ref):
    idx = idx_ref[:]                      # (T, K) int32
    vals = val_ref[:]                     # (T, K)
    x = x_ref[:]                          # (N,) or (N, d) in VMEM
    if x.ndim == 1:
        g = jnp.take(x, idx, axis=0)      # (T, K)
        out_ref[:] = jnp.sum(vals * g, axis=1)
    else:
        g = jnp.take(x, idx, axis=0)      # (T, K, d)
        out_ref[:] = jnp.sum(vals[..., None] * g, axis=1)


@functools.partial(jax.jit, static_argnames=("tile",))
def spmv_ell_pallas(A: EllMatrix, x: jnp.ndarray, tile: int = 2048):
    """y = A @ x with x pinned in VMEM; grid over row tiles."""
    n, k = A.indices.shape
    tile = min(tile, n)
    grid = pl.cdiv(n, tile)
    if x.ndim == 1:
        out_shape = jax.ShapeDtypeStruct((n,), x.dtype)
        out_spec = pl.BlockSpec((tile,), lambda i: (i,),
                                memory_space=pltpu.VMEM)
        x_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((n, x.shape[1]), x.dtype)
        out_spec = pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        x_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _spmv_kernel,
        out_shape=out_shape,
        grid=(grid,),
        in_specs=[
            x_spec,
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
    )(x, A.indices, A.values)
