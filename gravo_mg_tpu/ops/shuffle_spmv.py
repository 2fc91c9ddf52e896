"""Lane-shuffle FMA kernel — the device half of shuffle-ELL SpMV.

Motivation (measured on TPU v5e through the axon relay): XLA lowers the
generic ELL gather ``x[idx]`` to a scalar-unit path — 54 ms for 7.3M
gathers at 1M vertices, ~350x off the HBM roofline, which made the
smoother sweep the entire solve cost (SURVEY.md §3.2's hot loop).  The
only *vectorized* dynamic gather Mosaic lowers is the per-row 128-lane
shuffle ``jnp.take_along_axis(z, r, axis=-1)`` on same-shape 2D arrays
(`tpu.dynamic_gather`; see jax/_src/pallas/mosaic/lowering.py, gather
rule).  Shuffle-ELL (see ``sparse.ShuffleEll``) restructures any sparse
matrix so its whole SpMV decomposes into

  phase 1 (plain XLA): row gather  z[k, s, :] = xb[q[k, s], :]
           — slice-sized gathers ((1, 128) rows) DO hit XLA's fast path;
  phase 2 (this kernel): y[s, l] = sum_k v[k,s,l] * z[k, s, r[k,s,l]]
           — dynamic_gather + FMA, streaming z/r/v at HBM bandwidth.

Measured: 1M rows, 12 slots -> <=0.5 ms/apply vs 54 ms for the XLA
gather formulation (~110x).

The kernel accumulates over k in chunks so VMEM holds one (KC, T, 128)
block of each operand; the output tile is revisited across the k-grid
dimension (k innermost) and stays resident.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_KC = 4      # k-slots per grid step (ShuffleEll pads KP to a multiple)
_TILE = 512  # output row-groups (of 128 lanes) per grid step


def _use_pallas() -> bool:
    return jax.default_backend() != "cpu"


_LANE_GATHER_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(),
    collapsed_slice_dims=(1,),
    start_index_map=(1,),
    operand_batching_dims=(0,),
    start_indices_batching_dims=(0,),
)


def _lane_gather(z, r):
    """out[t, l] = z[t, r[t, l]] — the exact lax.gather form Mosaic lowers
    to `tpu.dynamic_gather` (lowering.py _gather_lowering_rule).  Built
    directly (not jnp.take_along_axis) so indices stay int32: the package
    runs with x64 enabled and jnp would promote them to int64, which
    Mosaic rejects."""
    return jax.lax.gather(
        z, r[..., None], _LANE_GATHER_DNUMS, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _kernel(z_ref, r_ref, v_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = o_ref[:]
    for k in range(_KC):
        r = r_ref[k]
        if r.dtype != jnp.int32:
            # r streams from HBM as int8 (4x less index traffic) and is
            # widened in-register for tpu.dynamic_gather.
            r = r.astype(jnp.int32)
        g = _lane_gather(z_ref[k], r)
        acc = acc + v_ref[k] * g
    o_ref[:] = acc


def _lane_shuffle_fma_xla(z, r, v):
    g = jnp.take_along_axis(z, r.astype(jnp.int32), axis=2)
    return jnp.sum(v * g, axis=0)


@jax.jit
def lane_shuffle_fma(z: jnp.ndarray, r: jnp.ndarray, v: jnp.ndarray):
    """y[s, l] = sum_k v[k, s, l] * z[k, s, r[k, s, l]].

    z/r/v: (KP, S, 128) with KP a multiple of 4; returns (S, 128).
    Pallas on TPU (f32); plain-XLA take_along_axis elsewhere (CPU tests,
    f64 precise paths).
    """
    kp, s, _ = z.shape
    if not _use_pallas() or v.dtype != jnp.float32 or kp % _KC:
        return _lane_shuffle_fma_xla(z, r, v)
    tile = min(_TILE, max(8, s))
    grid = (pl.cdiv(s, tile), kp // _KC)
    # Index maps return explicit int32 components: the package enables
    # x64 globally, under which python-int literals in index maps trace
    # to i64 and Mosaic fails to legalize the index function (empirically:
    # "failed to legalize operation 'func.return' (i32, i64)").
    import numpy as np

    _i32 = lambda a: jax.lax.convert_element_type(a, jnp.int32)  # noqa: E731
    zero = np.int32(0)  # numpy scalar: typed int32, not a captured tracer
    blk = pl.BlockSpec((_KC, tile, 128),
                       lambda i, k: (_i32(k), _i32(i), zero),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((s, 128), v.dtype),
        grid=grid,
        in_specs=[blk, blk, blk],
        out_specs=pl.BlockSpec((tile, 128), lambda i, k: (_i32(i), zero),
                               memory_space=pltpu.VMEM),
    )(z, r, v)
