"""gravo_mg_tpu — TPU-native geometric multigrid (Gravo MG capabilities).

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
Gravo MG ("A Fast Geometric Multigrid Method for Curved Surfaces",
SIGGRAPH 2023; reference C++ at rubenwiersma/gravo_mg): fast solvers for
sparse SPD systems on triangle meshes and point clouds via graph-Voronoi
coarsening hierarchies and smoothed multigrid cycles.

Public API parity with the reference package::

    from gravo_mg_tpu import MultigridSolver, Hierarchy, Sampling, Weighting
    solver = MultigridSolver(pos, neigh, mass)
    x = solver.solve(lhs, rhs)
"""

import os

import jax as _jax

# Persistent XLA compilation cache: hierarchy builds jit one kernel set per
# level shape; caching makes repeat runs warm-start.  Must go through
# jax.config (the env var is read before this package can set it — the
# environment's TPU plugin imports jax at interpreter start).
if not _jax.config.jax_compilation_cache_dir:
    _jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache", "gravo_mg_tpu_xla"),
    )
    # Threshold 0: through the axon relay even trivial eager ops take
    # ~0.4 s to compile (remote roundtrip), below the 0.5 s default write
    # threshold — so hundreds of small hierarchy-build ops recompiled in
    # every fresh process (hierarchy cold 88 s vs warm 23 s at 1M).
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# x64 mode: the compute path stays f32 (explicit dtypes everywhere), but the
# Galerkin chain / coarse factor run in f64 to keep near-singular systems
# (Poisson eta=1e-6) solvable — the reference is all-f64 Eigen.  Opt out
# with GRAVO_MG_TPU_NO_X64=1.
if os.environ.get("GRAVO_MG_TPU_NO_X64") != "1":
    _jax.config.update("jax_enable_x64", True)

from .enums import CycleType, Hierarchy, Sampling, Smoother, Weighting  # noqa: E402
from .core import MultigridSolver  # noqa: E402
from .sparse import EllMatrix, Prolongation, ell_from_scipy, spmv  # noqa: E402
from .hierarchy.builder import build_hierarchy  # noqa: E402
from .solver.min_quad import MinQuadWithFixedMG  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "MultigridSolver",
    "Hierarchy",
    "Sampling",
    "Weighting",
    "CycleType",
    "Smoother",
    "EllMatrix",
    "Prolongation",
    "ell_from_scipy",
    "spmv",
    "build_hierarchy",
    "MinQuadWithFixedMG",
    "__version__",
]
