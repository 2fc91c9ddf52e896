"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so distributed (`jax.sharding`)
paths are exercised without TPU hardware, and so the test suite never
contends with the single-client TPU tunnel.  The platform override must
happen via jax.config *after* import (the environment's TPU plugin
overrides JAX_PLATFORMS at interpreter start).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def sphere_mesh():
    """Small test sphere (2562 vertices) with operators."""
    from gravo_mg_tpu.utils.laplacian import cotan_laplacian, mass_voronoi
    from gravo_mg_tpu.utils.meshgen import icosphere
    from gravo_mg_tpu.utils.neighbors import neighbors_from_faces

    V, F = icosphere(4, bump=0.1)
    S = cotan_laplacian(V, F)
    M = mass_voronoi(V, F)
    neigh = neighbors_from_faces(F)
    return {"V": V, "F": F, "S": S, "M": M, "neigh": neigh}


@pytest.fixture(scope="session")
def medium_mesh():
    """Medium sphere (10242 vertices) for end-to-end solver tests."""
    from gravo_mg_tpu.utils.laplacian import cotan_laplacian, mass_voronoi
    from gravo_mg_tpu.utils.meshgen import icosphere
    from gravo_mg_tpu.utils.neighbors import neighbors_from_faces

    V, F = icosphere(5, bump=0.1)
    S = cotan_laplacian(V, F)
    M = mass_voronoi(V, F)
    neigh = neighbors_from_faces(F)
    return {"V": V, "F": F, "S": S, "M": M, "neigh": neigh}
