"""Backend path warming: hide one-time transfer/compile latencies.

On directly-attached TPUs both costs below are sub-second; through a
relay-tunneled device (this container's axon setup) they are the two
dominant contributors to time-to-first-solution and BOTH are one-time,
per-process, and overlappable with host-side setup work:

* **first device->host transfer** — the runtime initializes its d2h
  stream lazily on the first fetch; measured 60-900 s (high variance)
  through the relay tunnel, ~30 ms for every fetch after.  A solve's
  result/residual fetch should never be the first d2h of the process.
* **first compile of the fused solve program** — seconds with a warm
  persistent cache (jit_fused_solve entries in
  ``jax_compilation_cache_dir``), minutes fresh through the relay.

``warm_d2h_async()`` pays the first cost on a daemon thread the moment a
solver is constructed; ``MultigridSolveContext.prepare_async`` pays the
second concurrently with value reduction/upload.  Both are no-ops on CPU
backends (tests) and are opt-out via ``GRAVO_MG_NO_WARMUP=1``.

The reference has no analog — its solver is in-process C++
(multigrid_solver.cpp:1279) with no device runtime to initialize.
"""

from __future__ import annotations

import os
import threading
import time

_lock = threading.Lock()
_d2h_thread: threading.Thread | None = None
_d2h_stats: dict = {}


def _enabled() -> bool:
    """True when warming/precompile applies.  NOTE: calling
    ``jax.default_backend()`` initializes the backend — through the relay
    that dial can itself take a minute, so only call this off the main
    thread (prepare_async runs on contexts that already initialized the
    device; warm_d2h_async defers the check to its worker)."""
    if os.environ.get("GRAVO_MG_NO_WARMUP") == "1":
        return False
    if os.environ.get("GRAVO_MG_FORCE_WARMUP") == "1":
        return True  # tests: exercise warm/prepare paths on CPU
    import jax

    return jax.default_backend() != "cpu"


def warm_d2h_async() -> threading.Thread | None:
    """Start (once per process) a daemon thread that triggers the
    backend's device->host transfer-path initialization with a scalar
    fetch.  Returns the thread (alive or finished), or None on opt-out.
    The backend check runs on the worker (backend init itself can be slow
    through a relay and must not block the caller).  Idempotent and
    thread-safe; exceptions are swallowed (the real fetch later will
    surface them)."""
    global _d2h_thread
    with _lock:
        if _d2h_thread is not None:
            return _d2h_thread
        if os.environ.get("GRAVO_MG_NO_WARMUP") == "1":
            return None

        def _work():
            if not _enabled():
                return
            import jax
            import jax.numpy as jnp

            t0 = time.perf_counter()
            try:
                jax.device_get(jnp.zeros((8, 128), jnp.float32).sum())
                _d2h_stats["d2h_init_s"] = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001
                _d2h_stats["d2h_init_error"] = repr(e)

        t = threading.Thread(target=_work, daemon=True, name="gravo-d2h-warm")
        t.start()
        _d2h_thread = t
        return t


def wait_d2h(timeout: float | None = None) -> dict:
    """Join the d2h warm thread (if any) and return its stats dict:
    ``{"d2h_init_s": ..., "d2h_wait_s": ...}`` — total init cost and how
    long THIS call actually blocked (0 if it already finished)."""
    t = _d2h_thread
    out = dict(_d2h_stats)
    if t is None:
        return out
    t0 = time.perf_counter()
    t.join(timeout)
    out = dict(_d2h_stats)
    out["d2h_wait_s"] = time.perf_counter() - t0
    return out
