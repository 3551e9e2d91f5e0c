"""Test harness: run everything on a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (the driver separately
dry-runs the real multi-chip path via __graft_entry__.dryrun_multichip).

Note: this image pre-imports jax via sitecustomize (axon TPU tunnel), so the
platform must be switched via jax.config, not environment variables.
"""
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # older jax: fall back to XLA_FLAGS (no-op if backend is up)
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test FILES.

    The suite compiles hundreds of XLA CPU programs in one process; the
    LLVM JIT's code memory accumulates with the live executables and
    eventually segfaults inside a later compile (observed deterministically
    at ~220 programs once the change-gated switch multiplied program
    sizes).  Shapes/configs rarely repeat across files, so per-module
    clearing costs little recompilation and keeps the serial `pytest
    tests/` run within the JIT's memory budget."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
