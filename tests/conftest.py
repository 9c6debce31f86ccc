"""Test bootstrap: force an 8-device virtual CPU mesh before JAX imports.

Real runs target TPU; tests exercise the identical sharded code paths on
8 virtual CPU devices (the driver separately dry-run-compiles multi-chip
via __graft_entry__.dryrun_multichip).
"""
import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (remote TPU)
# and sitecustomize imports jax at interpreter startup, so the env var is
# already captured — override the live config instead (below, after the
# XLA flag so the 8 virtual CPU devices materialize).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
# NOTE: the on-disk persistent compilation cache is intentionally OFF.
# jaxlib's executable (de)serializer segfaults on some of this suite's
# large 8-device sharded modules (observed in both the read and write
# paths, fresh cache, ample disk/RAM).  Within one pytest process the
# in-memory jit cache already deduplicates compiles, so the persistent
# cache only ever helped across runs — not worth a crashing test suite.


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Free compiled executables after each test module.  The suite
    compiles hundreds of large programs (unrolled bitslice circuits,
    interpret-mode Pallas kernels, 8-device sharded modules); letting
    them all stay live corrupts jaxlib eventually — three distinct
    late-suite segfaults observed (cache read, cache write, and plain
    backend_compile) that never reproduce on module subsets.  Modules
    are compilation-disjoint, so this costs little."""
    yield
    jax.clear_caches()
