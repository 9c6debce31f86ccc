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

# Persistent compilation cache: first full run pays compile cost once.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
