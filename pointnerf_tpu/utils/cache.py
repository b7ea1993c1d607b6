"""Persistent XLA compile-cache location, keyed by the host CPU.

XLA:CPU AOT cache entries record the compile machine's CPU features and
SIGILL when loaded on a host without them (observed as random segfaults in
``backend_compile_and_load`` mid-test-suite after /tmp survived a host
migration — the ``cpu_aot_loader`` "machine type ... doesn't match" error
is the tell). Keying the cache directory by a hash of /proc/cpuinfo flags
makes a migrated session start a fresh cache instead of loading poison;
TPU entries recompile once per migration (remote compiles are cached
server-side too, so the cost is bounded).

Import-light on purpose: conftest.py must call this before jax loads.
"""

from __future__ import annotations

import hashlib
import os


def compile_cache_dir() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((line for line in f if line.startswith("flags")), "")
    except OSError:
        flags = ""
    h = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return f"/tmp/jax_cache_{h}"


def enable_persistent_cache() -> str:
    """setdefault JAX_COMPILATION_CACHE_DIR to the host-keyed dir."""
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", compile_cache_dir())
    return os.environ["JAX_COMPILATION_CACHE_DIR"]
