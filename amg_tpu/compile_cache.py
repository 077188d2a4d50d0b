"""Persistent XLA compile cache, keyed by a host fingerprint.

JAX's persistent compilation cache does not key entries by the *host* CPU's
feature set; an entry AOT-compiled on one machine silently fails to load on
another ("Target machine feature ... is not supported on the host machine"),
after which XLA recompiles from scratch on EVERY run — the stale entry is
never replaced.  A cache produced on a previous build host turned warm test
runs into hour-long compile storms here, so the cache directory name carries
a fingerprint of (machine arch, CPU flags, jax version): a foreign cache is
simply a different directory.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    parts = [platform.machine()]
    try:
        import jax

        parts.append(jax.__version__)
    except Exception:  # pragma: no cover
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(line.strip())
                    break
    except OSError:  # pragma: no cover - non-Linux
        parts.append(platform.processor())
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def cache_dir() -> str:
    base = os.environ.get("AMG_JAX_CACHE_BASE", "/tmp/amg_tpu_jax_cache")
    return f"{base}_{_host_fingerprint()}"


def enable(min_compile_secs: float = 0.5) -> str:
    """Point JAX's persistent compile cache at the fingerprinted dir."""
    import jax

    d = cache_dir()
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return d
