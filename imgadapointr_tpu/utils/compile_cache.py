"""Persistent XLA compilation cache — cross-process compile reuse.

Compiling the full train graph over the remote-TPU tunnel costs minutes
(the mid-size convergence-A/B graph ~13-25 min; bench's flagship ~2-5 min)
and the in-memory jit cache dies with the process. JAX's persistent
compilation cache serialises compiled executables to disk keyed by HLO
hash; measured over the axon tunnel (round 3) a second process loads a
cached executable in <1 s instead of recompiling.

Enabled by every CLI entry point (main.py, bench.py, benchmarks/*,
tools/inference.py). Controls:

- ``IMGADAPOINTR_COMPILE_CACHE=0``  — disable.
- ``IMGADAPOINTR_COMPILE_CACHE=/path`` — cache directory (default
  ``~/.cache/imgadapointr_tpu/xla``).
"""

from __future__ import annotations

import os


def enable_compile_cache() -> str | None:
    """Point JAX's persistent compilation cache at a shared directory.

    Returns the cache dir, or None when disabled. Call before the first
    ``jit`` compilation; safe to call more than once.
    """
    setting = os.environ.get("IMGADAPOINTR_COMPILE_CACHE", "")
    if setting == "0":
        return None
    path = setting or os.path.expanduser("~/.cache/imgadapointr_tpu/xla")
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # only persist compiles that are worth the disk round-trip
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
