"""Persistent XLA compilation cache.

First compiles on the (remote-attached) TPU cost 20-40 s per executable and
a bench/grid run compiles dozens; jax's persistent compilation cache keys
serialized executables by HLO hash so repeat runs (next epoch budget, next
driver round, a re-run of the same grid point) skip compilation entirely.
The reference has no analogue (torch eager pays no compile); this is a
TPU-runtime concern.

Enabled by default from the CLI (`ptranking_tpu.ltr`) and `bench.py`;
opt out with PTRANKING_COMPILE_CACHE=0, redirect with
PTRANKING_COMPILE_CACHE_DIR. Backends whose PJRT client cannot serialize
executables just log a one-line jax warning and proceed uncached — enabling
is always safe.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "ptranking_tpu", "xla")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax's compilation cache at a persistent directory.

    Returns the directory in use, or None when disabled
    (PTRANKING_COMPILE_CACHE=0) or unsupported by the jax build.
    """
    flag = os.environ.get("PTRANKING_COMPILE_CACHE", "")
    if flag == "0":
        return None
    cache_dir = path or os.environ.get("PTRANKING_COMPILE_CACHE_DIR",
                                       _DEFAULT_DIR)
    try:
        import jax

        # default: TPU backends only — CPU compiles are fast and XLA:CPU's
        # AOT loader warns per-load about host machine-feature drift.
        # PTRANKING_COMPILE_CACHE=1 forces it on anywhere.
        if flag != "1" and jax.default_backend() not in ("tpu", "axon"):
            return None
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even fast compiles: the dominant cost on a remote-attached
        # chip is the round-trip, not the compile itself
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return cache_dir
