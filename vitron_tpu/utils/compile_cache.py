"""Persistent XLA compilation cache for the serving/CLI entry points.

The server compiles many large programs (chunked 7B decode, the
diffusion pipelines' one-program generates, per-bucket SEEM/paged
programs). Through the remote-compile tunnel a cold start pays minutes
of compilation; JAX's persistent cache replays them from disk in
milliseconds after a restart. The reference has no equivalent — it pays
a full model *reload* per request (app.py:94-103); we keep weights
resident AND programs cached across restarts.

Skipped silently where unsupported (e.g. some interpret/CI backends):
serving must never fail because a cache directory is read-only.
"""
from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.environ.get(
    "VITRON_COMPILE_CACHE", os.path.expanduser("~/.cache/vitron_tpu/xla"))


def enable_compile_cache(path: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache; returns the dir or None.

    Pass path="" (or VITRON_COMPILE_CACHE="") to disable explicitly.
    """
    path = DEFAULT_DIR if path is None else path
    if not path:
        return None
    try:
        os.makedirs(path, exist_ok=True)
        # JAX's persistent-cache backend is a set-once singleton: if a cache
        # was already initialized at a different dir (e.g. an embedding
        # process enabled its own), redirecting the config alone is a no-op
        # and entries keep landing in the old dir. Reset the singleton so
        # this path actually takes effect.
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:
            pass
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything that took real compile time; tiny host-side
        # programs are cheaper to rebuild than to hash.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return path
    except Exception:
        return None
