"""Persistent XLA compilation cache.

The axon compile service takes 8-22 min for flagship-scale grad programs
(PERFORMANCE.md); without a persistent cache every process restart re-pays every
stage's compile. This enables JAX's on-disk executable cache so a program is
compiled once per (program, compiler version) and then deserialised in seconds.

Opt out with PAGNERF_COMPILE_CACHE=0; override the location with
PAGNERF_COMPILE_CACHE_DIR.
"""
from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.expanduser("~/.cache/pagnerf_tpu/xla_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Turn on the persistent compilation cache. Safe to call multiple times and
    before/after backend init. Returns the cache dir (None when disabled)."""
    if os.environ.get("PAGNERF_COMPILE_CACHE", "1") == "0":
        return None
    cache_dir = (cache_dir or os.environ.get("PAGNERF_COMPILE_CACHE_DIR")
                 or _DEFAULT_DIR)
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took noticeable compile time; entry size is
        # irrelevant next to multi-minute axon compiles
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - config names vary across jax
        log.warning("persistent compilation cache unavailable: %s", e)
        return None
    return cache_dir
