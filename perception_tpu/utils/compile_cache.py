"""Persistent XLA compilation cache for the CLI/serve/bench entry points.

The unified pipeline compiles in ~10 s per distinct shape on the v5e (and
the serve.py cold start chains several shapes into minutes). The reference
pays nothing equivalent (CUDA kernels are AOT), so a second-process cold
start must not re-pay tracing+compilation: enable jax's persistent
compilation cache once per process, keyed under a stable on-disk directory.

Call `enable_compilation_cache()` before the first jit execution. Safe to
call repeatedly and safe on backends where the cache is unsupported.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/perception_tpu/xla_cache")
_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at a persistent compilation cache directory.

    Returns the directory in use, or None if the cache could not be enabled
    (old jax, read-only filesystem, ...). Controlled by env:
      PT_COMPILATION_CACHE=0   disable entirely
      PT_COMPILATION_CACHE_DIR overrides the default location
    """
    global _enabled
    if os.environ.get("PT_COMPILATION_CACHE", "1") == "0":
        return None
    cache_dir = (cache_dir
                 or os.environ.get("PT_COMPILATION_CACHE_DIR")
                 or _DEFAULT_DIR)
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every compilation, even fast ones: the axon tunnel makes
        # wall-clock compile estimates unreliable, and small programs are
        # cheap to store.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        if os.environ.get("PT_CACHE_DEBUG") == "1":
            # Log WHY a lookup misses (jax prints the first differing key
            # component) — the tool for "warm run still compiles" triage.
            jax.config.update("jax_explain_cache_misses", True)
        _enabled = True
        return cache_dir
    except Exception:
        return None
