"""JAX initialization helpers: persistent compilation cache.

The alignment engine jits one executable per shape bucket; the persistent
cache makes those compiles a one-time cost per machine (important on TPU
where XLA compiles are tens of seconds).
"""

from __future__ import annotations

import os

_done = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    cache_dir = cache_dir or os.environ.get(
        "LESV_TPU_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "lesv_tpu_xla"))
    try:
        # one subdirectory per backend: concurrent CPU + TPU processes
        # must never share cache files (a reader racing a writer has
        # produced torn-file segfaults inside the zstd codec)
        cache_dir = os.path.join(cache_dir, jax.default_backend())
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # 2s threshold: skip persisting trivial executables (slices,
        # tiny fills) — fewer cache writes, fewer windows for jaxlib's
        # flaky cache-serialization path (see verify skill notes)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
