"""JAX initialization helpers: persistent compilation cache.

The alignment engine jits one executable per shape bucket; the persistent
cache makes those compiles a one-time cost per machine (important on TPU
where XLA compiles are tens of seconds).
"""

from __future__ import annotations

import os

_done = False


def _host_fingerprint() -> str:
    """Short stable hash of this host's CPU feature flags."""
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha256(f"{platform.machine()}|{feats}".encode()).hexdigest()
    return h[:12]


def setup_jax(cache_dir: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    cache_dir = cache_dir or os.environ.get(
        "LESV_TPU_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "lesv_tpu_xla"))
    if cache_dir in ("off", "none", "0"):
        # no persistent cache: dodges jaxlib's flaky cache write/read
        # paths (zstd serialization segfaults under compile churn — see
        # verify skill notes); tests opt in via conftest since XLA:CPU
        # compiles are cheap locally
        return
    try:
        # one subdirectory per backend: concurrent CPU + TPU processes
        # must never share cache files (a reader racing a writer has
        # produced torn-file segfaults inside the zstd codec)
        sub = jax.default_backend()
        if sub == "cpu":
            # CPU executables are AOT-compiled for the build host's exact
            # feature set; loading an entry written on a different CPU
            # trips cpu_aot_loader machine-feature mismatches (warned as
            # SIGILL risk, observed as compile-path segfaults) — key the
            # CPU cache by a host fingerprint
            sub = f"cpu-{_host_fingerprint()}"
        cache_dir = os.path.join(cache_dir, sub)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # 2s threshold: skip persisting trivial executables (slices,
        # tiny fills) — fewer cache writes, fewer windows for jaxlib's
        # flaky cache-serialization path (see verify skill notes)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
