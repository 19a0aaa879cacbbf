"""Persistent XLA compilation cache.

Serving-path programs (the slot engine's fused ``prefill_commit``, the
chunked decode variants, prefill buckets) each compile in tens of seconds
on a real TPU backend; without a persistent cache every fresh server
process pays that again, and a jit variant first hit mid-traffic stalls
live requests behind a compile (measured: 30-60 s TTFT spikes on the
first admission burst of an unseen batch bucket).

The reference framework gets this for free — MLX has no trace/compile
step at all — so the TPU-native design owes the user an equivalent:
compile once per (program, shape bucket) per machine, ever.

Opt out with ``MLX_PARALLM_NO_COMPILE_CACHE=1``; relocate with
``MLX_PARALLM_COMPILE_CACHE_DIR``.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_enabled = False


def enable_compile_cache() -> bool:
    """Idempotently point JAX's persistent compilation cache at a
    per-user directory. Returns True when the cache is active."""
    global _enabled
    if _enabled:
        return True
    if os.environ.get("MLX_PARALLM_NO_COMPILE_CACHE") == "1":
        return False
    path = os.environ.get("MLX_PARALLM_COMPILE_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "mlx_parallm_tpu", "xla-cache"
    )
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything that took a meaningful compile; tiny programs
        # aren't worth the disk round trip.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        _enabled = True
        logger.info("XLA compilation cache at %s", path)
        return True
    except Exception as e:  # pragma: no cover - depends on jax build
        logger.warning("compilation cache unavailable: %s", e)
        return False
