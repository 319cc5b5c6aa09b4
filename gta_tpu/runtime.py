"""Process-level runtime setup helpers."""

from __future__ import annotations

import os


def setup(cache_dir: str = "/root/.cache/jax_compilation") -> None:
    """Enable the persistent compilation cache (first Mosaic/XLA compiles of
    the full model take minutes over the tunneled TPU; subsequent processes
    hit the cache) and keep CPU fallback sane."""
    import jax

    # The container's TPU plugin force-overrides JAX_PLATFORMS; honor an
    # explicit backend request (e.g. GTA_PLATFORM=cpu for CI smokes) the
    # only way that works here — via jax.config after import.
    plat = os.environ.get("GTA_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    try:
        # TPU-optimized PRNG: threefry dropout bits cost ~15% of a train
        # step at these shapes; rbg is hardware-accelerated
        jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass
