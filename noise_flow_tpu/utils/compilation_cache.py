"""Persistent XLA compilation cache.

Remote/TPU compiles are expensive (and on tunneled devices, high-variance);
the reference's TF1 graphs had no cross-process caching at all. Enabling
jax's persistent cache makes every CLI re-run (train, sample, dncnn, bench)
skip recompilation of unchanged programs.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str = "") -> str:
    import jax

    d = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
         or os.path.expanduser("~/.cache/noise_flow_tpu/xla"))
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    return d
