"""tests_tpu run on the REAL chip (no platform override) — auto-skipped
when none is attached (each module guards on jax.devices).

Persistent compilation cache: compiles dominate this suite's wall time
over the axon tunnel (the round-3 record needed two invocations against
a 590 s window).  With the cache warm, the whole suite fits one
invocation comfortably; cold, it still populates the cache for the next
run.  Same cache directory as bench.py (.jax_cache/, gitignored).
"""
import os

import jax

try:
    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass  # cache is best-effort
