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


def pytest_collection_modifyitems(config, items):
    """Skip the whole suite LOUDLY when the TPU execute path is dead.

    The axon tunnel can wedge so that jax.devices() reports the chip but
    no execute/fetch round-trip ever returns (observed 2026-08-20: a
    trivial matmul fetch blocked >570 s).  Each module's platform guard
    passes in that state, and the first test then hangs to the pytest
    timeout.  Probe once with a deadline (TPU_PREFLIGHT_S, default 300 s
    — covers the 70-260 s cold-backend first-program cost) and skip
    everything with the reason when it fails; same pattern as bench.py's
    _preflight_tunnel.
    """
    import subprocess
    import sys

    import pytest

    try:
        if not any(d.platform == "tpu" for d in jax.devices()):
            return  # modules' own no-TPU skip guards handle this
    except Exception:
        return

    # Probe in a SUBPROCESS: if the execute leg is wedged, an in-process
    # probe leaves a stuck RPC that blocks the PJRT client's shutdown
    # path, hanging pytest at exit even though every test was skipped.
    deadline = float(os.environ.get("TPU_PREFLIGHT_S", "300"))
    try:
        rc = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax, numpy as np; "
                "x = jax.numpy.zeros((128,128), jax.numpy.bfloat16); "
                "np.asarray(x @ x)",
            ],
            timeout=deadline,
            capture_output=True,
        ).returncode
    except subprocess.TimeoutExpired:
        rc = -1
    if rc != 0:
        mark = pytest.mark.skip(
            reason=(
                f"TPU tunnel execute leg dead: trivial matmul fetch "
                f"exceeded {deadline:.0f}s (infrastructure, not code)"
            )
        )
        for item in items:
            item.add_marker(mark)
