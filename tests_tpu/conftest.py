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

# The probe child enumerates devices itself and reports; the parent makes
# NO backend-initializing jax call before the probe, so on single-client
# TPU runtimes the child can actually acquire the chip (round-4 advisor
# finding 2; the axon tunnel happens to allow multiple clients, but the
# order is now correct everywhere).
_PROBE_SRC = (
    "import jax, numpy as np, sys\n"
    "if not any(d.platform == 'tpu' for d in jax.devices()):\n"
    "    print('NO_TPU'); sys.exit(0)\n"
    "x = jax.numpy.zeros((128, 128), jax.numpy.bfloat16)\n"
    "np.asarray(x @ x)\n"
    "print('TPU_OK')\n"
)

_BUSY_PATTERNS = (
    "already in use",
    "ALREADY_EXISTS",
    "Device or resource busy",
    "libtpu.so is already in use",
)


def pytest_collection_modifyitems(config, items):
    """Skip (or, with TPU_PREFLIGHT_STRICT=1, ERROR) the whole suite
    LOUDLY when the TPU execute path is dead.

    The axon tunnel can wedge so that jax.devices() reports the chip but
    no execute/fetch round-trip ever returns (observed 2026-08-20: a
    trivial matmul fetch blocked >570 s).  Each module's platform guard
    passes in that state, and the first test then hangs to the pytest
    timeout.  Probe once in a subprocess with a deadline
    (TPU_PREFLIGHT_S, default 450 s — the 70-260 s cold-backend
    first-program cost plus headroom, round-4 advisor finding 3) and
    mark everything with the precise reason when it fails.

    Failure modes are distinguished (round-4 advisor finding 1):
    - probe TIMEOUT -> dead tunnel: skip/error with the deadline reason;
    - probe CRASH -> skip/error with the child's stderr tail in the
      reason (an import error or misconfig is NOT a dead tunnel);
    - probe reports the device is held by another client -> treated as
      healthy (multi-client tunnels serve both; single-client runtimes
      will surface the conflict per-test with a real error).
    An all-skipped pytest run exits 0, which a driver can mistake for a
    green gate; set TPU_PREFLIGHT_STRICT=1 to abort the session with a
    nonzero exit code instead of skipping.
    """
    import subprocess
    import sys

    import pytest

    deadline = float(os.environ.get("TPU_PREFLIGHT_S", "450"))
    reason = None
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=deadline,
            capture_output=True,
            text=True,
        )
        if proc.returncode == 0:
            return  # NO_TPU (module guards handle) or TPU_OK
        err = (proc.stderr or "").strip()
        if any(p in err for p in _BUSY_PATTERNS):
            return  # chip held by another client: not a dead tunnel
        tail = err[-400:] if err else "<no stderr>"
        reason = (
            f"TPU probe subprocess crashed (rc={proc.returncode}), "
            f"NOT a tunnel timeout — stderr tail: {tail}"
        )
    except subprocess.TimeoutExpired:
        reason = (
            f"TPU tunnel execute leg dead: trivial matmul fetch "
            f"exceeded {deadline:.0f}s (infrastructure, not code)"
        )

    if os.environ.get("TPU_PREFLIGHT_STRICT") == "1":
        pytest.exit(f"TPU preflight failed: {reason}", returncode=3)
    mark = pytest.mark.skip(reason=reason)
    for item in items:
        item.add_marker(mark)
