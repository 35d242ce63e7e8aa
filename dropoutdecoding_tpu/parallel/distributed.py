"""Multi-host initialization + experiment fan-out.

The reference's cluster story is a SLURM array of independent jobs
(run_main_experiments.py:81-86).  The TPU-native equivalents:

- ``init_multihost()``: `jax.distributed.initialize` for multi-host slices
  (DCN between hosts, ICI within a slice) — after this, the mesh in
  parallel/mesh.py spans all hosts' devices and pjit programs run SPMD.
- ``shard_work()``: deterministic round-robin split of an item list across
  hosts for embarrassingly-parallel evaluation (each host captions its
  share of images; JSONL outputs concatenate, and the append/dedupe resume
  semantics of the harness make retries safe — SURVEY.md §5 failure
  handling row).
"""
from __future__ import annotations

import jax


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialize jax.distributed when running on a multi-host slice.
    No-ops on a single host with no coordinator configured."""
    import os

    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def shard_work(items, process_index: int | None = None, process_count: int | None = None):
    """This host's share of a work list (stable round-robin)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % pc == pi]
