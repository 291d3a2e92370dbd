"""Multi-host bootstrap: jax.distributed + per-process data slicing.

The reference is single-process (SURVEY.md §2.15). On multi-host TPU
slices, JAX runs one process per host; this module wraps the two things
every entry point needs:

  - `initialize()` — `jax.distributed.initialize` with env-var
    autodetection (a no-op on single-process runs, so CLIs can call it
    unconditionally). After it, `jax.devices()` spans the whole slice
    and the mesh axes in parallel/sharding.py lay collectives over ICI
    within a host's chips and DCN across hosts — keep the TILE axis
    (halo exchanges + pair all-to-all) inside a host and put the DATA
    axis (one psum per step) across hosts.
  - `process_camera_slice(n)` — the contiguous camera range this process
    should load from disk (host-local data loading; the sharded steps
    only ever index into process-local device arrays).
"""

from __future__ import annotations

import os

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed from args or env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; TPU
    pod runtimes usually need no args at all). No-op when neither args
    nor env request a multi-process run."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ else None)
    if coordinator_address is None and num_processes is None:
        return  # single-process run
    process_id = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_camera_slice(n_cameras: int) -> tuple[int, int]:
    """[start, end) of the cameras THIS process should load — contiguous
    balanced split over jax.process_count() (host-local IO; remainders
    go to the leading processes)."""
    p = jax.process_count()
    i = jax.process_index()
    base, rem = divmod(n_cameras, p)
    start = i * base + min(i, rem)
    return start, start + base + (1 if i < rem else 0)
