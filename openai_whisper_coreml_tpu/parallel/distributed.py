"""Multi-host initialisation for pod slices.

Single entry point wrapping jax.distributed.initialize with the standard
restart-on-failure posture (SURVEY.md §5 failure-detection row): inference is
stateless, so the recovery story is "the failed host restarts, re-initialises,
re-jits, and rejoins" — there is no in-flight state to reconcile beyond the
serving queue, which re-enqueues on error (serve_http worker).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise multi-host JAX. No-ops on a single host.

    Arguments default from the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID) or the TPU metadata
    available to jax.distributed.initialize on Cloud TPU pods.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-sharded batch (DP across hosts)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    if per * n != global_batch:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    return slice(i * per, (i + 1) * per)
