"""Multi-host initialization & work partitioning.

The reference is strictly single-process (SURVEY.md §5: no comm backend at
all).  The TPU-native equivalent for multi-host pods: ``jax.distributed``
over DCN for process bootstrap, a global mesh over every chip, and — since
detection is embarrassingly parallel per file — a deterministic round-robin
partition of the file list per process, with detections gathered through
the filesystem exactly like the reference's CSV handoff.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Sequence

import jax

log = logging.getLogger(__name__)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op when single-process).

    Arguments default to the standard JAX_* / cloud-TPU environment
    discovery; call once before any jax computation on each host.
    """
    if num_processes == 1:
        # EXPLICIT single-process request: skip cluster auto-detection
        # entirely — inside a SLURM/MPI allocation, initialize() would
        # detect the cluster and block waiting for the other ranks (or
        # adopt the SLURM world size, silently dropping most of the file
        # partition on this host) despite the caller pinning 1
        # (review r3 batch 8)
        log.debug("explicit num_processes=1; jax.distributed not initialized")
        return
    if num_processes is None and "JAX_COORDINATOR_ADDRESS" not in os.environ \
            and coordinator_address is None:
        # No explicit configuration: defer to jax.distributed's own cluster
        # auto-detection (SLURM / OpenMPI / cloud-TPU metadata).  On a plain
        # single host detection raises immediately — that IS the no-op path
        # (an early return here used to skip auto-detection entirely, so
        # SLURM ranks each saw process_count()==1 and every host detected
        # the FULL file list — review r3 finding).
        try:
            jax.distributed.initialize()
        except Exception as e:  # noqa: BLE001 — "no cluster found" is normal
            log.debug("single-process run; jax.distributed not initialized "
                      "(%s)", e)
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    log.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def partition_files(files: Sequence[str], process_id: Optional[int] = None,
                    num_processes: Optional[int] = None) -> List[str]:
    """Deterministic per-process slice of the work list (sorted round-robin,
    so adding hosts rebalances without coordination)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    ordered = sorted(files)
    return ordered[pid::n]
