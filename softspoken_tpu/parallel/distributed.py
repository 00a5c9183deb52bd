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


def merge_partition_stores(store_path: str, remove: bool = True) -> dict:
    """Gather per-process ``<base>.pN<ext>`` detection stores into the main
    store at ``store_path``.

    ``detect --distributed`` writes one store per process (race-free by
    construction); review/silence/status read only the MAIN store, so this
    is the required gather step — run it once after all ranks finish
    (review r3 batch 10: the partitions were previously unreachable from
    any downstream stage).  File-granular and idempotent: a partition's
    file is skipped if the main store already processed it (each file is
    detected by exactly one rank, so file-level merge is exact).  Partition
    CSVs and their ``.processed`` sidecars are deleted after a successful
    merge unless ``remove=False``.
    """
    import glob
    import re

    from ..project.store import DetectionStore

    base, ext = os.path.splitext(store_path)
    parts = sorted(
        (p for p in glob.glob(f"{base}.p*{ext}")
         if re.fullmatch(re.escape(base) + r"\.p\d+" + re.escape(ext), p)),
        key=lambda p: int(re.search(r"\.p(\d+)" + re.escape(ext) + "$", p).group(1)),
    )
    main = DetectionStore(store_path)
    done = main.processed_files()
    merged_rows = 0
    merged_files = 0
    for part_path in parts:
        part = DetectionStore(part_path)
        by_file: dict = {}
        for _, r in part.df.iterrows():
            full = os.path.join(str(r["file_path"]), str(r["file_name"]))
            by_file.setdefault(full, []).append(
                (float(r["start_time"]), float(r["end_time"])))
        for full in part.processed_files():
            if full in done:
                continue
            merged_rows += main.append_intervals(full, by_file.get(full, []))
            main.mark_processed(full)
            done.add(full)
            merged_files += 1
    main.save()
    if remove:
        for part_path in parts:
            for p in (part_path, part_path + ".processed"):
                try:
                    os.remove(p)
                except OSError:
                    pass
    log.info("merged %d partition store(s): %d file(s), %d row(s) into %s",
             len(parts), merged_files, merged_rows, store_path)
    return {"partitions": len(parts), "files": merged_files,
            "rows": merged_rows, "store": store_path}
