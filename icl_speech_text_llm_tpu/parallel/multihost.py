"""Multi-host coordination.

Replaces the reference's `dist.init_process_group("nccl")` + rank gating
(ref: train/train.py:136-141,623): `jax.distributed.initialize()` connects the
hosts of a TPU pod slice, a single global Mesh spans every chip, and
main-process gating becomes `jax.process_index() == 0`. Metric/prediction
gathering rides `jax.experimental.multihost_utils`.

On a single host every helper degrades to a no-op, so the same entry points
run unchanged from 1 chip to a pod.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Connect this host to the pod (no-op on single-host).

    On Cloud TPU the arguments auto-detect from the metadata server; pass them
    explicitly for other clusters (the reference took rank via --local_rank,
    ref: train/train.py:47-48).
    Returns the process index.
    """
    import jax

    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            f"jax.distributed initialized: process {jax.process_index()} / "
            f"{jax.process_count()}, {jax.local_device_count()} local devices"
        )
    return jax.process_index()


def is_main_process() -> bool:
    """Rank-0 gating for logging/checkpointing (ref: train/train.py:139-141)."""
    import jax

    return jax.process_index() == 0


def process_count() -> int:
    import jax

    return jax.process_count()


def sync_hosts(name: str = "barrier") -> None:
    """Barrier across hosts (no-op single-host)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def broadcast_from_main(tree: Any) -> Any:
    """Replicate host-local data from process 0 to all hosts (e.g. symbol
    mappings, shuffled index orders) so every host packs identical batches."""
    import jax

    if jax.process_count() <= 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def gather_predictions(rows: list) -> list:
    """Gather per-host prediction lists onto every host for global metrics.

    The reference computed validation metrics per-rank and only rank 0 logged
    (SURVEY.md §5.8) — a silent correctness gap for sharded eval; this gathers
    so metrics cover the full set.
    """
    import jax

    if jax.process_count() <= 1:
        return rows
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(rows, tiled=False)
    out = []
    for per_host in gathered:
        out.extend(per_host)
    return out
