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

import json
import logging
from typing import Any, List, Optional

import numpy as np

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


def encode_rows(rows: List[dict]) -> np.ndarray:
    """Prediction rows (string-bearing dicts) → uint8 JSON buffer.

    ``multihost_utils.process_allgather`` moves ARRAY pytrees, not Python
    objects — string rows must ride a fixed-dtype buffer."""
    return np.frombuffer(json.dumps(rows).encode("utf-8"), dtype=np.uint8).copy()


def decode_rows(buf: np.ndarray, length: int) -> List[dict]:
    return json.loads(np.asarray(buf[:length], np.uint8).tobytes().decode("utf-8"))


def gather_predictions(rows: list) -> list:
    """Gather per-host prediction lists onto every host for global metrics.

    The reference computed validation metrics per-rank and only rank 0 logged
    (SURVEY.md §5.8) — a silent correctness gap for sharded eval; this gathers
    so metrics cover the full set. Rows are JSON-encoded into fixed-width
    uint8 buffers (padded to the global max length) because process_allgather
    handles array pytrees only.
    """
    import jax

    if jax.process_count() <= 1:
        return rows
    from jax.experimental import multihost_utils

    payload = encode_rows(rows)
    n = np.asarray([payload.size], np.int32)
    lengths = np.asarray(multihost_utils.process_allgather(n, tiled=False)).reshape(-1)
    max_len = int(lengths.max())
    padded = np.zeros((max_len,), np.uint8)
    padded[: payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded, tiled=False))
    out: list = []
    for host, length in enumerate(lengths):
        out.extend(decode_rows(gathered[host], int(length)))
    return out


def shard_indices(
    n: int,
    epoch: int = 0,
    shuffle: bool = True,
    seed: int = 0,
    process_id: Optional[int] = None,
    num_processes: Optional[int] = None,
) -> np.ndarray:
    """Per-host dataset index slice with per-epoch reshuffle.

    TPU-native equivalent of the reference's ``DistributedSampler`` +
    ``set_epoch`` (ref: train/train.py:325-330,418-419): every host draws the
    SAME permutation (seeded by seed+epoch), the order wraps around so the
    total is divisible by the host count, and host p takes ``order[p::P]``.
    On a single host this is just the (shuffled) full index list.
    """
    import jax

    pid = jax.process_index() if process_id is None else process_id
    pc = jax.process_count() if num_processes is None else num_processes
    order = (np.random.RandomState(seed + epoch).permutation(n) if shuffle
             else np.arange(n))
    if pc <= 1:
        return order
    pad = (-n) % pc
    if pad:
        order = np.concatenate([order, order[:pad]])
    return order[pid::pc]
